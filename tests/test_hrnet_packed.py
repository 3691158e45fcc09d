"""Lane-packed HRNet inference path: exactness vs the flax module.

The packed path (models/hrnet_packed.py) re-executes the same parameter
tree with batch-into-lanes block-diagonal convs and folded BatchNorm; it
must match HRNet.apply to float tolerance for every chunk size it will
see (the pipeline uses powers of two).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upliftingtabletennis_tpu.models.hrnet import HRNet, TableHRNet, WASBNet
from upliftingtabletennis_tpu.models.hrnet_packed import (
    _block_diag,
    hrnet_packed_apply,
    lane_pack,
    lane_unpack,
    table_hrnet_packed_apply,
    wasb_packed_apply,
)


def test_lane_pack_roundtrip():
    x = jnp.arange(8 * 4 * 6 * 16, dtype=jnp.float32).reshape(8, 4, 6, 16)
    for G in (1, 2, 4, 8):
        y = lane_pack(x, G)
        assert y.shape == (8 // G, 4, 6, G * 16)
        np.testing.assert_array_equal(np.asarray(lane_unpack(y, G, 16)), np.asarray(x))


def test_block_diag_kernel():
    w = jnp.arange(3 * 3 * 2 * 5, dtype=jnp.float32).reshape(3, 3, 2, 5)
    wb = np.array(_block_diag(w, 4))
    assert wb.shape == (3, 3, 8, 20)
    for g in range(4):
        np.testing.assert_array_equal(wb[:, :, 2 * g : 2 * g + 2, 5 * g : 5 * g + 5],
                                      np.asarray(w))
        wb[:, :, 2 * g : 2 * g + 2, 5 * g : 5 * g + 5] = 0
    assert (wb == 0).all()


@pytest.mark.parametrize("B", [8, 4])
def test_packed_matches_flax_hrnet(B):
    model = HRNet(out_channels=13, in_frames=1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, 64, 96, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    # non-trivial batch_stats so BN folding is actually exercised
    variables = jax.tree_util.tree_map_with_path(
        lambda path, a: (
            a + jnp.abs(jnp.asarray(rng.normal(size=a.shape), a.dtype)) * 0.3
            if any(getattr(k, "key", None) == "batch_stats" for k in path) or
               any(getattr(k, "key", None) in ("mean", "var") for k in path)
            else a
        ),
        variables,
    )
    ref, _ = model.apply(variables, x)
    out = hrnet_packed_apply(variables, x, 13)
    assert out.shape == ref.shape
    err = float(jnp.max(jnp.abs(out - ref)))
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    assert err / scale < 2e-4, f"packed vs flax mismatch: {err} (scale {scale})"


def test_packed_wrappers_match():
    rng = np.random.default_rng(1)
    xb = jnp.asarray(rng.normal(size=(8, 64, 96, 9)), jnp.float32)
    wasb = WASBNet()
    vb = wasb.init(jax.random.PRNGKey(1), xb[:1])
    ref, _ = wasb.apply(vb, xb)
    out, aux = wasb_packed_apply(vb, xb)
    assert aux is None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4, rtol=1e-3)

    xt = jnp.asarray(rng.normal(size=(8, 64, 96, 3)), jnp.float32)
    table = TableHRNet()
    vt = table.init(jax.random.PRNGKey(2), xt[:1])
    ref_t = table.apply(vt, xt)
    out_t = table_hrnet_packed_apply(vt, xt)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(ref_t), atol=5e-4, rtol=1e-3)
