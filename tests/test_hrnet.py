"""Golden parity: flax HRNet vs the reference torch HRNet (random weights)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from upliftingtabletennis_tpu.models.hrnet import HRNet, TableHRNet, WASBNet
from upliftingtabletennis_tpu.utils.port_torch import port_cnn_state_dict


def _ref_hrnet(reference_path, frames_out=3):
    import sys

    sys.path.insert(0, str(reference_path))
    import torch

    # The reference wasb.py imports `paths` at module level; already on path.
    from balldetection.models.wasb import HRNet as RefHRNet

    cfg = {
        "frames_in": 1,
        "frames_out": frames_out,
        "out_scales": [0],
        "MODEL": {
            "EXTRA": {
                "FINAL_CONV_KERNEL": 1,
                "PRETRAINED_LAYERS": ["*"],
                "STEM": {"INPLANES": 64, "STRIDES": [1, 1]},
                "STAGE1": {"NUM_MODULES": 1, "NUM_BRANCHES": 1, "BLOCK": "BOTTLENECK",
                           "NUM_BLOCKS": [1], "NUM_CHANNELS": [32], "FUSE_METHOD": "SUM"},
                "STAGE2": {"NUM_MODULES": 1, "NUM_BRANCHES": 2, "BLOCK": "BASIC",
                           "NUM_BLOCKS": [2, 2], "NUM_CHANNELS": [16, 32], "FUSE_METHOD": "SUM"},
                "STAGE3": {"NUM_MODULES": 1, "NUM_BRANCHES": 3, "BLOCK": "BASIC",
                           "NUM_BLOCKS": [2, 2, 2], "NUM_CHANNELS": [16, 32, 64], "FUSE_METHOD": "SUM"},
                "STAGE4": {"NUM_MODULES": 1, "NUM_BRANCHES": 4, "BLOCK": "BASIC",
                           "NUM_BLOCKS": [2, 2, 2, 2], "NUM_CHANNELS": [16, 32, 64, 128], "FUSE_METHOD": "SUM"},
                "DECONV": {"NUM_DECONVS": 0, "KERNEL_SIZE": [], "NUM_BASIC_BLOCKS": 2},
            },
            "INIT_WEIGHTS": True,
        },
    }
    torch.manual_seed(0)
    model = RefHRNet(cfg=cfg)
    model.eval()
    return model


def test_hrnet_parity(reference_path):
    import torch

    ref = _ref_hrnet(reference_path)
    H, W = 64, 96
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, H, W)).astype(np.float32)

    with torch.no_grad():
        out_ref, feats_ref = ref(torch.tensor(x))
    out_ref = out_ref[0].numpy()  # (B, 3, H, W)

    model = HRNet(out_channels=3, in_frames=1)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), x_nhwc)
    ported = port_cnn_state_dict(ref.state_dict(), variables)
    out, feats = model.apply(ported, x_nhwc)
    out = np.asarray(out).transpose(0, 3, 1, 2)

    assert out.shape == out_ref.shape
    np.testing.assert_allclose(out, out_ref, atol=2e-3, rtol=1e-3)


def test_hrnet_param_count(reference_path):
    ref = _ref_hrnet(reference_path)
    n_ref = sum(p.numel() for p in ref.parameters())
    model = HRNet(out_channels=3, in_frames=1)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    n_jax = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    assert n_jax == n_ref, (n_jax, n_ref)


def test_wrappers_shapes():
    x = jnp.zeros((1, 64, 96, 9))
    m = WASBNet(in_frames=3)
    v = m.init(jax.random.PRNGKey(0), x)
    heat, cls = m.apply(v, x)
    assert heat.shape == (1, 64, 96, 1)

    x1 = jnp.zeros((1, 64, 96, 3))
    t = TableHRNet()
    v = t.init(jax.random.PRNGKey(0), x1)
    heat = t.apply(v, x1)
    assert heat.shape == (1, 64, 96, 13)


def test_remat_matches_no_remat():
    """Per-block rematerialization (get_detector(..., remat=True)) keeps the
    identical parameter structure, loss, and gradients (to recompute float
    reassociation) — it only changes activation memory. Needed to train
    full-res HRNet/WASB on a 16 GB chip (closed_loop / run_detection)."""
    from upliftingtabletennis_tpu.models.factory import get_detector

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 32, 48, 9)).astype(np.float32))
    m0, _ = get_detector("wasb", "ball", train=True, remat=False)
    m1, _ = get_detector("wasb", "ball", train=True, remat=True)
    v0 = m0.init(jax.random.PRNGKey(0), x)
    v1 = m1.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(v0) == jax.tree.structure(v1)

    def loss(params, m, v):
        out, _ = m.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, mutable=["batch_stats"],
        )
        heat = out[0] if isinstance(out, tuple) else out
        return jnp.mean(heat ** 2)

    l0, g0 = jax.value_and_grad(loss)(v0["params"], m0, v0)
    l1, g1 = jax.value_and_grad(loss)(v1["params"], m1, v1)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)
