"""Golden-parity and behavior tests for the uplifting transformer.

The strongest test: port reference torch weights into the flax model and
require numerically matching outputs for all variants x token modes.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from upliftingtabletennis_tpu.models import get_uplifting_model
from upliftingtabletennis_tpu.utils.port_torch import port_uplifting_state_dict


def _dummy_batch(rng, B=3, T=50):
    ball = rng.uniform(size=(B, T, 2)).astype(np.float32)
    table = rng.uniform(size=(B, 13, 3)).astype(np.float32)
    table[..., 2] = 1.0
    table[:, 5, 2] = 0.0  # one invisible keypoint
    mask = np.ones((B, T), np.float32)
    mask[:, 40:] = 0.0  # reference requires mixed 0/1 masks (model.py:540-546)
    times = (np.arange(T, dtype=np.float32) / 50.0)[None].repeat(B, 0)
    times = times * mask
    return ball, table, mask, times


@pytest.mark.parametrize("size", ["small", "large"])
@pytest.mark.parametrize(
    "name,mode,time_rotation",
    [
        ("connectstage", "dynamic", "new"),        # paper "Ours"
        ("connectstage", "originalmethod", "new"),  # paper "Mixed" (ref README.md:209)
        ("connectstage", "originalmethod", "old"),  # paper "Kienzle et al." (ref README.md:208)
        ("connectstage", "stacked", "new"),
        ("multistage", "dynamic", "new"),
        ("multistage", "originalmethod", "new"),
        ("singlestage", "dynamic", "new"),
        ("singlestage", "free", "new"),
        ("singlestage", "stacked", "new"),
    ],
)
def test_matches_torch_reference(reference_path, name, mode, size, time_rotation):
    import sys

    sys.path.insert(0, str(reference_path))
    import torch
    from uplifting.model import get_model as ref_get_model

    torch.manual_seed(0)
    ref_model = ref_get_model(name, size, mode=mode, time_rotation=time_rotation)
    ref_model.eval()

    rng = np.random.default_rng(42)
    ball, table, mask, times = _dummy_batch(rng)

    with torch.no_grad():
        ref_rot, ref_pos = ref_model(
            torch.tensor(ball), torch.tensor(table), torch.tensor(mask), torch.tensor(times)
        )
    ref_rot, ref_pos = ref_rot.numpy(), ref_pos.numpy()

    model = get_uplifting_model(name, size, mode=mode, time_rotation=time_rotation)
    params = port_uplifting_state_dict(ref_model.state_dict())
    rot, pos = model.apply(
        {"params": params}, jnp.asarray(ball), jnp.asarray(table), jnp.asarray(mask), jnp.asarray(times)
    )
    rot, pos = np.asarray(rot), np.asarray(pos)

    valid = mask.astype(bool)
    # Exact structural parity is asserted per-layer in test_layer_parity; the
    # end-to-end bound allows for f32 transcendental differences (RoPE cos/sin
    # implementations differ between XLA and torch at ~1e-4) amplified over
    # up to 16 pre-LN layers. Error is measured relative to the output scale.
    def rel_err(a, b):
        return np.abs(a - b).max() / (np.sqrt(np.mean(b**2)) + 1e-8)

    assert rel_err(rot, ref_rot) < 2e-2, rel_err(rot, ref_rot)
    assert rel_err(pos[valid], ref_pos[valid]) < 2e-2, rel_err(pos[valid], ref_pos[valid])


def test_layer_parity(reference_path):
    """One transformer block matches the torch SimpleStaticLayer to ~3e-5."""
    import sys

    sys.path.insert(0, str(reference_path))
    import torch
    from uplifting.model import SimpleStaticLayer

    from upliftingtabletennis_tpu.models.uplifting import TransformerLayer

    torch.manual_seed(0)
    dim, heads = 32, 4
    ref_layer = SimpleStaticLayer(dim, heads, True, 0.0, "new")
    ref_layer.eval()

    rng = np.random.default_rng(0)
    B, T = 3, 50
    x = rng.normal(size=(B, T, dim)).astype(np.float32)
    mask = np.ones((B, T), np.float32)
    mask[:, 40:] = 0
    times = (np.arange(T, dtype=np.float32) / 50)[None].repeat(B, 0) * mask
    madd = np.where(mask > 0.5, 0.0, -1e9).astype(np.float32)

    with torch.no_grad():
        ref = ref_layer(
            torch.tensor(x),
            torch.tensor(np.where(mask > 0.5, 0.0, float("-inf")).astype(np.float32)),
            torch.tensor(times),
        ).numpy()

    params = port_uplifting_state_dict(ref_layer.state_dict())
    out = TransformerLayer(dim, heads, "new").apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(madd), jnp.asarray(times)
    )
    valid = mask.astype(bool)
    np.testing.assert_allclose(np.asarray(out)[valid], ref[valid], atol=2e-4)


def test_param_count_matches_reference(reference_path):
    import sys

    sys.path.insert(0, str(reference_path))
    import torch
    from uplifting.model import get_model as ref_get_model

    for name, size in [("connectstage", "large"), ("singlestage", "base"), ("multistage", "small")]:
        ref_model = ref_get_model(name, size, mode="dynamic", time_rotation="new")
        # inv_freq buffers are parameters in torch but recomputed in JAX; the
        # reference's connectstage constructs a dead `embed` module that is
        # never called when use_skipconnection=True (ref: model.py:513,551-557)
        # — we don't carry dead params.
        def is_dead(n):
            return "rotary_emb" in n or (name == "connectstage" and n.startswith("embed."))

        n_ref = sum(p.numel() for n, p in ref_model.named_parameters() if not is_dead(n))
        model = get_uplifting_model(name, size, mode="dynamic")
        rng = np.random.default_rng(0)
        ball, table, mask, times = _dummy_batch(rng, B=2)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(ball), jnp.asarray(table), jnp.asarray(mask), jnp.asarray(times)
        )
        n_jax = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
        assert n_jax == n_ref, f"{name}/{size}: {n_jax} != {n_ref}"


def test_jit_and_grad():
    """Forward is jittable and the loss is differentiable; stop_gradient keeps
    spin gradients out of the first stage (ref: model.py:553-555)."""
    model = get_uplifting_model("connectstage", "small", mode="dynamic")
    rng = np.random.default_rng(1)
    ball, table, mask, times = _dummy_batch(rng, B=2)
    args = tuple(map(jnp.asarray, (ball, table, mask, times)))
    variables = model.init(jax.random.PRNGKey(0), *args)

    @jax.jit
    def loss_fn(params):
        rot, pos = model.apply({"params": params}, *args)
        return jnp.sum(rot**2) + jnp.sum(pos**2)

    g = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)
    # position head receives gradient from pos loss
    gp = g["firststage"]["position_head"]["fc3"]["kernel"]
    assert np.abs(np.asarray(gp)).max() > 0


def test_padding_invariance():
    """Outputs for valid tokens must not depend on values in padded slots."""
    model = get_uplifting_model("connectstage", "small", mode="dynamic")
    rng = np.random.default_rng(2)
    ball, table, mask, times = _dummy_batch(rng, B=2)
    args = tuple(map(jnp.asarray, (ball, table, mask, times)))
    variables = model.init(jax.random.PRNGKey(0), *args)

    rot1, pos1 = model.apply({"params": variables["params"]}, *args)
    ball2 = ball.copy()
    ball2[:, 40:] = 123.0  # scribble on padded region
    rot2, pos2 = model.apply(
        {"params": variables["params"]}, jnp.asarray(ball2), *args[1:]
    )
    valid = mask.astype(bool)
    np.testing.assert_allclose(np.asarray(rot1), np.asarray(rot2), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(pos1)[valid], np.asarray(pos2)[valid], atol=1e-5
    )
