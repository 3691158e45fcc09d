"""Fused conv+bias+act Pallas kernels vs XLA conv + epilogue (interpret
mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upliftingtabletennis_tpu.ops.fused_conv import (
    conv1x1_bias_act,
    conv3x3_bias_act,
)


def xla_conv(x, w, b, residual=None, relu=True):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        y = y + b.astype(x.dtype)
    if residual is not None:
        y = y + residual
    return jax.nn.relu(y) if relu else y


@pytest.mark.parametrize("relu,with_res,with_bias", [
    (True, False, True), (False, False, True),
    (True, True, True), (True, False, False),
])
def test_conv3x3_fused_matches_xla(relu, with_res, with_bias):
    rng = np.random.default_rng(0)
    B, H, W, Ci, Co = 2, 8, 12, 16, 128
    x = jnp.asarray(rng.normal(size=(B, H, W, Ci)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.1, size=(3, 3, Ci, Co)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(Co,)), jnp.float32) if with_bias else None
    res = (jnp.asarray(rng.normal(size=(B, H, W, Co)), jnp.float32)
           if with_res else None)
    ref = xla_conv(x, w, b, res, relu)
    got = conv3x3_bias_act(x, w, b, res, relu=relu, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_conv3x3_boundary_rows():
    """Constant input must reproduce SAME zero-padding behavior at the
    top/bottom image rows (the clamped 1-row halo blocks are masked)."""
    rng = np.random.default_rng(1)
    B, H, W, Ci, Co = 1, 8, 6, 8, 128
    x = jnp.ones((B, H, W, Ci), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.1, size=(3, 3, Ci, Co)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(Co,)), jnp.float32)
    ref = xla_conv(x, w, b)
    got = conv3x3_bias_act(x, w, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_conv3x3_multi_tile_halo():
    """H spanning several row tiles exercises the cross-tile halo reads."""
    rng = np.random.default_rng(2)
    B, H, W, Ci, Co = 1, 16, 10, 8, 128
    x = jnp.asarray(rng.normal(size=(B, H, W, Ci)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.1, size=(3, 3, Ci, Co)), jnp.float32)
    ref = xla_conv(x, w, None, relu=False)
    # force th < H by monkeypatching the picker? cheaper: rely on the
    # default picker (th=2..16 divides 16); verify against XLA either way
    got = conv3x3_bias_act(x, w, None, relu=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("relu,with_res", [(True, False), (False, True)])
def test_conv1x1_fused_matches_xla(relu, with_res):
    rng = np.random.default_rng(3)
    B, H, W, Ci, Co = 2, 8, 12, 32, 64
    x = jnp.asarray(rng.normal(size=(B, H, W, Ci)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.1, size=(Ci, Co)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(Co,)), jnp.float32)
    res = (jnp.asarray(rng.normal(size=(B, H, W, Co)), jnp.float32)
           if with_res else None)
    ref = xla_conv(x, w[None, None], b, res, relu)
    got = conv1x1_bias_act(x, w, b, res, relu=relu, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_hrnet_packed_fused_conv_path_matches():
    """hrnet_packed with the fused-conv flag on must equal the XLA path."""
    from upliftingtabletennis_tpu.models import hrnet_packed as hp
    from upliftingtabletennis_tpu.models.hrnet import HRNet

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 9)), jnp.float32)
    model = HRNet(out_channels=1)
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    base = hp.hrnet_packed_apply(variables, x, 1, root=None)
    old = hp.FUSED_CONV
    try:
        hp.FUSED_CONV = True
        fused = hp.hrnet_packed_apply(variables, x, 1, root=None)
    finally:
        hp.FUSED_CONV = old
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                               atol=5e-3, rtol=5e-3)
