"""Pallas kernel parity tests (interpret mode on the CPU mesh).

The real-hardware executions are exercised by bench.py / the driver on the
TPU chip; these tests pin the kernel SEMANTICS against dense XLA references
so any refactor that changes math fails fast on CPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upliftingtabletennis_tpu.ops.dwconv import _dw_pallas, _dw_xla, depthwise_conv3x3
from upliftingtabletennis_tpu.ops.flash_attention import (
    dense_cross_attention,
    flash_cross_attention,
)


@pytest.mark.parametrize(
    "B,N,h,hd,Nkv",
    [
        (2, 777, 2, 32, 350),   # unaligned Nq + Nkv, multi-head
        (1, 2048, 1, 64, 1400), # segformer stage-1-like
        (2, 196, 8, 64, 196),   # self-attention (stage 4)
    ],
)
def test_flash_attention_matches_dense(B, N, h, hd, Nkv):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, N, h, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Nkv, h, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Nkv, h, hd)), jnp.float32)
    out = flash_cross_attention(q, k, v, interpret=True)
    ref = dense_cross_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_attention_scale():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 130, 1, 32)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 7, 1, 32)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 7, 1, 32)), jnp.float32)
    out = flash_cross_attention(q, k, v, scale=0.25, interpret=True)
    ref = dense_cross_attention(q, k, v, scale=0.25)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize(
    "B,H,W,C",
    [(1, 16, 24, 128), (2, 7, 13, 256), (1, 28, 50, 512)],
)
def test_dwconv_pallas_matches_xla(B, H, W, C):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 1, C)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
    out = _dw_pallas(x, w, b, interpret=True)
    ref = _dw_xla(x, w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_dwconv_dispatch_cpu_fallback():
    # on the CPU test backend the dispatcher must use the XLA path
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 1, 64)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(64,)), jnp.float32)
    out = depthwise_conv3x3(x, w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_dw_xla(x, w, b)), rtol=1e-6)
