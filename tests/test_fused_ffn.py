"""Fused LN+MixFFN Pallas half-block vs the unfused module (interpret
mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from upliftingtabletennis_tpu.ops.fused_ffn import fused_ln_ffn


def unfused(x, H, W, gamma, beta, w1, b1, dw, bdw, w2, b2, eps=1e-6):
    B, N, C = x.shape
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    y = (x - mean) / jnp.sqrt(var + eps) * gamma + beta
    h = y @ w1 + b1
    HID = h.shape[-1]
    h4 = h.reshape(B, H, W, HID)
    h4 = jax.lax.conv_general_dilated(
        h4, dw[:, :, None, :], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=HID,
    ) + bdw
    z = jax.nn.gelu(h4.reshape(B, N, HID), approximate=False)
    return x + z @ w2 + b2


def _params(rng, C, HID):
    return dict(
        gamma=jnp.asarray(rng.normal(1, 0.1, (C,)), jnp.float32),
        beta=jnp.asarray(rng.normal(0, 0.1, (C,)), jnp.float32),
        w1=jnp.asarray(rng.normal(0, 0.1, (C, HID)), jnp.float32),
        b1=jnp.asarray(rng.normal(0, 0.1, (HID,)), jnp.float32),
        dw=jnp.asarray(rng.normal(0, 0.2, (3, 3, HID)), jnp.float32),
        bdw=jnp.asarray(rng.normal(0, 0.1, (HID,)), jnp.float32),
        w2=jnp.asarray(rng.normal(0, 0.1, (HID, C)), jnp.float32),
        b2=jnp.asarray(rng.normal(0, 0.1, (C,)), jnp.float32),
    )


def test_fused_ffn_matches_unfused():
    rng = np.random.default_rng(0)
    for B, H, W, C, HID in [(2, 16, 12, 32, 128), (1, 12, 7, 16, 64)]:
        x = jnp.asarray(rng.normal(size=(B, H * W, C)), jnp.float32)
        p = _params(rng, C, HID)
        ref = unfused(x, H, W, **p)
        got = fused_ln_ffn(x, H, W, p["gamma"], p["beta"], p["w1"], p["b1"],
                           p["dw"], p["bdw"], p["w2"], p["b2"], interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)


def test_fused_ffn_boundary_rows_zero_padded():
    """The dw conv zero-pads the hidden tensor at image boundaries; a
    constant input must NOT behave periodically."""
    rng = np.random.default_rng(1)
    B, H, W, C, HID = 1, 8, 6, 8, 32
    x = jnp.ones((B, H * W, C), jnp.float32)
    p = _params(rng, C, HID)
    ref = unfused(x, H, W, **p)
    got = fused_ln_ffn(x, H, W, p["gamma"], p["beta"], p["w1"], p["b1"],
                       p["dw"], p["bdw"], p["w2"], p["b2"], interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_dwconv_custom_vjp_matches_autodiff():
    """depthwise_conv3x3's custom VJP (needed because the Pallas forward
    has no autodiff rule) must equal XLA autodiff of the reference conv."""
    from upliftingtabletennis_tpu.ops.dwconv import _dw_xla, depthwise_conv3x3

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 10, 16)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 1, 16)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(16,)), jnp.float32)
    gc = jax.grad(lambda *a: jnp.sum(jnp.sin(depthwise_conv3x3(*a))), (0, 1, 2))(x, w, b)
    gr = jax.grad(lambda *a: jnp.sum(jnp.sin(_dw_xla(*a))), (0, 1, 2))(x, w, b)
    for a, r in zip(gc, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=1e-4)


def test_fused_ffn_trainable_gradient_parity():
    """fused_ln_ffn_trainable (kernel fwd + recompute bwd) must produce the
    same gradients as autodiff through the unfused block — the requirement
    that puts detector TRAINING on the fused path (VERDICT round-1 #8)."""
    from upliftingtabletennis_tpu.ops.fused_ffn import fused_ln_ffn_trainable

    rng = np.random.default_rng(7)
    B, H, W, C, HID = 2, 8, 6, 16, 64
    x = jnp.asarray(rng.normal(size=(B, H * W, C)), jnp.float32)
    p = _params(rng, C, HID)
    names = ("gamma", "beta", "w1", "b1", "dw", "bdw", "w2", "b2")
    args = tuple(p[n] for n in names)
    cot = jnp.asarray(rng.normal(size=(B, H * W, C)), jnp.float32)

    def loss_fused(x, *a):
        return jnp.sum(fused_ln_ffn_trainable(H, W, True, x, *a) * cot)

    def loss_ref(x, *a):
        return jnp.sum(unfused(x, H, W, *a) * cot)

    gf = jax.grad(loss_fused, argnums=tuple(range(9)))(x, *args)
    gr = jax.grad(loss_ref, argnums=tuple(range(9)))(x, *args)
    for name, a, b in zip(("x",) + names, gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=5e-3, err_msg=name)


def test_fused_ffn_v2_matches_unfused():
    """Tap-matmul variant (dw folded into fc1 as Y9 @ W19) — exact same
    semantics as v1 incl. boundary zero-padding of the hidden tensor."""
    from upliftingtabletennis_tpu.ops.fused_ffn import fused_ln_ffn_v2

    rng = np.random.default_rng(2)
    for B, H, W, C, HID in [(2, 16, 12, 32, 128), (1, 12, 7, 16, 64)]:
        x = jnp.asarray(rng.normal(size=(B, H * W, C)), jnp.float32)
        p = _params(rng, C, HID)
        ref = unfused(x, H, W, **p)
        got = fused_ln_ffn_v2(x, H, W, p["gamma"], p["beta"], p["w1"],
                              p["b1"], p["dw"], p["bdw"], p["w2"], p["b2"],
                              interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)


def test_fused_ffn_v2_boundary_rows_zero_padded():
    from upliftingtabletennis_tpu.ops.fused_ffn import fused_ln_ffn_v2

    rng = np.random.default_rng(3)
    B, H, W, C, HID = 1, 8, 6, 8, 32
    x = jnp.ones((B, H * W, C), jnp.float32)
    p = _params(rng, C, HID)
    ref = unfused(x, H, W, **p)
    got = fused_ln_ffn_v2(x, H, W, p["gamma"], p["beta"], p["w1"], p["b1"],
                          p["dw"], p["bdw"], p["w2"], p["b2"], interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_fused_ffn_v3_matches_unfused():
    """Row-tap-matmul variant (dy taps stacked along lanes, dx shifts as
    adds — the Mosaic-compatible v2 restructure)."""
    from upliftingtabletennis_tpu.ops.fused_ffn import fused_ln_ffn_v3

    rng = np.random.default_rng(4)
    for B, H, W, C, HID in [(2, 16, 12, 32, 128), (1, 12, 7, 16, 64)]:
        x = jnp.asarray(rng.normal(size=(B, H * W, C)), jnp.float32)
        p = _params(rng, C, HID)
        ref = unfused(x, H, W, **p)
        got = fused_ln_ffn_v3(x, H, W, p["gamma"], p["beta"], p["w1"],
                              p["b1"], p["dw"], p["bdw"], p["w2"], p["b2"],
                              interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)


def test_fused_ffn_v3_boundary_rows_zero_padded():
    from upliftingtabletennis_tpu.ops.fused_ffn import fused_ln_ffn_v3

    rng = np.random.default_rng(5)
    B, H, W, C, HID = 1, 8, 6, 8, 32
    x = jnp.ones((B, H * W, C), jnp.float32)
    p = _params(rng, C, HID)
    ref = unfused(x, H, W, **p)
    got = fused_ln_ffn_v3(x, H, W, p["gamma"], p["beta"], p["w1"], p["b1"],
                          p["dw"], p["bdw"], p["w2"], p["b2"], interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)
