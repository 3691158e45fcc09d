"""Fused attention half-block kernel vs the reference formulation
(interpret mode on CPU), incl. multi-head and K/V-padding masking."""
import jax
import jax.numpy as jnp
import numpy as np

from upliftingtabletennis_tpu.ops.fused_attention import fused_attention_block


def reference(x, heads, gamma, beta, wq, bq, k, v, wp, bp, eps=1e-6):
    B, N, C = x.shape
    hd = C // heads
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    y = (x - mean) / jnp.sqrt(var + eps) * gamma + beta
    q = (y @ wq + bq).reshape(B, N, heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * hd**-0.5
    w = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, N, C)
    return x + o @ wp + bp


def test_fused_attention_matches_reference():
    rng = np.random.default_rng(0)
    for B, H, W, C, heads, Nkv in [(2, 8, 6, 32, 2, 9), (1, 12, 5, 16, 1, 20)]:
        x = jnp.asarray(rng.normal(size=(B, H * W, C)), jnp.float32)
        hd = C // heads
        gamma = jnp.asarray(rng.normal(1, 0.1, (C,)), jnp.float32)
        beta = jnp.asarray(rng.normal(0, 0.1, (C,)), jnp.float32)
        wq = jnp.asarray(rng.normal(0, 0.1, (C, C)), jnp.float32)
        bq = jnp.asarray(rng.normal(0, 0.1, (C,)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, Nkv, heads, hd)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, Nkv, heads, hd)), jnp.float32)
        wp = jnp.asarray(rng.normal(0, 0.1, (C, C)), jnp.float32)
        bp = jnp.asarray(rng.normal(0, 0.1, (C,)), jnp.float32)
        want = reference(x, heads, gamma, beta, wq, bq, k, v, wp, bp)
        got = fused_attention_block(x, H, W, heads, gamma, beta, wq, bq, k, v,
                                    wp, bp, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-4, rtol=3e-4)


def test_fused_attention_trainable_gradient_parity():
    """The recompute-backward wrapper must yield the same gradients as
    autodiff through the unfused formulation (requirement for putting
    detector training on the fused attention path)."""
    from upliftingtabletennis_tpu.ops.fused_attention import (
        fused_attention_block_trainable,
    )

    rng = np.random.default_rng(2)
    B, H, W, C, heads, Nkv = 1, 8, 4, 16, 2, 6
    hd = C // heads
    x = jnp.asarray(rng.normal(size=(B, H * W, C)), jnp.float32)
    args = (
        jnp.asarray(rng.normal(1, 0.1, (C,)), jnp.float32),       # gamma
        jnp.asarray(rng.normal(0, 0.1, (C,)), jnp.float32),       # beta
        jnp.asarray(rng.normal(0, 0.1, (C, C)), jnp.float32),     # wq
        jnp.asarray(rng.normal(0, 0.1, (C,)), jnp.float32),       # bq
        jnp.asarray(rng.normal(size=(B, Nkv, heads, hd)), jnp.float32),  # k
        jnp.asarray(rng.normal(size=(B, Nkv, heads, hd)), jnp.float32),  # v
        jnp.asarray(rng.normal(0, 0.1, (C, C)), jnp.float32),     # wp
        jnp.asarray(rng.normal(0, 0.1, (C,)), jnp.float32),       # bp
    )

    def loss_fused(x, *a):
        return jnp.sum(
            jnp.sin(fused_attention_block_trainable(H, W, heads, True, x, *a))
        )

    def loss_ref(x, *a):
        return jnp.sum(jnp.sin(reference(x, heads, *a)))

    gf = jax.grad(loss_fused, argnums=tuple(range(9)))(x, *args)
    gr = jax.grad(loss_ref, argnums=tuple(range(9)))(x, *args)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=3e-4)


def test_fused_block_in_segformer_cpu_parity():
    """MiTBlock's fused branch is TPU-gated; emulate by calling the fused
    math directly against the flax module output for a full block."""
    import flax.linen as nn

    from upliftingtabletennis_tpu.models.segformer import EfficientAttention

    rng = np.random.default_rng(1)
    B, H, W, C, heads, sr = 2, 8, 8, 32, 2, 2
    x = jnp.asarray(rng.normal(size=(B, H * W, C)), jnp.float32)

    class Half(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
            return x + EfficientAttention(C, heads, sr, name="attn")(y, H, W)

    mod = Half()
    variables = mod.init(jax.random.PRNGKey(0), x)
    want = mod.apply(variables, x)

    p1 = variables["params"]["norm1"]
    pa = variables["params"]["attn"]
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    y = (x - mean) / jnp.sqrt(var + 1e-6) * p1["scale"] + p1["bias"]
    kv_in = jax.lax.conv_general_dilated(
        y.reshape(B, H, W, C), pa["sr"]["kernel"], (sr, sr), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + pa["sr"]["bias"]
    kv_in = kv_in.reshape(B, -1, C)
    m2 = kv_in.mean(-1, keepdims=True)
    v2 = ((kv_in - m2) ** 2).mean(-1, keepdims=True)
    kv_in = (kv_in - m2) / jnp.sqrt(v2 + 1e-6) * pa["sr_norm"]["scale"] + pa["sr_norm"]["bias"]
    kv = (kv_in @ pa["kv"]["kernel"] + pa["kv"]["bias"]).reshape(
        B, -1, 2, heads, C // heads
    )
    got = fused_attention_block(
        x, H, W, heads, p1["scale"], p1["bias"], pa["q"]["kernel"],
        pa["q"]["bias"], kv[:, :, 0], kv[:, :, 1], pa["proj"]["kernel"],
        pa["proj"]["bias"], interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-4, rtol=3e-4)


def test_flash_cross_attention_diff_gradient_parity():
    """The custom-VJP flash wrapper (forward = Pallas one-pass kernel,
    backward = dense recompute) must match dense grads exactly — the raw
    pallas_call has no JVP rule, so grad through a TPU SegFormer (including
    flax param-creation stub calls) failed before this wrapper existed."""
    from upliftingtabletennis_tpu.ops.flash_attention import (
        dense_cross_attention,
        flash_cross_attention_diff,
    )

    rng = np.random.default_rng(3)
    B, Nq, Nkv, h, hd = 2, 37, 11, 2, 8
    q = jnp.asarray(rng.normal(size=(B, Nq, h, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Nkv, h, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Nkv, h, hd)), jnp.float32)
    scale = hd ** -0.5

    def loss_flash(q, k, v):
        o = flash_cross_attention_diff(q, k, v, scale, True)
        return jnp.sum(jnp.sin(o))

    def loss_dense(q, k, v):
        return jnp.sum(jnp.sin(dense_cross_attention(q, k, v, scale=scale)))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)
