"""Fused LayerNorm + q-proj + cross-attention + out-proj + residual kernel.

The SegFormer attention half-block x + proj(attn(q(LN(x)), k, v))
(models/segformer.py MiTBlock norm1 + EfficientAttention) lowers to ~5
HBM passes over the (N, C) activation. K/V come from the spatially
REDUCED tokens (<= ~1400), so like ops/flash_attention.py the whole K/V
fits VMEM; this kernel additionally keeps q and the attention output in
VMEM, reading x once and writing the half-block result once. K/V (and
their sr-conv + LayerNorm + projection) are computed OUTSIDE with XLA —
they are tiny.

Per (batch, row-tile) grid cell: LN over C -> q = y Wq + bq -> per-head
softmax(q k^T / sqrt(hd)) v with -inf masking of K/V padding -> concat
heads -> Wproj + bproj -> + x. Logits/softmax in f32.

Training runs the same kernel through `fused_attention_block_trainable`
(custom VJP, recompute backward — the fused_ffn.py pattern), so the
SegFormer attention half-block is on the fused path in BOTH modes.
Parity: tests/test_fused_attention.py (interpret, values + gradients)
+ on-chip A/B.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_attention_block", "fused_attention_block_trainable"]


def _kernel(x_ref, g_ref, b_ref, wq_ref, bq_ref, k_ref, v_ref, wp_ref,
            bp_ref, o_ref, *, eps: float, scale: float, nkv: int, heads: int):
    x = x_ref[0]  # (TQ, C) flat token tile — attention has no spatial halo
    T, C = x.shape
    hd = C // heads

    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)

    q = jax.lax.dot_general(
        y.astype(x.dtype), wq_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bq_ref[0].astype(jnp.float32)  # (T, C)
    q = q.astype(x.dtype)

    outs = []
    for h in range(heads):
        qh = q[:, h * hd : (h + 1) * hd]
        kh = k_ref[0, h]  # (Nkvp, hd)
        vh = v_ref[0, h]
        logits = jax.lax.dot_general(
            qh, kh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (T, Nkvp)
        if nkv < kh.shape[0]:
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(col < nkv, logits, -jnp.inf)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        w = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
        outs.append(
            jax.lax.dot_general(
                w, vh,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
    o = jnp.concatenate(outs, axis=-1).astype(x.dtype)  # (T, C)
    out = jax.lax.dot_general(
        o, wp_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bp_ref[0].astype(jnp.float32)
    o_ref[0] = (xf + out).astype(o_ref.dtype)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit, static_argnames=("H", "W", "heads", "eps", "interpret")
)
def fused_attention_block(x, H: int, W: int, heads: int, gamma, beta, wq, bq,
                          k, v, wp, bp, eps: float = 1e-6,
                          interpret: bool = False):
    """out = x + proj(attn(q(LN(x)), k, v)); x (B, N, C), N == H*W.

    k, v: (B, Nkv, heads, hd) — the already-projected (spatially reduced)
    keys/values. gamma/beta (C,), wq/wp (C, C), bq/bp (C,).
    """
    B, N, C = x.shape
    assert N == H * W and C % heads == 0
    hd = C // heads
    Nkv = k.shape[1]
    nkv_pad = _round_up(Nkv, 128)
    kt = jnp.transpose(k, (0, 2, 1, 3))  # (B, h, Nkv, hd)
    vt = jnp.transpose(v, (0, 2, 1, 3))
    if nkv_pad != Nkv:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, nkv_pad - Nkv), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, nkv_pad - Nkv), (0, 0)))

    # flat token tiles: the (TQ, Nkv_pad) f32 logits block must fit VMEM
    # (TQ=1024, Nkv<=1408 -> 5.6 MB); LN/q-proj are per-token so no halo
    TQ = 1024
    n_pad = _round_up(N, TQ)
    xp = jnp.pad(x, ((0, 0), (0, n_pad - N), (0, 0))) if n_pad != N else x
    grid = (B, n_pad // TQ)
    blk = pl.BlockSpec((1, TQ, C), lambda b, i: (b, i, 0),
                       memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda b, i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, heads, nkv_pad, hd), lambda b, i: (b, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, eps=float(eps), scale=hd ** -0.5,
                          nkv=Nkv, heads=heads),
        out_shape=jax.ShapeDtypeStruct((B, n_pad, C), x.dtype),
        grid=grid,
        in_specs=[
            blk,
            full(gamma.reshape(1, C)), full(beta.reshape(1, C)),
            full(wq), full(bq.reshape(1, C)),
            kv_spec, kv_spec,
            full(wp), full(bp.reshape(1, C)),
        ],
        out_specs=blk,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * N * C * C + 4 * B * N * Nkv * hd * heads,
            bytes_accessed=2 * B * N * C * x.dtype.itemsize,
            transcendentals=B * N * Nkv * heads,
        ),
        interpret=interpret,
    )(xp, gamma.reshape(1, C), beta.reshape(1, C), wq, bq.reshape(1, C),
      kt, vt, wp, bp.reshape(1, C))
    return out[:, :N]


# ---------------------------------------------------------------------------
# Differentiable wrapper: fused forward kernel + recompute backward
# (the ops/fused_ffn.py pattern)
# ---------------------------------------------------------------------------

def _ref_attention_block(x, gamma, beta, wq, bq, k, v, wp, bp, heads,
                         eps=1e-6):
    """Pure-jnp mirror of the kernel (same casts: LN/logits/softmax and the
    matmul accumulations in f32, operands in x.dtype), used to derive the
    backward pass by recomputation. k, v (B, Nkv, heads, hd)."""
    B, N, C = x.shape
    hd = C // heads
    scale = hd ** -0.5
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = jnp.square(xf - mean).mean(-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = (y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)).astype(x.dtype)
    q = jnp.dot(y, wq, preferred_element_type=jnp.float32) + bq.astype(jnp.float32)
    q = q.astype(x.dtype).reshape(B, N, heads, hd)
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k.astype(x.dtype),
                        preferred_element_type=jnp.float32) * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    w = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
    o = jnp.einsum("bhnm,bmhd->bnhd", w, v.astype(x.dtype),
                   preferred_element_type=jnp.float32)
    o = o.astype(x.dtype).reshape(B, N, C)
    out = jnp.dot(o, wp, preferred_element_type=jnp.float32) + bp.astype(jnp.float32)
    return (xf + out).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def fused_attention_block_trainable(H, W, heads, interpret, x, gamma, beta,
                                    wq, bq, k, v, wp, bp):
    """Differentiable fused attention half-block: Pallas forward, recompute
    backward through `_ref_attention_block` (flash-attention-style remat —
    the (N, Nkv) attention weights are never stored). With this and
    fused_ln_ffn_trainable, detector TRAINING runs the full fused MiTBlock
    path (round-1/2 gating was inference-only for attention)."""
    return fused_attention_block(x, H, W, heads, gamma, beta, wq, bq, k, v,
                                 wp, bp, interpret=interpret)


def _fused_attention_fwd(H, W, heads, interpret, x, gamma, beta, wq, bq,
                         k, v, wp, bp):
    out = fused_attention_block(x, H, W, heads, gamma, beta, wq, bq, k, v,
                                wp, bp, interpret=interpret)
    return out, (x, gamma, beta, wq, bq, k, v, wp, bp)


def _fused_attention_bwd(H, W, heads, interpret, res, g):
    x, *params = res
    _, vjp = jax.vjp(
        lambda x_, *p: _ref_attention_block(x_, *p, heads=heads), x, *params
    )
    return vjp(g.astype(x.dtype))


fused_attention_block_trainable.defvjp(_fused_attention_fwd,
                                       _fused_attention_bwd)
