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

Inference-only (no autodiff rule); MiTBlock gates it off during training.
Parity: tests/test_fused_attention.py (interpret) + on-chip A/B.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_attention_block"]


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
