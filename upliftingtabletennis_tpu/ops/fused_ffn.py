"""Fused LayerNorm + MixFFN + residual Pallas kernel for SegFormer blocks.

The unfused FFN half-block (MiTBlock norm2 + MixFFN, models/segformer.py)
lowers to LN -> dense -> reshape -> depthwise conv -> gelu -> dense ->
add, each materializing an (N, 4C)-sized tensor in HBM — ~5 full passes
over the hidden activation (367 MB at stage-1 detector size), measured
~10 ms/block on a v5e chip against a ~2 ms traffic bound.

This kernel computes the ENTIRE half-block out = x + fc2(gelu(dw3x3(
fc1(LN(x))))) per (batch, row-tile) grid cell: the hidden tensor lives
only in VMEM, HBM traffic drops to one read + one write of x. The 3x3
depthwise conv needs one halo row above/below, provided by shifted block
views of x (recomputing fc1 on 2 extra rows per tile — negligible);
image-boundary halos use the hidden tensor's zero padding exactly like
the unfused conv.

Numerics: LN and both matmuls accumulate in f32; gelu is the exact (erf)
variant matching the reference torch GELU. Parity vs the unfused module
is pinned by tests/test_fused_ffn.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_ln_ffn"]


def _erf(z):
    """Abramowitz & Stegun 7.1.26 polynomial erf (|err| < 1.5e-7) — the
    Pallas TPU lowering has no erf/erfc primitive."""
    s = jnp.sign(z)
    z = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * z)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
           + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-z * z))


def _gelu_exact(x):
    """0.5 x (1 + erf(x / sqrt(2))) — matches jax.nn.gelu(approximate=False)
    to ~1e-7, far below bf16 activation noise."""
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _kernel(xp_ref, xc_ref, xn_ref, g_ref, b_ref, w1_ref, b1_ref, dw_ref,
            bdw_ref, w2_ref, b2_ref, o_ref, *, eps: float, th: int, H: int):
    i = pl.program_id(1)
    xc = xc_ref[0]  # (th, W, C)
    top = xp_ref[0, -1:]  # last row of the previous tile
    bot = xn_ref[0, :1]  # first row of the next tile
    x = jnp.concatenate([top, xc, bot], axis=0)  # (th+2, W, C)
    R, W, C = x.shape

    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)

    h = jax.lax.dot_general(
        y.reshape(R * W, C).astype(xc.dtype),
        w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0].astype(jnp.float32)
    HID = h.shape[-1]

    # zero the halo rows that fall outside the image: the depthwise conv
    # zero-pads the HIDDEN tensor at image boundaries. Global row of local
    # row r is i*th + r - 1; mask rows with g < 0 or g >= H.
    g_row = jax.lax.broadcasted_iota(jnp.int32, (R * W, 1), 0) // W + i * th - 1
    ok = jnp.logical_and(g_row >= 0, g_row < H)
    h = jnp.where(ok, h, 0.0).reshape(R, W, HID).astype(xc.dtype)
    hp = jnp.pad(h, ((0, 0), (1, 1), (0, 0)))  # W-direction zero pad

    acc = jnp.zeros((th, W, HID), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            acc = acc + hp[dy : dy + th, dx : dx + W] * dw_ref[3 * dy + dx]
    z = _gelu_exact(acc + bdw_ref[0].astype(jnp.float32))

    out = jax.lax.dot_general(
        z.reshape(th * W, HID).astype(xc.dtype),
        w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0].astype(jnp.float32)
    o_ref[0] = (xc.astype(jnp.float32) + out.reshape(th, W, C)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("H", "W", "eps", "interpret", "tile_h"))
def fused_ln_ffn(x, H: int, W: int, gamma, beta, w1, b1, dw, bdw, w2, b2,
                 eps: float = 1e-6, interpret: bool = False, tile_h: int = None):
    """out = x + fc2(gelu(dw3x3(fc1(LN(x))))) for x (B, N, C), N == H*W.

    gamma/beta (C,) LN params; w1 (C, HID), b1 (HID,); dw (3, 3, HID) +
    bdw (HID,) depthwise conv; w2 (HID, C), b2 (C,).
    """
    B, N, C = x.shape
    assert N == H * W, (N, H, W)
    if tile_h is not None:
        assert H % tile_h == 0
        th = tile_h
    else:
        # largest row tile <= 16 keeping the VMEM hidden tile ~<= 8 MB;
        # bigger tiles amortize per-program overhead (measured optimum;
        # tiles >= 28 rows crash the Mosaic compiler at stage-1 width)
        HID = w1.shape[1]
        th = None
        for cand in (16, 8, 4):
            if H % cand == 0 and (cand + 2) * (W + 2) * HID * 2 <= 8 * 2**20:
                th = cand
                break
    assert th is not None, f"H={H} not divisible by 4"
    x4 = x.reshape(B, H, W, C)
    grid = (B, H // th)
    n_tiles = H // th

    def cur(b, i):
        return (b, i, 0, 0)

    def prev(b, i):
        return (b, jnp.maximum(i - 1, 0), 0, 0)

    def nxt(b, i):
        return (b, jnp.minimum(i + 1, n_tiles - 1), 0, 0)

    blk = pl.BlockSpec((1, th, W, C), cur, memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda b, i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    HID = w1.shape[1]
    # 2D operand shapes: Mosaic's VMEM layouts want >= 2 dims
    gamma2, beta2 = gamma.reshape(1, C), beta.reshape(1, C)
    b1_2, bdw2, b2_2 = b1.reshape(1, HID), bdw.reshape(1, HID), b2.reshape(1, C)
    dw2 = dw.reshape(9, HID)
    out = pl.pallas_call(
        functools.partial(_kernel, eps=float(eps), th=th, H=H),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, W, C), prev, memory_space=pltpu.VMEM),
            blk,
            pl.BlockSpec((1, th, W, C), nxt, memory_space=pltpu.VMEM),
            full(gamma2), full(beta2), full(w1), full(b1_2), full(dw2),
            full(bdw2), full(w2), full(b2_2),
        ],
        out_specs=blk,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * N * C * HID + 18 * B * N * HID,
            bytes_accessed=2 * B * N * C * x.dtype.itemsize,
            transcendentals=B * N * HID,
        ),
        interpret=interpret,
    )(x4, x4, x4, gamma2, beta2, w1, b1_2, dw2, bdw2, w2, b2_2)
    return out.reshape(B, N, C)


# ---------------------------------------------------------------------------
# v2: tap-matmul kernel — depthwise conv folded INTO the fc1 matmul
# ---------------------------------------------------------------------------
#
# The round-4 trace showed the v1 kernel at 22 TFLOP/s / 32 GB/s — neither
# roofline (VERDICT r5 #1): the 9-tap f32 depthwise loop + masking runs on
# the VPU over the (th, W, HID) hidden tile while the MXU idles. v2 uses
# the linearity of fc1: with dw_t the per-hidden-channel tap weights,
#
#   dw3x3(mask .* (LN(x) @ W1 + b1))
#     = sum_t shift_t(mask .* LN(x)) @ (W1 * dw_t)
#       + sum_t shift_t(mask) * (b1 * dw_t)
#     = Y9 @ W19
#
# where Y9 concatenates the 9 shifted copies of [masked LN(x), mask] along
# features (9*(C+1) channels) and W19 stacks [W1 * dw_t; b1 * dw_t]. One
# MXU matmul with K = 9*(C+1) (576-1161: full lane utilization, vs K = C =
# 64 at 50% for v1's fc1) replaces fc1 + the entire VPU tap loop; the f32
# accumulator never round-trips VMEM 9 times. Parity with v1/_ref_ln_ffn is
# exact up to bf16 rounding (tests/test_fused_ffn.py).


def _kernel_v2(xp_ref, xc_ref, xn_ref, g_ref, b_ref, w19_ref, bdw_ref,
               w2_ref, b2_ref, o_ref, *, eps: float, th: int, H: int):
    i = pl.program_id(1)
    xc = xc_ref[0]  # (th, W, C)
    top = xp_ref[0, -1:]
    bot = xn_ref[0, :1]
    x = jnp.concatenate([top, xc, bot], axis=0)  # (R, W, C)
    R, W, C = x.shape

    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)

    # in-image row mask (the depthwise conv zero-pads the hidden tensor at
    # image boundaries; masking y AND the indicator channel before the
    # shifts is algebraically identical — see the derivation above).
    # NB: the mask must be MATERIALIZED at (R, W, 1) — a lane-dim concat
    # whose operand is a broadcast of an (R, 1, 1) value crashes the
    # Mosaic compiler (the round-5 "v2 blocked" bug; bisected 2026-08-21:
    # shifted-slice concats and K=195 matmuls all compile, the broadcast
    # operand was the trigger).
    g_row = jax.lax.broadcasted_iota(jnp.int32, (R, W, 1), 0) + i * th - 1
    rowok = jnp.logical_and(g_row >= 0, g_row < H).astype(jnp.float32)
    y1 = jnp.concatenate([y * rowok, rowok], axis=-1).astype(xc.dtype)  # (R, W, C+1)
    yp = jnp.pad(y1, ((0, 0), (1, 1), (0, 0)))  # W-direction zero pad

    Y9 = jnp.concatenate(
        [yp[dy:dy + th, dx:dx + W] for dy in range(3) for dx in range(3)],
        axis=-1,
    )  # (th, W, 9*(C+1))

    acc = jax.lax.dot_general(
        Y9.reshape(th * W, 9 * (C + 1)),
        w19_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    z = _gelu_exact(acc + bdw_ref[0].astype(jnp.float32))
    out = jax.lax.dot_general(
        z.astype(xc.dtype),
        w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0].astype(jnp.float32)
    o_ref[0] = (xc.astype(jnp.float32) + out.reshape(th, W, -1)).astype(o_ref.dtype)


def build_w19(w1, b1, dw):
    """(C, HID), (HID,), (3, 3, HID) -> (9*(C+1), HID) stacked tap matrix."""
    C, HID = w1.shape
    dw9 = dw.reshape(9, HID)
    blocks = []
    for t in range(9):
        blocks.append(w1 * dw9[t][None, :])
        blocks.append((b1 * dw9[t])[None, :])
    return jnp.concatenate(blocks, axis=0)


@functools.partial(jax.jit, static_argnames=("H", "W", "eps", "interpret", "tile_h"))
def fused_ln_ffn_v2(x, H: int, W: int, gamma, beta, w1, b1, dw, bdw, w2, b2,
                    eps: float = 1e-6, interpret: bool = False,
                    tile_h: int = None):
    """Tap-matmul variant of `fused_ln_ffn` (same signature/semantics)."""
    B, N, C = x.shape
    assert N == H * W, (N, H, W)
    HID = w1.shape[1]
    if tile_h is not None:
        assert H % tile_h == 0
        th = tile_h
    else:
        th = None
        for cand in (16, 8, 4):
            # VMEM budget: Y9 tile (th, W, 9(C+1)) bf16 + f32 accumulator
            if H % cand == 0 and (
                cand * (W + 2) * 9 * (C + 1) * 2 + cand * W * HID * 4
            ) <= 24 * 2**20:
                th = cand
                break
    assert th is not None, f"H={H} not divisible by 4"
    x4 = x.reshape(B, H, W, C)
    grid = (B, H // th)
    n_tiles = H // th

    cur = lambda b, i: (b, i, 0, 0)
    prev = lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0)
    nxt = lambda b, i: (b, jnp.minimum(i + 1, n_tiles - 1), 0, 0)

    blk = pl.BlockSpec((1, th, W, C), cur, memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda b, i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    gamma2, beta2 = gamma.reshape(1, C), beta.reshape(1, C)
    bdw2, b2_2 = bdw.reshape(1, HID), b2.reshape(1, C)
    w19 = build_w19(w1, b1, dw).astype(x.dtype)
    out = pl.pallas_call(
        functools.partial(_kernel_v2, eps=float(eps), th=th, H=H),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, W, C), prev, memory_space=pltpu.VMEM),
            blk,
            pl.BlockSpec((1, th, W, C), nxt, memory_space=pltpu.VMEM),
            full(gamma2), full(beta2), full(w19), full(bdw2),
            full(w2), full(b2_2),
        ],
        out_specs=blk,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * (9 * (C + 1)) * HID + 2 * B * N * HID * C,
            bytes_accessed=2 * B * N * C * x.dtype.itemsize,
            transcendentals=B * N * HID,
        ),
        interpret=interpret,
    )(x4, x4, x4, gamma2, beta2, w19, bdw2, w2, b2_2)
    return out.reshape(B, N, C)


# ---------------------------------------------------------------------------
# v3: row-tap matmul kernel — the Mosaic-compatible restructure of v2
# ---------------------------------------------------------------------------
#
# v2 is blocked by a Mosaic compiler bug: lane-dim concatenation of
# sublane-SHIFTED slices (the dx shifts along W) crashes the remote
# compiler (PERF.md round-5 kernel analysis). v3 keeps v2's algebra but
# splits the 9 taps as 3 (row) x 3 (col):
#
#   dw3x3(h) = sum_dx shift_dx( Y3 @ W3_dx ),   h = fc1(LN(x)) masked
#
# where Y3 concatenates the 3 dy-shifted copies of [masked LN(x), mask]
# along lanes — dy shifts move the LEADING (untiled) dim only, so the
# concat is sublane-unshifted and compiles — and W3_dx stacks
# [W1 * dw(dy,dx); b1 * dw(dy,dx)] over dy into a (3*(C+1), HID) matrix.
# The dx shifts survive only as sublane-shifted slices feeding ADDS,
# exactly the pattern v1's tap loop already compiles. Net: the 9-tap VPU
# loop becomes 3 MXU matmuls at K = 3*(C+1) (= 195 at stage-1: ~2.3x
# v1's K=64 lane occupancy) + 2 vector adds.


def _kernel_v3(xp_ref, xc_ref, xn_ref, g_ref, b_ref, w3_ref, bdw_ref,
               w2_ref, b2_ref, o_ref, *, eps: float, th: int, H: int):
    i = pl.program_id(1)
    xc = xc_ref[0]  # (th, W, C)
    top = xp_ref[0, -1:]
    bot = xn_ref[0, :1]
    x = jnp.concatenate([top, xc, bot], axis=0)  # (R, W, C)
    R, W, C = x.shape

    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)

    # materialized (R, W, 1) mask — see the Mosaic-bug note in _kernel_v2
    g_row = jax.lax.broadcasted_iota(jnp.int32, (R, W, 1), 0) + i * th - 1
    rowok = jnp.logical_and(g_row >= 0, g_row < H).astype(jnp.float32)
    y1 = jnp.concatenate([y * rowok, rowok], axis=-1).astype(xc.dtype)  # (R, W, C+1)
    yp = jnp.pad(y1, ((0, 0), (1, 1), (0, 0)))  # (R, W+2, C+1)

    # dy-shifted slices move only the leading dim — lane concat compiles
    Y3 = jnp.concatenate([yp[dy:dy + th] for dy in range(3)], axis=-1)
    Y3 = Y3.reshape(th * (W + 2), 3 * (C + 1))

    HID = w2_ref.shape[0]
    acc = jnp.zeros((th, W, HID), jnp.float32)
    for dx in range(3):
        a = jax.lax.dot_general(
            Y3,
            w3_ref[dx],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(th, W + 2, HID)
        # sublane-shifted slice feeding an ADD — the v1-proven pattern
        acc = acc + a[:, dx:dx + W]
    z = _gelu_exact(acc + bdw_ref[0].astype(jnp.float32))
    out = jax.lax.dot_general(
        z.reshape(th * W, HID).astype(xc.dtype),
        w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0].astype(jnp.float32)
    o_ref[0] = (xc.astype(jnp.float32) + out.reshape(th, W, -1)).astype(o_ref.dtype)


def build_w3(w1, b1, dw):
    """(C, HID), (HID,), (3, 3, HID) -> (3, 3*(C+1), HID): per-dx stacked
    [W1 * dw(dy,dx); b1 * dw(dy,dx)] over dy."""
    C, HID = w1.shape
    cols = []
    for dx in range(3):
        blocks = []
        for dy in range(3):
            d = dw[dy, dx]
            blocks.append(w1 * d[None, :])
            blocks.append((b1 * d)[None, :])
        cols.append(jnp.concatenate(blocks, axis=0))
    return jnp.stack(cols, axis=0)


@functools.partial(jax.jit, static_argnames=("H", "W", "eps", "interpret", "tile_h"))
def fused_ln_ffn_v3(x, H: int, W: int, gamma, beta, w1, b1, dw, bdw, w2, b2,
                    eps: float = 1e-6, interpret: bool = False,
                    tile_h: int = None):
    """Row-tap-matmul variant of `fused_ln_ffn` (same signature/semantics)."""
    B, N, C = x.shape
    assert N == H * W, (N, H, W)
    HID = w1.shape[1]
    if tile_h is not None:
        assert H % tile_h == 0
        th = tile_h
    else:
        th = None
        for cand in (16, 8, 4):
            # VMEM: Y3 (th, W+2, 3(C+1)) bf16 + per-dx f32 matmul result +
            # f32 accumulator (th, W(+2), HID) x2
            if H % cand == 0 and (
                cand * (W + 2) * 3 * (C + 1) * 2
                + 2 * cand * (W + 2) * HID * 4
            ) <= 24 * 2**20:
                th = cand
                break
    assert th is not None, f"H={H} not divisible by 4"
    x4 = x.reshape(B, H, W, C)
    grid = (B, H // th)
    n_tiles = H // th

    cur = lambda b, i: (b, i, 0, 0)
    prev = lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0)
    nxt = lambda b, i: (b, jnp.minimum(i + 1, n_tiles - 1), 0, 0)

    blk = pl.BlockSpec((1, th, W, C), cur, memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda b, i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    gamma2, beta2 = gamma.reshape(1, C), beta.reshape(1, C)
    bdw2, b2_2 = bdw.reshape(1, HID), b2.reshape(1, C)
    w3 = build_w3(w1, b1, dw).astype(x.dtype)
    out = pl.pallas_call(
        functools.partial(_kernel_v3, eps=float(eps), th=th, H=H),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, W, C), prev, memory_space=pltpu.VMEM),
            blk,
            pl.BlockSpec((1, th, W, C), nxt, memory_space=pltpu.VMEM),
            full(gamma2), full(beta2), full(w3), full(bdw2),
            full(w2), full(b2_2),
        ],
        out_specs=blk,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * (9 * (C + 1)) * HID + 2 * B * N * HID * C,
            bytes_accessed=2 * B * N * C * x.dtype.itemsize,
            transcendentals=B * N * HID,
        ),
        interpret=interpret,
    )(x4, x4, x4, gamma2, beta2, w3, bdw2, w2, b2_2)
    return out.reshape(B, N, C)


# ---------------------------------------------------------------------------
# Differentiable wrapper: fused forward kernel + recompute backward
# ---------------------------------------------------------------------------

def _ref_ln_ffn(x, gamma, beta, w1, b1, dw, bdw, w2, b2, H, W, eps=1e-6):
    """Pure-jnp reference of the fused block (same math as the unfused
    MiTBlock FFN half: LN -> fc1 -> dw3x3 -> exact gelu -> fc2 -> +res),
    used to derive the backward pass by recomputation."""
    from upliftingtabletennis_tpu.ops.dwconv import depthwise_conv3x3

    B, N, C = x.shape
    hid = w1.shape[1]
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = jnp.square(xf - mean).mean(-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = (y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)).astype(x.dtype)
    y = y @ w1 + b1
    y = y.reshape(B, H, W, hid)
    y = depthwise_conv3x3(y, dw[:, :, None, :], bdw)
    y = y.reshape(B, N, hid)
    y = jax.nn.gelu(y, approximate=False)
    return x + (y @ w2 + b2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def fused_ln_ffn_trainable(H, W, interpret, x, gamma, beta, w1, b1, dw, bdw, w2, b2):
    """Differentiable fused LN+MixFFN block (VERDICT round-1 item 8).

    Forward runs the Pallas kernel (the (N, 4C) hidden tensor never touches
    HBM); backward RECOMPUTES through `_ref_ln_ffn` and applies its VJP —
    flash-attention-style rematerialization: ~one extra unfused forward of
    compute in exchange for never storing the hidden activations, putting
    detector TRAINING on the fused path (previously inference-only,
    models/segformer.py round-1 gating)."""
    return fused_ln_ffn(x, H, W, gamma, beta, w1, b1, dw, bdw, w2, b2,
                        interpret=interpret)


def _fused_ln_ffn_fwd(H, W, interpret, x, gamma, beta, w1, b1, dw, bdw, w2, b2):
    out = fused_ln_ffn(x, H, W, gamma, beta, w1, b1, dw, bdw, w2, b2,
                       interpret=interpret)
    return out, (x, gamma, beta, w1, b1, dw, bdw, w2, b2)


def _fused_ln_ffn_bwd(H, W, interpret, res, g):
    x, *params = res
    _, vjp = jax.vjp(
        lambda x_, *p: _ref_ln_ffn(x_, *p, H=H, W=W), x, *params
    )
    return vjp(g.astype(x.dtype))


fused_ln_ffn_trainable.defvjp(_fused_ln_ffn_fwd, _fused_ln_ffn_bwd)
