"""Pallas TPU depthwise 3x3 convolution (SegFormer MixFFN hot op).

XLA lowers `feature_group_count == channels` convolutions on TPU by
effectively treating each channel group separately: measured 5.1 ms for a
3.3 GFLOP depthwise conv at SegFormer stage-1 size (~40x off the HBM
roofline) and tens of seconds of compile time per block. The op is purely
memory-bound (18 FLOPs/element), so the right kernel reads each input tile
once into VMEM, applies all 9 taps there, and writes the output once.

Kernel layout: channels on the lane axis (tile 128), W on the sublane axis,
H tiled over the grid. The 1-element halo in H/W comes from padding the
input once in HBM and DMA-ing overlapping (TH+2, W+2, CT) slabs per program
(BlockSpec offsets are block-aligned, so the halo needs a manual
`make_async_copy` from an ANY-space input).

SAME padding, stride 1, NHWC, per-channel (3, 3) filters + bias — exactly
`flax.linen.Conv(features=C, kernel_size=(3, 3), feature_group_count=C)`
with kernel shape (3, 3, 1, C). Used by models/segformer.py MixFFN
(ref architecture: Xie et al. 2021, via the hub repo behind
balldetection/models/segformer_pp.py:12-19).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_h_tile(H: int, W2P: int, CT: int, itemsize: int, budget: int = 10 << 20) -> int:
    """Largest divisor of H fitting VMEM: 2 halo slabs + double-buffered out
    blocks + the f32 accumulator (and one mul temp) of the 9-tap compute."""
    for th in range(min(H, 128), 0, -1):
        vmem = (
            2 * (th + 2) * W2P * CT * itemsize  # double-buffered input slabs
            + 2 * th * _round_up(W2P, 128) * CT * itemsize  # out blocks
            + 2 * th * W2P * CT * 4  # f32 accumulator + mul temp
        )
        if H % th == 0 and vmem <= budget:
            return th
    return 1


def _dw_kernel(xp_ref, w_ref, b_ref, o_ref, scratch, sem, *, TH: int, W: int, CT: int):
    """Grid (B, nC, nH), H innermost. Double-buffered halo DMA: the slab for
    H-tile hi+1 is in flight while tile hi computes (guide: double buffering).
    Scratch/semaphores persist across sequential grid steps on the core.
    Full W span copied: Mosaic requires sublane-aligned DMA slices, so the
    input is pre-padded to an aligned width and only H/C are sliced."""
    b = pl.program_id(0)
    ci = pl.program_id(1)
    hi = pl.program_id(2)
    n_h = pl.num_programs(2)

    def slab_dma(slot, h):
        return pltpu.make_async_copy(
            xp_ref.at[b, pl.ds(h * TH, TH + 2), :, pl.ds(ci * CT, CT)],
            scratch.at[slot],
            sem.at[slot],
        )

    @pl.when(hi == 0)
    def _():  # warm-up for this (b, ci) pass
        slab_dma(0, 0).start()

    @pl.when(hi + 1 < n_h)
    def _():  # prefetch next H tile
        slab_dma((hi + 1) % 2, hi + 1).start()

    slab_dma(hi % 2, hi).wait()
    cur = scratch.at[hi % 2]
    w = w_ref[:, :, 0]  # (3, 3, CT)
    acc = jnp.broadcast_to(b_ref[0].astype(jnp.float32), (TH, W, CT))
    for i in range(3):
        for j in range(3):
            acc = acc + cur[i : i + TH, j : j + W, :].astype(jnp.float32) * w[
                i, j
            ].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _dw_pallas(x, w, bias, interpret=False):
    B, H, W, C = x.shape
    CT = min(C, 128)
    assert C % CT == 0, f"channels {C} not a multiple of the {CT} lane tile"
    sublane = 32 // x.dtype.itemsize  # 8 (f32) / 16 (bf16) / 32 (int8)
    W2P = _round_up(W + 2, sublane)  # aligned sublane width for the DMA slab
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, W2P - W - 1), (0, 0)))
    TH = _pick_h_tile(H, W2P, CT, x.dtype.itemsize)
    grid = (B, C // CT, H // TH)  # H innermost for the double-buffer pipeline
    return pl.pallas_call(
        functools.partial(_dw_kernel, TH=TH, W=W, CT=CT),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # halo slabs DMA'd manually
            pl.BlockSpec((3, 3, 1, CT), lambda b, c, h: (0, 0, 0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CT), lambda b, c, h: (0, c), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TH, W, CT), lambda b, c, h: (b, h, 0, c), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, TH + 2, W2P, CT), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=18 * B * H * W * C,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, w, bias.reshape(1, C))


def _dw_xla(x, w, bias):
    C = x.shape[-1]
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )
    return y + bias


@jax.custom_vjp
def depthwise_conv3x3(x, w, bias):
    """SAME depthwise 3x3 conv. x (B,H,W,C), w (3,3,1,C), bias (C,).

    Pallas kernel on TPU; XLA grouped conv elsewhere (CPU tests). Custom
    VJP (pallas_call defines no autodiff rule): for stride-1 SAME 3x3,
    dL/dx is the depthwise conv of the cotangent with the spatially
    flipped kernel, dL/dw is a 9-tap shifted correlation, dL/db a sum —
    all cheap XLA ops, so TPU training through the unfused MixFFN works.
    """
    if jax.default_backend() == "tpu" and x.shape[-1] % min(x.shape[-1], 128) == 0:
        return _dw_pallas(x, w, bias)
    return _dw_xla(x, w, bias)


def _dw_fwd(x, w, bias):
    return depthwise_conv3x3(x, w, bias), (x, w)


def _dw_bwd(res, g):
    x, w = res
    dx = _dw_xla(g, w[::-1, ::-1], jnp.zeros((x.shape[-1],), x.dtype))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    H, W = x.shape[1:3]
    dw = jnp.stack(
        [
            jnp.stack(
                [
                    jnp.sum(g * xp[:, dy : dy + H, dx_ : dx_ + W], axis=(0, 1, 2))
                    for dx_ in range(3)
                ]
            )
            for dy in range(3)
        ]
    )[:, :, None, :].astype(w.dtype)
    db = jnp.sum(g, axis=(0, 1, 2)).astype(x.dtype)
    return dx.astype(x.dtype), dw, db


depthwise_conv3x3.defvjp(_dw_fwd, _dw_bwd)
