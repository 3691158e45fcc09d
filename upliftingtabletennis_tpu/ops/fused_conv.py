"""Fused conv + bias + relu (+ residual) Pallas kernels for packed HRNet.

The round-5 slab roofline (PERF.md) shows 152 ms/slab-8 of HBM-bound
bias+relu+copy passes around the packed HRNet convolutions: XLA on TPU
does not fuse elementwise epilogues into convolutions, so every conv
output round-trips HBM once extra (conv: read x, write y; epilogue:
read y, write y' — 4 full passes per conv where 2 suffice). These
kernels compute `act(conv(x) + b [+ residual])` in one pass: read x
(plus a 2-row halo ≈ (th+2)/th amplification), write the activated
output, nothing else.

The 3x3 kernel uses the row-tap matmul formulation (the dy taps are
stacked along lanes by concatenating the three leading-dim-shifted
copies of the halo'd input — K = 3*Ci; the dx taps live in the output
lane dim — N = 3*Co — and are combined by two sublane-shifted adds).
Every construct here was individually chip-validated against the remote
Mosaic compiler (see PERF.md "Mosaic bug bisect", 2026-08-21): ONE
stacked weight ref (multiple weight refs and 3D ref indexing crash),
iota row masks, leading-dim-shifted lane concats, sublane-shifted
slices feeding adds, and lane slices at 128-multiples.

Weights arrive DENSE (kh, kw, Ci, Co) — for packed HRNet the caller
passes the block-diagonal kernel, so Ci/Co here are the packed lane
widths. Parity vs XLA conv+epilogue is pinned by tests/test_fused_conv.py.

ref: the reference runs these convs through cuDNN with its own fused
epilogues (torch Conv2d+BN+ReLU, wasb.py:255-507); this is the TPU
equivalent of that fusion.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3x3_bias_act", "conv1x1_bias_act", "fusable_3x3", "fusable_1x1"]

_VMEM_BUDGET = 40 * 2**20


def _pick_th(H, W, Ci, Co, halo):
    """Largest row tile whose VMEM working set fits the budget."""
    for th in (32, 16, 8, 4, 2):
        if H % th:
            continue
        y3 = th * (W + 2) * 3 * Ci * 2 if halo else 0
        acc = th * (W + 2) * 3 * Co * 4 if halo else th * W * Co * 4
        io = (th + 2) * W * Ci * 2 + th * W * Co * 2
        if y3 + acc + io <= _VMEM_BUDGET:
            return th
    return None


def fusable_3x3(H, W, Ci, Co, stride):
    return (stride == 1 and Co % 128 == 0
            and _pick_th(H, W, Ci, Co, halo=True) is not None)


def fusable_1x1(H, W, Ci, Co, stride):
    return stride == 1 and _pick_th(H, W, Ci, Co, halo=False) is not None


def _act(y, relu):
    return jnp.maximum(y, 0.0) if relu else y


def _k3(xp_ref, xc_ref, xn_ref, w_ref, b_ref, *rest, relu, th, H, Co, has_res):
    if has_res:
        r_ref, o_ref = rest
    else:
        (o_ref,) = rest
    i = pl.program_id(1)
    xc = xc_ref[0]  # (th, W, Ci)
    xh = jnp.concatenate([xp_ref[0], xc, xn_ref[0]], axis=0)  # (th+2, W, Ci)
    R, W, Ci = xh.shape
    # rows outside the image contribute zero (conv SAME zero padding);
    # the 1-row halo blocks are index-clamped so boundary tiles read a
    # duplicated row that must be masked out
    g_row = jax.lax.broadcasted_iota(jnp.int32, (R, W, 1), 0) + i * th - 1
    rowok = jnp.logical_and(g_row >= 0, g_row < H)
    xh = jnp.where(rowok, xh.astype(jnp.float32), 0.0).astype(xc.dtype)
    xp = jnp.pad(xh, ((0, 0), (1, 1), (0, 0)))  # W-direction zero pad
    # dy taps -> lanes (leading-dim shifts only: Mosaic-safe concat)
    y3 = jnp.concatenate([xp[dy:dy + th] for dy in range(3)], axis=-1)
    a = jax.lax.dot_general(y3, w_ref[...], (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (th, W+2, 3Co)
    acc = (a[:, 0:W, 0:Co] + a[:, 1:W + 1, Co:2 * Co]
           + a[:, 2:W + 2, 2 * Co:3 * Co])
    acc = acc + b_ref[0]
    if has_res:
        acc = acc + r_ref[0].astype(jnp.float32)
    o_ref[0] = _act(acc, relu).astype(o_ref.dtype)


def _k1(xc_ref, w_ref, b_ref, *rest, relu, has_res):
    if has_res:
        r_ref, o_ref = rest
    else:
        (o_ref,) = rest
    xc = xc_ref[0]
    a = jax.lax.dot_general(xc, w_ref[...], (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    a = a + b_ref[0]
    if has_res:
        a = a + r_ref[0].astype(jnp.float32)
    o_ref[0] = _act(a, relu).astype(o_ref.dtype)


def _stack_w3(w):
    """(3, 3, Ci, Co) -> (3*Ci, 3*Co): K stacks dy, N stacks dx."""
    return jnp.concatenate(
        [jnp.concatenate([w[dy, dx] for dy in range(3)], axis=0)
         for dx in range(3)], axis=1)


@functools.partial(jax.jit, static_argnames=("relu", "interpret"))
def conv3x3_bias_act(x, w, b, residual=None, *, relu=True, interpret=False):
    """act(conv3x3_same(x, w) + b [+ residual]) in one HBM pass.

    x (B, H, W, Ci); w (3, 3, Ci, Co) dense; b (Co,) or None;
    residual (B, H, W, Co) or None.
    """
    B, H, W, Ci = x.shape
    Co = w.shape[-1]
    th = _pick_th(H, W, Ci, Co, halo=True)
    assert th is not None, (H, W, Ci, Co)
    w3 = _stack_w3(w).astype(x.dtype)
    b2 = (jnp.zeros((Co,), jnp.float32) if b is None else b).astype(
        jnp.float32).reshape(1, Co)
    blk = pl.BlockSpec((1, th, W, Ci), lambda bb, i: (bb, i, 0, 0),
                       memory_space=pltpu.VMEM)
    prow = pl.BlockSpec((1, 1, W, Ci),
                        lambda bb, i: (bb, jnp.maximum(i * th - 1, 0), 0, 0),
                        memory_space=pltpu.VMEM)
    nrow = pl.BlockSpec((1, 1, W, Ci),
                        lambda bb, i: (bb, jnp.minimum(i * th + th, H - 1), 0, 0),
                        memory_space=pltpu.VMEM)
    ob = pl.BlockSpec((1, th, W, Co), lambda bb, i: (bb, i, 0, 0),
                      memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda bb, i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    ins = [prow, blk, nrow, full(w3), full(b2)]
    args = [x, x, x, w3, b2]
    if residual is not None:
        ins.append(ob)
        args.append(residual)
    return pl.pallas_call(
        functools.partial(_k3, relu=relu, th=th, H=H, Co=Co,
                          has_res=residual is not None),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Co), x.dtype),
        grid=(B, H // th),
        in_specs=ins,
        out_specs=ob,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * 9 * Ci * Co,
            bytes_accessed=B * H * W * (Ci + Co) * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=("relu", "interpret"))
def conv1x1_bias_act(x, w, b, residual=None, *, relu=True, interpret=False):
    """act(x @ w + b [+ residual]) — 1x1 conv with fused epilogue.

    x (B, H, W, Ci); w (Ci, Co); b (Co,) or None.
    """
    B, H, W, Ci = x.shape
    Co = w.shape[-1]
    th = _pick_th(H, W, Ci, Co, halo=False)
    assert th is not None, (H, W, Ci, Co)
    b2 = (jnp.zeros((Co,), jnp.float32) if b is None else b).astype(
        jnp.float32).reshape(1, Co)
    blk = pl.BlockSpec((1, th, W, Ci), lambda bb, i: (bb, i, 0, 0),
                       memory_space=pltpu.VMEM)
    ob = pl.BlockSpec((1, th, W, Co), lambda bb, i: (bb, i, 0, 0),
                      memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda bb, i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    ins = [blk, full(w), full(b2)]
    args = [x, w.astype(x.dtype), b2]
    if residual is not None:
        ins.append(ob)
        args.append(residual)
    return pl.pallas_call(
        functools.partial(_k1, relu=relu, has_res=residual is not None),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Co), x.dtype),
        grid=(B, H // th),
        in_specs=ins,
        out_specs=ob,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * Ci * Co,
            bytes_accessed=B * H * W * (Ci + Co) * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(*args)
