"""Rational-ratio bilinear downscale as per-group small matmuls.

`jax.image.resize(..., "bilinear", antialias=False)` lowers on TPU to a
DENSE (H_in x H_out) interpolation matmul per axis — 1.5 TFLOP and ~42 ms
per chunk-8 slab at the pipeline's working resolutions (round-4 trace,
`artifacts/profile/trace`), for what is mathematically a 2-tap lerp per
output pixel.

This module exploits that every resize in the pipeline is integer-sized:
with g = gcd(n_in, n_out), the half-pixel source mapping
`src = (j + 0.5) * n_in / n_out - 0.5` tiles into g independent groups of
q = n_in/g input pixels -> p = n_out/g output pixels, each applying the
SAME (p, q) 2-tap weight matrix. For a pure downscale (p < q) both taps
provably stay inside the group (src in (0, q-1)), so the axis pass is one
einsum against a tiny constant matrix — ~8x fewer FLOPs than the dense
lowering at 1080->896 and fusable by XLA.

Numerics match `jax.image.resize` to f32-accumulated bf16 matmul noise
(inputs are u8-valued video frames, exactly representable in bf16;
parity pinned by tests/test_resize.py). Upscales and degenerate ratios
fall back to `jax.image.resize`.

Semantics reference: the reference's cv2.INTER_LINEAR resize with
half-pixel centers (ref: balldetection/transforms.py:44-48).
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resize_bilinear_down", "can_fast_resize"]


def _axis_weights(n_in: int, n_out: int) -> np.ndarray:
    """(p, q) 2-tap bilinear matrix for one group of a n_in -> n_out
    downscale; returns None if the fast path does not apply."""
    if n_out >= n_in:
        return None
    g = math.gcd(n_in, n_out)
    q, p = n_in // g, n_out // g
    j = np.arange(p)
    src = (j + 0.5) * q / p - 0.5
    lo = np.floor(src).astype(np.int64)
    frac = (src - lo).astype(np.float32)
    # downscale invariant: 0 < src < q-1, so lo in [0, q-2] and both taps
    # are inside the group (see module docstring)
    if lo.min() < 0 or (lo + 1).max() > q - 1:
        return None
    A = np.zeros((p, q), np.float32)
    A[j, lo] = 1.0 - frac
    A[j, lo + 1] += frac
    return A


def can_fast_resize(in_hw, out_hw) -> bool:
    """True iff both axes are pure downscales handled by the fast path."""
    (ih, iw), (oh, ow) = in_hw, out_hw
    return (
        _axis_weights(ih, oh) is not None and _axis_weights(iw, ow) is not None
    )


@partial(jax.jit, static_argnames=("out_h", "out_w", "exact"))
def resize_bilinear_down(x, out_h: int, out_w: int, exact: bool = False):
    """Bilinear half-pixel downscale of NHWC `x` to (out_h, out_w), f32 out.

    Accepts uint8/bf16/f32 input; compute is bf16 with f32 accumulation
    (u8 values are exact in bf16; worst-case output error ~1.3/255 from
    bf16 weight rounding — the SAME rounding the TPU applies to the
    jax.image.resize dense matmul at default precision). `exact=True`
    computes in f32/HIGHEST for CPU-reference parity (tests). Falls back
    to `jax.image.resize` when an axis is not a strict downscale.
    """
    B, H, W, C = x.shape
    Ah = _axis_weights(H, out_h)
    Aw = _axis_weights(W, out_w)
    if (Ah is None and H != out_h) or (Aw is None and W != out_w):
        y = jax.image.resize(
            x.astype(jnp.float32), (B, out_h, out_w, C), "bilinear", antialias=False
        )
        return y
    dtype = jnp.float32 if exact else jnp.bfloat16
    prec = jax.lax.Precision.HIGHEST if exact else None
    y = x.astype(dtype)
    if Ah is not None:
        gh = H // Ah.shape[1]
        y = y.reshape(B, gh, Ah.shape[1], W, C)
        y = jnp.einsum(
            "pq,bgqwc->bgpwc",
            jnp.asarray(Ah, dtype),
            y,
            preferred_element_type=jnp.float32,
            precision=prec,
        ).astype(dtype)
        y = y.reshape(B, out_h, W, C)
    if Aw is not None:
        gw = W // Aw.shape[1]
        y = y.reshape(B, out_h, gw, Aw.shape[1], C)
        y = jnp.einsum(
            "pq,bhgqc->bhgpc",
            jnp.asarray(Aw, dtype),
            y,
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        y = y.reshape(B, out_h, out_w, C)
    return y.astype(jnp.float32)
