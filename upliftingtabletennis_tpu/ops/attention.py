"""Attention primitives: rotary-over-time embedding + additively-masked SDPA.

TPU-native rebuild of the reference attention path
(ref: uplifting/model.py:39-229). Differences by design:

* Shapes are fully batch-polymorphic: all ops accept arbitrary leading batch
  dims, so the "dynamic table-token stage" (attention over 14 tokens per
  timestep) runs as one einsum over a (B, T, ...) batch instead of the
  reference's reshape to (B*T, ...) (ref: model.py:360-384).
* Padding masks are finite additive biases (NEG_INF = -1e9) rather than
  -inf, matching the reference's accepted "-1e9, 0" mask format
  (ref: model.py:543) while avoiding NaNs from fully-masked softmax rows
  under XLA.
* Sequence lengths here are tiny (<= 50 ball tokens / 14 table tokens), so a
  fused XLA softmax-attention is already bandwidth-optimal; a Pallas flash
  kernel would only add launch overhead at these sizes. The hot path is the
  huge *batch* dimension, which XLA tiles onto the MXU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from upliftingtabletennis_tpu.core.geometry import MAX_FPS

NEG_INF = -1e9


def rope_angles(times: jnp.ndarray, head_dim: int) -> jnp.ndarray:
    """Rotation angles for rotary-over-time embedding.

    times: (..., N) timestamps in seconds. Positions are quantized to the
    MAX_FPS grid: pos = round(times * MAX_FPS) — the 'new' time_rotation of
    the reference (ref: model.py:71-72). Returns (..., N, head_dim//2).
    """
    inv_freq = 1.0 / (10000.0 ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    pos = jnp.round(times * MAX_FPS)
    return pos[..., None] * inv_freq


def apply_rope_over_time(
    x: jnp.ndarray, times: jnp.ndarray, time_rotation: str = "new"
) -> jnp.ndarray:
    """Apply rotary positional embedding over timestamps.

    x: (..., H, N, Dh) query or key tensor.
    times: (..., N) timestamps, broadcast over the head dim.
    time_rotation: 'new' = positions from timestamps (default),
                   'old' = integer sequence index positions
                   (ref: model.py:71-77).

    Pairs are interleaved exactly as the reference: channels (0,1), (2,3), ...
    rotate together (ref: model.py:89-100).
    """
    head_dim = x.shape[-1]
    if time_rotation == "new":
        t = times
    elif time_rotation == "old":
        n = x.shape[-2]
        idx = jnp.arange(n, dtype=x.dtype) / MAX_FPS  # pos = round(t*MAX_FPS) = arange(n)
        t = jnp.broadcast_to(idx, (*times.shape[:-1], n))
    else:
        raise ValueError(f"unknown time_rotation {time_rotation!r}")

    freqs = rope_angles(t, head_dim)  # (..., N, Dh/2)
    cos = jnp.cos(freqs)[..., None, :, :]  # broadcast over heads: (..., 1, N, Dh/2)
    sin = jnp.sin(freqs)[..., None, :, :]

    xr = x.reshape(*x.shape[:-1], head_dim // 2, 2)
    x_u, x_e = xr[..., 0], xr[..., 1]
    rot_u = x_u * cos - x_e * sin
    rot_e = x_u * sin + x_e * cos
    out = jnp.stack([rot_u, rot_e], axis=-1).reshape(x.shape)
    return out


def masked_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, mask_add: jnp.ndarray
) -> jnp.ndarray:
    """Scaled dot-product attention with a symmetric additive padding mask.

    q/k/v: (..., H, N, Dh). mask_add: (..., N) additive bias (0 for valid,
    NEG_INF for padding). The bias is applied on both the query and key axes
    — mask[..., None, :, None] + mask[..., None, None, :] — matching the
    reference (ref: model.py:218-224).
    """
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("...hqd,...hkd->...hqk", q, k) * scale
    bias = mask_add[..., None, :, None] + mask_add[..., None, None, :]
    logits = logits + bias
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("...hqk,...hkd->...hqd", weights, v)


def binarize_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """Convert a {0,1} validity mask to an additive {NEG_INF, 0} bias.

    Already-additive masks (min < -1e8) pass through unchanged
    (ref: model.py:540-546).
    """
    is_additive = jnp.min(mask) < -1e8
    return jnp.where(is_additive, mask, jnp.where(mask > 0.5, 0.0, NEG_INF))
