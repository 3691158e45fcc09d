"""Keypoints-from-heatmaps decoding with DARK Taylor refinement, jittable.

Port of the vendored mmpose post-processing used by ViTPose
(ref: vit_pose/vit_utils/top_down_eval.py:317-643 `keypoints_from_heatmaps`
with post_process='default'/'unbiased'): per-channel argmax + either the
quarter-offset-toward-gradient shift ('default') or the DARK method
(modulate with a Gaussian blur, log, second-order Taylor expansion around
the peak — 'unbiased', Zhang et al. 2020).

Everything is batched device code (vmap over B x K channels); the reference
loops channels in numpy on the host. The pipeline's own detector path uses
ops/peak.py (the reference's Gaussian-window fit); this module provides the
mmpose-compatible decode for ported ViTPose workflows.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _argmax_2d(hm):
    """(H, W) -> (x, y, maxval)."""
    H, W = hm.shape
    idx = jnp.argmax(hm)
    return idx % W, idx // W, hm.reshape(-1)[idx]


def _gaussian_blur(hm, kernel: int):
    """Depthwise Gaussian blur preserving the peak magnitude
    (ref: top_down_eval gaussian_blur: border-padded, renormalized to keep
    the original max)."""
    sigma = 0.3 * ((kernel - 1) * 0.5 - 1) + 0.8
    r = kernel // 2
    x = jnp.arange(-r, r + 1, dtype=hm.dtype)
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / jnp.sum(g)
    orig_max = jnp.max(hm)
    padded = jnp.pad(hm, r, mode="constant")
    # separable convolution via correlation
    out = jax.vmap(lambda row: jnp.correlate(row, g, mode="valid"))(padded)
    out = jax.vmap(lambda col: jnp.correlate(col, g, mode="valid"), in_axes=1, out_axes=1)(out)
    new_max = jnp.maximum(jnp.max(out), 1e-10)
    return out * (orig_max / new_max)


def _dark_refine(hm, x, y):
    """DARK: log-heatmap second-order Taylor offset at integer peak (x, y)."""
    H, W = hm.shape
    hm = jnp.maximum(hm, 1e-10)
    lhm = jnp.log(hm)

    def val(yy, xx):
        yy = jnp.clip(yy, 0, H - 1)
        xx = jnp.clip(xx, 0, W - 1)
        return lhm[yy, xx]

    dx = 0.5 * (val(y, x + 1) - val(y, x - 1))
    dy = 0.5 * (val(y + 1, x) - val(y - 1, x))
    dxx = 0.25 * (val(y, x + 2) - 2 * val(y, x) + val(y, x - 2))
    dyy = 0.25 * (val(y + 2, x) - 2 * val(y, x) + val(y - 2, x))
    dxy = 0.25 * (val(y + 1, x + 1) - val(y - 1, x + 1) - val(y + 1, x - 1) + val(y - 1, x - 1))

    det = dxx * dyy - dxy * dxy
    inside = (x > 1) & (x < W - 2) & (y > 1) & (y < H - 2) & (jnp.abs(det) > 1e-12)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    # -H^-1 @ grad
    ox = -(dyy * dx - dxy * dy) * inv_det
    oy = -(-dxy * dx + dxx * dy) * inv_det
    ox = jnp.where(inside, jnp.clip(ox, -1.0, 1.0), 0.0)
    oy = jnp.where(inside, jnp.clip(oy, -1.0, 1.0), 0.0)
    return x + ox, y + oy


def _default_refine(hm, x, y):
    """Quarter-pixel shift toward the larger neighbor (ref 'default')."""
    H, W = hm.shape

    def val(yy, xx):
        yy = jnp.clip(yy, 0, H - 1)
        xx = jnp.clip(xx, 0, W - 1)
        return hm[yy, xx]

    sx = jnp.sign(val(y, x + 1) - val(y, x - 1))
    sy = jnp.sign(val(y + 1, x) - val(y - 1, x))
    inside = (x > 0) & (x < W - 1) & (y > 0) & (y < H - 1)
    fx = x + jnp.where(inside, 0.25 * sx, 0.0)
    fy = y + jnp.where(inside, 0.25 * sy, 0.0)
    return fx, fy


@partial(jax.jit, static_argnames=("post_process", "kernel"))
def keypoints_from_heatmaps(heatmaps, post_process: str = "default", kernel: int = 11):
    """Decode (B, K, H, W) heatmaps -> (coords (B, K, 2), maxvals (B, K, 1)).

    post_process: 'default' (quarter shift) or 'unbiased' (DARK).
    Coordinates are in heatmap pixels (callers apply their own affine back-
    projection, ref: top_down_eval transform_preds).
    """
    B, K, H, W = heatmaps.shape
    flat = heatmaps.reshape(B * K, H, W)

    def decode_one(hm):
        x, y, mv = _argmax_2d(hm)
        if post_process == "unbiased":
            hm2 = _gaussian_blur(hm, kernel)
            fx, fy = _dark_refine(hm2, x, y)
        else:
            fx, fy = _default_refine(hm, x, y)
        valid = mv > 0
        fx = jnp.where(valid, fx, -1.0)
        fy = jnp.where(valid, fy, -1.0)
        return jnp.stack([fx, fy]).astype(jnp.float32), mv

    coords, maxvals = jax.vmap(decode_one)(flat)
    return coords.reshape(B, K, 2), maxvals.reshape(B, K, 1)


# ---------------------------------------------------------------------------
# Flip-test inference (ref: topdown_heatmap_simple_head.py:188-218 +
# post_processing/post_transforms.py flip_back)
# ---------------------------------------------------------------------------

def flip_back(heatmaps, flip_pairs=(), shift: bool = True):
    """Un-flip heatmaps predicted on horizontally flipped inputs.

    heatmaps: (B, h, w, C) NHWC predictions for the FLIPPED images.
    flip_pairs: sequence of (a, b) channel index pairs that swap identity
    under mirroring (left ear <-> right ear); empty for symmetric targets
    like the single ball channel.
    shift: translate the un-flipped maps right by one pixel — the reference's
    'shift_heatmap' alignment fix (ref: topdown_heatmap_simple_head.py:213-214).
    """
    out = heatmaps[:, :, ::-1, :]
    if flip_pairs:
        C = out.shape[-1]
        idx = list(range(C))
        for a, b in flip_pairs:
            idx[a], idx[b] = idx[b], idx[a]
        out = out[..., jnp.asarray(idx)]
    if shift:
        out = jnp.concatenate([out[:, :, :1, :], out[:, :, :-1, :]], axis=2)
    return out


def flip_test_heatmaps(apply_fn, images, flip_pairs=(), shift: bool = True):
    """Average the forward pass with a horizontally-flipped pass.

    apply_fn: images (B, H, W, C_in) NHWC -> heatmaps (B, h, w, C_out).
    Mirrors the reference's optional test-time flip augmentation
    (ref: topdown_heatmap_simple_head.py:194-218).
    """
    heat = apply_fn(images)
    heat_f = apply_fn(images[:, :, ::-1, :])
    return 0.5 * (heat + flip_back(heat_f, flip_pairs, shift))
