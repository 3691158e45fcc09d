"""Subpixel heatmap peak extraction: argmax + vmapped 3x3 Gaussian fit.

Rebuilds the reference's scipy hot loop (ref:
balldetection/helper_balldetection.py:29-110 and the per-channel variant
tabledetection/helper_tabledetection.py:50-156): for each heatmap, take the
argmax, cut a zero-padded 3x3 window, and fit a 4-parameter Gaussian
(x0, y0, sigma_x, sigma_y; amplitude fixed at 1) by minimizing the MSE to
the window values. The reference runs one scipy L-BFGS-B per heatmap on the
host (13 fits/frame for the table detector); here the same objective is
minimized by a fixed-iteration projected Levenberg-Marquardt fit, batched
over all heatmaps and channels on device — no host round-trip.

Positions are returned in image coordinates with the reference's pixel-
center scaling (x + 0.5) * scale - 0.5 (ref: :101-108), plus visibility
from max-activation thresholding (ball: threshold -inf i.e. always visible,
ref: :13; table: 0.1, ref tabledetection: :15).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

WINDOW = 3
PAD = WINDOW // 2
FIT_ITERS = 20


def _gauss(params, gx, gy):
    x0, y0, sx, sy = params[0], params[1], params[2], params[3]
    return jnp.exp(-((gx - x0) ** 2 / (2 * sx**2) + (gy - y0) ** 2 / (2 * sy**2)))


_LO = jnp.asarray([0.0, 0.0, 0.5, 0.5])
_HI = jnp.asarray([float(WINDOW), float(WINDOW), 50.0, 50.0])


def _fit_window(window):
    """Fit the 4-param Gaussian to one 3x3 window -> (x_off, y_off, ok)."""
    gy, gx = jnp.mgrid[0:WINDOW, 0:WINDOW]
    gx = gx.astype(jnp.float32).ravel()
    gy = gy.astype(jnp.float32).ravel()
    w = window.astype(jnp.float32).ravel()

    def residuals(p):
        return _gauss(p, gx, gy) - w

    p0 = jnp.asarray([WINDOW // 2, WINDOW // 2, 1.0, 1.0], jnp.float32)

    def step(carry, _):
        p, lam = carry
        r = residuals(p)
        J = jax.jacfwd(residuals)(p)  # (9, 4)
        A = J.T @ J + lam * jnp.eye(4)
        g = J.T @ r
        p_new = jnp.clip(p - jnp.linalg.solve(A, g), _LO, _HI)
        better = jnp.mean(residuals(p_new) ** 2) < jnp.mean(r**2)
        p = jnp.where(better, p_new, p)
        lam = jnp.clip(jnp.where(better, lam * 0.5, lam * 4.0), 1e-6, 1e6)
        return (p, lam), None

    (p, _), _ = jax.lax.scan(step, (p0, jnp.float32(1e-2)), None, length=FIT_ITERS)
    ok = jnp.mean(residuals(p) ** 2) < jnp.mean(residuals(p0) ** 2) + 1e-9
    # fallback to the window center (= argmax pixel) if the fit went nowhere
    x_off = jnp.where(ok, p[0], float(PAD))
    y_off = jnp.where(ok, p[1], float(PAD))
    return x_off, y_off


@partial(jax.jit, static_argnames=("image_width", "image_height", "threshold"))
def extract_peaks(heatmaps, image_width: int, image_height: int, threshold: float = -jnp.inf):
    """Extract subpixel peak positions from heatmaps (..., H, W).

    Returns (..., 3): x, y in image coordinates (pixel-center-aware scaling
    to image_width x image_height) and visibility (activation > threshold).
    Arbitrary leading batch/channel dims; everything stays on device.
    """
    *batch, H, W = heatmaps.shape
    flat = heatmaps.reshape(-1, H, W)
    B = flat.shape[0]

    idx = jnp.argmax(flat.reshape(B, -1), axis=1)
    y_max = idx // W
    x_max = idx % W
    activation = jnp.take_along_axis(flat.reshape(B, -1), idx[:, None], axis=1)[:, 0]

    padded = jnp.pad(flat, ((0, 0), (PAD, PAD), (PAD, PAD)))
    windows = jax.vmap(
        lambda hm, y, x: jax.lax.dynamic_slice(hm, (y, x), (WINDOW, WINDOW))
    )(padded, y_max, x_max)

    x_off, y_off = jax.vmap(_fit_window)(windows)
    x_sub = x_max.astype(jnp.float32) - PAD + x_off
    y_sub = y_max.astype(jnp.float32) - PAD + y_off

    sx = image_width / W
    sy = image_height / H
    x_img = (x_sub + 0.5) * sx - 0.5
    y_img = (y_sub + 0.5) * sy - 0.5
    vis = (activation > threshold).astype(jnp.float32)

    out = jnp.stack([x_img, y_img, vis], axis=-1)
    return out.reshape(*batch, 3)
