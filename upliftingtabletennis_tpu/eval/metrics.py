"""Detection metrics, losses and target rendering (reference-parity).

Rebuilds the metric/loss layer of the detection packages
(ref: balldetection/helper_balldetection.py:205-501,
tabledetection/helper_tabledetection.py:279-428) as JAX functions:

* ball PCK@k px measured against the motion-blur STREAK — min distance to
  the segments (min, center) and (center, max) (ref: ball helper :205-238);
* table PCK@k px over visible-AND-valid keypoints (ref: table helper
  :279-322);
* average pixel distance with sentinel-invalid filtering (ref: :241-274);
* visible/invisible classification accuracy (ref: :317-332);
* the weighted MSE heatmap loss (weight 100 where target > 0.1, mean over
  all elements, ref: :479-501);
* Gaussian heatmap target rendering at evaluation resolution, computed on
  device — the reference renders 1920x1080 float targets per sample in CPU
  dataloader workers (ref: balldetection/dataset.py:434-440), which is the
  memory-hungriest part of its input pipeline.

Visibility flags: 1 = visible, 0 = invisible (ref: ball helper :15-17).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BALL_VISIBLE = 1
BALL_INVISIBLE = 0


def point_segment_distance(p, e1, e2):
    """Distance from points (..., 2) to segments (e1, e2) (ref: :335-399)."""
    seg = e2 - e1
    L2 = jnp.sum(seg**2, axis=-1)
    t = jnp.where(L2 > 1e-12, jnp.sum((p - e1) * seg, axis=-1) / jnp.maximum(L2, 1e-12), 0.0)
    t = jnp.clip(t, 0.0, 1.0)
    closest = e1 + t[..., None] * seg
    return jnp.linalg.norm(p - closest, axis=-1)


def distance_to_streak(pred, gt_min, gt_center, gt_max):
    """Min distance to the two blur-streak segments (ref: :402-458)."""
    d1 = point_segment_distance(pred, gt_min, gt_center)
    d2 = point_segment_distance(pred, gt_center, gt_max)
    return jnp.minimum(d1, d2)


def pck_ball(preds, gts, gts_min, gts_max, tolerance):
    """Ball PCK@tolerance px vs the blur streak (ref: :205-238).

    preds (N, 3) with visibility; gts/gts_min/gts_max (N, >=2).
    Returns -1 if no valid detection (reference convention).
    """
    valid = preds[..., 2] == BALL_VISIBLE
    d = distance_to_streak(preds[..., :2], gts_min[..., :2], gts[..., :2], gts_max[..., :2])
    correct = (d <= tolerance) & valid
    n_valid = jnp.sum(valid)
    return jnp.where(n_valid > 0, jnp.sum(correct) / jnp.maximum(n_valid, 1), -1.0)


def pck_keypoints(preds, gts, tolerance):
    """Table PCK over visible-AND-valid keypoints (ref table helper :279-322).

    preds/gts (N, C, 3) with visibility channel.
    """
    valid = preds[..., 2] == BALL_VISIBLE
    visible = gts[..., 2] == BALL_VISIBLE
    d = jnp.linalg.norm(preds[..., :2] - gts[..., :2], axis=-1)
    m = valid & visible
    correct = (d <= tolerance) & m
    n = jnp.sum(m)
    return jnp.where(n > 0, jnp.sum(correct) / jnp.maximum(n, 1), -1.0)


def average_distance(preds, gts):
    """Mean pixel distance over valid (> -100 sentinel) detections
    (ref: :241-274). Returns 10000 if nothing valid."""
    valid = (preds[..., 0] > -100) & (preds[..., 1] > -100)
    d = jnp.linalg.norm(preds[..., :2] - gts[..., :2], axis=-1)
    n = jnp.sum(valid)
    return jnp.where(n > 0, jnp.sum(d * valid) / jnp.maximum(n, 1), 10000.0)


def average_distance_to_streak(preds, gt_min, gt, gt_max):
    """Mean streak distance over valid detections (ref: :402-458)."""
    valid = (preds[..., 0] > -100) & (preds[..., 1] > -100)
    d = distance_to_streak(preds[..., :2], gt_min[..., :2], gt[..., :2], gt_max[..., :2])
    n = jnp.sum(valid)
    return jnp.where(n > 0, jnp.sum(d * valid) / jnp.maximum(n, 1), 10000.0)


def acc_visible_invisible(cls_logits, label_vis):
    """Visible/invisible accuracy from 2-logit heads (ref: :317-332)."""
    gt_vis = label_vis == BALL_VISIBLE
    gt_invis = label_vis == BALL_INVISIBLE
    pred_vis = cls_logits[:, 0] <= cls_logits[:, 1]
    acc_vis = jnp.sum(pred_vis & gt_vis) / jnp.maximum(jnp.sum(gt_vis), 1)
    n_invis = jnp.sum(gt_invis)
    acc_invis = jnp.where(
        n_invis > 0, jnp.sum(~pred_vis & gt_invis) / jnp.maximum(n_invis, 1), 0.0
    )
    return acc_vis, acc_invis


def weighted_mse_loss(pred, target):
    """Heatmap loss: weight 100 where target > 0.1, mean over all elements
    (ref: ball helper :479-501, table helper :402-428)."""
    w = jnp.where(target > 0.1, 100.0, 1.0)
    return jnp.mean(w * (pred - target) ** 2)


@partial(jax.jit, static_argnames=("height", "width"))
def render_gaussian_heatmaps(coords, visibility, height: int, width: int, sigma: float = 6.0):
    """Render Gaussian target heatmaps on device.

    coords (..., 2) pixel positions at the target resolution; visibility
    (...,) — invisible points render as all-zero maps
    (ref: balldetection/dataset.py:416-419, 434-440).
    Returns (..., height, width) float32.
    """
    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    dy2 = (ys[None, :] - coords[..., 1].reshape(-1)[:, None]) ** 2  # (N, H)
    dx2 = (xs[None, :] - coords[..., 0].reshape(-1)[:, None]) ** 2  # (N, W)
    hm = jnp.exp(-(dy2[:, :, None] + dx2[:, None, :]) / (2.0 * sigma**2))
    vis = visibility.reshape(-1)[:, None, None]
    hm = hm * (vis > 0)
    return hm.reshape(*coords.shape[:-1], height, width)
