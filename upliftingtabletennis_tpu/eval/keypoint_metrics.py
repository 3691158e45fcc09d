"""Generic keypoint accuracy metrics (mmpose family), vectorized.

Port of the vendored ViTPose metric functions
(ref: vit_pose/vit_utils/top_down_eval.py:29-315): masked normalized
distances with the -1 "invalid" sentinel, per-keypoint / averaged PCK,
PCK-curve AUC, NME, EPE, and heatmap-argmax prediction extraction (2D and
3D). The reference computes AUC as 20 serial PCK passes and PCK as a
Python loop over keypoints; here every function is a single broadcasted
jnp expression (the validity set is threshold-independent, so the AUC
thresholds batch into one axis). Semantics — including the quirks — match
exactly and are pinned by tests/test_keypoint_metrics.py:

* rows whose `normalize` has ANY zero component are wholly invalidated
  (ref :50-52), while nonpositive entries elsewhere are clamped to 1e6;
* `pose_pck_accuracy`'s default normalize is (H, W) per row — H scales x
  and W scales y (ref :190-191) — kept as-is;
* keypoints with no valid sample report accuracy -1 and are excluded from
  the average and the valid count (ref :62-79).

These operate on coordinate arrays (N, K, D) — tiny relative to the
heatmaps — so they run fine on host or fused into a jitted eval step.
"""
from __future__ import annotations

import jax.numpy as jnp


def _calc_distances(preds, targets, mask, normalize):
    """Masked normalized distances -> (K, N), -1 where invalid
    (ref: top_down_eval.py:29-58)."""
    preds, targets = jnp.asarray(preds), jnp.asarray(targets)
    mask = jnp.asarray(mask, bool)
    normalize = jnp.asarray(normalize, jnp.float32)
    row_bad = jnp.any(normalize == 0, axis=1)
    m = mask & ~row_bad[:, None]
    norm = jnp.where(normalize <= 0, 1e6, normalize)
    d = jnp.linalg.norm((preds - targets) / norm[:, None, :], axis=-1)
    return jnp.where(m, d, -1.0).T


def _distance_acc(distances, thr=0.5):
    """Fraction of valid distances below thr per row; -1 if none valid
    (ref: top_down_eval.py:61-79). distances (..., N) with -1 sentinel."""
    distances = jnp.asarray(distances)
    valid = distances != -1
    n = valid.sum(-1)
    hits = ((distances < thr) & valid).sum(-1)
    return jnp.where(n > 0, hits / jnp.maximum(n, 1), -1.0)


def get_max_preds(heatmaps):
    """Argmax keypoint predictions from (N, K, H, W) heatmaps
    (ref: top_down_eval.py:82-114). Returns (preds (N, K, 2) xy, maxvals
    (N, K, 1)); preds are -1 where the max activation is <= 0."""
    heatmaps = jnp.asarray(heatmaps)
    N, K, _, W = heatmaps.shape
    flat = heatmaps.reshape(N, K, -1)
    idx = jnp.argmax(flat, axis=2)
    maxvals = jnp.max(flat, axis=2)[..., None]
    preds = jnp.stack([(idx % W), (idx // W)], axis=-1).astype(jnp.float32)
    return jnp.where(maxvals > 0.0, preds, -1.0), maxvals


def get_max_preds_3d(heatmaps):
    """Argmax predictions from (N, K, D, H, W) volumes
    (ref: top_down_eval.py:117-147). Returns ((N, K, 3) xyz, (N, K, 1))."""
    heatmaps = jnp.asarray(heatmaps)
    N, K, D, H, W = heatmaps.shape
    flat = heatmaps.reshape(N, K, -1)
    idx = jnp.argmax(flat, axis=2)
    maxvals = jnp.max(flat, axis=2)[..., None]
    preds = jnp.stack(
        [idx % W, (idx // W) % H, idx // (H * W)], axis=-1
    ).astype(jnp.float32)
    return jnp.where(maxvals > 0.0, preds, -1.0), maxvals


def keypoint_pck_accuracy(pred, gt, mask, thr, normalize):
    """PCK per keypoint + average + valid-keypoint count
    (ref: top_down_eval.py:198-236)."""
    acc = _distance_acc(_calc_distances(pred, gt, mask, normalize), thr)
    valid = acc >= 0
    cnt = valid.sum()
    avg = jnp.where(cnt > 0, jnp.where(valid, acc, 0.0).sum() / jnp.maximum(cnt, 1), 0.0)
    return acc, avg, cnt


def pose_pck_accuracy(output, target, mask, thr=0.05, normalize=None):
    """PCK from heatmaps via argmax extraction (ref: top_down_eval.py:155-195).
    Default normalize is (H, W) per row, matching the reference's quirk."""
    N, K, H, W = output.shape
    if K == 0:
        return None, 0, 0
    if normalize is None:
        normalize = jnp.tile(jnp.asarray([[H, W]], jnp.float32), (N, 1))
    pred, _ = get_max_preds(output)
    gt, _ = get_max_preds(target)
    return keypoint_pck_accuracy(pred, gt, mask, thr, normalize)


def keypoint_auc(pred, gt, mask, normalize, num_step=20):
    """Area under the PCK curve over thresholds i/num_step
    (ref: top_down_eval.py:239-270). One broadcast instead of num_step
    serial PCK passes: the valid set does not depend on the threshold."""
    nor = jnp.full((jnp.asarray(pred).shape[0], 2), float(normalize), jnp.float32)
    d = _calc_distances(pred, gt, mask, nor)  # (K, N)
    thrs = jnp.arange(num_step, dtype=jnp.float32) / num_step  # (S,)
    acc = _distance_acc(d[None], thrs[:, None, None])  # (S, K)
    valid = acc >= 0
    cnt = valid.sum(axis=1)
    avg = jnp.where(cnt > 0, jnp.where(valid, acc, 0.0).sum(1) / jnp.maximum(cnt, 1), 0.0)
    return jnp.mean(avg)


def keypoint_nme(pred, gt, mask, normalize_factor):
    """Normalized mean error over valid joints (ref: top_down_eval.py:273-293)."""
    d = _calc_distances(pred, gt, mask, normalize_factor)
    valid = d != -1
    return jnp.where(valid, d, 0.0).sum() / jnp.maximum(valid.sum(), 1)


def keypoint_epe(pred, gt, mask):
    """Average end-point error in input units (ref: top_down_eval.py:296-315)."""
    pred = jnp.asarray(pred)
    ones = jnp.ones((pred.shape[0], pred.shape[2]), jnp.float32)
    d = _calc_distances(pred, gt, mask, ones)
    valid = d != -1
    return jnp.where(valid, d, 0.0).sum() / jnp.maximum(valid.sum(), 1)
