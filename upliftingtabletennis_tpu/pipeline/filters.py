"""Dual-model trajectory filters + uplifting input glue.

Host-side (numpy/sklearn) filtering of per-frame detections — the data is
tiny (<= hundreds of points per rally), so the reference's behavior is kept
exactly (ref: inference/utils.py:70-232, 268-309):

* ball: keep frame iff both models report visible AND the two predictions
  agree within 20 px; emit (positions, valid indices, times = t / fps).
* table: per keypoint, collect frames where both models visible and agree
  within 10 px; >= 3 survivors -> DBSCAN(eps=10, min_samples=3), centroid
  of the largest cluster; noise-only -> mean fallback; else invisible.
"""
from __future__ import annotations

from collections import Counter
from typing import Optional, Tuple

import numpy as np

BALL_AGREEMENT_PX = 20.0
TABLE_AGREEMENT_PX = 10.0
VISIBLE = 1
INVISIBLE = 0
SEQUENCE_LEN = 50


def filter_trajectory_ball(pred1: np.ndarray, pred2: np.ndarray, fps: float):
    """(T, 3) x2 -> (positions (T', 2), valid_indices (T',), times (T',))
    (ref: inference/utils.py:70-102)."""
    diff = np.linalg.norm(pred1[:, :2] - pred2[:, :2], axis=1)
    ok = (diff <= BALL_AGREEMENT_PX) & (pred1[:, 2] == VISIBLE) & (pred2[:, 2] == VISIBLE)
    idx = np.nonzero(ok)[0]
    return pred1[idx, :2].astype(np.float64), idx, idx / float(fps)


def _dbscan_largest_cluster(points: np.ndarray, eps=10.0, min_samples=3) -> Optional[np.ndarray]:
    """Centroid of the largest DBSCAN cluster with the reference's fallbacks
    (ref: utils.py:184-232)."""
    if points.shape[0] == 0:
        return None
    if points.shape[0] < min_samples:
        return np.mean(points, axis=0)
    try:
        from sklearn.cluster import DBSCAN

        labels = DBSCAN(eps=eps, min_samples=min_samples).fit(points).labels_
    except Exception:  # sklearn-free fallback: grid density vote
        labels = _density_labels(points, eps, min_samples)
    valid = labels[labels != -1]
    if valid.size == 0:
        return np.mean(points, axis=0)
    biggest = Counter(valid.tolist()).most_common(1)[0][0]
    return np.mean(points[labels == biggest], axis=0)


def _density_labels(points, eps, min_samples):
    """Minimal DBSCAN replacement (pairwise-distance core-point expansion)."""
    n = len(points)
    d = np.linalg.norm(points[:, None] - points[None, :], axis=-1)
    neighbors = d <= eps
    core = neighbors.sum(1) >= min_samples
    labels = -np.ones(n, int)
    cur = 0
    for i in range(n):
        if labels[i] != -1 or not core[i]:
            continue
        stack = [i]
        labels[i] = cur
        while stack:
            j = stack.pop()
            for k in np.nonzero(neighbors[j])[0]:
                if labels[k] == -1:
                    labels[k] = cur
                    if core[k]:
                        stack.append(k)
        cur += 1
    return labels


def filter_trajectory_table(pred1: np.ndarray, pred2: np.ndarray) -> np.ndarray:
    """(T, 13, 3) x2 -> (13, 3) fused keypoints (ref: utils.py:137-180)."""
    T, N, _ = pred1.shape
    out = np.zeros((N, 3))
    for n in range(N):
        both = (pred1[:, n, 2] == VISIBLE) & (pred2[:, n, 2] == VISIBLE)
        dist = np.linalg.norm(pred1[:, n, :2] - pred2[:, n, :2], axis=1)
        sel = both & (dist < TABLE_AGREEMENT_PX)
        pts = pred1[sel, n, :2]
        if pts.shape[0] < 3:
            out[n] = (-1, -1, INVISIBLE)
            continue
        c = _dbscan_largest_cluster(pts, eps=10, min_samples=3)
        out[n] = (c[0], c[1], VISIBLE) if c is not None else (-1, -1, INVISIBLE)
    return out


def uplifting_inputs(ball_coords, table_coords, times, width, height, seq_len=SEQUENCE_LEN):
    """Normalize + pad to the uplifting model's input format
    (ref: _uplifting_transform, utils.py:268-309).

    Returns (ball (1, L, 2), table (1, 13, 3), times (1, L), mask (1, L))."""
    ball = np.asarray(ball_coords, np.float32) / np.asarray([width, height], np.float32)
    table = np.asarray(table_coords, np.float32).copy()
    table[:, 0] /= width
    table[:, 1] /= height

    T = ball.shape[0]
    L = seq_len
    out_ball = np.zeros((1, L, 2), np.float32)
    out_times = np.zeros((1, L), np.float32)
    mask = np.zeros((1, L), np.float32)
    n = min(T, L)
    out_ball[0, :n] = ball[:n]
    out_times[0, :n] = np.asarray(times, np.float32)[:n]
    mask[0, :n] = 1.0
    return out_ball, table[None], out_times, mask
