"""Visual observability: TensorBoard-ready figures for training/eval.

The reference's quality culture is visual — heatmap/keypoint overlays during
detector validation (ref: balldetection/train.py:186-242,
tabledetection/train.py:161-178), confusion-matrix images every 10 epochs
(ref: uplifting/helper.py:328-368), ROC curves (ref: :459-497) and a
missortings counter (ref: :500-540). This module provides jitter-free Agg
(headless) renders of all of them as (H, W, 3) uint8 arrays, directly
consumable by `SummaryWriter.add_image(..., dataformats='HWC')`.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _fig_to_image(fig) -> np.ndarray:
    """Rasterize a matplotlib figure to (H, W, 3) uint8."""
    fig.canvas.draw()
    img = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    import matplotlib.pyplot as plt

    plt.close(fig)
    return img


def _agg():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def confusion_matrix_image(tp: int, tn: int, fp: int, fn: int,
                           title: Optional[str] = "Confusion Matrix") -> np.ndarray:
    """2x2 sign-confusion matrix render (ref: uplifting/helper.py:328-368)."""
    plt = _agg()
    cm = np.array([[tp, fn], [fp, tn]])
    fig, ax = plt.subplots(figsize=(2.2, 2.2), dpi=100)
    im = ax.imshow(cm, cmap="Blues")
    ax.set_xticks([0, 1], labels=["Pred +", "Pred -"])
    ax.set_yticks([0, 1], labels=["GT +", "GT -"])
    plt.setp(ax.get_xticklabels(), rotation=45, ha="right", rotation_mode="anchor")
    thresh = im.norm(cm.max()) / 2.0 if cm.max() > 0 else 0.5
    for i in range(2):
        for j in range(2):
            color = "white" if im.norm(cm[i, j]) > thresh else "black"
            ax.text(j, i, int(cm[i, j]), ha="center", va="center", color=color, fontsize=12)
    if title:
        ax.set_title(title, fontsize=9)
    fig.tight_layout()
    return _fig_to_image(fig)


def roc_curve_points(labels: np.ndarray, scores: np.ndarray):
    """(fpr, tpr, thresholds) without sklearn: sort scores descending and
    sweep the threshold (standard ROC construction)."""
    labels = np.asarray(labels).astype(bool)
    scores = np.asarray(scores, np.float64)
    order = np.argsort(-scores)
    labels = labels[order]
    scores = scores[order]
    tps = np.cumsum(labels)
    fps = np.cumsum(~labels)
    # keep last index of each distinct score
    distinct = np.nonzero(np.diff(scores))[0]
    idx = np.concatenate([distinct, [len(scores) - 1]])
    tpr = tps[idx] / max(tps[-1], 1)
    fpr = fps[idx] / max(fps[-1], 1)
    return (
        np.concatenate([[0.0], fpr]),
        np.concatenate([[0.0], tpr]),
        np.concatenate([[np.inf], scores[idx]]),
    )


def roc_auc(labels: np.ndarray, scores: np.ndarray) -> float:
    fpr, tpr, _ = roc_curve_points(labels, scores)
    return float(np.trapezoid(tpr, fpr))


def roc_curve_image(labels: np.ndarray, scores: np.ndarray,
                    show_thresholds: bool = False) -> np.ndarray:
    """ROC plot render (ref: uplifting/helper.py:459-497)."""
    plt = _agg()
    fpr, tpr, thr = roc_curve_points(labels, scores)
    auc = float(np.trapezoid(tpr, fpr))
    fig, ax = plt.subplots(figsize=(5, 4), dpi=100)
    ax.plot(fpr, tpr, color="blue", label=f"ROC Curve (AUC = {auc:.3f})")
    ax.plot([0, 1], [0, 1], "--", color="gray", label="Random Classifier")
    ax.set_xlabel("False Positive Rate")
    ax.set_ylabel("True Positive Rate")
    ax.legend(loc="lower right", fontsize=8)
    ax.grid(True)
    if show_thresholds:
        for i in range(1, len(thr)):
            ax.annotate(f"{thr[i]:.0f}", (fpr[i], tpr[i]), fontsize=7)
    fig.tight_layout()
    return _fig_to_image(fig)


def count_missortings(labels: np.ndarray, scores: np.ndarray) -> Tuple[int, float]:
    """Minimum misclassifications over all thresholds + the optimal
    threshold, preferring |thresh| close to 0 on ties
    (ref: uplifting/helper.py:500-540). Vectorized over thresholds."""
    labels = np.asarray(labels).astype(int)
    scores = np.asarray(scores, np.float64)
    thresholds = np.sort(np.unique(scores))[::-1]
    preds = scores[None, :] >= thresholds[:, None]  # (T, N)
    miss = np.sum(preds != labels[None, :].astype(bool), axis=1)
    best = miss.min()
    cand = thresholds[miss == best]
    return int(best), float(cand[np.argmin(np.abs(cand))])


def heatmap_overlay_image(image: np.ndarray, pred_heat: np.ndarray,
                          gt_coords: Optional[np.ndarray] = None,
                          pred_coords: Optional[np.ndarray] = None) -> np.ndarray:
    """Validation overlay: image + predicted heatmap (red) + GT keypoints
    (green) + extracted peaks (orange) (ref: balldetection/train.py:186-242).

    image (H, W, 3) float/uint8 in [0, 255] (normalized inputs should be
    de-normalized by the caller); pred_heat (h, w) or (P, h, w) summed over
    channels; coords in image pixels, (P, >=2) with optional visibility col.
    """
    plt = _agg()
    img = np.clip(np.asarray(image, np.float32), 0, 255).astype(np.uint8)
    H, W = img.shape[:2]
    heat = np.asarray(pred_heat, np.float32)
    if heat.ndim == 3:
        heat = heat.max(axis=0)
    # bilinear-resize heat to image size (pure numpy, small)
    ys = np.linspace(0, heat.shape[0] - 1, H)
    xs = np.linspace(0, heat.shape[1] - 1, W)
    heat = heat[np.clip(ys.astype(int), 0, None)][:, np.clip(xs.astype(int), 0, None)]
    heat = np.clip(heat / max(float(heat.max()), 1e-6), 0, 1)

    fig, ax = plt.subplots(figsize=(8, 4.5), dpi=100)
    ax.imshow(img)
    ax.imshow(heat, cmap="Reds", alpha=0.45)
    for coords, color in ((gt_coords, "lime"), (pred_coords, "orange")):
        if coords is not None:
            c = np.asarray(coords)
            vis = c[:, 2] == 1 if c.shape[1] > 2 else np.ones(len(c), bool)
            ax.scatter(c[vis, 0], c[vis, 1], c=color, s=30, marker="x")
    ax.axis("off")
    fig.tight_layout()
    return _fig_to_image(fig)
