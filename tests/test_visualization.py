"""utils/visualization.py: ROC/missortings math + figure renders
(ref: uplifting/helper.py:328-368, 459-540; balldetection/train.py:186-242)."""
import numpy as np

from upliftingtabletennis_tpu.utils.visualization import (
    confusion_matrix_image,
    count_missortings,
    heatmap_overlay_image,
    roc_auc,
    roc_curve_image,
)


def test_roc_auc_matches_sklearn():
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 2, 200)
    scores = labels * 1.0 + rng.normal(0, 0.8, 200)
    try:
        from sklearn.metrics import roc_auc_score

        ref = roc_auc_score(labels, scores)
    except ImportError:
        ref = None
    auc = roc_auc(labels, scores)
    assert 0.7 < auc <= 1.0
    if ref is not None:
        np.testing.assert_allclose(auc, ref, atol=1e-9)


def test_count_missortings_brute_force():
    rng = np.random.default_rng(1)
    labels = rng.integers(0, 2, 40)
    scores = rng.normal(0, 1, 40)
    n, thr = count_missortings(labels, scores)
    # brute force over the same threshold set
    best = min(
        np.sum((scores >= t).astype(int) != labels) for t in np.unique(scores)
    )
    assert n == best
    assert np.sum((scores >= thr).astype(int) != labels) == best


def test_count_missortings_perfect_separation():
    labels = np.array([0, 0, 1, 1])
    scores = np.array([-2.0, -1.0, 1.0, 2.0])
    n, thr = count_missortings(labels, scores)
    assert n == 0 and thr == 1.0  # closest-to-zero optimal threshold


def test_figure_renders_produce_images():
    cm = confusion_matrix_image(10, 8, 2, 1)
    assert cm.ndim == 3 and cm.shape[2] == 3 and cm.dtype == np.uint8

    rng = np.random.default_rng(2)
    labels = rng.integers(0, 2, 50)
    scores = labels + rng.normal(0, 0.5, 50)
    roc = roc_curve_image(labels, scores)
    assert roc.ndim == 3 and roc.shape[2] == 3

    img = rng.uniform(0, 255, (64, 96, 3))
    heat = rng.uniform(0, 1, (1, 16, 24))
    gt = np.array([[40.0, 30.0, 1.0], [10.0, 10.0, 0.0]])
    overlay = heatmap_overlay_image(img, heat, gt_coords=gt)
    assert overlay.ndim == 3 and overlay.shape[2] == 3
