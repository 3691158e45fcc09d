"""Annotation quality checks: left/right keypoint-swap detection + camera
statistics.

Rebuilds the programmatic core of the reference's annotation tooling:
* `dataprocessing/check_annotations.py` — visual QA with left/right swap
  fixing: table keypoints come in mirrored pairs, and annotators sometimes
  swap them. The fix criterion here is calibration-consistency: calibrate
  from the keypoints as-annotated and with each candidate pair swapped; if
  swapping lowers the RANSAC reprojection error decisively, flag the frame.
* `dataprocessing/dataset_statistics.py` — fx/fy/camera-distance/azimuth
  distributions from per-frame calibrations (these informed the synthetic
  camera sampling ranges, ref: uplifting/data.py:60-64).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

# mirrored (left, right) keypoint index pairs (0-based, geometry.TABLE_POINTS)
LEFT_RIGHT_PAIRS = ((0, 1), (2, 3), (4, 5), (6, 7), (9, 10))


def _reproj_error(keypoints: np.ndarray, resolution) -> float:
    import jax
    import jax.numpy as jnp

    from upliftingtabletennis_tpu.core.calibration import calibrate_camera
    from upliftingtabletennis_tpu.core.geometry import TABLE_POINTS, world2img

    vis = (keypoints[:, 2] > 0).astype(np.float32)
    if vis.sum() < 6:
        return float("inf")
    Mint, Mext, _ = calibrate_camera(
        jnp.asarray(keypoints[:, :2], jnp.float32), jnp.asarray(vis), tuple(resolution),
        jax.random.PRNGKey(0), False,
    )
    proj = np.asarray(world2img(jnp.asarray(TABLE_POINTS), Mext, Mint))
    sel = vis > 0
    return float(np.linalg.norm(proj[sel] - keypoints[sel, :2], axis=1).mean())


def detect_left_right_swaps(keypoints: np.ndarray, resolution, margin: float = 0.5):
    """Return the list of pair indices whose swap lowers calibration
    reprojection error by more than `margin` px (likely annotation swaps).

    keypoints (13, 3): x, y, visibility.
    """
    base = _reproj_error(keypoints, resolution)
    flagged = []
    for pi, (a, b) in enumerate(LEFT_RIGHT_PAIRS):
        if keypoints[a, 2] <= 0 or keypoints[b, 2] <= 0:
            continue
        swapped = keypoints.copy()
        swapped[[a, b], :2] = swapped[[b, a], :2]
        err = _reproj_error(swapped, resolution)
        if err + margin < base:
            flagged.append(pi)
    return flagged, base


def fix_left_right_swaps(keypoints: np.ndarray, resolution, margin: float = 0.5):
    """Iteratively apply beneficial pair swaps; returns (fixed, n_swaps)."""
    fixed = keypoints.copy()
    n = 0
    for _ in range(len(LEFT_RIGHT_PAIRS)):
        flagged, _ = detect_left_right_swaps(fixed, resolution, margin)
        if not flagged:
            break
        a, b = LEFT_RIGHT_PAIRS[flagged[0]]
        fixed[[a, b], :2] = fixed[[b, a], :2]
        n += 1
    return fixed, n


def camera_statistics(cameras: List[Tuple[np.ndarray, np.ndarray]]) -> Dict[str, np.ndarray]:
    """fx/fy, camera distance and azimuth phi for (Mint, Mext) pairs
    (ref: dataprocessing/dataset_statistics.py)."""
    import jax.numpy as jnp

    from upliftingtabletennis_tpu.core.geometry import get_camera_location

    fx, fy, dist, phi = [], [], [], []
    for Mint, Mext in cameras:
        fx.append(float(np.asarray(Mint)[0, 0]))
        fy.append(float(np.asarray(Mint)[1, 1]))
        c = np.asarray(get_camera_location(jnp.asarray(Mext, jnp.float32)))
        dist.append(float(np.linalg.norm(c)))
        phi.append(float(np.rad2deg(np.arctan2(c[1], c[0]))))
    return {
        "fx": np.asarray(fx), "fy": np.asarray(fy),
        "distance": np.asarray(dist), "phi_deg": np.asarray(phi),
    }


def render_annotation_check(image, keypoints, resolution=None, out_path=None,
                            margin: float = 0.5):
    """Headless visual annotation check (ref: dataprocessing/
    check_annotations.py, which is an interactive cv2 viewer).

    Renders the frame with annotated keypoints (green = consistent,
    red = flagged as likely left/right-swapped by the calibration-
    consistency test), the reprojected table after calibration (orange),
    and the table wireframe. Returns the (H, W, 3) uint8 render; writes a
    PNG when out_path is given.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import jax.numpy as jnp

    from upliftingtabletennis_tpu.core.calibration import calibrate_from_keypoints
    from upliftingtabletennis_tpu.core.geometry import (
        TABLE_CONNECTIONS,
        TABLE_POINTS,
        world2img,
    )
    from upliftingtabletennis_tpu.utils.visualization import _fig_to_image

    img = np.asarray(image).astype(np.uint8)
    H, W = img.shape[:2]
    resolution = resolution or (W, H)
    kps = np.asarray(keypoints, np.float32)
    flagged_pairs, _ = detect_left_right_swaps(kps, resolution, margin)
    swaps = [LEFT_RIGHT_PAIRS[pi] for pi in flagged_pairs]
    flagged = {i for pair in swaps for i in pair}

    fig, ax = plt.subplots(figsize=(12, 7))
    ax.imshow(img)
    for i, (x, y, v) in enumerate(kps):
        if v != 1:
            continue
        color = "red" if i in flagged else "lime"
        ax.scatter([x], [y], c=color, s=60)
        ax.annotate(str(i + 1), (x + 4, y - 4), color=color, fontsize=9)

    if (kps[:, 2] == 1).sum() >= 6:
        Mint, Mext, _ = calibrate_from_keypoints(
            jnp.asarray(kps), tuple(resolution), use_ransac=True
        )
        proj = np.asarray(world2img(jnp.asarray(TABLE_POINTS, jnp.float32),
                                    Mext, Mint))
        ax.scatter(proj[:, 0], proj[:, 1], c="orange", s=25, marker="x")
        for a, b in TABLE_CONNECTIONS:
            ax.plot(proj[[a, b], 0], proj[[a, b], 1], c="orange", lw=0.8, alpha=0.7)
    title = "annotation OK" if not swaps else f"suspected swaps: {[(a+1, b+1) for a, b in swaps]}"
    ax.set_title(title)
    ax.axis("off")
    fig.tight_layout()
    render = _fig_to_image(fig)
    if out_path is not None:
        import matplotlib.image

        matplotlib.image.imsave(out_path, render)
    return render
