"""Pose/keypoint skeleton rendering + video-frame helpers.

Covers the reference's vendored visualization surface
(ref: vit_pose/vit_utils/visualization.py:11-483 — joints_dict,
draw_points, draw_skeleton, draw_points_and_skeleton — and
vit_pose/vit_utils/inference.py:41-94 — pad_image, VideoReader; the
streaming reader itself lives in data/video.py).

Differences from the reference: skeleton definitions are a small
registry (COCO-17 and MPII-16 built in, others register at runtime via
`register_skeleton`) instead of a 350-line literal table, and drawing is
vectorized over points/limbs. Point format matches the reference:
rows of (y, x, confidence).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "joints_dict",
    "register_skeleton",
    "draw_points",
    "draw_skeleton",
    "draw_points_and_skeleton",
    "pad_image",
]

# Standard benchmark skeletons (limb index pairs). COCO order follows the
# dataset spec (nose, eyes, ears, shoulders, elbows, wrists, hips, knees,
# ankles); MPII follows (ankles..head..wrists).
_SKELETONS: Dict[str, dict] = {
    "coco": {
        "keypoints": {
            0: "nose", 1: "left_eye", 2: "right_eye", 3: "left_ear",
            4: "right_ear", 5: "left_shoulder", 6: "right_shoulder",
            7: "left_elbow", 8: "right_elbow", 9: "left_wrist",
            10: "right_wrist", 11: "left_hip", 12: "right_hip",
            13: "left_knee", 14: "right_knee", 15: "left_ankle",
            16: "right_ankle",
        },
        "skeleton": [
            [15, 13], [13, 11], [16, 14], [14, 12], [11, 12], [5, 11],
            [6, 12], [5, 6], [5, 7], [6, 8], [7, 9], [8, 10], [1, 2],
            [0, 1], [0, 2], [1, 3], [2, 4], [3, 5], [4, 6],
        ],
    },
    "mpii": {
        "keypoints": {
            0: "right_ankle", 1: "right_knee", 2: "right_hip", 3: "left_hip",
            4: "left_knee", 5: "left_ankle", 6: "pelvis", 7: "thorax",
            8: "upper_neck", 9: "head_top", 10: "right_wrist",
            11: "right_elbow", 12: "right_shoulder", 13: "left_shoulder",
            14: "left_elbow", 15: "left_wrist",
        },
        "skeleton": [
            [0, 1], [1, 2], [2, 6], [3, 6], [3, 4], [4, 5], [6, 7], [7, 8],
            [8, 9], [10, 11], [11, 12], [12, 7], [13, 7], [13, 14], [14, 15],
        ],
    },
}


def register_skeleton(name: str, keypoints: Dict[int, str],
                      skeleton: Sequence[Sequence[int]]) -> None:
    """Register an additional dataset skeleton (ap10k, aic, ...)."""
    _SKELETONS[name] = {"keypoints": dict(keypoints),
                        "skeleton": [list(p) for p in skeleton]}


def joints_dict() -> Dict[str, dict]:
    """Name -> {keypoints: {idx: name}, skeleton: [[a, b], ...]}
    (ref: visualization.py:11-358)."""
    return _SKELETONS


def _palette(name: str, samples: int) -> List[Tuple[int, int, int]]:
    """Sample a matplotlib colormap into BGR uint8 tuples
    (ref: visualization.py:381-388)."""
    import matplotlib.pyplot as plt

    cmap = plt.get_cmap(name)
    if hasattr(cmap, "colors"):
        cols = np.asarray(cmap.colors)[:, :3]
    else:
        cols = np.asarray(cmap(np.linspace(0, 1, samples)))[:, :3]
    return [tuple(int(v) for v in c) for c in np.round(cols * 255)[:, ::-1]]


def draw_points(image: np.ndarray, points: np.ndarray,
                color_palette: str = "tab20", palette_samples: int = 16,
                confidence_threshold: float = 0.5) -> np.ndarray:
    """Draw (y, x, conf) points as filled circles, one palette color per
    joint index (ref: visualization.py:360-397)."""
    import cv2

    colors = _palette(color_palette, palette_samples)
    radius = max(1, min(image.shape[:2]) // 150)
    for i, pt in enumerate(np.asarray(points)):
        if pt[2] > confidence_threshold:
            image = cv2.circle(image, (int(pt[1]), int(pt[0])), radius,
                               colors[i % len(colors)], -1)
    return image


def draw_skeleton(image: np.ndarray, points: np.ndarray,
                  skeleton: Sequence[Sequence[int]],
                  color_palette: str = "Set2", palette_samples: int = 8,
                  person_index: int = 0,
                  confidence_threshold: float = 0.5) -> np.ndarray:
    """Draw limb segments between confident joints, one palette color per
    person (ref: visualization.py:399-443)."""
    import cv2

    colors = _palette(color_palette, palette_samples)
    color = colors[person_index % len(colors)]
    pts = np.asarray(points)
    for a, b in skeleton:
        p1, p2 = pts[a], pts[b]
        if p1[2] > confidence_threshold and p2[2] > confidence_threshold:
            image = cv2.line(image, (int(p1[1]), int(p1[0])),
                             (int(p2[1]), int(p2[0])), color, 2)
    return image


def draw_points_and_skeleton(image: np.ndarray, points: np.ndarray,
                             skeleton: Sequence[Sequence[int]],
                             points_color_palette: str = "tab20",
                             points_palette_samples: int = 16,
                             skeleton_color_palette: str = "Set2",
                             skeleton_palette_samples: int = 8,
                             person_index: int = 0,
                             confidence_threshold: float = 0.5) -> np.ndarray:
    """Skeleton then points overlay (ref: visualization.py:445-481)."""
    image = draw_skeleton(image, points, skeleton,
                          color_palette=skeleton_color_palette,
                          palette_samples=skeleton_palette_samples,
                          person_index=person_index,
                          confidence_threshold=confidence_threshold)
    return draw_points(image, points, color_palette=points_color_palette,
                       palette_samples=points_palette_samples,
                       confidence_threshold=confidence_threshold)


def pad_image(image: np.ndarray, aspect_ratio: float
              ) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Zero-pad to the target aspect ratio, centered; returns the padded
    image and the (left, top) offset (ref: inference.py:41-70)."""
    h, w = image.shape[:2]
    left = top = 0
    if w / h < aspect_ratio:
        target_w = int(aspect_ratio * h)
        left = (target_w - w) // 2
        pads = ((0, 0), (left, target_w - w - left)) + ((0, 0),) * (image.ndim - 2)
    else:
        target_h = int(w / aspect_ratio)
        top = (target_h - h) // 2
        pads = ((top, target_h - h - top), (0, 0)) + ((0, 0),) * (image.ndim - 2)
    return np.pad(image, pads, mode="constant"), (left, top)
