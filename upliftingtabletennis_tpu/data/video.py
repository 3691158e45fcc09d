"""Video ingest: decode broadcast footage into the pipeline's input formats.

Completes the reference's video path (its vendored reader lives in
vit_pose/vit_utils/inference.py and frame extraction in
dataprocessing/extract_*_data.py — both cv2.VideoCapture based). The
pipeline consumes either RGB uint8 frames or planar I420
(`TableTennisPipeline.predict(..., pixel_format='i420')`); decoders emit
YUV natively, so the I420 path skips the host-side RGB conversion entirely.
"""
from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np


def read_video(path: str, start: int = 0, end: Optional[int] = None,
               pixel_format: str = "rgb") -> np.ndarray:
    """Decode frames [start, end) of a video file.

    Returns (T, H, W, 3) uint8 RGB, or (T, H*3//2, W) uint8 planar I420
    when pixel_format='i420' (the pipeline's low-bandwidth ingest format).
    """
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(path)
    if start:
        cap.set(cv2.CAP_PROP_POS_FRAMES, start)
    frames = []
    idx = start
    while end is None or idx < end:
        ret, bgr = cap.read()
        if not ret:
            break
        if pixel_format == "i420":
            frames.append(cv2.cvtColor(bgr, cv2.COLOR_BGR2YUV_I420))
        else:
            frames.append(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB))
        idx += 1
    cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {path} in [{start}, {end})")
    return np.stack(frames)


def video_info(path: str) -> Tuple[int, int, int, float]:
    """(num_frames, height, width, fps)."""
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(path)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    fps = float(cap.get(cv2.CAP_PROP_FPS))
    cap.release()
    return n, h, w, fps


def iter_video_chunks(path: str, chunk: int = 256,
                      pixel_format: str = "rgb") -> Iterator[np.ndarray]:
    """Stream a long video in fixed-size chunks (bounded host memory)."""
    n, _, _, _ = video_info(path)
    for s in range(0, n, chunk):
        yield read_video(path, s, min(s + chunk, n), pixel_format)
