"""Detection datasets: TTHQ and BlurBall on-disk layouts.

Host-side readers that produce raw uint8 frames + annotations; all
augmentation/normalization/heatmap-rendering runs on device
(data/image_transforms.py, eval/metrics.render_gaussian_heatmaps), unlike
the reference which does cv2 transforms + full-res heatmap rendering in
dataloader worker processes (ref: balldetection/dataset.py:302-440).

Layouts (ref: balldetection/dataset.py, tabledetection/dataset.py):
* TTHQ ball: `<root>/tthq/ball_detection.csv` (sep=';', columns video,
  frame, ball_x, ball_y, ball_flag; flag==2 -> visible) + frames at
  `<root>/tthq/<video:02d>/<video:02d>_<frame:06d>.png`. Videos 1, 3, 10
  are the val+test pool, randomly shuffled (seed 0) and split in halves
  (ref: dataset.py:311-362).
* TTHQ table: `table_detection.csv` with 13 keypoints per frame
  (columns point_<k>_x/_y/_flag; flag==2 -> visible, ref:
  tabledetection/dataset.py:154-192).
* BlurBall: per-video annotation CSVs with blur streak (x, y, length,
  angle) -> min/max streak endpoints (ref: balldetection/dataset.py:266-270).

Readers return index lists; `load_frames` fetches and stacks triplets on
demand. A threaded prefetcher overlaps disk decode with device compute.
"""
from __future__ import annotations

import os
import queue
import threading
from typing import List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

BALL_VISIBLE = 1
BALL_INVISIBLE = 0
EVAL_WIDTH, EVAL_HEIGHT = 1920, 1080  # metric resolution (ref: helper:12)


class BallSample(NamedTuple):
    video: int
    frames: Tuple[int, int, int]  # (current, prev, next)
    coords: Tuple[float, float]
    visibility: int
    # blur streak endpoints (equal to coords for TTHQ, ref: dataset.py:412-415)
    min_coords: Tuple[float, float]
    max_coords: Tuple[float, float]


class TableSample(NamedTuple):
    video: int
    frame: int
    keypoints: np.ndarray  # (13, 3) x, y, visibility


def _read_csv(path, sep=";"):
    import pandas as pd

    return pd.read_csv(path, sep=sep)


def load_tthq_ball_index(root: str, mode: str, use_invisible: bool = True) -> List[BallSample]:
    """Index of TTHQ ball samples (ref: balldetection/dataset.py:302-366)."""
    val_test_vids = (1, 3, 10)
    data_path = os.path.join(root, "tthq")
    df = _read_csv(os.path.join(data_path, "ball_detection.csv"))
    samples = []
    for _, row in df.iterrows():
        video, frame = int(row["video"]), int(row["frame"])
        if mode == "train" and video in val_test_vids:
            continue
        if mode in ("val", "test") and video not in val_test_vids:
            continue
        for f in (frame - 1, frame + 1):
            if not os.path.exists(
                os.path.join(data_path, f"{video:02d}", f"{video:02d}_{f:06d}.png")
            ):
                break
        else:
            flag = BALL_VISIBLE if int(row["ball_flag"]) == 2 else BALL_INVISIBLE
            if not use_invisible and flag == BALL_INVISIBLE:
                continue
            xy = (float(row["ball_x"]), float(row["ball_y"]))
            samples.append(BallSample(video, (frame, frame - 1, frame + 1), xy, flag, xy, xy))

    rnd = np.random.RandomState(0)
    rnd.shuffle(samples)
    if mode == "val":
        samples = samples[: len(samples) // 2]
    elif mode == "test":
        samples = samples[len(samples) // 2 :]
    return samples


def load_tthq_table_index(root: str, mode: str) -> List[TableSample]:
    """Index of TTHQ table samples (ref: tabledetection/dataset.py:117-192)."""
    val_test_vids = (1, 3, 10)
    data_path = os.path.join(root, "tthq")
    df = _read_csv(os.path.join(data_path, "table_detection.csv"))
    samples = []
    for _, row in df.iterrows():
        video, frame = int(row["video"]), int(row["frame"])
        if mode == "train" and video in val_test_vids:
            continue
        if mode in ("val", "test") and video not in val_test_vids:
            continue
        kps = np.zeros((13, 3), np.float32)
        for k in range(13):
            kps[k, 0] = float(row.get(f"point_{k + 1}_x", np.nan))
            kps[k, 1] = float(row.get(f"point_{k + 1}_y", np.nan))
            flag = int(row.get(f"point_{k + 1}_flag", 0))
            kps[k, 2] = BALL_VISIBLE if flag == 2 else BALL_INVISIBLE
        samples.append(TableSample(video, frame, kps))
    rnd = np.random.RandomState(0)
    rnd.shuffle(samples)
    if mode == "val":
        samples = samples[: len(samples) // 2]
    elif mode == "test":
        samples = samples[len(samples) // 2 :]
    return samples


def load_frame(root: str, video: int, frame: int) -> np.ndarray:
    """One RGB frame as float32 (H, W, 3) in [0, 255]."""
    import cv2

    path = os.path.join(root, "tthq", f"{video:02d}", f"{video:02d}_{frame:06d}.png")
    img = cv2.imread(path)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32)


def load_ball_batch(root: str, samples: Sequence[BallSample]):
    """Stack (B, H, W, 9) triplets (prev, current, next) + annotations."""
    imgs, coords, vis = [], [], []
    for s in samples:
        cur = load_frame(root, s.video, s.frames[0])
        prev = load_frame(root, s.video, s.frames[1])
        nxt = load_frame(root, s.video, s.frames[2])
        imgs.append(np.concatenate([prev, cur, nxt], axis=-1))
        coords.append(s.coords)
        vis.append(s.visibility)
    return (
        np.stack(imgs),
        np.asarray(coords, np.float32)[:, None, :],
        np.asarray(vis, np.float32)[:, None],
    )


def load_table_batch(root: str, samples: Sequence[TableSample]):
    imgs, kps = [], []
    for s in samples:
        imgs.append(load_frame(root, s.video, s.frame))
        kps.append(s.keypoints)
    kps = np.stack(kps)
    return np.stack(imgs), kps[..., :2], kps[..., 2]


class Prefetcher:
    """Tiny threaded prefetcher overlapping host decode with device steps."""

    def __init__(self, make_batch, n_batches: int, depth: int = 2):
        self.q: "queue.Queue" = queue.Queue(maxsize=depth)
        self.n = n_batches

        def worker():
            for i in range(n_batches):
                self.q.put(make_batch(i))
            self.q.put(None)

        self.t = threading.Thread(target=worker, daemon=True)
        self.t.start()

    def __iter__(self):
        while True:
            item = self.q.get()
            if item is None:
                return
            yield item
