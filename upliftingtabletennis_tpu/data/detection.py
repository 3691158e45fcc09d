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


def load_ball_batch(root: str, samples: Sequence[BallSample], in_frames: int = 3):
    """Stack (B, H, W, 3*in_frames) windows (prev, current, next) + annotations.

    coords (B, 3, 2): rows are (center, streak_min, streak_max); for TTHQ
    min = max = center, matching the reference (ref: dataset.py:412-415).
    in_frames in {1, 3} like the reference (ref: dataset.py:26)."""
    assert in_frames in (1, 3), f"in_frames must be 1 or 3, got {in_frames}"
    imgs, coords, vis = [], [], []
    for s in samples:
        cur = load_frame(root, s.video, s.frames[0])
        if in_frames == 3:
            prev = load_frame(root, s.video, s.frames[1])
            nxt = load_frame(root, s.video, s.frames[2])
            imgs.append(np.concatenate([prev, cur, nxt], axis=-1))
        else:
            imgs.append(cur)
        coords.append([s.coords, s.min_coords, s.max_coords])
        vis.append([s.visibility] * 3)
    return (
        np.stack(imgs),
        np.asarray(coords, np.float32),
        np.asarray(vis, np.float32),
    )


def load_table_batch(root: str, samples: Sequence[TableSample]):
    imgs, kps = [], []
    for s in samples:
        imgs.append(load_frame(root, s.video, s.frame))
        kps.append(s.keypoints)
    kps = np.stack(kps)
    return np.stack(imgs), kps[..., :2], kps[..., 2]


class BlurBallSample(NamedTuple):
    paths: Tuple[str, str, str]  # (current, prev, next) frame paths
    coords: Tuple[float, float]
    blur_len: float
    blur_theta_deg: float
    visibility: int


def load_blurball_index(root: str, mode: str, use_invisible: bool = True) -> List[BlurBallSample]:
    """BlurBall layout: `<root>/blurball/<vid:02d>/frames/<seq:03d>/*.png` +
    `<root>/blurball/all_csv_annotations/<vid:02d>_csv_<seq:03d>.csv` with
    columns Frame, X, Y, l, theta, Visibility. Videos 3,6,8,15,20,22,24 are
    the val/test pool, shuffled-halved (ref: balldetection/dataset.py:135-222).
    """
    data_path = os.path.join(root, "blurball")
    ann_path = os.path.join(data_path, "all_csv_annotations")
    holdout = (3, 6, 8, 15, 20, 22, 24)
    vids = [v for v in range(26) if (v in holdout) == (mode != "train")]

    samples: List[BlurBallSample] = []
    for vid in vids:
        frames_root = os.path.join(data_path, f"{vid:02d}", "frames")
        if not os.path.isdir(frames_root):
            continue
        seqs = sorted(int(s) for s in os.listdir(frames_root) if s.isdecimal())
        for seq in seqs:
            seq_path = os.path.join(frames_root, f"{seq:03d}")
            csv = os.path.join(ann_path, f"{vid:02d}_csv_{seq:03d}.csv")
            if not os.path.exists(csv):
                continue
            df = _read_csv(csv, sep=",")
            by_frame = {int(r["Frame"]): r for _, r in df.iterrows()}
            frames = sorted(
                int(f[:-4]) for f in os.listdir(seq_path) if f.endswith(".png")
            )
            for i in range(1, len(frames) - 1):
                f, fp, fn = frames[i], frames[i - 1], frames[i + 1]
                if f not in by_frame or fp not in by_frame or fn not in by_frame:
                    continue
                flags = [
                    BALL_VISIBLE if int(by_frame[k]["Visibility"]) != 0 else BALL_INVISIBLE
                    for k in (f, fp, fn)
                ]
                if not use_invisible and BALL_INVISIBLE in flags:
                    continue
                r = by_frame[f]
                samples.append(
                    BlurBallSample(
                        (
                            os.path.join(seq_path, f"{f:05d}.png"),
                            os.path.join(seq_path, f"{fp:05d}.png"),
                            os.path.join(seq_path, f"{fn:05d}.png"),
                        ),
                        (float(r["X"]), float(r["Y"])),
                        float(r["l"]),
                        float(r["theta"]),
                        flags[0],
                    )
                )
    rnd = np.random.RandomState(0)
    rnd.shuffle(samples)
    if mode == "val":
        samples = samples[: len(samples) // 2]
    elif mode == "test":
        samples = samples[len(samples) // 2 :]
    return samples


def blur_streak_endpoints(coords_eval, blur_len, theta_deg, src_wh):
    """Min/max blur-streak endpoints at the evaluation resolution, clamped
    to the image (ref: balldetection/dataset.py:131-136). coords_eval is the
    ball center already rescaled to (EVAL_WIDTH, EVAL_HEIGHT); blur_len and
    theta are annotated at source resolution src_wh."""
    sx = EVAL_WIDTH / src_wh[0]
    sy = EVAL_HEIGHT / src_wh[1]
    dx = blur_len * np.cos(np.deg2rad(theta_deg)) * sx
    dy = blur_len * np.sin(np.deg2rad(theta_deg)) * sy
    x, y = coords_eval
    min_pt = (max(0.0, x - dx), max(0.0, y - dy))
    max_pt = (min(EVAL_WIDTH - 1.0, x + dx), min(EVAL_HEIGHT - 1.0, y + dy))
    return min_pt, max_pt


def load_frame_path(path: str) -> np.ndarray:
    """One RGB frame from an absolute path, float32 (H, W, 3) in [0, 255]."""
    import cv2

    img = cv2.imread(path)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32)


def load_blurball_ball_batch(root: str, samples: Sequence[BlurBallSample], in_frames: int = 3):
    """Stack (B, H, W, 3*in_frames) windows + (center, streak_min, streak_max).

    coords (B, 3, 2) at SOURCE resolution: row 0 the ball center (heatmap
    target), rows 1-2 the blur-streak endpoints (metrics only) — TTHQ uses
    min = max = center exactly like the reference (ref:
    balldetection/dataset.py:131-136, 412-415)."""
    assert in_frames in (1, 3), f"in_frames must be 1 or 3, got {in_frames}"
    imgs, coords, vis = [], [], []
    for s in samples:
        cur = load_frame_path(s.paths[0])
        if in_frames == 3:
            prev = load_frame_path(s.paths[1])
            nxt = load_frame_path(s.paths[2])
            imgs.append(np.concatenate([prev, cur, nxt], axis=-1))
        else:
            imgs.append(cur)
        x, y = s.coords
        dx = s.blur_len * np.cos(np.deg2rad(s.blur_theta_deg))
        dy = s.blur_len * np.sin(np.deg2rad(s.blur_theta_deg))
        H, W = cur.shape[:2]
        mn = (max(0.0, x - dx), max(0.0, y - dy))
        mx = (min(W - 1.0, x + dx), min(H - 1.0, y + dy))
        coords.append([(x, y), mn, mx])
        vis.append([s.visibility] * 3)
    return np.stack(imgs), np.asarray(coords, np.float32), np.asarray(vis, np.float32)


class BlurBallTableSample(NamedTuple):
    path: str
    keypoints: np.ndarray  # (13, 3) x, y, visibility at source resolution


def _rodrigues(rvec: np.ndarray) -> np.ndarray:
    theta = np.linalg.norm(rvec)
    if theta < 1e-12:
        return np.eye(3)
    k = rvec / theta
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def blurball_table_keypoints(camera_info: dict, orig_wh: Tuple[int, int]) -> np.ndarray:
    """Derive the 13 table keypoints by reprojecting TABLE_POINTS through a
    BlurBall per-video calibration yaml: Rodrigues(rvec) + tvec extrinsics,
    right-multiplied by the TT3D->ours coordinate-change matrix, focal f with
    principal point ((W-1)/2, (H-1)/2) (ref: tabledetection/dataset.py:276-303).
    Returns (13, 3) [x, y, visible] at the source resolution."""
    from upliftingtabletennis_tpu.core.geometry import TABLE_HEIGHT, TABLE_POINTS

    W, H = orig_wh
    rvec = np.asarray(camera_info["rvec"], np.float64).ravel()
    tvec = np.asarray(camera_info["tvec"], np.float64).ravel()
    f = float(camera_info["f"])
    Mint = np.array([[f, 0, (W - 1) / 2], [0, f, (H - 1) / 2], [0, 0, 1]])
    Mext = np.eye(4)
    Mext[:3, :3] = _rodrigues(rvec)
    Mext[:3, 3] = tvec
    trans = np.array(
        [[0, -1, 0, 0], [1, 0, 0, 0], [0, 0, 1, -TABLE_HEIGHT], [0, 0, 0, 1]], np.float64
    )
    Mext = Mext @ trans
    tp = np.concatenate([np.asarray(TABLE_POINTS, np.float64), np.ones((13, 1))], -1)
    cam_pts = (Mext @ tp.T).T
    img_pts = (Mint @ (cam_pts[:, :3] / cam_pts[:, 3:4]).T).T
    xy = img_pts[:, :2] / img_pts[:, 2:3]
    return np.concatenate([xy, np.full((13, 1), BALL_VISIBLE, np.float64)], -1).astype(
        np.float32
    )


def load_blurball_table_index(root: str, mode: str) -> List[BlurBallTableSample]:
    """BlurBall table samples: every frame of every sequence, keypoints from
    the per-video calib yaml (constant per video — static cameras). val =
    first shuffled half thinned 10x, test = second half (ref:
    tabledetection/dataset.py:210-262)."""
    import yaml

    data_path = os.path.join(root, "blurball")
    holdout = (3, 6, 8, 15, 20, 22, 24)
    vids = [v for v in range(26) if (v in holdout) == (mode != "train")]
    samples: List[BlurBallTableSample] = []
    for vid in vids:
        frames_root = os.path.join(data_path, f"{vid:02d}", "frames")
        calib = os.path.join(data_path, "all_calib_files", f"{vid:02d}_table_pose.yaml")
        if not os.path.isdir(frames_root) or not os.path.exists(calib):
            continue
        with open(calib) as f:
            camera_info = yaml.safe_load(f)
        kps = None
        for seq in sorted(s for s in os.listdir(frames_root) if s.isdecimal()):
            seq_path = os.path.join(frames_root, seq)
            for fname in sorted(f for f in os.listdir(seq_path) if f.endswith(".png")):
                path = os.path.join(seq_path, fname)
                if kps is None:  # one decode per video to learn the resolution
                    h, w = load_frame_path(path).shape[:2]
                    kps = blurball_table_keypoints(camera_info, (w, h))
                samples.append(BlurBallTableSample(path, kps))
    rnd = np.random.RandomState(0)
    rnd.shuffle(samples)
    if mode == "val":
        samples = samples[: len(samples) // 2][::10]
    elif mode == "test":
        samples = samples[len(samples) // 2 :]
    return samples


def load_blurball_table_batch(root: str, samples: Sequence[BlurBallTableSample]):
    imgs = [load_frame_path(s.path) for s in samples]
    kps = np.stack([s.keypoints for s in samples])
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
