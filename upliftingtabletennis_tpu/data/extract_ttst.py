"""TTST dataset extraction from raw annotation CSVs.

Rebuilds `dataprocessing/extract_ttst_data.py` (ref: :28-177): turns the
per-video `<vid>_events.csv` / `<vid>_keypoints.csv` annotation pairs into
the per-trajectory `.npy` layout consumed by data/ttst.py
(`trajectory_%04d/{r_img, times, Mint, Mext, hits, spin_class}.npy` and
optional extracted `frames/*.png`).

Event state machine (ref: :50-70): a trajectory is (Begin, Bounce, End)
with a Frontspin/Backspin annotation between Begin and End; events without
a spin annotation are dropped. spin_class: 1 = frontspin/topspin,
2 = backspin.

Camera regression: the reference feeds every (keypoint, observation) pair
across the event's frames into one BFGS/RANSAC regression
(ref: regress_cameramatrices.py:199-231). Cameras are static per sequence,
so here per-keypoint observations are first reduced to their median (robust
to annotation jitter) and the jitted 13-point RANSAC calibration runs on
the result (core/calibration.py) — same estimator family, fixed shapes.

CSV conventions (TTST raw annotations): sep=';', header on the SECOND line
(header=1); keypoint columns are '01_x'/'01_y'/'01_flag'..'13_*'
(zero-padded, unlike TTHQ's 'point_1_x'); flag == 2 means annotated.
"""
from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np

FPS = 50
NUM_TABLE_POINTS = 13
DEFAULT_RESOLUTION = (2560, 1440)  # original TTST video resolution (ref: :25)


def parse_events(events_df) -> Tuple[List[Tuple[int, int, int]], List[int]]:
    """(begin, bounce, end) trajectories + spin classes (ref: :50-70)."""
    events, spins = [], []
    spin_class = 0
    begin = bounce = end = None
    for frame, event in zip(events_df["frame"], events_df["event"]):
        if event == "Frontspin" and begin is not None:
            spin_class = 1
        elif event == "Backspin" and begin is not None:
            spin_class = 2

        if event == "Begin" and bounce is None and end is None:
            begin = frame
        elif event == "Bounce" and begin is not None and end is None:
            bounce = frame
        elif event == "End" and begin is not None and bounce is not None:
            end = frame
            if spin_class != 0:
                events.append((int(begin), int(bounce), int(end)))
                spins.append(spin_class)
            spin_class = 0
            begin = bounce = end = None
    return events, spins


def parse_ball_keypoints(keypoints_df) -> Dict[int, Tuple[float, float]]:
    """frame -> (x, y) for annotated (flag == 2) ball keypoints (ref: :73-77)."""
    out = {}
    for frame, x, y, flag in zip(
        keypoints_df["frame"],
        keypoints_df["ball_x"],
        keypoints_df["ball_y"],
        keypoints_df["ball_flag"],
    ):
        if int(flag) == 2:
            out[int(frame)] = (float(x), float(y))
    return out


def parse_table_keypoints(keypoints_df, begin: int, end: int) -> Dict[int, list]:
    """{point index: [(x, y), ...]} over the event's frames (ref: :80-90)."""
    out: Dict[int, list] = {}
    frames = np.asarray(keypoints_df["frame"])
    sel = np.nonzero((frames >= begin) & (frames <= end))[0]
    for i in sel:
        for p in range(1, NUM_TABLE_POINTS + 1):
            if int(keypoints_df[f"{p:02}_flag"].iloc[i]) == 2:
                out.setdefault(p, []).append(
                    (float(keypoints_df[f"{p:02}_x"].iloc[i]), float(keypoints_df[f"{p:02}_y"].iloc[i]))
                )
    return out


def regress_event_camera(table_annotations: Dict[int, list], resolution, seed: int = 0):
    """(Mint, Mext, n_inliers) from multi-frame table observations."""
    import jax
    import jax.numpy as jnp

    from upliftingtabletennis_tpu.core.calibration import calibrate_camera

    pts = np.full((NUM_TABLE_POINTS, 2), -1.0, np.float32)
    vis = np.zeros((NUM_TABLE_POINTS,), np.float32)
    for p, obs in table_annotations.items():
        pts[p - 1] = np.median(np.asarray(obs, np.float64), axis=0)
        vis[p - 1] = 1.0
    if vis.sum() < 6:  # reference asserts >= 6 points (ref: :199-206)
        raise ValueError(f"only {int(vis.sum())} visible table keypoints, need >= 6")
    Mint, Mext, n = calibrate_camera(
        jnp.asarray(pts), jnp.asarray(vis), tuple(resolution), jax.random.PRNGKey(seed), True
    )
    return np.asarray(Mint), np.asarray(Mext), int(n)


def transform_annotations(data_path: str, paths=("01", "02", "03", "04", "05", "06"),
                          resolution=DEFAULT_RESOLUTION):
    """Raw CSVs -> per-event arrays (ref: transform_annotations, :28-132).

    Returns (r_imgs, timestamps, Mints, Mexts, bounces, spin_classes,
    vids_and_frames)."""
    import pandas as pd

    events_all, spins_all = [], []
    ball_lists, table_lists, video_list = [], [], []
    for path in paths:
        kp_csv = os.path.join(data_path, f"{path}_keypoints.csv")
        ev_csv = os.path.join(data_path, f"{path}_events.csv")
        if not (os.path.exists(kp_csv) and os.path.exists(ev_csv)):
            continue
        keypoints_df = pd.read_csv(kp_csv, sep=";", header=1)
        events_df = pd.read_csv(ev_csv, sep=";", header=1)
        events, spins = parse_events(events_df)
        ball_by_frame = parse_ball_keypoints(keypoints_df)
        for begin, bounce, end in events:
            table_lists.append(parse_table_keypoints(keypoints_df, begin, end))
            event_balls = {}
            for frame in range(begin, end + 1):
                if frame in ball_by_frame:
                    event_balls[frame] = ball_by_frame[frame]
            ball_lists.append(event_balls)
            video_list.append(path)
        events_all += events
        spins_all += spins

    # bounce time relative to the event start (ref: :103-107)
    bounces = [np.array([(b - s) / FPS]) for (s, b, _) in events_all]

    # timestamps skip missing annotated frames but keep wall time (ref: :109-125)
    timestamps, r_imgs, vids_and_frames = [], [], []
    for event_balls, video in zip(ball_lists, video_list):
        ts, xy, fr = [], [], []
        start, stop = min(event_balls), max(event_balls)
        t = 0.0
        for frame in range(start, stop + 1):
            if frame in event_balls:
                ts.append(t)
                xy.append(event_balls[frame])
                fr.append(frame)
            t += 1.0 / FPS
        timestamps.append(np.asarray(ts))
        r_imgs.append(np.asarray(xy))
        vids_and_frames.append((video, fr))

    Mints, Mexts = [], []
    for i, table_annotations in enumerate(table_lists):
        Mint, Mext, _ = regress_event_camera(table_annotations, resolution, seed=i)
        Mints.append(Mint)
        Mexts.append(Mext)

    return r_imgs, timestamps, Mints, Mexts, bounces, spins_all, vids_and_frames


def extract_images(video_path: str, frames: List[int], out_dir: str) -> bool:
    """Extract [min-1, max+1] frames as frames/NNN.png (ref: :135-155)."""
    import cv2

    os.makedirs(os.path.join(out_dir, "frames"), exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        return False
    lo, hi = min(frames), max(frames)
    for idx, frame in enumerate(range(lo - 1, hi + 2)):
        cap.set(cv2.CAP_PROP_POS_FRAMES, frame)
        ret, img = cap.read()
        if not ret:
            continue
        cv2.imwrite(os.path.join(out_dir, "frames", f"{idx:03}.png"), img)
    return True


def generate_inference_dataset(data_path: str, save_path: str,
                               paths=("01", "02", "03", "04", "05", "06"),
                               resolution=DEFAULT_RESOLUTION,
                               extract_frames: bool = True):
    """Write the trajectory_%04d layout consumed by data/ttst.py
    (ref: generate_inference_dataset, :161-177)."""
    os.makedirs(save_path, exist_ok=True)
    r_imgs, timestamps, Mints, Mexts, bounces, spin_classes, vnf = transform_annotations(
        data_path, paths, resolution
    )
    for i in range(len(r_imgs)):
        out = os.path.join(save_path, f"trajectory_{i:04}")
        os.makedirs(out, exist_ok=True)
        np.save(os.path.join(out, "r_img.npy"), r_imgs[i])
        np.save(os.path.join(out, "times.npy"), timestamps[i])
        np.save(os.path.join(out, "Mint.npy"), Mints[i])
        np.save(os.path.join(out, "Mext.npy"), Mexts[i])
        np.save(os.path.join(out, "hits.npy"), bounces[i])
        np.save(os.path.join(out, "spin_class.npy"), spin_classes[i])
        if extract_frames:
            video_path = os.path.join(data_path, f"{vnf[i][0]}.mp4")
            if os.path.exists(video_path):
                extract_images(video_path, vnf[i][1], out)
    return len(r_imgs)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_path", required=True, help="dir with <vid>_{events,keypoints}.csv")
    p.add_argument("--save_path", required=True)
    p.add_argument("--videos", nargs="*", default=["01", "02", "03", "04", "05", "06"])
    p.add_argument("--resolution", type=int, nargs=2, default=list(DEFAULT_RESOLUTION))
    p.add_argument("--no_frames", action="store_true")
    args = p.parse_args(argv)
    n = generate_inference_dataset(
        args.data_path, args.save_path, tuple(args.videos), tuple(args.resolution),
        extract_frames=not args.no_frames,
    )
    print(f"wrote {n} trajectories to {args.save_path}")


if __name__ == "__main__":
    main()
