"""TTHQ rally (trajectory) dataset for full-pipeline evaluation.

Rebuilds the reference's inference-time trajectory dataset
(ref: inference/dataset.py:14-150): test rallies from the TTHQ val/test
videos (1, 3, 10) selected by

  usable AND status != 'last' AND no annotated ball/table frame inside
  AND all triplet frames extracted on disk,

yielding per rally the frame index triples, fps and the annotated spin
class. Frames load lazily (the reference loads whole rallies into memory;
a broadcast rally at 1920x1080x3 easily exceeds RAM when batched).

Also provides `dataset_statistics` — frame/trajectory counts across
datasets (ref: inference/calc_statistics.py).
"""
from __future__ import annotations

import os
from typing import List, NamedTuple, Tuple

import numpy as np

VAL_TEST_VIDS = (1, 3, 10)


class Rally(NamedTuple):
    video: int
    fps: float
    spin_class: int
    frames: List[Tuple[int, int, int]]  # (frame, prev, next)


def _frame_exists(data_path, video, frame):
    return os.path.exists(
        os.path.join(data_path, f"{video:02d}", f"{video:02d}_{frame:06d}.png")
    )


def load_tthq_rallies(root: str) -> List[Rally]:
    import pandas as pd

    data_path = os.path.join(root, "tthq")
    ball = pd.read_csv(os.path.join(data_path, "ball_detection.csv"), sep=";")
    table = pd.read_csv(os.path.join(data_path, "table_detection.csv"), sep=";")
    traj = pd.read_csv(os.path.join(data_path, "trajectories.csv"), sep=";")

    # column-name tolerance: our writer uses start/end, the reference's
    # uses start_frame/end_frame
    s_col = "start_frame" if "start_frame" in traj.columns else "start"
    e_col = "end_frame" if "end_frame" in traj.columns else "end"

    annotated = {
        v: set(ball[ball["video"] == v]["frame"]) | set(table[table["video"] == v]["frame"])
        for v in VAL_TEST_VIDS
    }

    rallies = []
    for _, row in traj.iterrows():
        v = int(row["video"])
        if v not in VAL_TEST_VIDS:
            continue
        usable = row["usable"] in (True, "True", 1)
        if not usable or str(row["status"]) == "last":
            continue
        s, e = int(float(row[s_col])), int(float(row[e_col]))
        if any(f in annotated[v] for f in range(s, e + 1)):
            continue  # rallies overlapping annotated frames are excluded
        triples = []
        ok = True
        for f in range(s + 1, e):
            if not all(_frame_exists(data_path, v, g) for g in (f, f - 1, f + 1)):
                ok = False
                break
            triples.append((f, f - 1, f + 1))
        if ok and triples:
            rallies.append(Rally(v, float(row["fps"]), int(row["spin_class"]), triples))
    return rallies


def load_rally_frames(root: str, rally: Rally):
    """RGB frames of a rally: list of (H, W, 3) float32 arrays in frame order
    spanning [start, end] (prev of first .. next of last)."""
    from upliftingtabletennis_tpu.data.detection import load_frame

    data_path = root
    first = rally.frames[0][1]
    last = rally.frames[-1][2]
    return [load_frame(data_path, rally.video, f) for f in range(first, last + 1)]


def dataset_statistics(root: str) -> dict:
    """Frame/trajectory counts across the available dataset layouts
    (ref: inference/calc_statistics.py)."""
    import pandas as pd

    out = {}
    tthq = os.path.join(root, "tthq")
    if os.path.isdir(tthq):
        for csv, key in (("ball_detection.csv", "tthq_ball_frames"),
                         ("table_detection.csv", "tthq_table_frames"),
                         ("trajectories.csv", "tthq_trajectories")):
            path = os.path.join(tthq, csv)
            if os.path.exists(path):
                out[key] = len(pd.read_csv(path, sep=";"))
        try:
            out["tthq_test_rallies"] = len(load_tthq_rallies(root))
        except Exception:
            pass
    ttst = os.path.join(root, "ttst")
    if os.path.isdir(ttst):
        out["ttst_trajectories"] = len(
            [d for d in os.listdir(ttst) if d.startswith("trajectory_")]
        )
    synth = os.path.join(root, "syntheticdata")
    if os.path.isdir(synth):
        n = 0
        for mode in os.listdir(synth):
            for direction in os.listdir(os.path.join(synth, mode)):
                n += len(
                    [d for d in os.listdir(os.path.join(synth, mode, direction))
                     if d.startswith("trajectory_")]
                )
        out["synthetic_trajectories"] = n
    return out
