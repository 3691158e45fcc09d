"""TT3D (Gossard et al.) external evaluation dataset reader.

Layout (ref: TT3DDataset, uplifting/data.py:365-524): per-view directories
`<base>/tt3d/data/evaluation/{back,side,oblique}[_no_noise]/*.csv` with
columns u, v, X, Y, Z, Timestamp, plus one `<view>.yaml` camera file with
rvec/tvec/f/h/w.

Conventions preserved:
* Rodrigues rotation of rvec; extrinsic right-multiplied by the coordinate-
  system change matrix [[0,-1,0,0],[1,0,0,0],[0,0,1,-TABLE_HEIGHT],[0,0,0,1]]
  (ref: data.py:423-434); world points mapped with its inverse.
* image coords normalized by the camera's (w, h) — NOT the working
  resolution (ref: data.py:450-454).
* framerate from mean delta t; first bounce from the run-length hit
  detector; padding to 50 + mask.
"""
from __future__ import annotations

import glob
import os
from typing import NamedTuple

import numpy as np

from upliftingtabletennis_tpu.core.geometry import (
    TABLE_HEIGHT,
    TABLE_LENGTH,
    TABLE_WIDTH,
    TABLE_POINTS,
)

SEQUENCE_LEN = 50


class TT3DBatch(NamedTuple):
    r_img: np.ndarray       # (N, 50, 2) normalized by (w, h)
    table_img: np.ndarray   # (N, 13, 3) normalized + visibility
    mask: np.ndarray        # (N, 50)
    r_world: np.ndarray     # (N, 50, 3)
    times: np.ndarray       # (N, 50)
    hits: np.ndarray        # (N, 1) first bounce time or -1
    Mint: np.ndarray        # (N, 3, 3)
    Mext: np.ndarray        # (N, 4, 4)
    framerate: np.ndarray   # (N,)

    def __len__(self):
        return self.r_img.shape[0]


def _rodrigues(rvec):
    theta = np.linalg.norm(rvec)
    if theta < 1e-12:
        return np.eye(3)
    k = rvec / theta
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


_TRANS = np.array(
    [[0, -1, 0, 0], [1, 0, 0, 0], [0, 0, 1, -TABLE_HEIGHT], [0, 0, 0, 1]], np.float64
)


def _count_first_hit(r_world, direction, fps):
    """First table-bounce time via the reference run-length logic
    (ref: data.py:482-524). Returns -1 if none."""
    x, y, z = r_world[:, 0], r_world[:, 1], r_world[:, 2]
    if direction == "left_to_right":
        opp = (-0.01 > x) & (x > -TABLE_LENGTH / 2)
        own = (TABLE_LENGTH / 2 > x) & (x > 0.01)
    else:
        opp = (TABLE_LENGTH / 2 > x) & (x > 0.01)
        own = (-0.01 > x) & (x > -TABLE_LENGTH / 2)
    low = z < TABLE_HEIGHT + 0.04
    ony = np.abs(y) < TABLE_WIDTH / 2
    hits = []
    for m in (low & ony & opp, low & ony & own):
        start = None
        for i, b in enumerate(m):
            if b and (i == 0 or not m[i - 1]):
                start = i
            if not b and i != 0 and m[i - 1]:
                end = i - 1
                hits.append(
                    0.75 * (end + start) / 2 / fps
                    + 0.25 * (np.argmin(z[start : end + 1]) + start) / fps
                )
    return min(hits) if hits else -1.0


def load_tt3d(base_dir: str, view: str = "back", noise: bool = True) -> TT3DBatch:
    assert view in ("back", "side", "oblique")
    import yaml

    folder = view if noise else f"{view}_no_noise"
    data_dir = os.path.join(base_dir, "tt3d", "data", "evaluation", folder)
    files = sorted(glob.glob(os.path.join(data_dir, "*.csv")))
    if not files:
        raise FileNotFoundError(f"no CSVs in {data_dir}")
    with open(os.path.join(base_dir, "tt3d", "data", "evaluation", f"{view}.yaml")) as f:
        cam = yaml.safe_load(f)
    rvec = np.asarray(cam["rvec"], np.float64).ravel()
    tvec = np.asarray(cam["tvec"], np.float64).ravel()
    fcl, h, w = float(cam["f"]), float(cam["h"]), float(cam["w"])

    Mint = np.array([[fcl, 0, w / 2], [0, fcl, h / 2], [0, 0, 1]])
    Mext = np.eye(4)
    Mext[:3, :3] = _rodrigues(rvec)
    Mext[:3, 3] = tvec
    Mext = Mext @ _TRANS

    # project table points with the composed camera
    tp = np.concatenate([TABLE_POINTS, np.ones((13, 1))], -1)
    cam_pts = (Mext @ tp.T).T
    img_pts = (Mint @ (cam_pts[:, :3] / cam_pts[:, 3:4]).T).T
    table_img = img_pts[:, :2] / img_pts[:, 2:3]
    table_img = np.concatenate(
        [table_img / np.array([w, h]), np.ones((13, 1))], -1
    ).astype(np.float32)

    N = len(files)
    out = TT3DBatch(
        np.zeros((N, SEQUENCE_LEN, 2), np.float32),
        np.broadcast_to(table_img, (N, 13, 3)).copy(),
        np.zeros((N, SEQUENCE_LEN), np.float32),
        np.zeros((N, SEQUENCE_LEN, 3), np.float32),
        np.zeros((N, SEQUENCE_LEN), np.float32),
        np.full((N, 1), -1.0, np.float32),
        np.broadcast_to(Mint.astype(np.float32), (N, 3, 3)).copy(),
        np.broadcast_to(Mext.astype(np.float32), (N, 4, 4)).copy(),
        np.zeros((N,), np.float32),
    )
    import pandas as pd

    inv_trans = np.linalg.inv(_TRANS)
    for i, path in enumerate(files):
        df = pd.read_csv(path)
        r_img = df[["u", "v"]].values
        r_world = df[["X", "Y", "Z"]].values
        times = df["Timestamp"].values
        T = min(len(r_img), SEQUENCE_LEN)
        # world coords into our coordinate system (ref: data.py:440)
        rw = np.concatenate([r_world, np.ones((len(r_world), 1))], -1)
        rw = (inv_trans @ rw.T).T[:, :3]
        out.r_img[i, :T] = r_img[:T] / np.array([w, h])
        out.r_world[i, :T] = rw[:T]
        out.times[i, :T] = times[:T]
        out.mask[i, :T] = 1.0
        dt = np.diff(times[:T])
        fps = 1.0 / np.mean(dt) if len(dt) and np.mean(dt) > 0 else 0.0
        out.framerate[i] = fps
        direction = "left_to_right" if rw[0, 0] < 0 else "right_to_left"
        out.hits[i, 0] = _count_first_hit(rw[:T], direction, fps)
    return out
