"""TTST real-video evaluation dataset reader.

Layout per trajectory dir (ref: RealInferenceDataset, uplifting/data.py:250-336):
  r_img.npy (T, 2) 2D ball detections at 2560x1440 working resolution
  times.npy (T,), hits.npy (K,), Mint.npy (3, 3), Mext.npy (4, 4),
  spin_class.npy () in {0: unannotated, 1: topspin, 2: backspin}

val = first 33% of sorted trajectory dirs, test = rest (ref: data.py:264-267).
Sequences are padded/cropped to 50 with a mask; coordinates are normalized
by (WIDTH, HEIGHT) downstream (augment.eval_augment).
"""
from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np

from upliftingtabletennis_tpu.core.geometry import (
    TABLE_POINTS,
    world2img,
)

BACKSPIN_CLASS = 2
TOPSPIN_CLASS = 1
NOT_ANNOTATED_CLASS = 0

SEQUENCE_LEN = 50


class TTSTBatch(NamedTuple):
    r_img: np.ndarray       # (N, 50, 2) px
    table_img: np.ndarray   # (N, 13, 3) px + visibility
    mask: np.ndarray        # (N, 50)
    times: np.ndarray       # (N, 50)
    hits: np.ndarray        # (N, 1)
    Mint: np.ndarray        # (N, 3, 3)
    Mext: np.ndarray        # (N, 4, 4)
    spin_class: np.ndarray  # (N,)

    def __len__(self):
        return self.r_img.shape[0]


def load_ttst(path: str, mode: str = "val") -> TTSTBatch:
    """Load and pad the TTST layout. mode in {'val', 'test', 'all'}."""
    import jax.numpy as jnp

    dirs = sorted(d for d in os.listdir(path) if d.startswith("trajectory_"))
    if mode == "val":
        dirs = dirs[: int(0.33 * len(dirs))]
    elif mode == "test":
        dirs = dirs[int(0.33 * len(dirs)) :]
    elif mode != "all":
        raise ValueError(mode)

    N = len(dirs)
    out = TTSTBatch(
        np.zeros((N, SEQUENCE_LEN, 2), np.float32),
        np.zeros((N, 13, 3), np.float32),
        np.zeros((N, SEQUENCE_LEN), np.float32),
        np.zeros((N, SEQUENCE_LEN), np.float32),
        np.full((N, 1), -1.0, np.float32),
        np.zeros((N, 3, 3), np.float32),
        np.zeros((N, 4, 4), np.float32),
        np.zeros((N,), np.float32),
    )
    for i, d in enumerate(dirs):
        p = os.path.join(path, d)
        r_img = np.load(os.path.join(p, "r_img.npy"))
        times = np.load(os.path.join(p, "times.npy"))
        hits = np.load(os.path.join(p, "hits.npy"))
        Mint = np.load(os.path.join(p, "Mint.npy"))
        Mext = np.load(os.path.join(p, "Mext.npy"))
        spin = np.load(os.path.join(p, "spin_class.npy"))
        T = min(len(r_img), SEQUENCE_LEN)
        out.r_img[i, :T] = r_img[:T]
        out.times[i, :T] = times[:T]
        out.mask[i, :T] = 1.0
        if len(hits):
            out.hits[i, 0] = hits[0]
        out.Mint[i] = Mint[:3, :3]
        out.Mext[i] = Mext
        out.spin_class[i] = float(spin)
        table = np.asarray(
            world2img(jnp.asarray(TABLE_POINTS), jnp.asarray(Mext), jnp.asarray(Mint[:3, :3]))
        )
        out.table_img[i] = np.concatenate([table, np.ones((13, 1))], -1)
    return out
