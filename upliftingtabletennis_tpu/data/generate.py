"""Synthetic-dataset generation CLI (replaces syntheticdataset/mujocosimulation).

  python -m upliftingtabletennis_tpu.data.generate \
      --num_trajectories 50000 --mode intermediate --direction left_to_right \
      --folder <output root> [--batch 2048]

Writes the reference on-disk layout `<folder>/<mode>/<direction>/
trajectory_%04d/{positions,velocities,rotations,times,bounces,Mint,Mext}.npy`
(ref: mujocosimulation.py:241-248) so datasets are interchangeable between
engines. The reference needs "several days" for 125k trajectories on 96 CPU
processes (README.md:94-110); the vmapped integrator generates thousands of
candidates per device step.
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--num_trajectories", type=int, default=50000)
    p.add_argument("--folder", type=str, default="syntheticdata")
    p.add_argument("--mode", type=str, default="intermediate")
    p.add_argument("--direction", type=str, default="left_to_right")
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax

    from upliftingtabletennis_tpu.core.physics import FPS
    from upliftingtabletennis_tpu.data import datagen as DG
    from upliftingtabletennis_tpu.data.datagen import MODES, DIRECTIONS, sim_camera

    assert args.mode in MODES, f"mode must be one of {MODES}"
    assert args.direction in DIRECTIONS

    t0 = time.perf_counter()
    key = jax.random.PRNGKey(args.seed)
    res = DG.generate_dataset(key, args.num_trajectories, args.mode, args.direction, args.batch)
    dt = time.perf_counter() - t0
    n = len(res["positions"])
    print(f"[datagen] {n} valid trajectories in {dt:.1f}s ({n / dt:.1f} traj/s)")

    Mext, Mint = (np.asarray(a) for a in sim_camera())
    out = os.path.join(args.folder, args.mode, args.direction)
    os.makedirs(out, exist_ok=True)
    for i in range(n):
        d = os.path.join(out, f"trajectory_{i:04}")
        os.makedirs(d, exist_ok=True)
        valid = res["frame_valid"][i]
        T = int(valid.sum())
        np.save(os.path.join(d, "positions.npy"), res["positions"][i][:T])
        np.save(os.path.join(d, "velocities.npy"), res["velocities"][i][:T])
        np.save(os.path.join(d, "rotations.npy"), res["rotations"][i][:T])
        np.save(os.path.join(d, "times.npy"), np.arange(T) / FPS)
        nb = int(res["n_bounces"][i])
        np.save(os.path.join(d, "bounces.npy"), res["bounces"][i][:nb])
        np.save(os.path.join(d, "Mext.npy"), np.broadcast_to(Mext, (T, 4, 4)))
        np.save(os.path.join(d, "Mint.npy"), np.broadcast_to(Mint, (T, 3, 3)))
    print(f"[datagen] saved to {out}")


if __name__ == "__main__":
    main()
