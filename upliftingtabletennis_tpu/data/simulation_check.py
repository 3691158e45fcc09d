"""Dataset sanity checks + trajectory visualization.

TPU-native equivalents of the reference's syntheticdataset QA tooling
(ref: syntheticdataset/check.py — deterministic re-simulation;
syntheticdataset/visualize_trajectories.py — 3D trajectory plots). The
reference's check.py is bit-rotted (imports stale names, SURVEY §2.6); this
one is tested.

  python -m upliftingtabletennis_tpu.data.simulation_check --data_dir <dir>
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def resimulate_check(data_dir: str, n_check: int = 5, atol: float = 1e-4) -> bool:
    """Re-simulate stored trajectories from their first frame's state and
    compare: the integrator must be deterministic and the stored data
    self-consistent (ref intent: syntheticdataset/check.py)."""
    import jax.numpy as jnp

    from upliftingtabletennis_tpu.core import physics as P

    dirs = sorted(d for d in os.listdir(data_dir) if d.startswith("trajectory_"))[:n_check]
    ok = True
    for d in dirs:
        p = os.path.join(data_dir, d)
        pos = np.load(os.path.join(p, "positions.npy"))
        vel = np.load(os.path.join(p, "velocities.npy"))
        rot = np.load(os.path.join(p, "rotations.npy"))
        state0 = P.BallState(
            jnp.asarray(pos[0], jnp.float32),
            jnp.asarray(vel[0], jnp.float32),
            jnp.asarray(rot[0], jnp.float32),
        )
        n = len(pos)
        # stored frame k corresponds to 1 + k*substeps integrator steps from
        # the INITIAL state; reconstruct by stepping from frame 0's state:
        # frame 0 already includes the initial kick, so advance substeps per
        # frame without the extra initial step.
        traj = [np.asarray(state0.r)]
        state = state0
        for _ in range(n - 1):
            for _ in range(2):
                state = P.step(state)
            traj.append(np.asarray(state.r))
        err = np.abs(np.stack(traj) - pos).max()
        if err > atol:
            print(f"[check] {d}: max resimulation error {err:.2e} > {atol:.0e}")
            ok = False
    return ok


def plot_trajectories_3d(positions_list, save_path=None):
    """3D trajectory plot with the table wireframe
    (ref: syntheticdataset/visualize_trajectories.py)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from upliftingtabletennis_tpu.core.geometry import TABLE_CONNECTIONS, TABLE_POINTS

    fig = plt.figure(figsize=(8, 6))
    ax = fig.add_subplot(projection="3d")
    for a, b in TABLE_CONNECTIONS:
        pa, pb = TABLE_POINTS[a], TABLE_POINTS[b]
        ax.plot([pa[0], pb[0]], [pa[1], pb[1]], [pa[2], pb[2]], "k-", lw=1)
    for pos in positions_list:
        pos = np.asarray(pos)
        ax.plot(pos[:, 0], pos[:, 1], pos[:, 2], lw=1.5)
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.set_zlabel("z [m]")
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
        return save_path
    return fig


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", required=True)
    p.add_argument("--n_check", type=int, default=5)
    p.add_argument("--plot", type=str, default=None, help="save a 3D plot to this path")
    args = p.parse_args(argv)
    ok = resimulate_check(args.data_dir, args.n_check)
    print("[check] deterministic re-simulation:", "OK" if ok else "FAILED")
    if args.plot:
        dirs = sorted(
            d for d in os.listdir(args.data_dir) if d.startswith("trajectory_")
        )[:8]
        ps = [np.load(os.path.join(args.data_dir, d, "positions.npy")) for d in dirs]
        plot_trajectories_3d(ps, args.plot)
        print(f"[check] plot saved to {args.plot}")


if __name__ == "__main__":
    main()
