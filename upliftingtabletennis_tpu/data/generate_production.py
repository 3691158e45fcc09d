"""Production synthetic-dataset generation: the reference's full recipe.

Generates the paper's 140k-trajectory training corpus (ref: README.md:94-105):

  intermediate 50k x {left_to_right, right_to_left}
  first_good    5k x 2    first_short 2.5k x 2    first_long 2.5k x 2
  final_win     5k x 2    final_lose   5k x 2

scaled by --scale, writing one stacked .npz TrajectoryStore per
(mode, direction) shard (data/synthetic.save_store_npz). The reference
needs "several days" at 96 CPU processes for this corpus
(ref: README.md:94-110); the vmapped implicit-Euler engine generates
batched candidates and mask-filters them on device (data/datagen.py).

  python -m upliftingtabletennis_tpu.data.generate_production \
      --out <root> --scale 1.0 --seed 7
"""
from __future__ import annotations

import argparse
import os
import time

# (mode, per-direction count) — ref README.md:94-105
RECIPE = (
    ("intermediate", 50_000),
    ("first_good", 5_000),
    ("first_short", 2_500),
    ("first_long", 2_500),
    ("final_win", 5_000),
    ("final_lose", 5_000),
)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--scale", type=float, default=1.0,
                   help="multiply every recipe count (1.0 = the paper's 140k)")
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--modes", type=str, default=None,
                   help="comma-separated subset of modes (default: all)")
    p.add_argument("--max_seconds_per_shard", type=float, default=0.0,
                   help="> 0: cap each capped-mode shard's generation time "
                        "(post-compile) and keep whatever was accepted")
    p.add_argument("--capped_modes", type=str, default="final_win",
                   help="comma-separated modes the time cap applies to "
                        "(final_win acceptance is ~0.2%% even in the "
                        "reference MuJoCo engine)")
    p.add_argument("--dp", action="store_true",
                   help="shard each candidate batch over all visible devices "
                        "('dp' mesh axis; every chip simulates --batch "
                        "candidates per iteration from its own key)")
    args = p.parse_args(argv)

    import jax

    from upliftingtabletennis_tpu.data import datagen as DG
    from upliftingtabletennis_tpu.data import synthetic as SYN

    mesh = None
    if args.dp and len(jax.devices()) > 1:
        from upliftingtabletennis_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        print(f"[mesh] datagen sharded over {mesh.shape['dp']} devices", flush=True)

    only = set(args.modes.split(",")) if args.modes else None
    key = jax.random.PRNGKey(args.seed)
    total = 0
    t_start = time.perf_counter()
    for mode, n_ref in RECIPE:
        if only and mode not in only:
            continue
        n = max(int(round(n_ref * args.scale)), 1)
        for direction in DG.DIRECTIONS:
            out = os.path.join(args.out, mode, f"{direction}.npz")
            if os.path.exists(out):
                print(f"[skip] {out} exists", flush=True)
                continue
            key, sub = jax.random.split(key)
            t0 = time.perf_counter()
            cap = (args.max_seconds_per_shard
                   if mode in args.capped_modes.split(",") else 0.0)
            res = DG.generate_dataset(sub, n, mode, direction, batch=args.batch,
                                      max_seconds=cap, mesh=mesh)
            store = SYN.store_from_datagen(res)
            SYN.save_store_npz(out, store)
            dt = time.perf_counter() - t0
            got = len(store)
            total += got
            print(f"[done] {mode}/{direction}: {got}/{n} trajectories in {dt:.1f}s "
                  f"({got / dt:.0f} traj/s)", flush=True)
    print(f"[total] {total} trajectories in {time.perf_counter() - t_start:.1f}s")


if __name__ == "__main__":
    main()
