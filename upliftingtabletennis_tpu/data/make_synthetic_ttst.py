"""Generate a physics-held-out evaluation set in the TTST on-disk layout.

The real TTST videos/annotations are not redistributable with the code
(ref: README.md data instructions), so environments without the dataset can
still produce ACCURACY evidence: simulate held-out trajectories with the
calibrated physics engine, project them through the simulation camera
(rescaled to the 2560x1440 TTST working resolution), and write the exact
layout data/ttst.py + eval/run_uplifting_eval.py consume
(`trajectory_%04d/{r_img, times, Mint, Mext, hits, spin_class}.npy`,
ref: dataprocessing/extract_ttst_data.py:161-177).

  python -m upliftingtabletennis_tpu.data.make_synthetic_ttst \
      --out <root> --num 300 --seed 777
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def write_synthetic_ttst(out_root: str, num: int, seed: int = 777, fps: int = 50,
                         modes=("intermediate", "first_good", "first_long")):
    import jax
    import jax.numpy as jnp

    from upliftingtabletennis_tpu.core import geometry as G
    from upliftingtabletennis_tpu.data import datagen as DG

    path = os.path.join(out_root, "ttst")
    os.makedirs(path, exist_ok=True)
    Mext, Mint_sim = (np.asarray(a) for a in DG.sim_camera())
    Mint = np.asarray(
        G.rescale_intrinsics(jnp.asarray(Mint_sim), (1920, 1080), (G.WIDTH, G.HEIGHT))
    )
    key = jax.random.PRNGKey(seed)
    step = 500 // fps
    i = 0
    per_mode = (num + len(modes) - 1) // len(modes)
    for mode in modes:
        key, sub = jax.random.split(key)
        res = DG.generate_dataset(sub, per_mode, mode, "left_to_right")
        for k in range(len(res["positions"])):
            if i >= num:
                break
            valid = res["frame_valid"][k]
            pos = res["positions"][k][valid][::step][:50]
            if len(pos) < 8:
                continue
            times = np.arange(len(pos)) / fps
            r_img = np.asarray(
                G.world2img(jnp.asarray(pos), jnp.asarray(Mext), jnp.asarray(Mint))
            )
            w_local = np.asarray(
                G.transform_rotation_axes(
                    jnp.asarray(res["rotations"][k][0]), jnp.asarray(pos)
                )
            )
            d = os.path.join(path, f"trajectory_{i:04d}")
            os.makedirs(d, exist_ok=True)
            np.save(os.path.join(d, "r_img.npy"), r_img)
            np.save(os.path.join(d, "times.npy"), times)
            np.save(os.path.join(d, "hits.npy"), res["bounces"][k][: res["n_bounces"][k]])
            np.save(os.path.join(d, "Mint.npy"), Mint)
            np.save(os.path.join(d, "Mext.npy"), Mext)
            np.save(os.path.join(d, "spin_class.npy"),
                    np.array(1.0 if w_local[1] > 0 else 2.0))
            i += 1
    return i


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--num", type=int, default=300)
    p.add_argument("--seed", type=int, default=777)
    args = p.parse_args(argv)
    n = write_synthetic_ttst(args.out, args.num, args.seed)
    print(f"wrote {n} trajectories to {os.path.join(args.out, 'ttst')}")


if __name__ == "__main__":
    main()
