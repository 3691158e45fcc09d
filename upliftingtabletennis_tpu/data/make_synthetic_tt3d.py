"""Generate a physics-held-out evaluation set in the TT3D on-disk layout.

The real TT3D dataset (Gossard et al.) is external and not redistributable
with the code (ref: uplifting/data.py:365-524 reader, README.md data
instructions), so environments without it can still produce 3D-position-
error evidence: simulate held-out trajectories, project them through three
TT3D-style cameras (back / side / oblique), and write the exact layout
`data/tt3d.py` + `eval/run_uplifting_eval.py --tt3d_dir` consume:

  <out>/tt3d/data/evaluation/{view}[_no_noise]/NNNN.csv   (u,v,X,Y,Z,Timestamp)
  <out>/tt3d/data/evaluation/{view}.yaml                  (rvec,tvec,f,h,w)

Coordinates follow the TT3D conventions the reader undoes: world points
premultiplied by the coordinate-change matrix, cameras stored as
rvec/tvec with Mext_reader = Rt(yaml) @ TRANS. The noisy variants add
sigma_px Gaussian detection noise to (u, v) (the dataset's published
detections are noisy; the reference evaluates both).

  python -m upliftingtabletennis_tpu.data.make_synthetic_tt3d \
      --out <root> --num 40 --seed 31
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from upliftingtabletennis_tpu.core.geometry import TABLE_HEIGHT
from upliftingtabletennis_tpu.data.tt3d import _TRANS

# (distance m, azimuth deg from +x, height m) per view — back looks down
# the table length, side across it, oblique between (Gossard et al. fig.)
VIEWS = {
    "back": (7.5, 0.0, 2.5),
    "side": (6.0, 90.0, 2.2),
    "oblique": (7.0, 45.0, 2.6),
}
FOCAL, IMG_W, IMG_H = 1900.0, 1920.0, 1080.0
EVAL_FPS = 100  # TT3D tracks are ~100 fps
NOISE_PX = 1.5


def _look_at_extrinsic(cam_pos, target):
    """Our-world Mext (4x4) looking from cam_pos at target, z-up."""
    f = target - cam_pos
    f = f / np.linalg.norm(f)
    up = np.array([0.0, 0.0, 1.0])
    r = np.cross(f, up)
    r = r / np.linalg.norm(r)
    u = np.cross(r, f)
    Mext = np.eye(4)
    Mext[0, :3], Mext[1, :3], Mext[2, :3] = r, -u, f
    Mext[:3, 3] = -Mext[:3, :3] @ cam_pos
    return Mext


def _inv_rodrigues(R):
    """Rotation matrix -> rotation vector, robust at theta ~ pi (the back
    view's camera-to-TT3D-frame rotation is a near-180deg turn)."""
    from scipy.spatial.transform import Rotation

    return Rotation.from_matrix(R).as_rotvec()


def write_synthetic_tt3d(out_root: str, num: int, seed: int = 31,
                         modes=("intermediate", "first_good")):
    import jax
    import jax.numpy as jnp

    from upliftingtabletennis_tpu.data import datagen as DG

    base = os.path.join(out_root, "tt3d", "data", "evaluation")
    os.makedirs(base, exist_ok=True)
    rng = np.random.default_rng(seed)

    # simulate once; reuse the trajectories for every view
    key = jax.random.PRNGKey(seed)
    trajs = []
    per_mode = (num + len(modes) - 1) // len(modes)
    step = 500 // EVAL_FPS
    for mode in modes:
        key, sub = jax.random.split(key)
        res = DG.generate_dataset(sub, per_mode, mode, "left_to_right")
        for k in range(len(res["positions"])):
            valid = res["frame_valid"][k]
            pos = res["positions"][k][valid][::step][:50]
            if len(pos) >= 10:
                trajs.append(pos)
    trajs = trajs[:num]

    inv_trans = np.linalg.inv(_TRANS)
    for view, (dist, az_deg, height) in VIEWS.items():
        az = np.deg2rad(az_deg)
        cam = np.array([dist * np.cos(az), dist * np.sin(az), height])
        Mext = _look_at_extrinsic(cam, np.array([0.0, 0.0, TABLE_HEIGHT]))
        Mint = np.array([[FOCAL, 0, IMG_W / 2], [0, FOCAL, IMG_H / 2], [0, 0, 1]])
        # yaml camera satisfies Mext_reader = Rt(yaml) @ TRANS == Mext
        Rt = Mext @ inv_trans
        import yaml as _yaml

        with open(os.path.join(base, f"{view}.yaml"), "w") as f:
            _yaml.safe_dump(
                {
                    "rvec": [float(v) for v in _inv_rodrigues(Rt[:3, :3])],
                    "tvec": [float(v) for v in Rt[:3, 3]],
                    "f": FOCAL, "h": IMG_H, "w": IMG_W,
                },
                f,
            )
        for noise in (True, False):
            d = os.path.join(base, view if noise else f"{view}_no_noise")
            os.makedirs(d, exist_ok=True)
            for i, pos in enumerate(trajs):
                ch = (Mext @ np.concatenate([pos, np.ones((len(pos), 1))], -1).T).T
                uv = (Mint @ (ch[:, :3] / ch[:, 3:4]).T).T
                uv = uv[:, :2] / uv[:, 2:3]
                if noise:
                    uv = uv + rng.normal(0, NOISE_PX, uv.shape)
                # world coords stored in the TT3D frame (reader applies inv)
                xyz = (_TRANS @ np.concatenate([pos, np.ones((len(pos), 1))], -1).T).T[:, :3]
                times = np.arange(len(pos)) / EVAL_FPS
                rows = ["u,v,X,Y,Z,Timestamp"] + [
                    f"{uv[t,0]:.3f},{uv[t,1]:.3f},{xyz[t,0]:.6f},{xyz[t,1]:.6f},"
                    f"{xyz[t,2]:.6f},{times[t]:.6f}"
                    for t in range(len(pos))
                ]
                with open(os.path.join(d, f"{i:04d}.csv"), "w") as f:
                    f.write("\n".join(rows))
    return len(trajs)


def _ensure(path):
    os.makedirs(path, exist_ok=True)
    return path


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--num", type=int, default=40)
    p.add_argument("--seed", type=int, default=31)
    args = p.parse_args(argv)
    n = write_synthetic_tt3d(args.out, args.num, args.seed)
    print(f"wrote {n} trajectories x 3 views x 2 noise variants under "
          f"{os.path.join(args.out, 'tt3d')}")


if __name__ == "__main__":
    main()
