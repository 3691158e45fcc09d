"""Offline probe: what calibration reproj error SHOULD the closed loop reach?

The round-5 closed loop measures calib_reproj_px median 1.90 over visible
detected keypoints, while the per-keypoint detection error is ~0.94-1.79 px
mean. This probe isolates the calibration stage: sample closed-loop-style
cameras, project the 13 table keypoints, perturb them with the MEASURED
per-keypoint noise magnitudes, run `core.calibration.calibrate_camera`
(the exact pipeline path, use_ransac=True), and report

  * reproj-vs-detections (the closed-loop metric),
  * reproj-vs-TRUTH (what the camera is actually worth downstream),

for the shipped settings and for candidate tweaks (more LM iters, final
all-visible IRLS refit). Pure CPU; lets us attribute the 1.90 px before
spending chip time on a re-eval.
"""
from __future__ import annotations

import argparse
import json

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=64)
    p.add_argument("--seed", type=int, default=3)
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from upliftingtabletennis_tpu.core import calibration as C
    from upliftingtabletennis_tpu.core import geometry as G
    from upliftingtabletennis_tpu.data import synthetic as SYN

    # measured per-keypoint mean radial error (closed_loop_results.json r5);
    # Rayleigh mean = sigma * sqrt(pi/2) -> per-axis sigma
    kp_mean_px = np.array(
        [1.07, 0.96, 1.34, 1.34, 1.10, 0.95, 1.06, 1.51, 1.43, 1.79, 0.94, 1.08, 1.19]
    )
    kp_sigma = kp_mean_px / np.sqrt(np.pi / 2.0)

    W, H = 1920, 1080
    pts3d = jnp.asarray(G.TABLE_POINTS, jnp.float32)

    calib = jax.jit(
        lambda p2, vis, key: C.calibrate_camera(p2, vis, (W, H), key, True)
    )

    def final_refit(p2, vis, Mint, Mext, iters):
        # refit on ALL visible points whose residual under the RANSAC camera
        # is < 2*INLIER_THRESHOLD (recovers near-threshold points the
        # 6-point hypothesis refit excluded)
        proj = np.asarray(G.world2img(pts3d, Mext, Mint))
        err = np.linalg.norm(proj - np.asarray(p2), axis=-1)
        w = ((err < 2 * C.INLIER_THRESHOLD) & (np.asarray(vis) > 0)).astype(np.float32)
        Mi, Me, _ = C.refine_camera(
            pts3d, jnp.asarray(p2), jnp.asarray(w), (W, H),
            (jnp.asarray(Mint), jnp.asarray(Mext)), "l1", iters
        )
        return np.asarray(Mi), np.asarray(Me)

    rng = np.random.default_rng(args.seed)
    rows = []
    for i in range(args.n):
        key = jax.random.PRNGKey(20_000 + i)
        Mint_gt, Mext_gt = SYN.sample_cameras(key, ())
        proj_gt = np.asarray(G.world2img(pts3d, Mext_gt, Mint_gt))
        # rescale from the sampler's frame (2560x1440) to eval 1920x1080
        scale = np.array([W / 2560.0, H / 1440.0])
        proj_gt = proj_gt * scale
        vis = ((proj_gt[:, 0] >= 0) & (proj_gt[:, 0] < W)
               & (proj_gt[:, 1] >= 0) & (proj_gt[:, 1] < H)).astype(np.float32)
        if vis.sum() < 8:
            continue
        det = proj_gt + rng.normal(size=proj_gt.shape) * kp_sigma[:, None]

        Mi, Me, n_in = calib(jnp.asarray(det, jnp.float32), jnp.asarray(vis), key)
        Mi, Me = np.asarray(Mi), np.asarray(Me)

        def score(Mi_, Me_):
            proj = np.asarray(
                G.world2img(pts3d, jnp.asarray(Me_, jnp.float32), jnp.asarray(Mi_, jnp.float32))
            )
            m = vis > 0
            return (
                float(np.mean(np.linalg.norm((proj - det)[m], axis=-1))),
                float(np.mean(np.linalg.norm((proj - proj_gt)[m], axis=-1))),
            )

        r_det, r_gt = score(Mi, Me)
        Mi2, Me2 = final_refit(det, vis, Mi, Me, 40)
        r2_det, r2_gt = score(Mi2, Me2)
        rows.append({
            "n_vis": float(vis.sum()), "n_inliers": int(n_in),
            "shipped_vs_det": r_det, "shipped_vs_gt": r_gt,
            "refit_vs_det": r2_det, "refit_vs_gt": r2_gt,
        })

    def med(k):
        return float(np.median([r[k] for r in rows]))

    summary = {
        "n": len(rows),
        "n_inliers_mean": float(np.mean([r["n_inliers"] for r in rows])),
        "shipped_vs_det_median": med("shipped_vs_det"),
        "shipped_vs_gt_median": med("shipped_vs_gt"),
        "refit_vs_det_median": med("refit_vs_det"),
        "refit_vs_gt_median": med("refit_vs_gt"),
    }
    print(json.dumps(summary, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"summary": summary, "rows": rows}, f, indent=2)


if __name__ == "__main__":
    main()
