"""Full-pipeline evaluation: detect -> filter -> uplift -> calibrate.

Equivalent of `python -m inference.inference_combined`
(ref: inference/inference_combined.py:65-175 TTHQ protocol): per rally,
run both ball detectors + agreement filter, both table detectors + DBSCAN
fusion, the uplifting model, and RANSAC camera calibration from the fused
keypoints; report

  * table keypoint reprojection error (calibrated camera vs detections),
  * ball reprojection error (predicted 3D reprojected vs detected 2D),
  * spin accuracy / macro-F1 vs annotated classes.

Rallies stream from a directory of per-trajectory frame folders:
  <root>/trajectory_XXXX/{frame_000000.png, ...} + meta.json
    {"fps": 50, "spin_class": 1}
(the reference reads its TTHQ trajectory CSV layout; the adapter in
data/detection.py covers that when the dataset is present).
"""
from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def evaluate_rally(pipeline, frames, fps):
    """One rally through the full pipeline; returns raw pieces for metrics."""
    import jax.numpy as jnp

    from upliftingtabletennis_tpu.core.geometry import world2img
    from upliftingtabletennis_tpu.pipeline import filters as F
    from upliftingtabletennis_tpu.pipeline.interface import WIDTH, HEIGHT

    triples = [(frames[i - 1], frames[i], frames[i + 1]) for i in range(1, len(frames) - 1)]
    ball_main, _ = pipeline.ball_detector.predict(triples)
    ball_aux, _ = pipeline.ball_detector_aux.predict(triples)
    ball, idx, times = F.filter_trajectory_ball(ball_main, ball_aux, fps)

    table_main, _ = pipeline.table_detector.predict(frames)
    table_aux, _ = pipeline.table_detector_aux.predict(frames)
    table = F.filter_trajectory_table(table_main, table_aux)

    spin = pos3d = None
    if len(ball) >= 2:
        b, t, tt, mask = F.uplifting_inputs(ball, table, times, WIDTH, HEIGHT)
        spin, pos3d = pipeline.uplifting_model.predict_without_normalization(b, t, mask, tt)

    Mint = Mext = None
    ball_reproj_err = table_reproj_err = np.nan
    n_visible = int((table[:, 2] == 1).sum())
    if n_visible >= 6:
        Mint, Mext, _ = pipeline.calibrate_camera(table)
        from upliftingtabletennis_tpu.core.geometry import TABLE_POINTS

        proj_table = np.asarray(
            world2img(jnp.asarray(TABLE_POINTS), jnp.asarray(Mext, jnp.float32), jnp.asarray(Mint, jnp.float32))
        )
        vis = table[:, 2] == 1
        table_reproj_err = float(
            np.linalg.norm(proj_table[vis] - table[vis, :2], axis=1).mean()
        )
        if pos3d is not None and len(pos3d):
            proj_ball = np.asarray(
                world2img(jnp.asarray(pos3d, jnp.float32), jnp.asarray(Mext, jnp.float32), jnp.asarray(Mint, jnp.float32))
            )
            n = min(len(proj_ball), len(ball))
            ball_reproj_err = float(np.linalg.norm(proj_ball[:n] - ball[:n], axis=1).mean())

    return {
        "spin": spin,
        "pos3d": pos3d,
        "n_ball": len(ball),
        "table_reproj_px": table_reproj_err,
        "ball_reproj_px": ball_reproj_err,
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", required=True)
    p.add_argument("--checkpoints", type=str, default=None, help="json dict of checkpoint paths")
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args(argv)

    import cv2

    from upliftingtabletennis_tpu.pipeline import TableTennisPipeline

    ck = json.loads(args.checkpoints) if args.checkpoints else None
    pipeline = TableTennisPipeline(ck)

    traj_dirs = sorted(glob.glob(os.path.join(args.data_root, "trajectory_*")))
    if args.limit:
        traj_dirs = traj_dirs[: args.limit]

    tp = tn = fp = fn = 0
    table_errs, ball_errs = [], []
    for d in traj_dirs:
        meta = json.load(open(os.path.join(d, "meta.json")))
        frame_paths = sorted(glob.glob(os.path.join(d, "frame_*.png")))
        frames = [
            cv2.cvtColor(cv2.imread(f), cv2.COLOR_BGR2RGB).astype(np.float32)
            for f in frame_paths
        ]
        out = evaluate_rally(pipeline, frames, meta["fps"])
        if np.isfinite(out["table_reproj_px"]):
            table_errs.append(out["table_reproj_px"])
        if np.isfinite(out["ball_reproj_px"]):
            ball_errs.append(out["ball_reproj_px"])
        spin_class = meta.get("spin_class", 0)
        if out["spin"] is not None and spin_class in (1, 2):
            pred_top = out["spin"][1] > 0
            if spin_class == 1:
                tp += pred_top
                fn += not pred_top
            else:
                tn += not pred_top
                fp += pred_top

    total = max(tp + tn + fp + fn, 1)
    f1p = 2 * tp / max(2 * tp + fp + fn, 1)
    f1m = 2 * tn / max(2 * tn + fn + fp, 1)
    print(f"table reproj px: {np.mean(table_errs) if table_errs else float('nan'):.2f}")
    print(f"ball reproj px: {np.mean(ball_errs) if ball_errs else float('nan'):.2f}")
    print(f"spin acc: {(tp + tn) / total:.4f}  macro-F1: {(f1p + f1m) / 2:.4f}")


if __name__ == "__main__":
    main()
