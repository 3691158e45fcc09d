"""Full-pipeline evaluation: detect -> filter -> uplift -> calibrate.

Equivalent of `python -m inference.inference_combined` with both protocols:

* TTHQ (ref: inference/inference_combined.py:65-175): per rally, run both
  ball detectors + agreement filter, both table detectors + DBSCAN fusion,
  the uplifting model, and RANSAC camera calibration from the fused
  keypoints; report
    - table keypoint reprojection error (calibrated camera vs detections),
    - ball reprojection error (predicted 3D reprojected vs detected 2D),
    - spin accuracy / macro-F1 vs annotated classes.

* TTST (ref: :178-305): additionally compares against the ANNOTATIONS —
    - table keypoint error: fused detections vs annotated table points,
    - ball detection error: filtered detections vs annotated 2D ball,
    - ball uplifting error: predicted 3D reprojected through the stored
      (rescaled) camera vs annotated 2D ball.
  Everything lives at the 1920x1080 inference resolution: the stored
  2560x1440 annotations/intrinsics are rescaled exactly like the reference
  dataset does (ref: inference/dataset.py:162-172 — fx*s, (cx+0.5)*s-0.5).

* 3D visualization (ref: :310-456): Agg-rendered PNGs — a 3D plot of the
  predicted trajectory over the table wireframe, and a 2D overlay of the
  middle frame with detected keypoints, detected ball track and the
  reprojected 3D trajectory.

Rally layouts consumed:
  TTHQ: <root>/trajectory_XXXX/{frame_*.png} + meta.json {"fps", "spin_class"}
  TTST: <root>/trajectory_XXXX/{frames/*.png, r_img.npy, times.npy,
        Mint.npy, Mext.npy, spin_class.npy}  (data/extract_ttst.py layout)
"""
from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np

from upliftingtabletennis_tpu.pipeline.interface import HEIGHT, WIDTH

TTST_SRC_RES = (2560, 1440)  # annotation space (ref: extract_ttst_data.py:25)
TOPSPIN_CLASS, BACKSPIN_CLASS = 1, 2


class SpinCounts:
    """TP/TN/FP/FN accumulator for topspin-vs-backspin (ref: :252-263)."""

    def __init__(self):
        self.tp = self.tn = self.fp = self.fn = 0

    def update(self, spin_pred, spin_class):
        if spin_pred is None or spin_class not in (TOPSPIN_CLASS, BACKSPIN_CLASS):
            return
        pred_top = spin_pred[1] > 0
        if spin_class == TOPSPIN_CLASS:
            self.tp += int(pred_top)
            self.fn += int(not pred_top)
        else:
            self.tn += int(not pred_top)
            self.fp += int(pred_top)

    def metrics(self):
        total = max(self.tp + self.tn + self.fp + self.fn, 1)
        f1p = 2 * self.tp / max(2 * self.tp + self.fp + self.fn, 1)
        f1m = 2 * self.tn / max(2 * self.tn + self.fn + self.fp, 1)
        return {"accuracy": (self.tp + self.tn) / total, "macro_f1": (f1p + f1m) / 2}


def _reproject(pos3d, Mint, Mext):
    import jax.numpy as jnp

    from upliftingtabletennis_tpu.core.geometry import world2img

    return np.asarray(
        world2img(
            jnp.asarray(pos3d, jnp.float32),
            jnp.asarray(Mext, jnp.float32),
            jnp.asarray(Mint, jnp.float32),
        )
    )


def evaluate_rally(pipeline, frames, fps):
    """TTHQ-protocol metrics for one rally (ref: :103-163)."""
    from upliftingtabletennis_tpu.core.geometry import TABLE_POINTS

    out = pipeline.run_rally(frames, fps)
    ball, table, spin, pos3d = out["ball"], out["table"], out["spin"], out["pos3d"]

    ball_reproj_err = table_reproj_err = np.nan
    if int((table[:, 2] == 1).sum()) >= 6:
        Mint, Mext, _ = pipeline.calibrate_camera(table)
        proj_table = _reproject(np.asarray(TABLE_POINTS), Mint, Mext)
        vis = table[:, 2] == 1
        table_reproj_err = float(np.linalg.norm(proj_table[vis] - table[vis, :2], axis=1).mean())
        if pos3d is not None and len(pos3d):
            proj_ball = _reproject(pos3d, Mint, Mext)
            n = min(len(proj_ball), len(ball))
            ball_reproj_err = float(np.linalg.norm(proj_ball[:n] - ball[:n], axis=1).mean())

    return {
        "spin": spin,
        "pos3d": pos3d,
        "n_ball": len(ball),
        "table_reproj_px": table_reproj_err,
        "ball_reproj_px": ball_reproj_err,
    }


def evaluate_rally_ttst(pipeline, frames, ann, frame_offset: int = 1):
    """TTST-protocol metrics for one rally (ref: :178-305).

    ann: dict with r_img (T, 2) px at 2560x1440, times (T,), Mint (3, 3)
    at 2560x1440, Mext (4, 4), spin_class. frames[i + frame_offset] must
    correspond to annotation i (the extractor pads one frame at each end,
    ref extract_ttst_data.py:147).
    """
    import jax.numpy as jnp

    from upliftingtabletennis_tpu.core.geometry import rescale_intrinsics

    times_ann = np.asarray(ann["times"], np.float64)
    fps = 1.0 / float(times_ann[1] - times_ann[0])  # ref: :237
    scale = np.array([WIDTH / TTST_SRC_RES[0], HEIGHT / TTST_SRC_RES[1]])
    r_img = np.asarray(ann["r_img"], np.float64) * scale  # ref: :227 (via 0-1 norm)
    Mint = np.asarray(
        rescale_intrinsics(jnp.asarray(ann["Mint"], jnp.float32), TTST_SRC_RES, (WIDTH, HEIGHT))
    )
    Mext = np.asarray(ann["Mext"], np.float64)

    out = pipeline.run_rally(frames, fps)
    ball, valid_idx, table = out["ball"], out["valid_idx"], out["table"]
    spin, pos3d = out["spin"], out["pos3d"]

    # interior frame k (center = frames[k+1]) corresponds to annotation
    # k + frame_offset - 1; keep detections with a matching annotation
    ann_idx = valid_idx + frame_offset - 1
    keep = (ann_idx >= 0) & (ann_idx < len(r_img))
    det = ball[keep]
    gt = r_img[ann_idx[keep]]
    err_ball_det = float(np.linalg.norm(det - gt, axis=1).mean()) if len(det) else np.nan

    # table: fused detections vs annotated (all annotated points visible)
    err_table = np.nan
    if "table_img" in ann:
        t_gt = np.asarray(ann["table_img"], np.float64) * scale
        vis = table[:, 2] == 1
        if vis.any():
            err_table = float(np.linalg.norm(table[vis, :2] - t_gt[vis], axis=1).mean())

    # pos3d rows align 1:1 with the filtered ball rows (both are the
    # filtered sequence, possibly truncated to the 50-token window)
    err_ball_upl = np.nan
    if pos3d is not None and len(pos3d):
        proj = _reproject(pos3d, Mint, Mext)[keep[: len(pos3d)]]
        n = min(len(proj), len(gt))
        if n:
            err_ball_upl = float(np.linalg.norm(proj[:n] - gt[:n], axis=1).mean())

    return {
        "spin": spin,
        "pos3d": pos3d,
        "table_px": err_table,
        "ball_detection_px": err_ball_det,
        "ball_uplifting_px": err_ball_upl,
    }


# ---------------------------------------------------------------------------
# 3D / overlay visualization (ref: visualize_tthq, :310-456)
# ---------------------------------------------------------------------------

def render_rally_3d(pos3d, out_path: str):
    """3D trajectory over the table wireframe -> PNG (ref: :365-411)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from upliftingtabletennis_tpu.core.geometry import TABLE_CONNECTIONS, TABLE_POINTS

    tp = np.asarray(TABLE_POINTS)
    fig = plt.figure(figsize=(10, 10))
    ax = fig.add_subplot(111, projection="3d")
    pos3d = np.asarray(pos3d)
    ax.plot(pos3d[:, 0], pos3d[:, 1], pos3d[:, 2], linewidth=3.5, color="orange",
            label="Predicted Ball Trajectory")
    ax.scatter(tp[:, 0], tp[:, 1], tp[:, 2], c="green", marker="o", s=80,
               label="Table Keypoints")
    for a, b in TABLE_CONNECTIONS:
        ax.plot(tp[[a, b], 0], tp[[a, b], 1], tp[[a, b], 2], c="black")
    ax.set_xlabel("X"); ax.set_ylabel("Y"); ax.set_zlabel("Z")
    # equal aspect (ref: :392-411)
    lims = np.array([ax.get_xlim3d(), ax.get_ylim3d(), ax.get_zlim3d()])
    mid = lims.mean(axis=1)
    radius = 0.5 * (lims[:, 1] - lims[:, 0]).max()
    ax.set_xlim3d(mid[0] - radius, mid[0] + radius)
    ax.set_ylim3d(mid[1] - radius, mid[1] + radius)
    ax.set_zlim3d(mid[2] - radius, mid[2] + radius)
    ax.view_init(elev=20.0, azim=130)
    fig.savefig(out_path, dpi=80)
    plt.close(fig)


def render_rally_overlay(frame, table, ball, pos3d, Mint, Mext, out_path: str,
                         spin_pred=None, spin_gt: int = 0):
    """Middle-frame overlay: detected keypoints (green), detected ball track
    (green), reprojected 3D trajectory (orange) -> PNG (ref: :413-456)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    img = np.asarray(frame).astype(np.uint8)
    fig, ax = plt.subplots(figsize=(16, 9))
    ax.imshow(img)
    sx, sy = img.shape[1] / WIDTH, img.shape[0] / HEIGHT
    for i, (x, y, v) in enumerate(np.asarray(table)):
        if v == 1:
            ax.scatter([x * sx], [y * sy], c="lime", s=60)
            ax.annotate(str(i + 1), (x * sx + 4, y * sy - 4), color="lime", fontsize=8)
    ball = np.asarray(ball)
    if len(ball):
        ax.scatter(ball[:, 0] * sx, ball[:, 1] * sy, c="lime", s=25)
    if pos3d is not None and len(pos3d) and Mint is not None:
        proj = _reproject(pos3d, Mint, Mext)
        ok = (proj[:, 0] >= 0) & (proj[:, 0] < WIDTH) & (proj[:, 1] >= 0) & (proj[:, 1] < HEIGHT)
        ax.scatter(proj[ok, 0] * sx, proj[ok, 1] * sy, c="orange", s=15)
    if spin_pred is not None:
        pred = "Topspin" if spin_pred[1] > 0 else "Backspin"
        gt = {TOPSPIN_CLASS: "Topspin", BACKSPIN_CLASS: "Backspin"}.get(spin_gt, "Unknown")
        ax.set_title(
            f"Predicted Spin: {pred} {spin_pred[1] / (2 * np.pi):.1f}Hz , GT: {gt}",
            fontsize=14,
        )
    ax.axis("off")
    fig.savefig(out_path, dpi=80, bbox_inches="tight")
    plt.close(fig)


def visualize_rally(pipeline, frames, fps, out_dir: str, name: str, spin_gt: int = 0):
    """Run the pipeline on one rally and write <name>_3d.png + <name>_2d.png."""
    os.makedirs(out_dir, exist_ok=True)
    out = pipeline.run_rally(frames, fps)
    Mint = Mext = None
    if int((out["table"][:, 2] == 1).sum()) >= 6:
        Mint, Mext, _ = pipeline.calibrate_camera(out["table"])
    if out["pos3d"] is not None and len(out["pos3d"]):
        render_rally_3d(out["pos3d"], os.path.join(out_dir, f"{name}_3d.png"))
    mid = frames[len(frames) // 2]
    render_rally_overlay(
        mid, out["table"], out["ball"], out["pos3d"], Mint, Mext,
        os.path.join(out_dir, f"{name}_2d.png"), out["spin"], spin_gt,
    )
    return out


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def _load_frames(paths):
    import cv2

    return [cv2.cvtColor(cv2.imread(f), cv2.COLOR_BGR2RGB) for f in paths]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", choices=["tthq", "ttst"], default="tthq")
    p.add_argument("--data_root", required=True)
    p.add_argument("--checkpoints", type=str, default=None, help="json dict of checkpoint paths")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--visualize_dir", type=str, default=None,
                   help="write <traj>_3d.png/<traj>_2d.png renders here")
    args = p.parse_args(argv)

    from upliftingtabletennis_tpu.pipeline import TableTennisPipeline

    ck = json.loads(args.checkpoints) if args.checkpoints else None
    pipeline = TableTennisPipeline(ck)

    traj_dirs = sorted(glob.glob(os.path.join(args.data_root, "trajectory_*")))
    if args.limit:
        traj_dirs = traj_dirs[: args.limit]

    spin = SpinCounts()
    errs: dict = {}
    for d in traj_dirs:
        name = os.path.basename(d)
        if args.dataset == "tthq":
            meta = json.load(open(os.path.join(d, "meta.json")))
            frames = _load_frames(sorted(glob.glob(os.path.join(d, "frame_*.png"))))
            out = evaluate_rally(pipeline, frames, meta["fps"])
            for k in ("table_reproj_px", "ball_reproj_px"):
                if np.isfinite(out[k]):
                    errs.setdefault(k, []).append(out[k])
            spin.update(out["spin"], meta.get("spin_class", 0))
            fps, spin_gt = meta["fps"], meta.get("spin_class", 0)
        else:
            frames = _load_frames(sorted(glob.glob(os.path.join(d, "frames", "*.png"))))
            ann = {
                k: np.load(os.path.join(d, f"{k}.npy"))
                for k in ("r_img", "times", "Mint", "Mext", "spin_class")
            }
            out = evaluate_rally_ttst(pipeline, frames, ann)
            for k in ("table_px", "ball_detection_px", "ball_uplifting_px"):
                if np.isfinite(out[k]):
                    errs.setdefault(k, []).append(out[k])
            spin.update(out["spin"], int(ann["spin_class"]))
            fps = 1.0 / float(ann["times"][1] - ann["times"][0])
            spin_gt = int(ann["spin_class"])
        if args.visualize_dir:
            visualize_rally(pipeline, frames, fps, args.visualize_dir, name, spin_gt)

    for k, v in errs.items():
        print(f"{k}: {np.mean(v):.2f} ± {np.std(v):.2f} px  (n={len(v)})")
    m = spin.metrics()
    print(f"spin acc: {m['accuracy']:.4f}  macro-F1: {m['macro_f1']:.4f}")


if __name__ == "__main__":
    main()
