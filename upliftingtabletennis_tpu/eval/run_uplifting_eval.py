"""Uplifting evaluation CLI: TTST (+robustness suite) and TT3D protocols.

Equivalent of `python -m inference.inference_uplifting`
(ref: inference/inference_uplifting.py):

  python -m upliftingtabletennis_tpu.eval.run_uplifting_eval \
      --checkpoint <orbax dir or reference .pt> \
      --ttst_dir <root>/ttst [--tt3d_dir <root>]

TTST: mean 2D reprojection error of predicted 3D positions through the
stored cameras vs annotated detections (px at 1920x1080 + diag-normalized),
spin accuracy / macro-F1, under Identity / HalfFPS / Drop(0.1, 0.1) /
Combine (ref: :118-213, :342-348).
TT3D: mean 3D position error (cm) per view (back/side/oblique) with and
without detection noise (ref: :61-114).
"""
from __future__ import annotations

import argparse

import numpy as np


def load_uplifting(checkpoint: str):
    """Load from an Orbax dir or a reference torch .pt file."""
    import os

    from upliftingtabletennis_tpu.models import get_uplifting_model

    if os.path.isfile(checkpoint) and checkpoint.endswith(".pt"):
        from upliftingtabletennis_tpu.utils.port_torch import load_reference_checkpoint

        params, info = load_reference_checkpoint(checkpoint)
        model = get_uplifting_model(
            info.get("name", "connectstage"), info.get("size", "large"),
            info.get("tabletoken_mode", "dynamic"), info.get("time_rotation", "new"),
        )
        return model, params, info.get("transform_mode", "global")
    from upliftingtabletennis_tpu.utils.checkpoint import load_model_from_checkpoint

    model, params, _, info = load_model_from_checkpoint(checkpoint)
    return model, params, info.get("transform_mode", "global")


def eval_ttst(model, params, transform_mode, ttst, special_transform, batch_size=64):
    """One TTST pass; returns dict of metrics (ref: inference_ttst)."""
    import jax
    import jax.numpy as jnp

    from upliftingtabletennis_tpu.core.geometry import (
        HEIGHT,
        WIDTH,
        transform_rotation_axes,
        world2img,
    )

    EVAL_W, EVAL_H = 1920, 1080

    @jax.jit
    def fwd(ball, table, mask, times):
        rot, pos = model.apply({"params": params}, ball, table, mask, times)
        if transform_mode == "global":
            rot = transform_rotation_axes(rot, pos)
        return rot, pos

    per_traj, scores, labels = [], [], []
    N = len(ttst)
    for s in range(0, N, batch_size):
        sl = slice(s, min(s + batch_size, N))
        data = {
            "r_img": ttst.r_img[sl] / np.array([WIDTH, HEIGHT], np.float32),
            "table_img": _norm_table(ttst.table_img[sl]),
            "mask": ttst.mask[sl].copy(),
            "times": ttst.times[sl].copy(),
        }
        data = special_transform(data)
        rot, pos = fwd(*map(jnp.asarray, (data["r_img"], data["table_img"], data["mask"], data["times"])))
        rot, pos = np.asarray(rot), np.asarray(pos)

        # reproject predictions, compare vs (denormalized) annotations at eval res
        pred2d = np.asarray(
            world2img(jnp.asarray(pos), jnp.asarray(ttst.Mext[sl])[:, None], jnp.asarray(ttst.Mint[sl])[:, None])
        )
        gt2d = data["r_img"] * np.array([WIDTH, HEIGHT])
        sx, sy = EVAL_W / WIDTH, EVAL_H / HEIGHT
        pred2d = (pred2d + 0.5) * np.array([sx, sy]) - 0.5
        gt2d = (gt2d + 0.5) * np.array([sx, sy]) - 0.5
        m = data["mask"]
        d = np.sqrt(np.sum((pred2d - gt2d) ** 2, axis=-1))
        per_traj.append(np.sum(d * m, axis=1) / np.maximum(np.sum(m, axis=1), 1))

        scores.append(rot[:, 1])
        labels.append(ttst.spin_class[sl])

    per_traj = np.concatenate(per_traj)
    scores, labels = np.concatenate(scores), np.concatenate(labels)
    ann = (labels == 1) | (labels == 2)
    y = (labels[ann] == 1).astype(int)
    sc = scores[ann]
    tp = int(((y == 1) & (sc > 0)).sum())
    fn = int(((y == 1) & (sc <= 0)).sum())
    tn = int(((y == 0) & (sc < 0)).sum())
    fp = int(((y == 0) & (sc >= 0)).sum())
    total = max(tp + tn + fp + fn, 1)
    f1p = 2 * tp / max(2 * tp + fp + fn, 1)
    f1m = 2 * tn / max(2 * tn + fn + fp, 1)
    diag = (EVAL_W**2 + EVAL_H**2) ** 0.5
    return {
        "mean_2d_px": float(np.mean(per_traj)),
        "std_2d_px": float(np.std(per_traj)),
        "mean_2d_normed": float(np.mean(per_traj) / diag),
        "spin_accuracy": (tp + tn) / total,
        "spin_macro_f1": (f1p + f1m) / 2,
    }


def _norm_table(table):
    from upliftingtabletennis_tpu.core.geometry import HEIGHT, WIDTH

    t = table.copy()
    t[..., 0] /= WIDTH
    t[..., 1] /= HEIGHT
    return t


def eval_tt3d(model, params, transform_mode, base_dir, batch_size=64):
    """TT3D 3D position error per view x noise (ref: inference_tt3d)."""
    import jax
    import jax.numpy as jnp

    from upliftingtabletennis_tpu.data.tt3d import load_tt3d

    @jax.jit
    def fwd(ball, table, mask, times):
        return model.apply({"params": params}, ball, table, mask, times)

    results = {}
    for noise in (True, False):
        all_m = []
        for view in ("back", "side", "oblique"):
            try:
                data = load_tt3d(base_dir, view, noise)
            except FileNotFoundError:
                continue
            ms = []
            for s in range(0, len(data), batch_size):
                sl = slice(s, min(s + batch_size, len(data)))
                _, pos = fwd(
                    jnp.asarray(data.r_img[sl]), jnp.asarray(data.table_img[sl]),
                    jnp.asarray(data.mask[sl]), jnp.asarray(data.times[sl]),
                )
                pos = np.asarray(pos)
                m = data.mask[sl]
                d = np.sqrt(np.sum((pos - data.r_world[sl]) ** 2, axis=-1))
                ms.append(np.sum(d * m, axis=1) / np.maximum(np.sum(m, axis=1), 1))
            if ms:
                m = np.concatenate(ms)
                results[(view, noise)] = (float(np.mean(m) * 100), float(np.std(m) * 100))
                all_m.append(m)
        if all_m:
            m = np.concatenate(all_m)
            results[("all", noise)] = (float(np.mean(m) * 100), float(np.std(m) * 100))
    return results


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--ttst_dir", default=None)
    p.add_argument("--tt3d_dir", default=None)
    args = p.parse_args(argv)

    from upliftingtabletennis_tpu.data.ttst import load_ttst
    from upliftingtabletennis_tpu.eval.robustness import STANDARD_SUITE

    model, params, transform_mode = load_uplifting(args.checkpoint)

    if args.ttst_dir:
        ttst = load_ttst(args.ttst_dir, "test")
        for name, make in STANDARD_SUITE:
            m = eval_ttst(model, params, transform_mode, ttst, make())
            print(
                f"[TTST/{name}] 2D err {m['mean_2d_px']:.2f}px "
                f"(normed {m['mean_2d_normed']:.4f})  spin acc {m['spin_accuracy']:.4f} "
                f"macro-F1 {m['spin_macro_f1']:.4f}"
            )
    if args.tt3d_dir:
        res = eval_tt3d(model, params, transform_mode, args.tt3d_dir)
        for (view, noise), (mean, std) in sorted(res.items(), key=str):
            print(f"[TT3D/{view} noise={noise}] 3D err {mean:.2f} +- {std:.2f} cm")


if __name__ == "__main__":
    main()
