"""Detection evaluation CLI: PCK@{2,5,10,20} px on the TTHQ test split.

Equivalent of `python -m inference.inference_balldetection` /
`inference.inference_tabledetection` (ref: inference/inference_balldetection
.py:64-113, inference_tabledetection.py:60-107): checkpoints are
self-describing, metrics measured at 1920x1080 (ball: distance to the blur
streak; table: visible-and-valid keypoints).

  python -m upliftingtabletennis_tpu.eval.run_detection_eval \
      --task ball --checkpoints <ckpt1> <ckpt2> ... --data_root <root>
"""
from __future__ import annotations

import argparse

import numpy as np


def evaluate_checkpoint(task: str, ckpt_path: str, data_root: str, batch_size=8,
                        resolution=None, eval_resolution=None, limit=None,
                        flip_test=False):
    import jax
    import jax.numpy as jnp

    from upliftingtabletennis_tpu.data import detection as D
    from upliftingtabletennis_tpu.data.image_transforms import (
        ImageAugmentConfig,
        augment_detection_batch,
    )
    from upliftingtabletennis_tpu.eval import metrics as M
    from upliftingtabletennis_tpu.models.factory import get_detector
    from upliftingtabletennis_tpu.ops.peak import extract_peaks
    from upliftingtabletennis_tpu.utils.checkpoint import load_checkpoint

    variables, _, info = load_checkpoint(ckpt_path)
    model, (MW, MH) = get_detector(info.get("model", "wasb"), task,
                                   in_frames=info.get("in_frames"), train=False)
    if resolution:
        MW, MH = resolution
    elif "resolution" in info:
        MW, MH = info["resolution"]
    EW, EH = eval_resolution or (D.EVAL_WIDTH, D.EVAL_HEIGHT)
    n_points = 1 if task == "ball" else 13

    if task == "ball":
        from functools import partial

        index = D.load_tthq_ball_index(data_root, "test")
        load = partial(D.load_ball_batch, in_frames=info.get("in_frames", 3))
    else:
        index = D.load_tthq_table_index(data_root, "test")
        load = D.load_table_batch
    if limit:
        index = index[:limit]

    cfg = ImageAugmentConfig()

    @jax.jit
    def infer(images, coords, vis):
        imgs, c_model, v = augment_detection_batch(
            jax.random.PRNGKey(0), images, coords, vis, (MW, MH), cfg, False
        )
        heat, _ = (lambda o: o if isinstance(o, tuple) else (o, None))(
            model.apply(variables, imgs)
        )
        if flip_test:
            # optional horizontal flip-test TTA (ball only — flip swaps
            # left/right table identities; ref: topdown_heatmap_simple_head
            # .py:188-218)
            from upliftingtabletennis_tpu.ops.heatmap_decode import flip_back

            heat_f, _ = (lambda o: o if isinstance(o, tuple) else (o, None))(
                model.apply(variables, imgs[:, :, ::-1, :])
            )
            heat = 0.5 * (heat + flip_back(heat_f))
        heat = jnp.moveaxis(heat, -1, 1)
        preds = extract_peaks(heat, EW, EH, threshold=-jnp.inf if task == "ball" else 0.1)
        c_eval = jnp.stack(
            [(c_model[..., 0] + 0.5) * EW / MW - 0.5, (c_model[..., 1] + 0.5) * EH / MH - 0.5], -1
        )
        return preds, jnp.concatenate([c_eval, v[..., None]], -1)

    preds_all, gts_all = [], []
    for s in range(0, len(index) - batch_size + 1, batch_size):
        imgs, coords, vis = load(data_root, index[s : s + batch_size])
        if coords.ndim == 2:
            coords = coords[:, None]
        preds, gts = infer(jnp.asarray(imgs), jnp.asarray(coords), jnp.asarray(vis))
        preds_all.append(np.asarray(preds))
        gts_all.append(np.asarray(gts))
    preds = np.concatenate(preds_all)
    gts = np.concatenate(gts_all)

    out = {}
    for tol in (2, 5, 10, 20):
        if task == "ball":
            # gts rows: (center, streak_min, streak_max) at eval res
            pq = jnp.asarray(preds[:, 0])
            out[f"pck{tol}"] = float(
                M.pck_ball(pq, jnp.asarray(gts[:, 0, :2]), jnp.asarray(gts[:, 1, :2]),
                           jnp.asarray(gts[:, 2, :2]), tol)
            )
        else:
            out[f"pck{tol}"] = float(M.pck_keypoints(jnp.asarray(preds), jnp.asarray(gts), tol))
    if task == "ball":
        out["avg_dist"] = float(
            M.average_distance(jnp.asarray(preds), jnp.asarray(gts[:, :1]))
        )
    else:
        out["avg_dist"] = float(M.average_distance(jnp.asarray(preds), jnp.asarray(gts)))
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--task", choices=["ball", "table"], default="ball")
    p.add_argument("--checkpoints", nargs="+", required=True)
    p.add_argument("--data_root", required=True)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--flip_test", action="store_true",
                   help="horizontal flip-test TTA (ball only)")
    args = p.parse_args(argv)

    for ckpt in args.checkpoints:
        m = evaluate_checkpoint(args.task, ckpt, args.data_root, args.batch_size,
                                limit=args.limit, flip_test=args.flip_test)
        print(f"{ckpt}: " + "  ".join(f"{k}={v:.4f}" for k, v in m.items()))


if __name__ == "__main__":
    main()
