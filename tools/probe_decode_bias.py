"""Confirm the ADVICE round-4 decode-bias diagnosis empirically.

Hypothesis (ADVICE.md r4 #1): closed_loop.make_batch scales training
targets with plain `coords * s` into the model-output grid, while the
pipeline decode (ops/peak.extract_peaks) maps back with the pixel-center
convention `(x + 0.5) * s - 0.5`. A model trained on those targets then
carries a systematic `0.5 * (s - 1)` px/axis decode bias (s = EVAL/OUT):
3.5 px/axis at SegFormer's 1/4-res output — exactly the reported uniform
~4.9 px radial table error.

This probe runs the EXISTING closed-loop checkpoints on freshly rendered
val batches and scores the decode three ways:
  pixel_center : (x+0.5)*s-0.5  (the pipeline decode, biased if hypothesis)
  plain        : x*s            (inverse of the training-target scaling)
  debiased     : pixel_center - 0.5*(s-1)  (equivalent to plain)

If `plain` collapses the error, the hypothesis is confirmed and the fix
is to make the training targets use the pixel-center convention.

  python tools/probe_decode_bias.py --out artifacts/closed_loop
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default="artifacts/closed_loop")
    p.add_argument("--tasks", type=str, default="ball,table")
    p.add_argument("--n_batches", type=int, default=4)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from upliftingtabletennis_tpu.data import synthetic as SYN
    from upliftingtabletennis_tpu.data.image_transforms import normalize_image
    from upliftingtabletennis_tpu.eval.closed_loop import EVAL_H, EVAL_W, _load_store
    from upliftingtabletennis_tpu.models.factory import get_detector
    from upliftingtabletennis_tpu.ops.peak import extract_peaks
    from upliftingtabletennis_tpu.utils.checkpoint import load_checkpoint

    store = _load_store(os.environ.get("CLOSED_LOOP_DATA", "data/syntheticdata_npz"))
    store_j = jax.tree.map(jnp.asarray, store)
    val_idx = jnp.asarray(SYN.split_indices(len(store), "val"))

    report = {}
    for task in args.tasks.split(","):
        ckpt = os.path.join(args.out, f"{task}_detector")
        tree, _, info = load_checkpoint(ckpt)
        model_name = info["model"]
        RW, RH = info["render_res"]
        n_pts = 1 if task == "ball" else 13
        model, _ = get_detector(model_name, task, train=False)
        variables = {"params": tree["params"]}
        if tree.get("batch_stats"):
            variables["batch_stats"] = tree["batch_stats"]

        # reuse the closed-loop renderer via a tiny args shim
        from upliftingtabletennis_tpu.eval import closed_loop as CL

        class _A:
            render_res = (RW, RH)
            batch_size = 2

        import types

        # sample_rendered is nested inside train_detectors; re-create the
        # essential render here (same code path: render at EVAL res ->
        # downscale to model res)
        from upliftingtabletennis_tpu.core.geometry import WIDTH as UPL_W, HEIGHT as UPL_H
        from upliftingtabletennis_tpu.data.render_rally import (
            project_context,
            render_frames,
            rescale_px,
        )

        B = 2

        @jax.jit
        def render_batch(key, store_arg, idx_arg):
            # store/idx MUST be jit ARGUMENTS — closing over the corpus
            # embeds it as HLO constants and the remote compile request
            # exceeds the helper's body limit (HTTP 413; see
            # closed_loop.sample_rendered)
            k_idx, k_b, k_t, k_n = jax.random.split(key, 4)
            idx = jax.random.choice(k_idx, idx_arg, (B,), replace=False)
            sample = SYN.assemble_batch(k_b, store_arg, idx, train=True)
            r_img = sample["r_img"]
            mask = sample["mask"]
            table_img = sample["table_img"]
            T = r_img.shape[1]
            u = jax.random.uniform(k_t, (B,))
            n_valid = jnp.sum(mask, axis=1)
            t_mid = jnp.clip((u * (n_valid - 2)).astype(jnp.int32) + 1, 1, T - 2)
            bidx = jnp.arange(B)
            table_px = rescale_px(table_img[..., :2], (UPL_W, UPL_H), (EVAL_W, EVAL_H))
            ball_px_all = rescale_px(r_img, (UPL_W, UPL_H), (EVAL_W, EVAL_H))
            ctx_px = rescale_px(
                project_context(sample["Mint"], sample["Mext"]),
                (UPL_W, UPL_H), (EVAL_W, EVAL_H),
            )

            def render_one(k, b):
                if task == "ball":
                    ts = jnp.stack([t_mid[b] - 1, t_mid[b], t_mid[b] + 1])
                else:
                    ts = t_mid[b][None]
                frames = render_frames(
                    k, ball_px_all[b, ts], mask[b, ts], table_px[b],
                    height=EVAL_H, width=EVAL_W, context_px=ctx_px[b],
                )
                if (RW, RH) != (EVAL_W, EVAL_H):
                    frames = jax.image.resize(
                        frames.astype(jnp.float32),
                        (frames.shape[0], RH, RW, 3), "bilinear", antialias=False,
                    )
                    frames = jnp.clip(jnp.round(frames), 0, 255)
                return jnp.concatenate([f for f in frames], axis=-1)

            keys = jax.random.split(k_n, B)
            images = jax.vmap(render_one)(keys, bidx)
            if task == "ball":
                coords = ball_px_all[bidx, t_mid][:, None]
                vis = jnp.ones((B, 1))
            else:
                coords = table_px
                vis = table_img[..., 2]
            return images, coords, vis

        @jax.jit
        def heat_of(images):
            x = normalize_image(images.astype(jnp.float32))
            y = model.apply(variables, x)
            heat = y[0] if isinstance(y, tuple) else y
            return jnp.moveaxis(heat, -1, 1)

        errs = {"pixel_center": [], "plain": []}
        for i in range(args.n_batches):
            images, coords, vis = render_batch(
                jax.random.PRNGKey(7000 + i), store_j, val_idx)
            heat = heat_of(images)
            OH, OW = heat.shape[-2], heat.shape[-1]
            s = np.asarray([EVAL_W / OW, EVAL_H / OH], np.float32)
            pk = np.asarray(extract_peaks(heat, EVAL_W, EVAL_H))[..., :2]
            coords = np.asarray(coords)[:, :n_pts]
            m = np.asarray(vis)[:, :n_pts] > 0
            d_pc = np.linalg.norm(pk - coords, axis=-1)[m]
            pk_plain = pk - 0.5 * (s - 1.0)
            d_pl = np.linalg.norm(pk_plain - coords, axis=-1)[m]
            errs["pixel_center"].append(d_pc)
            errs["plain"].append(d_pl)
        rep = {
            k: {
                "mean_px": float(np.mean(np.concatenate(v))),
                "median_px": float(np.median(np.concatenate(v))),
            }
            for k, v in errs.items()
        }
        rep["model"] = model_name
        rep["scale"] = [float(x) for x in s]
        report[task] = rep
        print(task, json.dumps(rep, indent=2), flush=True)

    with open(os.path.join(args.out, "decode_bias_probe.json"), "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
