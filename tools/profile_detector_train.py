"""Detector TRAINING step-time probe (VERDICT round-1 item 7).

Times the same jitted train step `train.run_detection` runs — device-side
augmentation (`augment_detection_batch`) + Gaussian target rendering +
fwd/bwd + Adam + EMA — on synthetic on-device batches, so the number is
the trainer's step time minus host PNG decode (which is threaded prefetch
and, with real data absent in this environment, unmeasurable anyway).

One model per invocation (a fresh process isolates OOM / remote-compile
failures so a ladder of configs can be scripted):

  python tools/profile_detector_train.py --model wasb --task ball \
      --batch 4 --steps 10

Prints ONE JSON line: {"model", "task", "batch", "res", "ms_per_step",
"steps_per_sec"}. Mirrors the reference's training budget framing
(ref: balldetection/config.py:41-44 — batch 4, days of training);
PERF.md records the results.
"""
from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", type=str, default="wasb")
    p.add_argument("--task", choices=["ball", "table"], default="ball")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--resolution", type=int, nargs=2, default=None,
                   help="override model input resolution W H")
    p.add_argument("--source_res", type=int, nargs=2, default=(1920, 1080),
                   help="raw-image resolution fed to the augment stage")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from upliftingtabletennis_tpu.data.image_transforms import (
        ImageAugmentConfig,
        augment_detection_batch,
    )
    from upliftingtabletennis_tpu.eval import metrics as M
    from upliftingtabletennis_tpu.models.factory import get_detector

    task = args.task
    model, (MW, MH) = get_detector(args.model, task, train=True, remat=True)
    if args.resolution:
        MW, MH = args.resolution
    SW, SH = args.source_res
    EW, EH = 1920, 1080  # loss at eval res, like the trainer
    B = args.batch
    n_ch = 9 if task == "ball" else 3
    n_pts = 1 if task == "ball" else 13
    aug_cfg = ImageAugmentConfig(flip_prob=0.5 if task == "ball" else 0.0)

    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(rng, jnp.zeros((1, MH, MW, n_ch)))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-3))
    opt_state = tx.init(params)
    ema = params

    @jax.jit
    def train_step(params, batch_stats, opt_state, ema, key, images, coords, vis):
        k1, k_drop = jax.random.split(key)
        imgs, c_model, v = augment_detection_batch(
            k1, images, coords, vis, (MW, MH), aug_cfg, True
        )
        c_eval = jnp.stack(
            [(c_model[..., 0] + 0.5) * (EW / MW) - 0.5,
             (c_model[..., 1] + 0.5) * (EH / MH) - 0.5], -1
        )
        target = M.render_gaussian_heatmaps(c_eval, v, EH, EW, 6.0)

        def loss_fn(p):
            out = model.apply(
                {"params": p, "batch_stats": batch_stats}, imgs,
                mutable=["batch_stats"] if batch_stats else [],
                rngs={"dropout": k_drop},
            )
            y, new_state = out if batch_stats else (out, {})
            heat = y[0] if isinstance(y, tuple) else y
            logits = jnp.moveaxis(heat, -1, 1)
            logits = jax.image.resize(logits, (*logits.shape[:2], EH, EW), "bilinear")
            return M.weighted_mse_loss(logits, target), new_state

        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = jax.tree.map(lambda e, q: 0.999 * e + 0.001 * q, ema, params)
        return params, new_state.get("batch_stats", batch_stats), opt_state, ema, loss

    key = jax.random.PRNGKey(1)
    images = jax.random.uniform(key, (B, SH, SW, n_ch), jnp.float32, 0.0, 255.0)
    coords = jax.random.uniform(key, (B, n_pts, 2), jnp.float32, 100.0, 600.0)
    vis = jnp.ones((B, n_pts))

    # warmup (compile) + forced completion: block_until_ready is a NO-OP on
    # the axon platform — fetch one element instead
    t_c0 = time.perf_counter()
    out = train_step(params, batch_stats, opt_state, ema, key, images, coords, vis)
    params, batch_stats, opt_state, ema, loss = out
    np.asarray(jnp.ravel(loss))
    compile_s = time.perf_counter() - t_c0

    t0 = time.perf_counter()
    for i in range(args.steps):
        key, k = jax.random.split(key)
        params, batch_stats, opt_state, ema, loss = train_step(
            params, batch_stats, opt_state, ema, k, images, coords, vis
        )
    np.asarray(jnp.ravel(loss))
    dt = time.perf_counter() - t0

    print(json.dumps({
        "model": args.model, "task": task, "batch": B, "res": [MW, MH],
        "ms_per_step": round(1000 * dt / args.steps, 1),
        "steps_per_sec": round(args.steps / dt, 3),
        "samples_per_sec": round(B * args.steps / dt, 2),
        "compile_s": round(compile_s, 1),
        "loss_final": float(np.asarray(loss)),
    }))


if __name__ == "__main__":
    main()
