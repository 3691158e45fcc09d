"""Closed-loop synthetic end-to-end pipeline accuracy (no real data needed).

Protocol (VERDICT round-1 item 3; the only obtainable pipeline-level
accuracy number in a no-egress environment):

1. Physics trajectories (data/datagen engine) are projected through
   sampled broadcast-like cameras (data/synthetic camera model) and
   rendered into video frames ON DEVICE (data/render_rally).
2. Ball + table detectors are trained on these rendered frames — the
   rendering happens inside the jitted train step, so the "dataset" is
   infinite and never touches the host.
3. The FULL pipeline (detect -> dual-model filter -> DBSCAN table fusion
   -> RANSAC calibration -> uplifting, pipeline/interface.py) runs on
   held-out rendered rallies and is scored against the physics ground
   truth: ball detection px error, table reprojection px error, 3D
   trajectory error (cm), spin accuracy / macro-F1.

Metric definitions follow the reference's combined eval
(ref: inference/inference_combined.py:65-175, 137-163); the 3D error is
extra — real TTHQ/TTST have no 3D ground truth, the physics world does.

  python -m upliftingtabletennis_tpu.eval.closed_loop \
      --data_dir <syntheticdata root> --out artifacts/closed_loop \
      --train_steps 600 --n_eval 32 [--uplifting_checkpoint <dir>]
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

EVAL_W, EVAL_H = 1920, 1080  # pipeline working space (interface.py:38)
EMA_DECAY = 0.999


def ema_update(ema, params, decay=EMA_DECAY):
    """One step of a ZERO-initialized EMA (finalize with ema_finalize)."""
    import jax

    return jax.tree.map(lambda e, q: decay * e + (1.0 - decay) * q, ema, params)


def ema_finalize(ema, n_steps, decay=EMA_DECAY):
    """Debias a zero-init EMA: for constant params p the result is exactly p
    at ANY step count. Initializing the EMA at the random init instead (the
    long-run trainers' pattern) leaves decay**n_steps of the RANDOM weights
    blended into the saved detector (30% at 1200 steps) — weight-averaging
    with noise, which wrecked eval in the first closed-loop chip run while
    the printed raw-param loss looked converged."""
    import jax

    bias_corr = 1.0 - decay ** n_steps
    return jax.tree.map(lambda e: e / bias_corr, ema)


def ema_decay_for(train_steps: int, decay=EMA_DECAY) -> float:
    """EMA horizon scaled to the run length. A fixed 0.999 over a few
    thousand steps averages params across a phase where they are still
    improving fast (the debiased 150-step smoke EMA spread its weight
    nearly uniformly over ALL 150 steps — mid-training garbage dominated
    the saved detector). Cap the averaging window at ~10% of the run."""
    return min(decay, 1.0 - 10.0 / max(train_steps, 20))


def _load_store(data_dir, modes=("intermediate",)):
    import jax

    from upliftingtabletennis_tpu.data import datagen as DG
    from upliftingtabletennis_tpu.data import synthetic as SYN

    stores = []
    if data_dir and os.path.isdir(data_dir):
        for mode in modes:
            for direction in DG.DIRECTIONS:
                npz = os.path.join(data_dir, mode, f"{direction}.npz")
                if os.path.isfile(npz):
                    stores.append(SYN.load_store_npz(npz))
    if not stores:
        key = jax.random.PRNGKey(0)
        res = DG.generate_dataset(key, 256, "intermediate", "left_to_right")
        stores.append(SYN.store_from_datagen(res))
    return SYN.concat_stores(stores)


def _detector_meta(ckpt, default_name, default_res):
    """Architecture AND input resolution recorded in the checkpoint's
    self-describing metadata (utils/checkpoint.save_checkpoint) — the eval
    must reconstruct whatever train_detectors actually trained, not
    hard-coded/CLI values: a --skip_train eval against checkpoints trained
    at a different render_res would otherwise silently run the detectors at
    the wrong resolution (ADVICE r4 #3; same class of bug fixed earlier in
    tools/diagnose_table_detector)."""
    try:
        with open(os.path.join(ckpt, "meta.json")) as f:
            info = json.load(f)["additional_info"]
        name = info.get("model", default_name)
        res = tuple(info.get("render_res", default_res))
    except Exception:
        return default_name, tuple(default_res)
    if tuple(default_res) != res:
        print(f"[closed_loop] WARNING: --render_res {tuple(default_res)} != "
              f"checkpoint's trained resolution {res} ({ckpt}); "
              f"using the checkpoint's", flush=True)
    return name, res


def _pipeline_from(ball_ckpt, table_ckpt, uplifting_checkpoint, model_res, chunk=8):
    """Pipeline with the closed-loop-trained detectors. Main and aux slots
    share one model per task — the dual-model agreement filter then always
    passes, which is the protocol's intent (it still exercises the filter,
    DBSCAN fusion, calibration and uplifting stages)."""
    from upliftingtabletennis_tpu.pipeline.interface import (
        BallDetector,
        TableDetector,
        TableTennisPipeline,
        UpliftingModel,
    )

    ball_name, ball_res = _detector_meta(ball_ckpt, "wasb", model_res)
    table_name, table_res = _detector_meta(table_ckpt, "hrnet", model_res)
    pipe = TableTennisPipeline.__new__(TableTennisPipeline)
    pipe.ball_detector = BallDetector(ball_name, ball_ckpt, chunk, resolution=ball_res)
    pipe.ball_detector_aux = BallDetector(ball_name, ball_ckpt, chunk, resolution=ball_res)
    pipe.table_detector = TableDetector(table_name, table_ckpt, chunk, resolution=table_res)
    pipe.table_detector_aux = TableDetector(table_name, table_ckpt, chunk, resolution=table_res)
    if uplifting_checkpoint:
        pipe.uplifting_model = UpliftingModel(uplifting_checkpoint)
    else:
        print("[closed_loop] WARNING: no --uplifting_checkpoint — the uplifting "
              "arm runs RANDOM-INIT weights; its 3D/spin numbers are noise "
              "(the physics-fit arm is unaffected)", flush=True)
        pipe.uplifting_model = UpliftingModel(name="connectstage", size="small")
    pipe.KEYPOINT_VISIBLE = 1
    return pipe


def train_detectors(store, args):
    """Train ball (triplet) + table (single-frame) detectors on frames
    rendered inside the jitted step (loss/EMA semantics as the reference
    trainers, ref: balldetection/train.py:93-141)."""
    import jax
    import jax.numpy as jnp
    import optax

    from upliftingtabletennis_tpu.data import synthetic as SYN
    from upliftingtabletennis_tpu.data.image_transforms import normalize_image
    from upliftingtabletennis_tpu.data.render_rally import (
        project_context,
        render_frames,
        rescale_px,
    )
    from upliftingtabletennis_tpu.core.geometry import WIDTH as UPL_W, HEIGHT as UPL_H
    from upliftingtabletennis_tpu.eval import metrics as M
    from upliftingtabletennis_tpu.models.factory import get_detector

    RW, RH = args.render_res  # rendered frame resolution == model input res
    B = args.batch_size
    store_j = jax.tree.map(jnp.asarray, store)
    train_idx = jnp.asarray(SYN.split_indices(len(store), "train"))

    def sample_rendered(key, store_arg, idx_arg, task):
        """(images, coords_eval, vis) rendered on the fly. The store MUST
        arrive as a jit argument — closing over the ~GB corpus embeds it
        as HLO constants and the serialized compile request exceeds the
        remote compile helper's body limit (HTTP 413)."""
        k_idx, k_b, k_t, k_n = jax.random.split(key, 4)
        idx = jax.random.choice(k_idx, idx_arg, (B,), replace=False)
        sample = SYN.assemble_batch(k_b, store_arg, idx, train=True)
        r_img = sample["r_img"]            # (B, 50, 2) px in 2560x1440
        mask = sample["mask"]              # (B, 50)
        table_img = sample["table_img"]    # (B, 13, 3)
        # random valid frame (not first/last so the triplet stays in-rally)
        T = r_img.shape[1]
        u = jax.random.uniform(k_t, (B,))
        n_valid = jnp.sum(mask, axis=1)
        t_mid = jnp.clip((u * (n_valid - 2)).astype(jnp.int32) + 1, 1, T - 2)
        bidx = jnp.arange(B)

        table_px = rescale_px(table_img[..., :2], (UPL_W, UPL_H), (EVAL_W, EVAL_H))
        ball_px_all = rescale_px(r_img, (UPL_W, UPL_H), (EVAL_W, EVAL_H))
        # world-anchored floor/marker context: without it corner identities
        # are mirror-ambiguous and the table detector collapses (round-2/3)
        ctx_px = rescale_px(
            project_context(sample["Mint"], sample["Mext"]),
            (UPL_W, UPL_H), (EVAL_W, EVAL_H),
        )  # (B, 3, 4, 2)

        def render_one(k, b):
            """Render at the EVAL resolution (1920x1080) and downscale to the
            model input res through the pipeline's OWN resampling chain —
            jax.image.resize bilinear/antialias=False == cv2.INTER_LINEAR
            (image_transforms.host_downscale), + uint8 quantization. Round-2
            trained on frames rendered DIRECTLY at model res: the renderer's
            hard-thresholded ~1.4 px table lines then looked nothing like the
            antialiased lines the eval-time 1080p->model downscale produces,
            and the table detector collapsed (VERDICT round-2 weak #1)."""
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
            return jnp.concatenate([f for f in frames], axis=-1)  # (RH, RW, 3|9)

        keys = jax.random.split(k_n, B)
        images = jax.vmap(render_one)(keys, bidx)
        if task == "ball":
            coords = ball_px_all[bidx, t_mid][:, None]  # (B, 1, 2) eval px
            vis = jnp.ones((B, 1))
        else:
            coords = table_px  # (B, 13, 2) eval px
            vis = table_img[..., 2]
        return images, coords, vis

    from upliftingtabletennis_tpu.utils.checkpoint import save_checkpoint
    from upliftingtabletennis_tpu.ops.peak import extract_peaks

    results = {}
    for task in args.tasks:
        model_name = args.ball_model if task == "ball" else args.table_model
        model, _ = get_detector(model_name, task, train=True, remat=True)
        n_ch = 9 if task == "ball" else 3
        n_pts = 1 if task == "ball" else 13
        rng = jax.random.PRNGKey(args.seed + (0 if task == "ball" else 1))
        rng, k_init = jax.random.split(rng)
        variables = jax.jit(model.init)(k_init, jnp.zeros((1, RH, RW, n_ch)))
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        # the model's OUTPUT resolution (heatmap grid): HRNet's stride-1 stem
        # gives OH,OW == RH,RW; SegFormer predicts at 1/4 input res (the
        # reference upsamples b2 logits to eval res — numerically the same
        # objective, (4x)^2 less loss-tensor bandwidth to keep it native)
        eval_model, _ = get_detector(model_name, task, train=False)
        _y = jax.eval_shape(
            eval_model.apply, variables,
            jax.ShapeDtypeStruct((1, RH, RW, n_ch), jnp.float32),
        )
        _heat = _y[0] if isinstance(_y, tuple) else _y
        OH, OW = _heat.shape[1], _heat.shape[2]  # NHWC
        if args.init_from:
            # warm-start a continuation run (e.g. a fresh LR anneal from the
            # best checkpoint of a previous schedule) instead of from scratch
            from upliftingtabletennis_tpu.utils.checkpoint import load_checkpoint
            src = os.path.join(args.init_from, f"{task}_detector")
            tree, _, src_info = load_checkpoint(src)
            params = jax.tree.map(jnp.asarray, tree["params"])
            if tree.get("batch_stats"):
                batch_stats = jax.tree.map(jnp.asarray, tree["batch_stats"])
            print(f"[{task}] warm-start from {src} "
                  f"(val_px_err {src_info.get('val_px_err')})", flush=True)
        accum = max(1, args.accum)
        n_updates = max(1, args.train_steps // accum)
        # warmup + cosine decay: constant Adam at the peak lr oscillates
        # around the optimum at this tiny batch size; the tail anneal is
        # what turns coarse localization into few-px peaks
        warmup = min(100, max(10, n_updates // 20))
        # tiny fixture runs: warmup must leave a positive decay span
        warmup = min(warmup, max(1, n_updates // 2))
        sched = optax.warmup_cosine_decay_schedule(
            0.0, args.lr, warmup, n_updates, args.lr * 0.03
        )
        tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(sched))
        if accum > 1:
            # effective batch = accum * batch_size without the HBM cost
            # (batch 2 at full-res HRNet already fills the 16 GB chip);
            # params only move every `accum` microbatches
            tx = optax.MultiSteps(tx, every_k_schedule=accum)
        opt_state = tx.init(params)
        decay = ema_decay_for(args.train_steps)
        ema = jax.tree.map(jnp.zeros_like, params)  # see ema_finalize

        # loss is computed at the model's NATIVE output resolution (OH, OW):
        # targets render there with sigma scaled from the 6-px eval-res
        # reference value — numerically the same objective as upsampling
        # logits to eval res, at (EVAL/OUT)^2 x less loss-tensor bandwidth
        sx, sy = OW / EVAL_W, OH / EVAL_H
        # floor the sigma at 1.5 OUTPUT px: a /4-res grid would otherwise get
        # a sub-pixel sigma (near-delta targets, no gradient support) —
        # mmpose-style heads use sigma ~2 at /4 for the same reason
        sigma_model = max(6.0 * sx, 1.5)

        # Two jitted programs per step, NOT one: the fused
        # assemble+render+fwd/bwd program exceeds the remote compile
        # helper's capacity on this host (HTTP 500 / broken pipe — same
        # limit that pins the pipeline chunk at 8). The extra program
        # execution costs only the ~4 ms floor.
        @jax.jit
        def make_batch(key, store_arg, idx_arg):
            k_data, k_drop = jax.random.split(key)
            images, coords, vis = sample_rendered(k_data, store_arg, idx_arg, task)
            # Pixel-center mapping into the model-output grid — the exact
            # inverse of the pipeline decode (ops/peak.py:99, ref
            # balldetection/transforms.py:44-48). Plain `coords * s` scaling
            # here trained the round-4 detectors to targets carrying a
            # systematic 0.5*(1/s - 1) px/axis decode bias: +3.5 px/axis at
            # SegFormer's 1/4-res output = the uniform ~4.9 px radial table
            # error ADVICE r4 #1 diagnosed (README had misattributed it to
            # render-domain noise).
            coords_m = (coords[:, :n_pts] + 0.5) * jnp.asarray([sx, sy]) - 0.5
            target = M.render_gaussian_heatmaps(
                coords_m, vis[:, :n_pts], OH, OW, sigma_model
            )
            # Normalize EXACTLY like the inference pipeline (resize->
            # ImageNet normalize, interface.py) — the detectors trained
            # here are consumed by that pipeline, so raw-pixel training
            # inputs would be out of distribution at eval. Casting/
            # normalizing here (not in the train step) also dodges an XLA
            # space-to-batch crash on u8 conv inputs (select between f32
            # and u8 pad operands, SIGABRT).
            return (normalize_image(images.astype(jnp.float32)), target,
                    coords_m, vis[:, :n_pts], k_drop)

        def soft_argmax_px(heat_bchw):
            """Per-channel spatial-softmax expectation (DSNT) in model px."""
            B2, C, H2, W2 = heat_bchw.shape
            p = jax.nn.softmax(
                (args.softargmax_beta * heat_bchw).reshape(B2, C, -1), axis=-1
            ).reshape(B2, C, H2, W2)
            ex = jnp.sum(p * jnp.arange(W2, dtype=jnp.float32)[None, None, None, :],
                         axis=(-2, -1))
            ey = jnp.sum(p * jnp.arange(H2, dtype=jnp.float32)[None, None, :, None],
                         axis=(-2, -1))
            return jnp.stack([ex, ey], axis=-1)

        @jax.jit
        def step(params, batch_stats, opt_state, ema, images, target,
                 coords_m, vis, k_drop):
            def loss_fn(p):
                out = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    images.astype(jnp.float32),
                    mutable=["batch_stats"] if batch_stats else [],
                    rngs={"dropout": k_drop},
                )
                y, new_state = out if batch_stats else (out, {})
                heat = y[0] if isinstance(y, tuple) else y  # some models return (heat, cls)
                logits = jnp.moveaxis(heat, -1, 1)
                mse = M.weighted_mse_loss(logits, target)
                # Soft-argmax coordinate loss: sparse-heatmap MSE alone has a
                # near-degenerate minimum at the dataset-mean heatmap — the
                # round-3 table detector converged in LOSS while its heatmaps
                # were ~zero with peaks clustered at the table center
                # (artifacts/diagnose_table overlays). The spatial-softmax
                # expectation has no such collapse: any mass off the true
                # location pays linearly, and the gradient directly optimizes
                # the metric being judged (px error).
                pred_px = soft_argmax_px(logits)
                norm = jnp.asarray([OW, OH], jnp.float32)
                l1 = jnp.abs(pred_px - coords_m) / norm
                m = (vis > 0).astype(jnp.float32)[..., None]
                coord = jnp.sum(l1 * m) / jnp.maximum(jnp.sum(m) * 2, 1.0)
                return mse + args.coord_weight * coord, (new_state, mse, coord)

            (loss, (new_state, mse, coord)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            ema = ema_update(ema, params, decay)
            return (params, new_state.get("batch_stats", batch_stats), opt_state,
                    ema, loss, mse, coord)

        # ---- validation probe (the ONLY trusted signal: round 3 declared a
        # detector converged on train loss while val px error sat at 170;
        # eval_model was built above for the output-shape probe) ----
        val_idx = jnp.asarray(SYN.split_indices(len(store), "val"))

        @jax.jit
        def probe_err(p, bs, key, store_arg, idx_arg):
            images, coords, vis = sample_rendered(key, store_arg, idx_arg, task)
            x = normalize_image(images.astype(jnp.float32))
            v = {"params": p}
            if bs:
                v["batch_stats"] = bs
            y = eval_model.apply(v, x)
            heat = y[0] if isinstance(y, tuple) else y
            pk = extract_peaks(jnp.moveaxis(heat, -1, 1), EVAL_W, EVAL_H)
            err = jnp.linalg.norm(pk[..., :2] - coords[:, :n_pts], axis=-1)
            m = (vis[:, :n_pts] > 0).astype(jnp.float32)
            return jnp.sum(err * m), jnp.sum(m)

        def val_px(p, bs, n_batches=6, seed0=7_000):
            s = c = 0.0
            for i in range(n_batches):
                e, n = probe_err(p, bs, jax.random.PRNGKey(seed0 + i),
                                 store_j, val_idx)
                s += float(e)
                c += float(n)
            return s / max(c, 1.0)

        best = {"px": float("inf"), "params": None, "bs": None, "step": -1}
        evals_since_best = 0
        t0 = time.perf_counter()
        steps_run = args.train_steps
        for it in range(args.train_steps):
            rng, k = jax.random.split(rng)
            images, target, coords_m, vis, k_drop = make_batch(k, store_j, train_idx)
            params, batch_stats, opt_state, ema, loss, mse, coord = step(
                params, batch_stats, opt_state, ema, images, target,
                coords_m, vis, k_drop
            )
            if it % 50 == 0 or it == args.train_steps - 1:
                print(f"[{task}] step {it}: loss {float(loss):.4f} "
                      f"(mse {float(mse):.4f} coord {float(coord):.4f}) "
                      f"({time.perf_counter() - t0:.0f}s)", flush=True)
            last = it == args.train_steps - 1
            if args.eval_every and ((it + 1) % args.eval_every == 0 or last):
                px = val_px(params, batch_stats)
                marker = ""
                if px < best["px"]:
                    best = {"px": px, "params": jax.device_get(params),
                            "bs": jax.device_get(batch_stats), "step": it}
                    evals_since_best = 0
                    marker = "  *best*"
                    # persist the snapshot IMMEDIATELY: the tunneled chip has
                    # multi-minute outages that can kill a run mid-training;
                    # a retry can then --init_from <out>/best_snapshot
                    snap = os.path.join(args.out, "best_snapshot",
                                        f"{task}_detector")
                    s_tree = {"params": best["params"]}
                    if best["bs"]:
                        s_tree["batch_stats"] = best["bs"]
                    save_checkpoint(
                        snap, s_tree, f"closed_loop_{model_name}",
                        {"task": task, "model": model_name,
                         "render_res": list(args.render_res),
                         "weights": f"best@{it}", "val_px_err": px,
                         "steps_run": it + 1})
                else:
                    evals_since_best += 1
                print(f"[{task}] step {it}: VAL px {px:.1f}{marker}", flush=True)
                if args.patience and evals_since_best >= args.patience and not last:
                    print(f"[{task}] early stop at step {it} "
                          f"(no val improvement in {args.patience} evals; "
                          f"best {best['px']:.1f} px @ step {best['step']})",
                          flush=True)
                    steps_run = it + 1
                    break

        ema = ema_finalize(ema, steps_run, decay)

        # Pick among final raw params, the EMA, and the best-val snapshot by
        # measured val detection error (rendered exactly like training
        # batches, scored in eval px) — at short step counts the EMA window
        # can lag the raw params, and the best-val snapshot wins whenever
        # training wandered after its peak.
        cands = {"raw": (params, batch_stats), "ema": (ema, batch_stats)}
        if best["params"] is not None:
            cands[f"best@{best['step']}"] = (best["params"], best["bs"])
        px_err = {}
        for cand, (p, bs) in cands.items():
            px_err[cand] = val_px(p, bs, n_batches=4, seed0=8_000)
        chosen = min(px_err, key=px_err.get)
        print(f"[{task}] val detection px err: "
              + " ".join(f"{k} {v:.1f}" for k, v in px_err.items())
              + f" -> saving {chosen}", flush=True)

        ckpt = os.path.join(args.out, f"{task}_detector")
        p_sel, bs_sel = cands[chosen]
        tree = {"params": jax.device_get(p_sel)}
        if bs_sel:
            tree["batch_stats"] = jax.device_get(bs_sel)
        save_checkpoint(ckpt, tree, f"closed_loop_{model_name}",
                        {"task": task, "model": model_name,
                         "render_res": list(args.render_res),
                         "weights": chosen, "val_px_err": px_err[chosen],
                         "steps_run": steps_run})
        results[task] = ckpt
    return results


def evaluate_pipeline(store, ckpts, args):
    """Render held-out rallies at 1920x1080 and run the COMPLETE pipeline,
    scoring vs physics truth (metrics per inference_combined.py:137-163
    + 3D error the real datasets cannot provide)."""
    import jax
    import jax.numpy as jnp

    from upliftingtabletennis_tpu.core.geometry import (
        HEIGHT as UPL_H,
        WIDTH as UPL_W,
        transform_rotation_axes,
    )
    from upliftingtabletennis_tpu.data import synthetic as SYN
    from upliftingtabletennis_tpu.data.render_rally import (
        project_context,
        render_frames,
        rescale_px,
    )
    from upliftingtabletennis_tpu.train.uplifting_train import spin_classification_metrics

    store_j = jax.tree.map(jnp.asarray, store)
    test_idx = SYN.split_indices(len(store), "test")[: args.n_eval]
    # jit with the store as an ARGUMENT (eager per-rally assembly dispatches
    # hundreds of ops through the per-program floor; closure would embed the
    # corpus as HLO constants — see sample_rendered)
    assemble_j = jax.jit(lambda k, s, i: SYN.assemble_batch(k, s, i, train=True))
    pipe = _pipeline_from(
        ckpts["ball"], ckpts["table"], args.uplifting_checkpoint, tuple(args.render_res)
    )

    from upliftingtabletennis_tpu.core import geometry as G

    def calib_reproj_px(Mint_c, Mext_c, table_out):
        """Mean reprojection error (px @1920x1080) of the calibrated camera
        over the VISIBLE detected keypoints — the quality signal the
        physics-fit arm gates on (n_inliers alone passed cameras whose
        reprojections were hundreds of px off in the round-2 run)."""
        vis = table_out[:, 2] > 0
        if not vis.any():
            return float("inf")
        proj = np.asarray(
            G.world2img(
                jnp.asarray(G.TABLE_POINTS, jnp.float32),
                jnp.asarray(Mext_c, jnp.float32),
                jnp.asarray(Mint_c, jnp.float32),
            )
        )
        d = np.linalg.norm(proj[vis] - table_out[vis, :2], axis=-1)
        return float(np.mean(d))

    ball_px_errs, table_px_errs, pos3d_errs = [], [], []
    table_kp_errs = [[] for _ in range(13)]
    spin_scores, spin_labels = [], []
    pf_pos3d, pf_cls, pf_lbl, pf_reproj = [], [], [], []
    pf_spread, pf_seed_agree = [], []
    ball_frame_diag = []
    rally_diag = []
    calib_inliers, calib_reprojs = [], []
    n_valid_frames = 0
    n_evaluated = 0
    n_pf_calib_fail = 0
    for j, ti in enumerate(test_idx):
        key = jax.random.PRNGKey(10_000 + int(ti))
        sample = assemble_j(
            key, store_j, jnp.asarray([int(ti)])
        )  # train=True samples a fresh camera; key is fixed per rally
        mask = np.asarray(sample["mask"][0])
        T = int(mask.sum())
        if T < 8:
            continue
        n_evaluated += 1
        r_img_pad = np.asarray(sample["r_img"][0])       # (50, 2) 2560x1440 px
        table_img = np.asarray(sample["table_img"][0])
        r_world = np.asarray(sample["r_world"][0][:T])
        rotation = np.asarray(sample["rotation"][0])
        times = np.asarray(sample["times"][0][:T])

        ball_eval_pad = np.asarray(rescale_px(r_img_pad, (UPL_W, UPL_H), (EVAL_W, EVAL_H)))
        ball_eval = ball_eval_pad[:T]
        table_eval = np.asarray(
            rescale_px(table_img[:, :2], (UPL_W, UPL_H), (EVAL_W, EVAL_H))
        )
        # render the whole rally at the pipeline's working resolution; the
        # padded tail renders ball-free and is sliced off (fixed shape ->
        # one compile for all rallies)
        ctx_eval = rescale_px(
            project_context(sample["Mint"][0], sample["Mext"][0]),
            (UPL_W, UPL_H), (EVAL_W, EVAL_H),
        )
        frames = np.asarray(
            render_frames(
                jax.random.PRNGKey(j), jnp.asarray(ball_eval_pad), jnp.asarray(mask),
                jnp.asarray(table_eval), height=EVAL_H, width=EVAL_W,
                context_px=ctx_eval,
            )
        )[:T]
        fps = 1.0 / max(float(times[1] - times[0]), 1e-6)
        out = pipe.run_rally(frames, fps=fps)

        # ball detection error vs ground truth at the filtered frames
        # (valid_idx indexes interior frames 1..T-2, interface.py run_rally)
        vi = np.asarray(out["valid_idx"]) + 1
        if len(vi):
            d = np.linalg.norm(out["ball"] - ball_eval[vi], axis=-1)
            ball_px_errs.append(d)
            n_valid_frames += len(vi)
            # per-frame diagnostics for the heavy-tail hunt (VERDICT r4 #6):
            # rally id, frame index, distance to rally edges, time to the
            # nearest bounce, GT position — enough to characterize outliers
            # offline without re-running the chip
            # "hits" = first table-bounce time of the rally (-1 if none)
            hits = np.atleast_1d(np.asarray(sample.get("hits", [-1.0]))[0])
            bounces = hits[hits >= 0]
            for fi, err in zip(vi.tolist(), d.tolist()):
                t_f = float(times[fi]) if fi < len(times) else 0.0
                dt_bounce = (
                    float(np.min(np.abs(bounces - t_f)))
                    if bounces.size else None
                )
                ball_frame_diag.append({
                    "rally": int(ti), "frame": int(fi), "err_px": float(err),
                    "edge_dist": int(min(fi, T - 1 - fi)),
                    "dt_bounce_s": dt_bounce,
                    "gt_x": float(ball_eval[fi, 0]),
                    "gt_y": float(ball_eval[fi, 1]),
                })

        # table keypoint error vs ground truth (per keypoint too — a single
        # aggregate was too coarse to localize the round-2 failure)
        vis_kp = out["table"][:, 2] > 0
        if vis_kp.any():
            dt = np.linalg.norm(out["table"][vis_kp, :2] - table_eval[vis_kp], axis=-1)
            table_px_errs.append(dt)
            for kp in np.flatnonzero(vis_kp):
                table_kp_errs[kp].append(
                    float(np.linalg.norm(out["table"][kp, :2] - table_eval[kp]))
                )

        # calibration quality on EVERY rally (not just the physfit arm)
        Mint_c, Mext_c, n_inl = pipe.calibrate_camera(out["table"])
        reproj = calib_reproj_px(Mint_c, Mext_c, np.asarray(out["table"]))
        calib_inliers.append(int(n_inl))
        calib_reprojs.append(reproj)

        # 3D trajectory error vs physics, spin class vs physics
        d3 = None
        if out["pos3d"] is not None and len(out["pos3d"]) == len(vi):
            d3 = np.linalg.norm(out["pos3d"] - r_world[vi], axis=-1)
            pos3d_errs.append(d3)
        # per-rally diagnostics: localizes tails (e.g. which rallies carry
        # the calib mean>>median gap) without re-running the chip
        rally_diag.append({
            "rally": int(ti), "T": T, "n_frames": int(len(vi)),
            "n_kp_visible": int(np.sum(vis_kp)), "n_inliers": int(n_inl),
            "calib_reproj_px": float(reproj),
            "table_px_mean": (float(np.mean(dt)) if vis_kp.any() else None),
            "pos3d_err_cm_median": (
                float(100 * np.median(d3)) if d3 is not None else None
            ),
        })
        w_local = np.asarray(
            transform_rotation_axes(jnp.asarray(rotation), jnp.asarray(r_world))
        )
        if out["spin"] is not None:
            spin_scores.append(float(out["spin"][1]))
            spin_labels.append(1.0 if w_local[1] > 0 else 2.0)

        # physics-fit arm: the TRAINING-FREE pipeline — same detections and
        # RANSAC-calibrated camera, but differentiable-physics fitting
        # (core/fitting.py) instead of the uplifting network
        if not args.skip_physics_fit and len(vi) >= 8:
            from upliftingtabletennis_tpu.core import fitting as FIT

            # Gate on calibration QUALITY, not only inlier count: a camera
            # with >= 6 inliers but tens-of-px reprojection error feeds the
            # fitter a wrong projection model and the fit diverges to km
            # scale (round-2 artifact; ADVICE.md #1).
            if n_inl < 6 or reproj > args.physfit_max_calib_reproj_px:
                n_pf_calib_fail += 1
            else:
                # pad to the 50-token protocol shape: one compile total
                obs_p = np.zeros((50, 2), np.float32)
                t_p = np.zeros(50, np.float32)
                m_p = np.zeros(50, np.float32)
                k = min(len(vi), 50)
                obs_p[:k] = out["ball"][:k]
                t_p[:k] = np.asarray(out["times"])[:k]
                m_p[:k] = 1.0
                # HYBRID seeding (VERDICT r4 #3): the uplifting network's
                # prediction joins the multi-start and arbitrates basins
                # via seed-aware robust selection — it runs on the SAME
                # detections right above, so this stays training-free at
                # pipeline level while resolving monocular depth ambiguity
                # (interface.fit_physics `init=` semantics).
                init_state = None
                seed_r0 = None
                if (
                    args.uplifting_checkpoint
                    and out["pos3d"] is not None
                    and len(out["pos3d"]) >= 2
                    and out["spin"] is not None
                ):
                    pos3d = np.asarray(out["pos3d"], np.float32)
                    v0 = (pos3d[1] - pos3d[0]) / max(
                        float(t_p[1] - t_p[0]), 1e-3
                    )
                    w_world_seed = G.inverse_transform_rotation_axes(
                        jnp.asarray(out["spin"], jnp.float32),
                        jnp.asarray(pos3d, jnp.float32),
                    )
                    init_state = FIT.BallState(
                        r=jnp.asarray(pos3d[0]), v=jnp.asarray(v0),
                        w=w_world_seed,
                    )
                    seed_r0 = pos3d[0]
                fit = FIT.fit_trajectory(
                    obs_p, t_p, m_p, Mint_c, Mext_c, n_frames=500,
                    n_starts=args.physfit_starts,
                    adam_steps=args.physfit_adam_steps,
                    lm_steps=args.physfit_lm_steps,
                    huber_px=20.0, key=jax.random.PRNGKey(j),
                    init_state=init_state,
                )
                d3f = np.linalg.norm(
                    np.asarray(fit.r_world)[:k] - r_world[vi[:k]], axis=-1
                )
                pf_pos3d.append(d3f)
                pf_reproj.append(float(np.asarray(fit.reproj_px)))
                pf_spread.append(float(np.asarray(fit.basin_spread_m)))
                pf_seed_agree.append(
                    float(np.linalg.norm(np.asarray(fit.state0.r) - seed_r0))
                    if seed_r0 is not None else float("inf")
                )
                pf_cls.append(float(np.asarray(FIT.spin_class_from_fit(fit))))
                pf_lbl.append(1.0 if w_local[1] > 0 else 2.0)

    res = {
        "n_rallies": int(n_evaluated),
        "n_rallies_skipped_short": int(len(test_idx) - n_evaluated),
        "n_detected_frames": int(n_valid_frames),
        "ball_detection_px_mean": float(np.mean(np.concatenate(ball_px_errs))) if ball_px_errs else None,
        "ball_detection_px_median": float(np.median(np.concatenate(ball_px_errs))) if ball_px_errs else None,
        "table_detection_px_mean": float(np.mean(np.concatenate(table_px_errs))) if table_px_errs else None,
        "table_detection_px_median": float(np.median(np.concatenate(table_px_errs))) if table_px_errs else None,
        "table_px_per_keypoint": [
            (float(np.mean(e)) if e else None) for e in table_kp_errs
        ],
        "calib_n_inliers_mean": float(np.mean(calib_inliers)) if calib_inliers else None,
        "calib_reproj_px_mean": (
            float(np.mean([r for r in calib_reprojs if np.isfinite(r)]))
            if any(np.isfinite(r) for r in calib_reprojs) else None
        ),
        "calib_reproj_px_median": (
            float(np.median([r for r in calib_reprojs if np.isfinite(r)]))
            if any(np.isfinite(r) for r in calib_reprojs) else None
        ),
        "pos3d_err_cm_mean": float(100 * np.mean(np.concatenate(pos3d_errs))) if pos3d_errs else None,
        "pos3d_err_cm_median": float(100 * np.median(np.concatenate(pos3d_errs))) if pos3d_errs else None,
    }
    # PCK@k in 1920x1080 eval px. NOTE: ball PCK here is POINT-to-point
    # distance to the physics ground truth — stricter than the reference's
    # ball PCK, which measures distance to the annotated motion-blur STREAK
    # segments (ref: helper_balldetection.py:227-230); synthetic GT has no
    # blur annotation, so these are not directly comparable to
    # reference-published PCK figures. Table PCK matches the reference
    # definition (point keypoints, ref: inference_tabledetection.py:97-105).
    for name, errs in (("ball", ball_px_errs), ("table", table_px_errs)):
        if errs:
            e = np.concatenate(errs)
            for k in (2, 5, 10, 20):
                res[f"{name}_pck@{k}"] = float(np.mean(e <= k))
    if spin_scores:
        sm = spin_classification_metrics(np.asarray(spin_scores), np.asarray(spin_labels))
        res["spin_accuracy"] = sm["accuracy"]
        res["spin_macro_f1"] = sm["macro_f1"]
    # Physics-fit arm: always report sample counts; error metrics are
    # NULLED below a minimum sample count — n=2 "metrics" read as
    # measurements when they are noise (ADVICE.md round-2 #1).
    res["physfit_n_rallies"] = int(len(pf_pos3d))
    res["physfit_n_calib_fail"] = int(n_pf_calib_fail)
    if len(pf_pos3d) >= args.physfit_min_rallies:
        res["physfit_pos3d_err_cm_mean"] = float(100 * np.mean(np.concatenate(pf_pos3d)))
        res["physfit_pos3d_err_cm_median"] = float(100 * np.median(np.concatenate(pf_pos3d)))
        # Convergence gate (GT-free): reproj_px bounds 2D agreement, but a
        # 5-px residual still admits meter-scale DEPTH error (round-4:
        # converged median 8.8 cm, mean 101 cm). The r5 gate additionally
        # requires depth identifiability: either the near-tied basins agree
        # in 3D (FitResult.basin_spread_m small) or the winning basin agrees
        # with the network seed (the learned prior resolves the ambiguity).
        reproj_ok = np.asarray(pf_reproj) <= args.physfit_gate_px
        spread_ok = np.asarray(pf_spread) <= args.physfit_max_spread_m
        seed_ok = np.asarray(pf_seed_agree) <= args.physfit_seed_agree_m
        conv = reproj_ok & (spread_ok | seed_ok)
        res["physfit_gate_px"] = float(args.physfit_gate_px)
        res["physfit_max_spread_m"] = float(args.physfit_max_spread_m)
        res["physfit_basin_spread_m_median"] = float(np.median(pf_spread))
        res["physfit_n_seed_arbitrated"] = int(np.sum(reproj_ok & ~spread_ok & seed_ok))
        res["physfit_coverage"] = float(np.mean(conv))
        res["physfit_n_converged"] = int(conv.sum())
        if conv.any():
            e_conv = np.concatenate(
                [d for d, c in zip(pf_pos3d, conv) if c])
            res["physfit_pos3d_err_cm_mean_converged"] = float(100 * np.mean(e_conv))
            res["physfit_pos3d_err_cm_median_converged"] = float(100 * np.median(e_conv))
        else:
            res["physfit_pos3d_err_cm_mean_converged"] = None
            res["physfit_pos3d_err_cm_median_converged"] = None
        pred = np.asarray(pf_cls)
        gt = np.asarray(pf_lbl)
        res["physfit_spin_accuracy"] = float(np.mean(pred == gt))
        f1 = []
        for c in (1.0, 2.0):
            tp = np.sum((pred == c) & (gt == c))
            fp = np.sum((pred == c) & (gt != c))
            fn = np.sum((pred != c) & (gt == c))
            f1.append(2.0 * tp / max(2.0 * tp + fp + fn, 1e-9))
        res["physfit_spin_macro_f1"] = float(np.mean(f1))
    elif pf_pos3d:
        print(f"[closed_loop] physfit ran on only {len(pf_pos3d)} rallies "
              f"(< {args.physfit_min_rallies}) — error metrics withheld",
              flush=True)
        res["physfit_pos3d_err_cm_mean"] = None
        res["physfit_pos3d_err_cm_median"] = None
        res["physfit_spin_accuracy"] = None
        res["physfit_spin_macro_f1"] = None
    if ball_frame_diag and getattr(args, "out", None):
        with open(os.path.join(args.out, "ball_frame_diag.json"), "w") as f:
            json.dump(ball_frame_diag, f)
    if rally_diag and getattr(args, "out", None):
        with open(os.path.join(args.out, "rally_diag.json"), "w") as f:
            json.dump(rally_diag, f, indent=1)
    return res


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_dir", type=str, default=None)
    p.add_argument("--out", type=str, default="artifacts/closed_loop")
    p.add_argument("--train_steps", type=int, default=3000)
    p.add_argument("--batch_size", type=int, default=2,
                   help="2 fits the remat-trained full-res HRNets in 16 GB "
                        "HBM; batch 4 needs ~24 GB even with remat")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--accum", type=int, default=1,
                   help="gradient-accumulation microbatches per update "
                        "(effective batch = accum * batch_size)")
    p.add_argument("--eval_every", type=int, default=250,
                   help="probe val px error every N steps (0 = off); best-val "
                        "params are snapshotted and eligible for saving")
    p.add_argument("--patience", type=int, default=8,
                   help="early-stop after N val probes without improvement "
                        "(0 = never)")
    p.add_argument("--coord_weight", type=float, default=5.0,
                   help="weight of the soft-argmax coordinate loss (L1 on "
                        "frame-normalized coords) added to the heatmap MSE")
    p.add_argument("--softargmax_beta", type=float, default=20.0,
                   help="spatial-softmax temperature for the coordinate loss")
    p.add_argument("--n_eval", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ball_model", type=str, default="wasb",
                   help="ball detector architecture (models/factory.py)")
    p.add_argument("--table_model", type=str, default="hrnet",
                   help="table detector architecture; segformerpp_b0's "
                        "global (SR-)attention resolves the corner-identity "
                        "ambiguity that caps the conv-only HRNet at ~170 px "
                        "(limited receptive field cannot see the asymmetric "
                        "scene markers from the keypoints)")
    p.add_argument("--render_res", type=int, nargs=2, default=(960, 544),
                   help="rendered-frame + detector input resolution W H "
                        "(training renders at model res; eval renders 1920x1080)")
    p.add_argument("--uplifting_checkpoint", type=str, default=None)
    p.add_argument("--skip_train", action="store_true",
                   help="reuse checkpoints already in --out")
    p.add_argument("--init_from", type=str, default=None,
                   help="warm-start each trained task's params from "
                        "<init_from>/<task>_detector instead of from scratch "
                        "(fresh optimizer + LR schedule — use to anneal a "
                        "previous run's best checkpoint further)")
    p.add_argument("--tasks", type=str, default="ball,table",
                   help="comma-separated detector tasks to (re)train; tasks "
                        "not listed reuse the checkpoint already in --out")
    p.add_argument("--skip_physics_fit", action="store_true",
                   help="skip the training-free differentiable-physics arm")
    p.add_argument("--physfit_starts", type=int, default=24)
    p.add_argument("--physfit_adam_steps", type=int, default=250)
    p.add_argument("--physfit_lm_steps", type=int, default=10)
    p.add_argument("--physfit_max_calib_reproj_px", type=float, default=10.0,
                   help="skip the physics-fit arm when the calibrated "
                        "camera's mean reprojection error exceeds this")
    p.add_argument("--physfit_min_rallies", type=int, default=8,
                   help="withhold physfit error metrics below this sample "
                        "count (counts are always reported)")
    p.add_argument("--physfit_gate_px", type=float, default=5.0,
                   help="convergence gate on the fit's GT-free reprojection "
                        "residual (FitResult.reproj_px): rallies above it "
                        "are excluded from *_converged metrics; coverage "
                        "reports the retained fraction (looser than the "
                        "clean-track 3 px default — detector tracks carry "
                        "~1-2 px detection noise)")
    p.add_argument("--physfit_max_spread_m", type=float, default=0.3,
                   help="depth-identifiability gate: max 3D spread (m) of "
                        "near-tied basins (FitResult.basin_spread_m) for a "
                        "fit to count as converged without seed agreement")
    p.add_argument("--physfit_seed_agree_m", type=float, default=0.5,
                   help="alternative gate arm: a fit whose winning r0 is "
                        "within this distance (m) of the network seed "
                        "counts as converged even when basins are ambiguous "
                        "(the learned prior arbitrates)")
    args = p.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    ckpts = {t: os.path.join(args.out, f"{t}_detector") for t in ("ball", "table")}
    args.tasks = (
        [] if args.skip_train
        else [t.strip() for t in args.tasks.split(",") if t.strip()]
    )
    # Fail fast: a task that is NOT being retrained must already have a
    # checkpoint in --out — otherwise a full training run burns before the
    # missing-checkpoint load error surfaces (ADVICE.md round-2 #2).
    missing = [t for t in ("ball", "table")
               if t not in args.tasks and not os.path.isdir(ckpts[t])]
    if missing:
        raise SystemExit(
            f"[closed_loop] no checkpoint in {args.out} for non-retrained "
            f"task(s) {missing}; train them (--tasks {','.join(missing)}) "
            f"or point --out at a directory that has them"
        )
    if args.uplifting_checkpoint and not os.path.exists(args.uplifting_checkpoint):
        raise SystemExit(
            f"[closed_loop] --uplifting_checkpoint {args.uplifting_checkpoint} "
            "does not exist"
        )

    store = _load_store(args.data_dir)
    print(f"[data] {len(store)} trajectories")
    if args.tasks:
        ckpts.update(train_detectors(store, args))
    res = evaluate_pipeline(store, ckpts, args)
    print(json.dumps(res, indent=2))
    with open(os.path.join(args.out, "closed_loop_results.json"), "w") as f:
        json.dump(res, f, indent=2)
    return res


if __name__ == "__main__":
    main()
