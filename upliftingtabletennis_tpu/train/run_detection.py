"""Detection-model training driver (ball + table), CLI.

TPU-native equivalent of `python -m balldetection.train` /
`python -m tabledetection.train` (ref: balldetection/train.py:42-277,
tabledetection/train.py:38-231):

  python -m upliftingtabletennis_tpu.train.run_detection \
      --task ball --model segformerpp_b2 --data_root <root with tthq/>

Semantics preserved: Adam lr 1e-3, grad clip 5.0, EMA 0.999, weighted-MSE
loss on logits bilinearly upscaled to the 1920x1080 evaluation resolution,
periodic validation every VAL_ITERATIONS with best-PCK@5 checkpointing
(ref: balldetection/train.py:93-141, 133-139). The classification loss is
wired with weight 0 exactly like the reference (train.py:96-97).

TPU-native differences: augmentation + heatmap rendering + loss run fused
on device; the host only decodes PNGs (threaded prefetch).
"""
from __future__ import annotations

import argparse
import os
import time
from functools import partial

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--task", choices=["ball", "table"], default="ball")
    p.add_argument("--model", type=str, default="segformerpp_b2")
    p.add_argument("--data", choices=["tthq", "blurball"], default="tthq",
                   help="blurball = the pretraining dataset (ref: train.py:64-70)")
    p.add_argument("--data_root", type=str, required=True)
    p.add_argument("--pretraining", action="store_true",
                   help="warm-start from the BlurBall-pretrained checkpoint at "
                        "<save_dir>/pretraining_blurball/<model>/model "
                        "(ref: balldetection/models/segformer_pp.py:57-67)")
    p.add_argument("--init_checkpoint", type=str, default=None,
                   help="explicit warm-start checkpoint path (overrides --pretraining)")
    p.add_argument("--torch_init", type=str, default=None,
                   help="raw pretrained torch init weights for wasb/hrnet "
                        "(initialization/wasb/model.pth) or vitpose "
                        "(initialization/vitpose/mae_pretrain_vit_*.pth), "
                        "filtered + first-conv-widened like the reference")
    p.add_argument("--hf_backbone", type=str, default=None,
                   help="path to a HuggingFace nvidia/mit-bN torch state dict "
                        "(.pt/.bin): initializes the SegFormer backbone from "
                        "ImageNet weights via the golden-tested port "
                        "(the reference's external-hub init, "
                        "ref: balldetection/models/segformer_pp.py:12-19)")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--num_epochs", type=int, default=None,
                   help="default: 10 for blurball, 50 ball / 700 table on tthq "
                        "(ref: balldetection/config.py:42, tabledetection/config.py:29)")
    p.add_argument("--val_iterations", type=int, default=500)
    p.add_argument("--val_samples", type=int, default=None,
                   help="cap validation set size (default: full val pass)")
    p.add_argument("--ema_decay", type=float, default=0.999)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--save_dir", type=str, default="saved_models")
    p.add_argument("--logdir", type=str, default="runs")
    p.add_argument("--dp", type=int, default=None,
                   help="data-parallel devices (default: all available)")
    p.add_argument("--max_steps", type=int, default=None, help="debug cap")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax_debug_nans (the reference's detect_anomaly, "
                        "ref: uplifting/train.py:25-26)")
    p.add_argument("--resolution", type=int, nargs=2, default=None,
                   help="override model input resolution W H (debug/smoke)")
    p.add_argument("--eval_resolution", type=int, nargs=2, default=None,
                   help="override 1920x1080 eval resolution (debug/smoke)")
    p.add_argument("--in_frames", type=int, choices=(1, 3), default=None,
                   help="ball input frames, 1 or 3 (ref: balldetection/train.py:12, "
                        "dataset.py:26); table is always 1")
    p.add_argument("--heatmap_sigma", type=float, default=6.0,
                   help="Gaussian target sigma at eval res (ref: balldetection/train.py:13)")
    p.add_argument("--not_use_invis", action="store_true",
                   help="exclude invisible-ball samples from train AND val "
                        "(ref: balldetection/train.py:14,65-69)")
    p.add_argument("--exp_id", type=str, default=None,
                   help="experiment tag embedded in the run identifier "
                        "(ref: balldetection/config.py:47)")
    p.add_argument("--debug", action="store_true",
                   help="debug mode: route logs/checkpoints to <dir>_tmp and enable "
                        "jax_debug_nans (ref: balldetection/config.py:49-50, "
                        "uplifting/train.py:25-26)")
    args = p.parse_args(argv)
    if args.debug:
        args.debug_nans = True
        args.logdir = args.logdir.rstrip("/") + "_tmp"
        args.save_dir = args.save_dir.rstrip("/") + "_tmp"
    if args.num_epochs is None:
        args.num_epochs = 10 if args.data == "blurball" else (50 if args.task == "ball" else 700)

    import jax
    import jax.numpy as jnp
    import optax

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    from upliftingtabletennis_tpu.data import detection as D
    from upliftingtabletennis_tpu.data.image_transforms import (
        ImageAugmentConfig,
        augment_detection_batch,
    )
    from upliftingtabletennis_tpu.eval import metrics as M
    from upliftingtabletennis_tpu.models.factory import get_detector
    from upliftingtabletennis_tpu.ops.peak import extract_peaks
    from upliftingtabletennis_tpu.utils.checkpoint import save_checkpoint

    task = args.task
    in_frames = (args.in_frames or 3) if task == "ball" else 1
    model, (MW, MH) = get_detector(args.model, task, in_frames=in_frames,
                                   train=True, remat=True)
    eval_model, _ = get_detector(args.model, task, in_frames=in_frames, train=False)
    if args.resolution:
        MW, MH = args.resolution
    EW, EH = args.eval_resolution or (D.EVAL_WIDTH, D.EVAL_HEIGHT)

    # Flip would swap left/right table keypoint identities -> disabled for
    # the table task (ref: tabledetection/transforms.py:53)
    aug_cfg = ImageAugmentConfig(flip_prob=0.5 if task == "ball" else 0.0)

    use_invis = not args.not_use_invis
    if task == "ball" and args.data == "tthq":
        index_tr = D.load_tthq_ball_index(args.data_root, "train", use_invisible=use_invis)
        index_va = D.load_tthq_ball_index(args.data_root, "val", use_invisible=use_invis)
        load = partial(D.load_ball_batch, in_frames=in_frames)
    elif task == "ball":  # blurball pretraining run
        index_tr = D.load_blurball_index(args.data_root, "train", use_invisible=use_invis)
        index_va = D.load_blurball_index(args.data_root, "val", use_invisible=use_invis)
        load = partial(D.load_blurball_ball_batch, in_frames=in_frames)
    elif args.data == "tthq":
        index_tr = D.load_tthq_table_index(args.data_root, "train")
        index_va = D.load_tthq_table_index(args.data_root, "val")
        load = D.load_table_batch
    else:
        index_tr = D.load_blurball_table_index(args.data_root, "train")
        index_va = D.load_blurball_table_index(args.data_root, "val")
        load = D.load_blurball_table_batch

    print(f"[data] {args.data}: {len(index_tr)} train / {len(index_va)} val samples")

    # data-parallel mesh: batch sharded over 'dp', params replicated; XLA
    # partitions the jitted step into per-device compute + psum gradient
    # reduction (SURVEY §2.8 parallelism note / §5.8)
    from upliftingtabletennis_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        replicate,
        replicated_sharding,
    )

    n_dp = args.dp or len(jax.devices())
    if args.batch_size % n_dp != 0:
        n_dp = 1
    mesh = make_mesh(n_dp=n_dp, devices=jax.devices()[:n_dp])
    shard_b = batch_sharding(mesh)
    print(f"[parallel] dp={n_dp} device(s)")

    def put_batch(*arrays):
        return tuple(jax.device_put(jnp.asarray(a), shard_b) for a in arrays)

    rng = jax.random.PRNGKey(args.seed)
    example = jnp.zeros((args.batch_size, MH, MW, 3 * in_frames))
    variables = jax.jit(model.init)(rng, example)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    init_ckpt = args.init_checkpoint
    if init_ckpt is None and args.pretraining:
        init_ckpt = os.path.join(args.save_dir, "pretraining_blurball", args.model, "model")
    if init_ckpt:
        # warm start from the BlurBall-pretrained weights: the reference's
        # pretrain -> finetune handoff (ref: balldetection/train.py:58-60)
        from upliftingtabletennis_tpu.utils.checkpoint import load_checkpoint

        warm, _, _ = load_checkpoint(init_ckpt)
        params = warm["params"]
        batch_stats = warm.get("batch_stats", batch_stats)
        print(f"[init] warm-started from {init_ckpt}")
    if args.torch_init:
        # the reference's raw pretrained initialization weights: WASB
        # publish -> HRNet family (ref: wasb.py:580-589), MAE -> ViTPose
        # backbone (ref: vitpose.py:56-78); filtered load + first-conv
        # widening semantics live in port_torch.torch_init_detector
        import torch as _torch

        from upliftingtabletennis_tpu.utils.port_torch import torch_init_detector

        sd = _torch.load(args.torch_init, map_location="cpu")
        if isinstance(sd, dict) and isinstance(sd.get("model"), dict):
            sd = sd["model"]  # MAE checkpoint layout
        elif isinstance(sd, dict) and isinstance(sd.get("state_dict"), dict):
            sd = sd["state_dict"]
        variables, n_loaded, n_total = torch_init_detector(
            {"params": params, "batch_stats": batch_stats}, sd,
            args.model, in_frames)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", batch_stats)
        print(f"[init] loaded {n_loaded}/{n_total} tensors from {args.torch_init}")
    if args.hf_backbone:
        # ImageNet init for the MiT backbone from a HuggingFace mit-bN
        # state dict, via the golden-parity-tested port; the first patch
        # embed is widened to 3*in_frames channels by weight tiling / n
        # exactly like the reference (ref: segformer_pp.py:32-37)
        assert "segformer" in args.model, "--hf_backbone needs a segformer model"
        import torch as _torch

        from upliftingtabletennis_tpu.utils.port_torch import (
            port_hf_segformer_backbone,
        )

        sd = _torch.load(args.hf_backbone, map_location="cpu")
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        ported = port_hf_segformer_backbone(sd)
        n_in = 3 * in_frames
        if n_in != 3:
            pe0 = ported["patch_embed_0"]["kernel"]
            ported["patch_embed_0"]["kernel"] = np.tile(
                pe0, (1, 1, n_in // 3, 1)
            ) / (n_in // 3)
        # structure-checked merge: tree.map fails loudly on any mismatch
        params = dict(params)
        params["backbone"] = jax.tree.map(
            lambda a, b: jnp.asarray(b, a.dtype), params["backbone"], ported
        )
        print(f"[init] MiT backbone initialized from {args.hf_backbone}")
    params = replicate(mesh, params)
    batch_stats = replicate(mesh, batch_stats)
    ema_params = params
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(args.lr))
    opt_state = tx.init(params)

    n_points = 1 if task == "ball" else 13

    @jax.jit
    def train_step(params, batch_stats, opt_state, ema, key, images, coords, vis):
        """images raw [0,255] at source res; coords in source px."""
        k1, k2, k_drop = jax.random.split(key, 3)
        imgs, c_model, v = augment_detection_batch(
            k1, images, coords, vis, (MW, MH), aug_cfg, True
        )
        # coords at eval res for the target heatmap (ref: train flow). For
        # the ball task coords carry (center, streak_min, streak_max); only
        # the center renders a heatmap (ref: dataset.py:434-440)
        c_eval = jnp.stack(
            [(c_model[..., 0] + 0.5) * EW / MW - 0.5, (c_model[..., 1] + 0.5) * EH / MH - 0.5],
            -1,
        )
        tp = 1 if task == "ball" else n_points
        target = M.render_gaussian_heatmaps(c_eval[:, :tp], v[:, :tp], EH, EW,
                                            args.heatmap_sigma)

        def loss_fn(p):
            out = model.apply(
                {"params": p, "batch_stats": batch_stats},
                imgs,
                mutable=["batch_stats"] if batch_stats else [],
                rngs={"dropout": k_drop},
            )
            (heat, cls_out), new_state = out if batch_stats else (out, {})
            logits = jnp.moveaxis(heat, -1, 1)  # (B, P, h, w)
            logits = jax.image.resize(logits, (*logits.shape[:2], EH, EW), "bilinear")
            loss = M.weighted_mse_loss(logits, target)
            return loss, new_state

        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = jax.tree.map(lambda e, q: args.ema_decay * e + (1 - args.ema_decay) * q, ema, params)
        bs = new_state.get("batch_stats", batch_stats)
        return params, bs, opt_state, ema, loss

    @jax.jit
    def infer(params, batch_stats, images, coords, vis, key):
        imgs, c_model, v = augment_detection_batch(
            key, images, coords, vis, (MW, MH), aug_cfg, False
        )
        vars_ = {"params": params}
        if batch_stats:
            vars_["batch_stats"] = batch_stats
        heat, _ = eval_model.apply(vars_, imgs)
        heat = jnp.moveaxis(heat, -1, 1)  # (B, P, h, w)
        preds = extract_peaks(heat, EW, EH, threshold=-jnp.inf if task == "ball" else 0.1)
        c_eval = jnp.stack(
            [(c_model[..., 0] + 0.5) * EW / MW - 0.5, (c_model[..., 1] + 0.5) * EH / MH - 0.5],
            -1,
        )
        gts = jnp.concatenate([c_eval, v[..., None]], -1)
        return preds, gts

    @jax.jit
    def infer_viz(params, batch_stats, images, coords, vis, key):
        """First-val-batch visualization pieces: model-res images + heatmaps."""
        imgs, c_model, v = augment_detection_batch(
            key, images, coords, vis, (MW, MH), aug_cfg, False
        )
        vars_ = {"params": params}
        if batch_stats:
            vars_["batch_stats"] = batch_stats
        heat, _ = eval_model.apply(vars_, imgs)
        return imgs, jnp.moveaxis(heat, -1, 1), c_model, v

    def log_val_overlay(ema, batch_stats, key, step):
        """Heatmap/keypoint overlay figures during validation
        (ref: balldetection/train.py:186-242)."""
        from upliftingtabletennis_tpu.data.image_transforms import (
            IMAGENET_MEAN,
            IMAGENET_STD,
        )
        from upliftingtabletennis_tpu.utils.visualization import heatmap_overlay_image

        imgs, coords, vis = load(args.data_root, index_va[: args.batch_size])
        x, heat, c_model, v = infer_viz(
            ema, batch_stats, jnp.asarray(imgs), jnp.asarray(coords), jnp.asarray(vis), key
        )
        # de-normalize the (possibly 9-channel triplet) center frame
        x0 = np.asarray(x[0])
        center = x0[..., 3:6] if x0.shape[-1] == 9 else x0[..., :3]
        center = (center * np.asarray(IMAGENET_STD) + np.asarray(IMAGENET_MEAN)) * 255.0
        gt = np.concatenate([np.asarray(c_model[0]), np.asarray(v[0])[:, None]], -1)
        img = heatmap_overlay_image(center, np.asarray(heat[0]), gt_coords=gt)
        writer.add_image("val/overlay", img, step, dataformats="HWC")

    def validate(ema, batch_stats, key):
        preds_all, gts_all = [], []
        n_val = len(index_va) if args.val_samples is None else min(len(index_va), args.val_samples)
        for s in range(0, n_val, args.batch_size):
            batch = index_va[s : s + args.batch_size]
            if len(batch) < args.batch_size:
                break
            imgs, coords, vis = load(args.data_root, batch)
            preds, gts = infer(
                ema, batch_stats, jnp.asarray(imgs), jnp.asarray(coords), jnp.asarray(vis), key
            )
            preds_all.append(np.asarray(preds))
            gts_all.append(np.asarray(gts))
        if not preds_all:
            return {}
        preds = np.concatenate(preds_all)
        gts = np.concatenate(gts_all)
        out = {}
        for tol in (2, 5, 10, 20):
            if task == "ball":
                # streak PCK: distance to the (min, center, max) blur segments
                pq = preds[:, 0]  # (N, 3) single-channel peak
                out[f"pck{tol}"] = float(
                    M.pck_ball(pq, gts[:, 0, :2], gts[:, 1, :2], gts[:, 2, :2], tol)
                )
            else:
                out[f"pck{tol}"] = float(M.pck_keypoints(preds, gts, tol))
        return out

    exp = f"_exp:{args.exp_id}" if args.exp_id else ""
    identifier = f"{task}_{args.model}{exp}_{time.strftime('%m%d%Y-%H%M%S')}"
    hparams = {"task": task, "model": args.model, "lr": args.lr, "batch_size": args.batch_size,
               "resolution": [MW, MH], "in_frames": in_frames,
               "heatmap_sigma": args.heatmap_sigma, "use_invis": use_invis,
               "exp_id": args.exp_id, "data": args.data}
    from upliftingtabletennis_tpu.parallel.distributed import is_main_process

    writer = None
    if is_main_process():  # rank-aware logging (ref: dist_util master_only)
        try:
            from torch.utils.tensorboard import SummaryWriter

            writer = SummaryWriter(os.path.join(args.logdir, identifier))
        except Exception:
            writer = None
    best_pck5 = -1.0
    it = 0
    steps_per_epoch = len(index_tr) // args.batch_size
    rng_np = np.random.default_rng(args.seed)
    for epoch in range(args.num_epochs):
        order = rng_np.permutation(len(index_tr))

        def make_batch(i):
            sel = [index_tr[j] for j in order[i * args.batch_size : (i + 1) * args.batch_size]]
            return load(args.data_root, sel)

        for imgs, coords, vis in D.Prefetcher(make_batch, steps_per_epoch):
            rng, k = jax.random.split(rng)
            b_imgs, b_coords, b_vis = put_batch(imgs, coords, vis)
            params, batch_stats, opt_state, ema_params, loss = train_step(
                params, batch_stats, opt_state, ema_params, k, b_imgs, b_coords, b_vis,
            )
            it += 1
            if it % args.val_iterations == 0 or (args.max_steps and it >= args.max_steps):
                rng, k = jax.random.split(rng)
                metrics = validate(ema_params, batch_stats, k)
                print(f"it {it}: loss {float(loss):.4f} {metrics}")
                if writer:
                    writer.add_scalar("train/loss", float(loss), it)
                    for mk, mv in metrics.items():
                        writer.add_scalar(f"val/{mk}", mv, it)
                    log_val_overlay(ema_params, batch_stats, k, it)
                if metrics.get("pck5", -1) > best_pck5:
                    best_pck5 = metrics["pck5"]
                    save_checkpoint(
                        os.path.join(args.save_dir, identifier, "model"),
                        {"params": ema_params, "batch_stats": batch_stats},
                        identifier, {"epoch": epoch, **hparams},
                    )
            if args.max_steps and it >= args.max_steps:
                print(f"[done] max_steps reached, final loss {float(loss):.4f}")
                return
        print(f"epoch {epoch}: loss {float(loss):.4f}")


if __name__ == "__main__":
    main()
