"""Uplifting-model training driver (CLI).

TPU-native equivalent of `python -m uplifting.train` (ref: uplifting/train.py):

  python -m upliftingtabletennis_tpu.train.run_uplifting \
      --data_dir <syntheticdata root with <mode>/<direction>/trajectory_*> \
      --model_name connectstage --model_size large --token_mode dynamic

Differences from the reference by design:
* the input pipeline (fps resample, camera sampling, noise augmentation) is
  jitted device code, not CPU DataLoader workers;
* training runs data-parallel over all available devices via jit
  partitioning (params replicated, batch sharded over 'dp');
* checkpoints are Orbax + JSON (self-describing, EMA params), with the same
  four best-model criteria (trajectory / spin / synthetic / combined with
  the 0.007 normalized-reprojection gate, ref: train.py:75-102).
* if --data_dir is absent, a small dataset is generated on the fly with the
  built-in physics engine (useful for smoke runs; use
  data/datagen.generate_dataset for production-scale generation).
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np


def build_store(args):
    """Load (or generate) the trajectory corpus.

    Returns (store, train_idx, val_idx) with the 70/10/20 split computed
    PER (mode, direction) shard, like the reference's per-directory split
    (ref: uplifting/data.py:38-48) — a global split over the concatenated
    corpus would draw all of val from whichever mode sorts last.
    """
    import jax

    from upliftingtabletennis_tpu.data import datagen as DG
    from upliftingtabletennis_tpu.data import synthetic as SYN

    stores = []
    if args.data_dir and os.path.isdir(args.data_dir):
        for mode in DG.MODES:
            for direction in DG.DIRECTIONS:
                npz = os.path.join(args.data_dir, mode, f"{direction}.npz")
                d = os.path.join(args.data_dir, mode, direction)
                if os.path.isfile(npz):
                    stores.append(SYN.load_store_npz(npz))
                elif os.path.isdir(d):
                    stores.append(SYN.store_from_disk(d, pad_to=500))
        if not stores:
            # flat layout: trajectory_* directly under data_dir
            stores = [SYN.store_from_disk(args.data_dir, pad_to=500)]
    else:
        # generate a small on-the-fly dataset
        print(f"[data] no data_dir; generating {args.generate} trajectories per mode")
        key = jax.random.PRNGKey(args.seed)
        for mode in ("intermediate", "first_good", "first_long"):
            key, sub = jax.random.split(key)
            res = DG.generate_dataset(sub, args.generate, mode, "left_to_right")
            stores.append(SYN.store_from_datagen(res))

    train_idx, val_idx = [], []
    off = 0
    for s in stores:
        n = len(s)
        train_idx.append(off + SYN.split_indices(n, "train"))
        val_idx.append(off + SYN.split_indices(n, "val"))
        off += n
    return (
        SYN.concat_stores(stores),
        np.concatenate(train_idx),
        np.concatenate(val_idx),
    )


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--num_epochs", type=int, default=800)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--model_name", type=str, default="connectstage")
    p.add_argument("--model_size", type=str, default="large")
    p.add_argument("--token_mode", type=str, default="dynamic")
    p.add_argument("--transform_mode", type=str, default="global")
    p.add_argument("--time_rotation", type=str, default="new")
    p.add_argument("--blur_strength", type=float, default=0.4)
    p.add_argument("--stop_prob", type=float, default=0.5)
    p.add_argument("--randdet_prob", type=float, default=0.0)
    p.add_argument("--randmiss_prob", type=float, default=0.05)
    p.add_argument("--tablemiss_prob", type=float, default=0.05)
    p.add_argument("--randomize_std", type=float, default=2.0)
    p.add_argument("--back_view_frac", type=float, default=0.0,
                   help="fraction of training cameras drawn from behind-the-"
                        "table azimuths (TT3D back-view enrichment; the "
                        "reference prior spans one side only, "
                        "data/synthetic.sample_cameras)")
    p.add_argument("--ema_decay", type=float, default=0.999)
    p.add_argument("--data_dir", type=str, default=None)
    p.add_argument("--ttst_dir", type=str, default=None, help="TTST real data for val_real")
    p.add_argument("--generate", type=int, default=256, help="per-mode count when generating data")
    p.add_argument("--logdir", type=str, default="runs")
    p.add_argument("--save_dir", type=str, default="saved_models")
    p.add_argument("--resume", type=str, default=None,
                   help="resume full training state from <run_dir>/latest "
                        "(exceeds the reference, which is save-only; SURVEY §5.4)")
    p.add_argument("--save_latest_every", type=int, default=10,
                   help="epochs between resumable 'latest' state snapshots")
    p.add_argument("--val_subset", type=int, default=4096,
                   help="cap on synthetic-val trajectories per epoch "
                        "(evenly strided over shards; 0 = use all)")
    p.add_argument("--max_hours", type=float, default=0.0,
                   help="wall-clock budget; > 0 stops after the first epoch "
                        "that exceeds it, saving a resumable 'latest' state")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax_debug_nans (the reference's detect_anomaly, "
                        "ref: uplifting/train.py:25-26)")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of epoch 1 into logdir")
    p.add_argument("--exp_id", type=str, default=None,
                   help="experiment tag embedded in the run identifier "
                        "(ref: uplifting/config.py:28-33)")
    p.add_argument("--debug", action="store_true",
                   help="debug mode: route logs/checkpoints to <dir>_tmp and enable "
                        "jax_debug_nans (ref: uplifting/config.py:35-50, "
                        "train.py:25-26)")
    args = p.parse_args(argv)
    if args.debug:
        args.debug_nans = True
        args.logdir = args.logdir.rstrip("/") + "_tmp"
        args.save_dir = args.save_dir.rstrip("/") + "_tmp"

    import jax
    import jax.numpy as jnp

    from upliftingtabletennis_tpu.data import synthetic as SYN
    from upliftingtabletennis_tpu.data.augment import AugmentConfig, eval_augment, train_augment
    from upliftingtabletennis_tpu.data.ttst import load_ttst
    from upliftingtabletennis_tpu.models import get_uplifting_model
    from upliftingtabletennis_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from upliftingtabletennis_tpu.train.uplifting_train import (
        Batch,
        create_train_state,
        make_eval_step,
        make_train_step,
        make_val2d_step,
        spin_classification_metrics,
    )
    from upliftingtabletennis_tpu.utils.checkpoint import save_checkpoint

    exp = f"_exp:{args.exp_id}" if args.exp_id else ""
    identifier = (
        f"lr:{args.lr:.2e}_bs:{args.batch_size:02d}_name:{args.model_name}"
        f"_mode:{args.token_mode}_size:{args.model_size}_tr:{args.time_rotation}"
        f"_trans:{args.transform_mode}{exp}_{time.strftime('%m%d%Y-%H%M%S')}"
    )
    hparams = {
        "lr": args.lr, "batch_size": args.batch_size, "num_epochs": args.num_epochs,
        "seed": args.seed, "size": args.model_size, "name": args.model_name,
        "ema_decay": args.ema_decay, "tabletoken_mode": args.token_mode,
        "time_rotation": args.time_rotation, "randomize_std": args.randomize_std,
        "stop_prob": args.stop_prob, "blur_strength": args.blur_strength,
        "randdet_prob": args.randdet_prob, "randmiss_prob": args.randmiss_prob,
        "tablemiss_prob": args.tablemiss_prob, "transform_mode": args.transform_mode,
        "exp_id": args.exp_id,
    }

    from upliftingtabletennis_tpu.parallel.distributed import is_main_process

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    try:
        assert is_main_process()  # rank-aware logging (ref dist_util master_only)
        from torch.utils.tensorboard import SummaryWriter

        writer = SummaryWriter(os.path.join(args.logdir, identifier))
        # hparams without polluting the scalars tab (the reference patches
        # SummaryWriter for the same reason, ref: uplifting/helper.py:249-256)
        import json as _json

        writer.add_text("hparams", _json.dumps(hparams, indent=2))
    except Exception:
        writer = None

    store, train_idx, val_idx = build_store(args)
    n = len(store)
    print(f"[data] {n} trajectories ({len(train_idx)} train / {len(val_idx)} val)")
    store_j = jax.tree.map(jnp.asarray, store)

    ttst = None
    if args.ttst_dir and os.path.isdir(args.ttst_dir):
        ttst = load_ttst(args.ttst_dir, "val")
        print(f"[data] TTST val: {len(ttst)} trajectories")

    model = get_uplifting_model(args.model_name, args.model_size, args.token_mode, args.time_rotation)
    aug_cfg = AugmentConfig(
        blur_strength=args.blur_strength, randomize_std=args.randomize_std,
        stop_prob=args.stop_prob, randdet_prob=args.randdet_prob,
        randmiss_prob=args.randmiss_prob, tablemiss_prob=args.tablemiss_prob,
    )

    rng = jax.random.PRNGKey(args.seed)
    rng, init_key, data_key = jax.random.split(rng, 3)

    # The whole batch path (gather + resample + camera sampling + noise
    # augs + normalize) is ONE jitted program: the augment chain alone is
    # dozens of jnp ops which, dispatched eagerly through the tunneled
    # chip's ~4 ms/program floor, dominated round-1's step time.
    def _assemble(key, store, idx, train):
        k1, k2 = jax.random.split(key)
        sample = SYN.assemble_batch(k1, store, idx, train=train,
                                    back_frac=args.back_view_frac if train else 0.0)
        sample = train_augment(k2, sample, aug_cfg) if train else eval_augment(sample)
        return Batch(
            ball_img=sample["r_img"], table_img=sample["table_img"], mask=sample["mask"],
            r_world=sample["r_world"], rotation=sample["rotation"], times=sample["times"],
        ), sample

    _make_batch_train = jax.jit(lambda key, store, idx: _assemble(key, store, idx, True))
    _make_batch_eval = jax.jit(lambda key, store, idx: _assemble(key, store, idx, False))

    def make_batch(key, idx, train):
        fn = _make_batch_train if train else _make_batch_eval
        return fn(key, store_j, idx)

    # Single-device fast path: assemble + augment + fwd/bwd/opt/EMA as ONE
    # program (2 dispatches/step -> 1; each dispatch carries the tunneled
    # chip's ~4 ms floor). Multi-device keeps the explicit shard_batch path.
    def make_fused_train_step(train_step):
        @jax.jit
        def fused(state, key, store, idx):
            batch, _ = _assemble(key, store, idx, True)
            return train_step(state, batch)

        return fused

    def make_fused_val_step(eval_step, val2d_step):
        @jax.jit
        def fused(params, key, store, idx):
            batch, sample = _assemble(key, store, idx, False)
            m = eval_step(params, batch)
            m2 = val2d_step(
                params, sample["r_img"], sample["table_img"], sample["mask"],
                sample["times"], sample["Mint"], sample["Mext"],
            )
            return {**m, "metric_2d": m2["metric_2d"]}

        return fused

    example_batch, _ = make_batch(data_key, jnp.asarray(train_idx[: args.batch_size]), True)
    state, tx = create_train_state(model, init_key, example_batch, args.lr)
    train_step = make_train_step(model, tx, args.transform_mode, args.ema_decay)
    eval_step = make_eval_step(model, args.transform_mode)
    val2d_step = make_val2d_step(model, args.transform_mode)
    single_device = jax.device_count() == 1
    fused_train = make_fused_train_step(train_step) if single_device else None
    fused_val = make_fused_val_step(eval_step, val2d_step) if single_device else None

    mesh = make_mesh()
    state = replicate(mesh, state)

    best = {"trajectory": 1e8, "spin": 0.0, "synthetic": 1e8, "spin_mixed": 0.0, "traj_mixed": 1e8}
    threshold_trajectory = 0.007  # (ref: train.py:76)
    steps_per_epoch = max(len(train_idx) // args.batch_size, 1)

    val_sel = val_idx
    if args.val_subset and len(val_idx) > args.val_subset:
        # evenly-strided subset keeps every (mode, direction) shard
        # represented while bounding per-epoch val cost on the tunnel
        val_sel = val_idx[:: max(len(val_idx) // args.val_subset, 1)][: args.val_subset]

    def run_val(params, epoch):
        # synthetic val (ref: val, train.py:141-225)
        tot = None
        for s in range(0, len(val_sel), args.batch_size):
            idx = jnp.asarray(val_sel[s : s + args.batch_size])
            key_s = jax.random.PRNGKey(epoch * 7919 + s)
            if single_device:
                m = fused_val(params, key_s, store_j, idx)
            else:
                batch, sample = make_batch(key_s, idx, False)
                m = eval_step(params, batch)
                m2 = val2d_step(
                    params, sample["r_img"], sample["table_img"], sample["mask"],
                    sample["times"], sample["Mint"], sample["Mext"],
                )
                m = {**m, "metric_2d": m2["metric_2d"]}
            tot = m if tot is None else jax.tree.map(lambda a, b: a + b, tot, m)
        count = float(tot["count"])
        metric = float(tot["metric"]) / count
        metric_pos = float(tot["metric_position"]) / count
        metric_2d = float(tot["metric_2d"]) / count
        norm_2d = metric_2d / (WIDTH_DIAG)
        if writer:
            writer.add_scalar("val/metric", metric, epoch)
            writer.add_scalar("val/metric position", metric_pos, epoch)
            writer.add_scalar("val/metric 2D", metric_2d, epoch)
            writer.add_scalar("val/metric 2D normed", norm_2d, epoch)
            if epoch % 10 == 0:  # per-axis sign-confusion renders (ref: train.py:210-214)
                from upliftingtabletennis_tpu.utils.visualization import (
                    confusion_matrix_image,
                )

                tp, tn = np.asarray(tot["tp"]), np.asarray(tot["tn"])
                fp, fn = np.asarray(tot["fp"]), np.asarray(tot["fn"])
                for ax_i, ax_name in enumerate("xyz"):
                    img = confusion_matrix_image(
                        int(tp[ax_i]), int(tn[ax_i]), int(fp[ax_i]), int(fn[ax_i]),
                        title=f"omega_{ax_name} sign",
                    )
                    writer.add_image(f"val/confusion {ax_name}", img, epoch,
                                     dataformats="HWC")
        return metric, metric_pos, norm_2d

    from upliftingtabletennis_tpu.core.geometry import HEIGHT, WIDTH

    WIDTH_DIAG = (WIDTH**2 + HEIGHT**2) ** 0.5

    def run_val_real(params, epoch):
        if ttst is None:
            return None, None
        scores, labels = [], []
        tot2d, cnt = 0.0, 0
        for s in range(0, len(ttst), 64):
            sl = slice(s, s + 64)
            r_img = jnp.asarray(ttst.r_img[sl]) / jnp.asarray([WIDTH, HEIGHT], jnp.float32)
            tab = ttst.table_img[sl].copy()
            tab[..., :2] /= np.asarray([WIDTH, HEIGHT])
            m2 = val2d_step(
                params, r_img, jnp.asarray(tab), jnp.asarray(ttst.mask[sl]),
                jnp.asarray(ttst.times[sl]), jnp.asarray(ttst.Mint[sl]), jnp.asarray(ttst.Mext[sl]),
            )
            tot2d += float(m2["metric_2d"]); cnt += int(m2["count"])
            scores.append(np.asarray(m2["spin_score"])); labels.append(ttst.spin_class[sl])
        norm_2d = (tot2d / cnt) / WIDTH_DIAG
        spin = spin_classification_metrics(np.concatenate(scores), np.concatenate(labels))
        if writer:
            writer.add_scalar("val real/metric 2D normed", norm_2d, epoch)
            writer.add_scalar("val real/macro f1", spin["macro_f1"], epoch)
            writer.add_scalar("val real/accuracy", spin["accuracy"], epoch)
            if epoch % 10 == 0:  # ROC render + missortings (ref: helper.py:459-540)
                from upliftingtabletennis_tpu.utils.visualization import (
                    count_missortings,
                    roc_curve_image,
                )

                lab = np.concatenate(labels)
                sc = np.concatenate(scores)
                annotated = (lab == 1) | (lab == 2)
                if annotated.sum() >= 2 and len(np.unique(lab[annotated])) > 1:
                    y = (lab[annotated] == 1).astype(int)
                    writer.add_image(
                        "val real/roc", roc_curve_image(y, sc[annotated]), epoch,
                        dataformats="HWC",
                    )
                    n_miss, thr = count_missortings(y, sc[annotated])
                    writer.add_scalar("val real/missortings", n_miss, epoch)
                    writer.add_scalar("val real/optimal threshold", thr, epoch)
        return norm_2d, spin["macro_f1"]

    def save(name, epoch, params):
        save_checkpoint(
            os.path.join(args.save_dir, identifier, name), params, identifier,
            {"epoch": epoch, **hparams},
        )

    start_epoch = 0
    if args.resume:
        # restore the FULL optimizer state (params/ema/opt/step) and continue
        from upliftingtabletennis_tpu.utils.checkpoint import load_checkpoint

        tmpl = jax.device_get(state)
        restored, identifier, info = load_checkpoint(args.resume, target=tmpl)
        state = jax.tree.map(jnp.asarray, restored)
        state = replicate(mesh, state)
        start_epoch = int(info.get("epoch", -1)) + 1
        best.update(info.get("best", {}))
        print(f"[resume] {args.resume} -> epoch {start_epoch}")

    print(f"[train] {steps_per_epoch} steps/epoch on {jax.device_count()} device(s)")
    it = start_epoch * steps_per_epoch
    t_budget0 = time.perf_counter()
    for epoch in range(start_epoch, args.num_epochs):
        if args.max_hours and (time.perf_counter() - t_budget0) > args.max_hours * 3600:
            print(f"[train] wall-clock budget {args.max_hours}h reached at epoch {epoch}")
            save_checkpoint(
                os.path.join(args.save_dir, identifier, "latest"), state, identifier,
                {"epoch": epoch - 1, "best": best, **hparams},
            )
            break
        # device-time profile of one post-compile epoch (ref has no profiler;
        # SURVEY §5.1 — TPU equivalent of its wall-clock harnesses)
        if args.profile and epoch == 1:
            jax.profiler.start_trace(os.path.join(args.logdir, identifier, "profile"))
        if args.profile and epoch == 2:
            jax.profiler.stop_trace()
        rng, ek = jax.random.split(rng)
        perm = jax.random.permutation(ek, len(train_idx))
        t0 = time.perf_counter()
        for s in range(steps_per_epoch):
            idx = jnp.asarray(train_idx)[perm[s * args.batch_size : (s + 1) * args.batch_size]]
            if len(idx) < args.batch_size:
                continue
            rng, bk = jax.random.split(rng)
            if single_device:
                state, metrics = fused_train(state, bk, store_j, idx)
            else:
                batch, _ = make_batch(bk, idx, True)
                batch = shard_batch(mesh, batch)
                state, metrics = train_step(state, batch)
            if writer and it % 10 == 0:
                writer.add_scalar("train/loss", float(metrics["loss"]), it)
                writer.add_scalar("train/loss rotation", float(metrics["loss_rot"]), it)
                writer.add_scalar("train/loss position", float(metrics["loss_pos"]), it)
            it += 1
        dt = time.perf_counter() - t0

        metric, metric_pos, norm2d_syn = run_val(state.ema_params, epoch)
        norm2d_real, f1 = run_val_real(state.ema_params, epoch)
        metric_traj = norm2d_real if norm2d_real is not None else norm2d_syn
        metric_spin = f1 if f1 is not None else 0.0
        print(
            f"epoch {epoch}: loss {float(metrics['loss']):.3f} val_metric {metric:.3f} "
            f"pos {metric_pos:.4f} reproj {metric_traj:.5f} f1 {metric_spin:.3f} ({dt:.1f}s)"
        )

        # multi-criteria checkpointing (ref: train.py:84-102)
        if metric_traj < best["trajectory"]:
            best["trajectory"] = metric_traj
            save("model_trajectory", epoch, state.ema_params)
        if metric_spin >= best["spin"]:
            best["spin"] = metric_spin
            save("model_spin", epoch, state.ema_params)
        if metric < best["synthetic"]:
            best["synthetic"] = metric
            save("model_synthetic", epoch, state.ema_params)
        if metric_traj <= threshold_trajectory:
            if metric_spin > best["spin_mixed"] or (
                metric_spin == best["spin_mixed"] and metric_traj < best["traj_mixed"]
            ):
                best["spin_mixed"] = metric_spin
                best["traj_mixed"] = metric_traj
                save("model", epoch, state.ema_params)

        if (epoch + 1) % args.save_latest_every == 0 or epoch == args.num_epochs - 1:
            save_checkpoint(
                os.path.join(args.save_dir, identifier, "latest"), state, identifier,
                {"epoch": epoch, "best": best, **hparams},
            )

    if writer:
        writer.close()


if __name__ == "__main__":
    main()
