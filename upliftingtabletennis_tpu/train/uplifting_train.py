"""Uplifting-model training: optax Adam + global-norm clip + EMA, jit-DP.

Mirrors the reference trainer semantics (ref: uplifting/train.py:105-138):

  loss_rot = sum_b || omega_b - omega_hat_b ||_2          (train.py:107)
  loss_pos = sum(MSE * mask) / sum(mask)                  (train.py:126)
  loss     = loss_rot + loss_pos
  grad clip 5.0 (train.py:129), Adam lr 1e-4 (config.py), EMA decay 0.999:
  ema = a * ema + (1 - a) * params                        (helper.py:311-325)

TPU-native differences: the whole step (fwd+bwd+clip+adam+ema) is one jitted
function; under a Mesh with the batch sharded over 'dp' and params
replicated, XLA partitions it into per-device compute + psum gradient
reduction — the DDP/NCCL equivalent with zero framework code.
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from upliftingtabletennis_tpu.core.geometry import (
    HEIGHT,
    WIDTH,
    transform_rotation_axes,
    world2img,
)


class TrainState(NamedTuple):
    params: Any
    ema_params: Any
    opt_state: Any
    step: jnp.ndarray


class Batch(NamedTuple):
    """One training batch (ref dataset item, uplifting/data.py:76-170)."""

    ball_img: jnp.ndarray   # (B, T, 2) normalized 2D detections
    table_img: jnp.ndarray  # (B, 13, 3) normalized keypoints + visibility
    mask: jnp.ndarray       # (B, T) {0,1}
    r_world: jnp.ndarray    # (B, T, 3) ground-truth 3D trajectory
    rotation: jnp.ndarray   # (B, 3) ground-truth spin (world frame)
    times: jnp.ndarray      # (B, T) seconds


def make_optimizer(lr: float = 1e-4, clip: float = 5.0):
    return optax.chain(optax.clip_by_global_norm(clip), optax.adam(lr))


def create_train_state(model, rng, example_batch: Batch, lr: float = 1e-4):
    variables = jax.jit(model.init)(
        rng,
        example_batch.ball_img,
        example_batch.table_img,
        example_batch.mask,
        example_batch.times,
    )
    params = variables["params"]
    tx = make_optimizer(lr)
    return TrainState(params, params, tx.init(params), jnp.zeros((), jnp.int32)), tx


def loss_fn(model, params, batch: Batch, transform_mode: str = "global"):
    pred_rot, pred_pos = model.apply(
        {"params": params}, batch.ball_img, batch.table_img, batch.mask, batch.times
    )
    rotation = batch.rotation
    if transform_mode == "local":
        # network predicts in the ball's flight frame (ref: train.py:123-124)
        rotation = transform_rotation_axes(rotation, batch.r_world)
    loss_rot = jnp.sum(jnp.sqrt(jnp.sum((pred_rot - rotation) ** 2, axis=1) + 1e-12))
    mask = batch.mask[..., None]
    # NB: the reference divides the summed *elementwise* masked MSE by
    # sum(mask), not by 3*sum(mask) — match exactly (train.py:126).
    loss_pos = jnp.sum(((pred_pos - batch.r_world) ** 2) * mask) / jnp.sum(batch.mask)
    return loss_rot + loss_pos, (loss_rot, loss_pos)


def make_train_step(model, tx, transform_mode: str = "global", ema_decay: float = 0.999):
    """Build the jitted train step: (state, batch) -> (state, metrics)."""

    @jax.jit
    def train_step(state: TrainState, batch: Batch):
        (loss, (loss_rot, loss_pos)), grads = jax.value_and_grad(
            lambda p: loss_fn(model, p, batch, transform_mode), has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = jax.tree.map(
            lambda e, p: ema_decay * e + (1.0 - ema_decay) * p, state.ema_params, params
        )
        metrics = {"loss": loss, "loss_rot": loss_rot, "loss_pos": loss_pos}
        return TrainState(params, ema, opt_state, state.step + 1), metrics

    return train_step


def make_eval_step(model, transform_mode: str = "global"):
    """Synthetic-set validation metrics (ref: uplifting/train.py:141-225).

    Returns summed metrics + count; caller accumulates and divides.
    """

    @jax.jit
    def eval_step(params, batch: Batch):
        pred_rot, pred_pos = model.apply(
            {"params": params}, batch.ball_img, batch.table_img, batch.mask, batch.times
        )
        rotation = transform_rotation_axes(batch.rotation, batch.r_world)
        if transform_mode == "global":
            pred_rot = transform_rotation_axes(pred_rot, batch.r_world)

        err = pred_rot - rotation
        metric = jnp.sum(jnp.sqrt(jnp.sum(err**2, axis=1)))
        metricabs = jnp.sum(
            jnp.abs(
                jnp.linalg.norm(pred_rot, axis=1) - jnp.linalg.norm(rotation, axis=1)
            )
        )
        cosang = jnp.sum(pred_rot * rotation, axis=1) / (
            jnp.linalg.norm(pred_rot, axis=1) * jnp.linalg.norm(rotation, axis=1) + 1e-12
        )
        metricangle = jnp.sum(jnp.rad2deg(jnp.arccos(jnp.clip(cosang, -1.0, 1.0))))
        perframe = jnp.sqrt(jnp.sum((pred_pos - batch.r_world) ** 2, axis=-1))
        metric_pos = jnp.sum(
            jnp.sum(perframe * batch.mask, axis=1) / jnp.sum(batch.mask, axis=1)
        )
        # sign agreement per axis (ref: helper.py:290-308)
        gt_sign = jnp.sign(rotation)
        pred_sign = jnp.sign(pred_rot)
        tp = jnp.sum((gt_sign == 1) & (pred_sign == 1), axis=0)
        tn = jnp.sum((gt_sign == -1) & (pred_sign == -1), axis=0)
        fp = jnp.sum((gt_sign == -1) & (pred_sign == 1), axis=0)
        fn = jnp.sum((gt_sign == 1) & (pred_sign == -1), axis=0)
        return {
            "metric": metric,
            "metric_abs": metricabs,
            "metric_angle": metricangle,
            "metric_position": metric_pos,
            "tp": tp,
            "tn": tn,
            "fp": fp,
            "fn": fn,
            "count": batch.ball_img.shape[0],
        }

    return eval_step


def make_val2d_step(model, transform_mode: str = "global"):
    """2D-reprojection validation (ref: val_real, uplifting/train.py:228-299).

    Projects predicted 3D positions through the stored cameras and measures
    masked-mean pixel distance to the (denormalized) annotated 2D positions;
    also returns the omega_y spin score for topspin/backspin classification.
    Inputs follow the TTSTBatch/augmented-sample conventions with r_img
    normalized to [0, 1].
    """

    @jax.jit
    def val2d_step(params, r_img, table_img, mask, times, Mint, Mext):
        pred_rot, pred_pos = model.apply({"params": params}, r_img, table_img, mask, times)
        if transform_mode == "global":
            pred_rot = transform_rotation_axes(pred_rot, pred_pos)

        gt_px = r_img * jnp.asarray([WIDTH, HEIGHT], jnp.float32)
        pred_px = world2img(pred_pos, Mext[:, None], Mint[:, None])
        d = jnp.sqrt(jnp.sum((pred_px - gt_px) ** 2, axis=-1) + 1e-12)
        per_traj = jnp.sum(d * mask, axis=1) / jnp.sum(mask, axis=1)
        metric_2d = jnp.sum(per_traj)
        return {"metric_2d": metric_2d, "spin_score": pred_rot[:, 1], "count": r_img.shape[0]}

    return val2d_step


def spin_classification_metrics(spin_scores, spin_classes):
    """Accuracy / macro-F1 / ROC-AUC from omega_y scores vs labels
    (ref: uplifting/train.py:264-291). numpy, host-side."""
    import numpy as np

    scores = np.asarray(spin_scores)
    labels = np.asarray(spin_classes)
    annotated = (labels == 1) | (labels == 2)
    y = (labels[annotated] == 1).astype(int)  # topspin=1
    s = scores[annotated]
    tp = int(np.sum((y == 1) & (s > 0)))
    fn = int(np.sum((y == 1) & (s <= 0)))
    tn = int(np.sum((y == 0) & (s < 0)))
    fp = int(np.sum((y == 0) & (s >= 0)))
    total = max(tp + tn + fp + fn, 1)
    accuracy = (tp + tn) / total
    f1_plus = 2 * tp / max(2 * tp + fp + fn, 1)
    f1_minus = 2 * tn / max(2 * tn + fn + fp, 1)
    macro_f1 = (f1_plus + f1_minus) / 2
    try:
        from sklearn.metrics import roc_auc_score

        roc_auc = float(roc_auc_score(y, s)) if len(np.unique(y)) > 1 else float("nan")
    except Exception:
        roc_auc = float("nan")
    return {"accuracy": accuracy, "macro_f1": macro_f1, "roc_auc": roc_auc}
