"""Jittable detection-noise augmentations for uplifting training.

Rebuilds the reference's dict-pipeline transforms
(ref: uplifting/transformations.py) as pure stateless-PRNG functions over
fixed-shape padded batches. Each augmentation is `fn(key, sample) ->
sample`, vectorized over the batch — the reference's per-frame Python loops
(e.g. RandomMissing's compaction, transformations.py:199-208) become masked
gathers.

Sample fields (all batched, T = sequence capacity = 50):
  r_img (B, T, 2) px  | r_world (B, T, 3) | times (B, T) s | mask (B, T) {0,1}
  table_img (B, 13, 3) px+vis             | hits (B, 1) first-bounce time
  blur_positions (B, TB, 3), blur_mask (B, TB): the 500 fps source arrays
  Mint (B, 3, 3), Mext (B, 4, 4)
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from upliftingtabletennis_tpu.core.geometry import (
    HEIGHT,
    WIDTH,
    KEYPOINT_INVISIBLE,
    world2img,
)
from upliftingtabletennis_tpu.core.physics import FPS as BLUR_FPS


class AugmentConfig(NamedTuple):
    """Noise hyperparameters (ref: uplifting/config.py:77-83, train.py:11-16)."""

    blur_strength: float = 0.4
    randomize_std: float = 2.0
    stop_prob: float = 0.5
    randdet_prob: float = 0.0
    randmiss_prob: float = 0.05
    tablemiss_prob: float = 0.05


def motion_blur(key, sample, strength: float):
    """Substitute each detection by a random true position within the
    +-strength * dt window on the 500 fps ground-truth grid, reprojected
    (ref: MotionBlur, transformations.py:91-140).
    """
    if strength == 0:
        return sample
    times = sample["times"]  # (B, T)
    mask = sample["mask"] > 0.5
    B, T = times.shape

    # neighbor times: before[i] = times[i-1], after[i] = times[i+1] within the
    # valid region (clamped at the ends) (ref: :117-122)
    length = jnp.sum(mask, axis=1).astype(jnp.int32)  # (B,)
    idx = jnp.arange(T)[None, :]
    prev_t = jnp.where(idx - 1 >= 0, jnp.roll(times, 1, axis=1), times)
    next_t = jnp.where(idx + 1 < length[:, None], jnp.roll(times, -1, axis=1), times)
    lo_t = times + strength * (prev_t - times)
    hi_t = times + strength * (next_t - times)

    # blur grid is uniform at BLUR_FPS: valid indices are [ceil(lo*fps), floor(hi*fps)]
    blur_mask = sample["blur_mask"] > 0.5
    n_blur = jnp.sum(blur_mask, axis=1).astype(jnp.int32)  # (B,)
    lo_i = jnp.ceil(lo_t * BLUR_FPS - 1e-6).astype(jnp.int32)
    hi_i = jnp.floor(hi_t * BLUR_FPS + 1e-6).astype(jnp.int32)
    lo_i = jnp.clip(lo_i, 0, n_blur[:, None] - 1)
    hi_i = jnp.clip(hi_i, 0, n_blur[:, None] - 1)
    u = jax.random.uniform(key, (B, T))
    pick = lo_i + jnp.floor(u * (hi_i - lo_i + 1).astype(jnp.float32)).astype(jnp.int32)
    pick = jnp.clip(pick, lo_i, hi_i)

    new_world = jnp.take_along_axis(sample["blur_positions"], pick[..., None], axis=1)
    new_img = world2img(new_world, sample["Mext"][:, None], sample["Mint"][:, None])

    m = mask[..., None]
    out = dict(sample)
    out["r_world"] = jnp.where(m, new_world, sample["r_world"])
    out["r_img"] = jnp.where(m, new_img, sample["r_img"])
    return out


def randomize_detections(key, sample, std: float):
    """Gaussian pixel noise on ball + table detections (ref: :26-46)."""
    k1, k2 = jax.random.split(key)
    out = dict(sample)
    out["r_img"] = sample["r_img"] + std * jax.random.normal(k1, sample["r_img"].shape)
    tab = sample["table_img"]
    noise = std * jax.random.normal(k2, tab[..., :2].shape)
    out["table_img"] = jnp.concatenate([tab[..., :2] + noise, tab[..., 2:]], -1)
    return out


def random_stop(key, sample, stop_prob: float):
    """Truncate the sequence >=4 frames after the first bounce with prob
    stop_prob — simulates the opponent hitting the ball (ref: :49-88)."""
    times, mask = sample["times"], sample["mask"] > 0.5
    B, T = times.shape
    k1, k2 = jax.random.split(key)
    do = jax.random.uniform(k1, (B,)) < stop_prob

    hit_time = sample["hits"][:, 0]
    has_hit = hit_time > 0
    hit_ind = jnp.argmin(jnp.abs(times - hit_time[:, None]) + 1e6 * (~mask), axis=1)
    seq_len = jnp.sum(mask, axis=1).astype(jnp.int32)
    room = seq_len - hit_ind  # frames from hit to end
    can = room >= 4
    # len_after_hit ~ randint[4, room] (ref: :77)
    u = jax.random.uniform(k2, (B,))
    len_after = 4 + jnp.floor(u * jnp.maximum(room - 3, 1).astype(jnp.float32)).astype(jnp.int32)
    cut = hit_ind + len_after
    apply = do & has_hit & can
    idx = jnp.arange(T)[None, :]
    new_mask = mask & jnp.where(apply[:, None], idx < cut[:, None], True)

    m = new_mask[..., None]
    out = dict(sample)
    out["mask"] = new_mask.astype(sample["mask"].dtype)
    out["r_img"] = jnp.where(m, sample["r_img"], 0.0)
    out["r_world"] = jnp.where(m, sample["r_world"], 0.0)
    out["times"] = jnp.where(new_mask, times, 0.0)
    return out


def random_detection(key, sample, p: float):
    """Replace detections by uniform random image points with prob p
    (ref: :143-173)."""
    if p == 0:
        return sample
    B, T, _ = sample["r_img"].shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    wh = jnp.asarray([WIDTH, HEIGHT], jnp.float32)
    mask = sample["mask"] > 0.5
    swap_ball = (jax.random.uniform(k1, (B, T)) < p) & mask
    rand_pts = jax.random.uniform(k2, (B, T, 2)) * wh
    out = dict(sample)
    out["r_img"] = jnp.where(swap_ball[..., None], rand_pts, sample["r_img"])
    tab = sample["table_img"]
    swap_tab = jax.random.uniform(k3, tab.shape[:-1]) < p
    rand_tab = jax.random.uniform(k4, (*tab.shape[:-1], 2)) * wh
    out["table_img"] = jnp.concatenate(
        [jnp.where(swap_tab[..., None], rand_tab, tab[..., :2]), tab[..., 2:]], -1
    )
    return out


def random_missing(key, sample, p: float):
    """Drop frames with prob p and compact the survivors to the left
    (ref: :176-215). The reference's sequential copy loop becomes a stable
    argsort gather."""
    if p == 0:
        return sample
    mask = sample["mask"] > 0.5
    B, T = mask.shape
    drop = (jax.random.uniform(key, (B, T)) < p) & mask
    keep = mask & ~drop
    # stable order: kept frames first, in time order
    order = jnp.argsort(jnp.where(keep, jnp.arange(T)[None, :], T + jnp.arange(T)[None, :]), axis=1)

    def g(x):
        ind = order[..., None] if x.ndim == 3 else order
        return jnp.take_along_axis(x, ind, axis=1)

    n_keep = jnp.sum(keep, axis=1)
    idx = jnp.arange(T)[None, :]
    new_mask = idx < n_keep[:, None]
    m3 = new_mask[..., None]
    out = dict(sample)
    out["mask"] = new_mask.astype(sample["mask"].dtype)
    out["r_img"] = jnp.where(m3, g(sample["r_img"]), 0.0)
    out["r_world"] = jnp.where(m3, g(sample["r_world"]), 0.0)
    out["times"] = jnp.where(new_mask, g(sample["times"]), 0.0)
    return out


def table_missing(key, sample, p: float):
    """Mark table keypoints invisible + randomize their coords (ref: :218-237)."""
    if p == 0:
        return sample
    tab = sample["table_img"]
    k1, k2 = jax.random.split(key)
    miss = jax.random.uniform(k1, tab.shape[:-1]) < p
    wh = jnp.asarray([WIDTH, HEIGHT], jnp.float32)
    rand_pts = jax.random.uniform(k2, (*tab.shape[:-1], 2)) * wh
    coords = jnp.where(miss[..., None], rand_pts, tab[..., :2])
    vis = jnp.where(miss, float(KEYPOINT_INVISIBLE), tab[..., 2])
    out = dict(sample)
    out["table_img"] = jnp.concatenate([coords, vis[..., None]], -1)
    return out


def normalize_img_coords(sample):
    """Normalize pixel coordinates to [0, 1] by (WIDTH, HEIGHT) (ref: :252-266)."""
    wh = jnp.asarray([WIDTH, HEIGHT], jnp.float32)
    out = dict(sample)
    out["r_img"] = sample["r_img"] / wh
    tab = sample["table_img"]
    out["table_img"] = jnp.concatenate([tab[..., :2] / wh, tab[..., 2:]], -1)
    return out


def train_augment(key, sample, cfg: AugmentConfig = AugmentConfig()):
    """Full training pipeline in the reference's order (ref: :286-300)."""
    keys = jax.random.split(key, 6)
    sample = motion_blur(keys[0], sample, cfg.blur_strength)
    sample = randomize_detections(keys[1], sample, cfg.randomize_std)
    sample = random_stop(keys[2], sample, cfg.stop_prob)
    sample = random_detection(keys[3], sample, cfg.randdet_prob)
    sample = random_missing(keys[4], sample, cfg.randmiss_prob)
    sample = table_missing(keys[5], sample, cfg.tablemiss_prob)
    return normalize_img_coords(sample)


def eval_augment(sample):
    """Validation pipeline: normalization only (ref: :286-300)."""
    return normalize_img_coords(sample)
