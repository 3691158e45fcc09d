"""Tests: pose losses vs torch oracles, layer decay, BlurBall reader,
simulation check, trajectory plotting."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from upliftingtabletennis_tpu.models import losses as L


def test_joints_mse_matches_torch_formula():
    rng = np.random.default_rng(0)
    p = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)
    t = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)
    ours = float(L.joints_mse_loss(jnp.asarray(p), jnp.asarray(t)))
    ref = 0.5 * np.mean(np.mean((p.reshape(2, 4, -1) - t.reshape(2, 4, -1)) ** 2, -1))
    assert abs(ours - ref) < 1e-6


def test_ohkm_selects_hard_joints():
    p = np.zeros((1, 4, 4, 4), np.float32)
    t = np.zeros((1, 4, 4, 4), np.float32)
    t[0, 2] = 10.0  # one very hard joint
    full = float(L.joints_mse_loss(jnp.asarray(p), jnp.asarray(t)))
    hard = float(L.joints_ohkm_mse_loss(jnp.asarray(p), jnp.asarray(t), topk=1))
    assert hard > full  # mining concentrates on the hard joint


def test_wing_losses_finite_and_monotone():
    d = jnp.linspace(0, 50, 100)[None, :, None]
    zero = jnp.zeros_like(d)
    for fn in (L.wing_loss, L.soft_wing_loss):
        small = float(fn(d * 0.01, zero))
        large = float(fn(d, zero))
        assert 0 < small < large
    p = jnp.zeros((1, 2, 8, 8))
    t = jnp.full((1, 2, 8, 8), 0.3)
    v = float(L.adaptive_wing_loss(p, t))
    assert np.isfinite(v) and v > 0


def test_layer_decay_multipliers():
    from upliftingtabletennis_tpu.models.vit import ViTBackbone

    model = ViTBackbone(embed_dim=32, depth=3, num_heads=2)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    mults = L.layer_decay_mask_fn(params, depth=3, decay_rate=0.5)
    flat = jax.tree_util.tree_flatten_with_path(mults)[0]
    by_name = { "/".join(str(getattr(p, "key", "")) for p in path): v for path, v in flat}
    assert by_name["patch_embed_proj/kernel"] == 0.5**3
    assert by_name["blocks_0/attn_qkv/kernel"] == 0.5**2
    assert by_name["blocks_2/attn_qkv/kernel"] == 0.5**0
    assert by_name["last_norm/scale"] == 1.0

    import optax

    tx = optax.chain(L.scale_by_layer_decay(3, 0.5), optax.sgd(1.0))
    state = tx.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(g, state, params)
    flat_u = {"/".join(str(getattr(p, "key", "")) for p in path): v
              for path, v in jax.tree_util.tree_flatten_with_path(updates)[0]}
    assert float(flat_u["patch_embed_proj/kernel"].ravel()[0]) == -(0.5**3)


def test_blurball_reader(tmp_path):
    import cv2
    import pandas as pd

    from upliftingtabletennis_tpu.data.detection import (
        blur_streak_endpoints,
        load_blurball_index,
    )

    root = tmp_path
    vid, seq = 3, 1  # vid 3 is in the val/test pool
    seq_dir = root / "blurball" / f"{vid:02d}" / "frames" / f"{seq:03d}"
    seq_dir.mkdir(parents=True)
    ann_dir = root / "blurball" / "all_csv_annotations"
    ann_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    rows = []
    for f in range(5):
        img = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
        cv2.imwrite(str(seq_dir / f"{f:05d}.png"), img)
        rows.append({"Frame": f, "X": 10.0 + f, "Y": 20.0, "l": 3.0, "theta": 30.0,
                     "Visibility": 1 if f != 2 else 0})
    pd.DataFrame(rows).to_csv(ann_dir / f"{vid:02d}_csv_{seq:03d}.csv", index=False)

    val = load_blurball_index(str(root), "val")
    test = load_blurball_index(str(root), "test")
    assert len(val) + len(test) == 3  # frames 1..3 (ends skipped)
    train = load_blurball_index(str(root), "train")
    assert len(train) == 0  # vid 3 not in train

    vis_only = load_blurball_index(str(root), "val", use_invisible=False) + load_blurball_index(
        str(root), "test", use_invisible=False
    )
    assert all(s.visibility == 1 for s in vis_only)

    mn, mx = blur_streak_endpoints((100.0, 50.0), 3.0, 30.0, (48, 32))
    assert mn[0] < 100 < mx[0] and mn[1] < 50 < mx[1]


def test_simulation_check_and_plot(tmp_path):
    import jax

    from upliftingtabletennis_tpu.data import datagen as DG
    from upliftingtabletennis_tpu.data.generate import main as gen_main
    from upliftingtabletennis_tpu.data.simulation_check import (
        plot_trajectories_3d,
        resimulate_check,
    )

    gen_main([
        "--num_trajectories", "3", "--mode", "intermediate",
        "--direction", "left_to_right", "--folder", str(tmp_path), "--batch", "256",
    ])
    ddir = os.path.join(str(tmp_path), "intermediate", "left_to_right")
    assert resimulate_check(ddir, n_check=3, atol=1e-3)

    pos = np.load(os.path.join(ddir, "trajectory_0000", "positions.npy"))
    out = plot_trajectories_3d([pos], save_path=str(tmp_path / "traj.png"))
    assert os.path.exists(out)


def test_ae_loss_matches_reference_torch():
    """ae_loss / bottomup_heatmap_loss vs the vendored torch implementation
    (ref: vit_pose/vit_models/losses/multi_loss_factory.py AELoss,
    HeatmapLoss) on random tags/joints incl. empty and single-person
    images (the reference's normalization quirks)."""
    import sys

    import torch

    sys.path.insert(0, "/root/reference")
    from vit_pose.vit_models.losses.multi_loss_factory import AELoss, HeatmapLoss

    from upliftingtabletennis_tpu.models.losses import (
        ae_loss,
        bottomup_heatmap_loss,
    )

    rng = np.random.default_rng(3)
    N, M, K, H, W = 4, 5, 3, 8, 6
    tags = rng.normal(size=(N, K * H * W, 1)).astype(np.float32)
    joints = np.zeros((N, M, K, 2), np.int64)
    joints[..., 0] = rng.integers(0, K * H * W, (N, M, K))
    joints[..., 1] = rng.integers(0, 2, (N, M, K))
    joints[1, :, :, 1] = 0                    # image with no people
    joints[2, 1:, :, 1] = 0                   # single-person image
    for loss_type in ("exp", "max"):
        ref = AELoss(loss_type)(torch.tensor(tags), torch.tensor(joints))
        got = ae_loss(jnp.asarray(tags), jnp.asarray(joints), loss_type)
        np.testing.assert_allclose(np.asarray(got[0]), ref[0].numpy().ravel(),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(got[1]), ref[1].numpy().ravel(),
                                   atol=1e-5)

    pred = rng.normal(size=(N, K, H, W)).astype(np.float32)
    gt = np.abs(rng.normal(size=(N, K, H, W))).astype(np.float32)
    gt[0, 1] = 0.0  # empty channel
    mask = (rng.uniform(size=(N, H, W)) > 0.3).astype(np.float32)
    for sup in (True, False):
        ref = HeatmapLoss(supervise_empty=sup)(
            torch.tensor(pred), torch.tensor(gt), torch.tensor(mask)
        )
        got = bottomup_heatmap_loss(jnp.asarray(pred), jnp.asarray(gt),
                                    jnp.asarray(mask), supervise_empty=sup)
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-5)


def test_regression_losses_match_reference_torch():
    """smooth-l1 / l1 / mse / mpjpe / bone losses vs the vendored torch
    implementations (ref: vit_pose/vit_models/losses/regression_loss.py)."""
    import sys

    import torch

    sys.path.insert(0, "/root/reference")
    from vit_pose.vit_models.losses.regression_loss import (
        BoneLoss,
        L1Loss,
        MPJPELoss,
        MSELoss,
        SmoothL1Loss,
    )

    rng = np.random.default_rng(5)
    N, K, D = 3, 7, 3
    out = rng.normal(size=(N, K, D)).astype(np.float32)
    tgt = rng.normal(size=(N, K, D)).astype(np.float32)
    w = rng.uniform(0.5, 1.5, (N, K, D)).astype(np.float32)
    to = torch.tensor
    pairs = [
        (SmoothL1Loss, L.smooth_l1_loss),
        (L1Loss, L.l1_regression_loss),
        (MSELoss, L.mse_regression_loss),
        (MPJPELoss, L.mpjpe_loss),
    ]
    for RefCls, fn in pairs:
        for utw in (False, True):
            ref = RefCls(use_target_weight=utw)(
                to(out), to(tgt), to(w) if utw else None
            ).item()
            got = float(fn(jnp.asarray(out), jnp.asarray(tgt),
                           jnp.asarray(w) if utw else None, use_target_weight=utw))
            np.testing.assert_allclose(got, ref, atol=1e-5)

    parents = [0, 0, 1, 2, 0, 4, 5]
    bw = rng.uniform(0.5, 1.5, (N, 6)).astype(np.float32)
    for utw in (False, True):
        ref = BoneLoss(parents, use_target_weight=utw)(
            to(out), to(tgt), to(bw) if utw else None
        ).item()
        got = float(L.bone_loss(jnp.asarray(out), jnp.asarray(tgt), parents,
                                jnp.asarray(bw) if utw else None,
                                use_target_weight=utw))
        np.testing.assert_allclose(got, ref, atol=1e-5)
