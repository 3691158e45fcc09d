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


def test_bce_and_combined_target_mse_match_reference_torch():
    """bce_loss / combined_target_mse_loss vs the vendored torch modules
    (ref: vit_pose/vit_models/losses/classfication_loss.py BCELoss,
    mse_loss.py CombinedTargetMSELoss)."""
    import sys

    import torch

    sys.path.insert(0, "/root/reference")
    from vit_pose.vit_models.losses.classfication_loss import BCELoss
    from vit_pose.vit_models.losses.mse_loss import CombinedTargetMSELoss

    rng = np.random.default_rng(11)
    N, K = 4, 5
    out = rng.uniform(0.02, 0.98, (N, K)).astype(np.float32)
    tgt = rng.integers(0, 2, (N, K)).astype(np.float32)
    for utw, w in ((False, None),
                   (True, rng.uniform(0.5, 1.5, (N, K)).astype(np.float32)),
                   (True, rng.uniform(0.5, 1.5, (N,)).astype(np.float32))):
        ref = BCELoss(use_target_weight=utw, loss_weight=1.3)(
            torch.tensor(out), torch.tensor(tgt),
            torch.tensor(w) if utw else None).item()
        got = float(L.bce_loss(jnp.asarray(out), jnp.asarray(tgt),
                               jnp.asarray(w) if utw else None,
                               use_target_weight=utw, loss_weight=1.3))
        np.testing.assert_allclose(got, ref, atol=1e-5)

    J, H, W = 3, 6, 4
    pred = rng.normal(size=(N, 3 * J, H, W)).astype(np.float32)
    gt = rng.normal(size=(N, 3 * J, H, W)).astype(np.float32)
    tw = rng.uniform(0.5, 1.5, (N, J, 1)).astype(np.float32)
    for utw in (False, True):
        ref = CombinedTargetMSELoss(use_target_weight=utw, loss_weight=0.7)(
            torch.tensor(pred), torch.tensor(gt), torch.tensor(tw)).item()
        got = float(L.combined_target_mse_loss(
            jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(tw),
            use_target_weight=utw, loss_weight=0.7))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_mesh_and_gan_losses_match_reference_torch():
    """Rotation helpers, perspective projection, MeshLoss and GANLoss vs
    the vendored torch implementations (ref: vit_pose/vit_models/losses/
    mesh_loss.py)."""
    import sys

    import torch

    sys.path.insert(0, "/root/reference")
    from vit_pose.vit_models.losses.mesh_loss import (
        GANLoss,
        MeshLoss,
        batch_rodrigues,
        perspective_projection,
        quat_to_rotmat,
    )

    rng = np.random.default_rng(13)
    B = 6
    quat = rng.normal(size=(B, 4)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(L.quat_to_rotmat(jnp.asarray(quat))),
        quat_to_rotmat(torch.tensor(quat)).numpy(), atol=1e-5)
    aa = rng.normal(size=(B, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(L.batch_rodrigues(jnp.asarray(aa))),
        batch_rodrigues(torch.tensor(aa)).numpy(), atol=1e-5)

    # rot6d: the reference's copy is unreachable (missing F import) —
    # property-test the intended Zhou et al. math instead.
    R = np.asarray(L.batch_rodrigues(jnp.asarray(aa)))
    six = R[:, :, :2].reshape(B, 6)
    R6 = np.asarray(L.rot6d_to_rotmat(jnp.asarray(six)))
    np.testing.assert_allclose(R6, R, atol=1e-5)

    pts = rng.normal(size=(B, 7, 3)).astype(np.float32)
    rot = np.asarray(L.batch_rodrigues(jnp.asarray(aa)))
    tr = rng.normal(size=(B, 3)).astype(np.float32)
    tr[:, 2] += 6.0
    fl = rng.uniform(500, 1500, (B,)).astype(np.float32)
    cc = rng.normal(size=(B, 2)).astype(np.float32) * 100
    ref_p = perspective_projection(
        torch.tensor(pts), torch.tensor(rot), torch.tensor(tr),
        torch.tensor(fl), torch.tensor(cc)).numpy()
    got_p = np.asarray(L.perspective_projection(
        jnp.asarray(pts), jnp.asarray(rot), jnp.asarray(tr),
        jnp.asarray(fl), jnp.asarray(cc)))
    np.testing.assert_allclose(got_p, ref_p, rtol=1e-4, atol=1e-3)

    K, V = 8, 20
    output = {
        "vertices": rng.normal(size=(B, V, 3)).astype(np.float32),
        "joints_3d": rng.normal(size=(B, K, 3)).astype(np.float32),
        "camera": np.stack([rng.uniform(0.5, 1.5, B), rng.normal(size=B),
                            rng.normal(size=B)], -1).astype(np.float32),
        "pose": np.asarray(L.batch_rodrigues(
            jnp.asarray(rng.normal(size=(B * 24, 3)).astype(np.float32)))
        ).reshape(B, 24, 3, 3),
        "beta": rng.normal(size=(B, 10)).astype(np.float32),
    }
    target = {
        "vertices": rng.normal(size=(B, V, 3)).astype(np.float32),
        "joints_3d": rng.normal(size=(B, K, 3)).astype(np.float32),
        "joints_3d_visible": rng.integers(0, 2, (B, K, 1)).astype(np.float32),
        "joints_2d": rng.uniform(0, 224, (B, K, 2)).astype(np.float32),
        "joints_2d_visible": rng.integers(0, 2, (B, K, 1)).astype(np.float32),
        "pose": rng.normal(size=(B, 72)).astype(np.float32),
        "beta": rng.normal(size=(B, 10)).astype(np.float32),
        "has_smpl": rng.integers(0, 2, (B,)).astype(np.float32),
    }
    weights = dict(joints_2d_loss_weight=1.0, joints_3d_loss_weight=2.0,
                   vertex_loss_weight=0.5, smpl_pose_loss_weight=3.0,
                   smpl_beta_loss_weight=0.02)
    ref_mod = MeshLoss(img_res=224, focal_length=5000, **weights)
    ref = ref_mod(
        {k: torch.tensor(v) for k, v in output.items()},
        {k: torch.tensor(v) for k, v in target.items()})
    got = L.mesh_loss({k: jnp.asarray(v) for k, v in output.items()},
                      {k: jnp.asarray(v) for k, v in target.items()},
                      img_res=224, focal_length=5000, **weights)
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_allclose(float(got[k]), ref[k].item(),
                                   rtol=1e-4, atol=1e-5)

    x = rng.normal(size=(B, 1)).astype(np.float32)
    for gan_type in ("vanilla", "lsgan", "wgan", "hinge"):
        ref_gan = GANLoss(gan_type, loss_weight=2.0)
        for real in (True, False):
            for is_disc in (False, True):
                r = ref_gan(torch.tensor(x), real, is_disc).item()
                g = float(L.gan_loss(jnp.asarray(x), real, gan_type,
                                     loss_weight=2.0, is_disc=is_disc))
                np.testing.assert_allclose(g, r, rtol=1e-5, atol=1e-6)


def test_semi_supervision_and_multistage_losses_match_reference_torch():
    """semi_supervision_loss / multi_stage_loss vs the vendored torch
    modules (ref: regression_loss.py SemiSupervisionLoss,
    multi_loss_factory.py MultiLossFactory)."""
    import sys

    import torch

    sys.path.insert(0, "/root/reference")
    from vit_pose.vit_models.losses.multi_loss_factory import MultiLossFactory
    from vit_pose.vit_models.losses.regression_loss import SemiSupervisionLoss

    rng = np.random.default_rng(17)
    N, K = 4, 7
    parents = [0, 0, 1, 2, 0, 4, 5]
    output = {
        "labeled_pose": rng.normal(size=(N, K, 3)).astype(np.float32),
        "unlabeled_pose": rng.normal(size=(N, K, 3)).astype(np.float32),
        "unlabeled_traj": rng.normal(size=(N, 1, 3)).astype(np.float32),
    }
    output["unlabeled_traj"][..., 2] += 5.0
    for nintr in (4, 9):
        intr = rng.uniform(0.1, 1.0, (N, nintr)).astype(np.float32)
        target = {
            "unlabeled_target_2d": rng.normal(size=(N, K, 2)).astype(np.float32),
            "intrinsics": intr,
        }
        ref_mod = SemiSupervisionLoss(parents, projection_loss_weight=1.5,
                                      bone_loss_weight=0.8)
        ref = ref_mod({k: torch.tensor(v) for k, v in output.items()},
                      {k: torch.tensor(v) for k, v in target.items()})
        got = L.semi_supervision_loss(
            {k: jnp.asarray(v) for k, v in output.items()},
            {k: jnp.asarray(v) for k, v in target.items()},
            parents, projection_loss_weight=1.5, bone_loss_weight=0.8)
        for k in ("proj_loss", "bone_loss"):
            np.testing.assert_allclose(float(got[k]), ref[k].item(),
                                       rtol=1e-4, atol=1e-5)

    J, H, W, M = 3, 8, 6, 5
    cfg = dict(num_joints=J, num_stages=2, ae_loss_type="exp",
               with_ae_loss=[True, False], push_loss_factor=[0.001, 0.001],
               pull_loss_factor=[0.001, 0.001], with_heatmaps_loss=[True, True],
               heatmaps_loss_factor=[1.0, 4.0])
    outputs = [rng.normal(size=(N, 2 * J, H, W)).astype(np.float32),
               rng.normal(size=(N, J, H, W)).astype(np.float32)]
    heatmaps = [np.abs(rng.normal(size=(N, J, H, W))).astype(np.float32)
                for _ in range(2)]
    masks = [(rng.uniform(size=(N, H, W)) > 0.2).astype(np.float32)
             for _ in range(2)]
    joints = []
    for _ in range(2):
        j = np.zeros((N, M, J, 2), np.int64)
        j[..., 0] = rng.integers(0, J * H * W, (N, M, J))
        j[..., 1] = rng.integers(0, 2, (N, M, J))
        joints.append(j)
    ref_mod = MultiLossFactory(**{k: (v if not isinstance(v, tuple) else list(v))
                                  for k, v in cfg.items()})
    rh, rpush, rpull = ref_mod(
        [torch.tensor(o) for o in outputs], [torch.tensor(h) for h in heatmaps],
        [torch.tensor(m) for m in masks], [torch.tensor(j) for j in joints])
    gh, gpush, gpull = L.multi_stage_loss(
        [jnp.asarray(o) for o in outputs], [jnp.asarray(h) for h in heatmaps],
        [jnp.asarray(m) for m in masks], [jnp.asarray(j) for j in joints],
        num_joints=J, ae_loss_type="exp", with_ae_loss=(True, False),
        push_loss_factor=(0.001, 0.001), pull_loss_factor=(0.001, 0.001),
        with_heatmaps_loss=(True, True), heatmaps_loss_factor=(1.0, 4.0))
    for r, g in zip(rh, gh):
        np.testing.assert_allclose(np.asarray(g), r.numpy(), atol=1e-5)
    for r, g in zip(rpush + rpull, gpush + gpull):
        if r is None:
            assert g is None
        else:
            np.testing.assert_allclose(np.asarray(g), r.numpy().ravel(),
                                       atol=1e-5)
