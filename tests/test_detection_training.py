"""End-to-end detection training smoke test on a synthetic TTHQ layout."""
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def fake_tthq(tmp_path_factory):
    """Tiny TTHQ tree: 2 videos x a few frames with a bright ball blob."""
    import cv2

    root = tmp_path_factory.mktemp("data")
    tthq = root / "tthq"
    rng = np.random.default_rng(0)
    rows_ball = ["video;frame;ball_x;ball_y;ball_flag"]
    rows_table = [
        "video;frame;"
        + ";".join(f"point_{k}_x;point_{k}_y;point_{k}_flag" for k in range(1, 14))
    ]
    H, W = 96, 128
    for video in (1, 2):
        vdir = tthq / f"{video:02d}"
        vdir.mkdir(parents=True)
        for frame in range(8):
            img = rng.integers(0, 60, (H, W, 3), dtype=np.uint8)
            bx, by = rng.uniform(10, W - 10), rng.uniform(10, H - 10)
            cv2.circle(img, (int(bx), int(by)), 3, (255, 255, 255), -1)
            cv2.imwrite(str(vdir / f"{video:02d}_{frame:06d}.png"), img)
            if 1 <= frame <= 6:
                rows_ball.append(f"{video};{frame};{bx:.1f};{by:.1f};2")
                pts = ";".join(
                    f"{rng.uniform(5, W - 5):.1f};{rng.uniform(5, H - 5):.1f};2" for _ in range(13)
                )
                rows_table.append(f"{video};{frame};{pts}")
    (tthq / "ball_detection.csv").write_text("\n".join(rows_ball))
    (tthq / "table_detection.csv").write_text("\n".join(rows_table))
    return str(root)


def test_index_loading(fake_tthq):
    from upliftingtabletennis_tpu.data import detection as D

    tr = D.load_tthq_ball_index(fake_tthq, "train")
    va = D.load_tthq_ball_index(fake_tthq, "val")
    te = D.load_tthq_ball_index(fake_tthq, "test")
    assert len(tr) > 0 and len(va) + len(te) > 0
    assert all(s.video == 2 for s in tr)  # video 1 is val/test
    assert all(s.video == 1 for s in va + te)

    imgs, coords, vis = D.load_ball_batch(fake_tthq, tr[:2])
    assert imgs.shape == (2, 96, 128, 9)
    # coords rows: (center, streak_min, streak_max); TTHQ has min == max ==
    # center (ref: balldetection/dataset.py:412-415)
    assert coords.shape == (2, 3, 2) and vis.shape == (2, 3)
    np.testing.assert_array_equal(coords[:, 0], coords[:, 1])
    np.testing.assert_array_equal(coords[:, 0], coords[:, 2])

    tt = D.load_tthq_table_index(fake_tthq, "train")
    imgs, kps, v = D.load_table_batch(fake_tthq, tt[:2])
    assert imgs.shape == (2, 96, 128, 3) and kps.shape == (2, 13, 2)


@pytest.fixture(scope="module")
def fake_blurball(tmp_path_factory):
    """Tiny BlurBall tree: 2 videos (one holdout) x 1 sequence x frames,
    streak annotations + per-video calib yamls (ref layout:
    balldetection/dataset.py:135-222, tabledetection/dataset.py:210-262)."""
    import cv2

    root = tmp_path_factory.mktemp("bbdata")
    bb = root / "blurball"
    ann = bb / "all_csv_annotations"
    calib = bb / "all_calib_files"
    ann.mkdir(parents=True)
    calib.mkdir()
    rng = np.random.default_rng(1)
    H, W = 96, 128
    for vid in (1, 3):  # 3 is in the holdout set
        seq_dir = bb / f"{vid:02d}" / "frames" / "000"
        seq_dir.mkdir(parents=True)
        rows = ["Frame,X,Y,l,theta,Visibility"]
        for frame in range(6):
            img = rng.integers(0, 60, (H, W, 3), dtype=np.uint8)
            bx, by = rng.uniform(10, W - 10), rng.uniform(10, H - 10)
            cv2.circle(img, (int(bx), int(by)), 2, (255, 255, 255), -1)
            cv2.imwrite(str(seq_dir / f"{frame:05d}.png"), img)
            rows.append(f"{frame},{bx:.1f},{by:.1f},2.0,30.0,1")
        (ann / f"{vid:02d}_csv_000.csv").write_text("\n".join(rows))
        # a plausible camera ~5 m behind the table looking at it
        (calib / f"{vid:02d}_table_pose.yaml").write_text(
            "rvec: [1.2, 0.0, 0.0]\ntvec: [0.0, 0.5, 5.0]\nf: 120.0\n"
        )
    return str(root)


def test_blurball_ball_index_and_batch(fake_blurball):
    from upliftingtabletennis_tpu.data import detection as D

    tr = D.load_blurball_index(fake_blurball, "train")
    va = D.load_blurball_index(fake_blurball, "val")
    te = D.load_blurball_index(fake_blurball, "test")
    assert len(tr) > 0 and len(va) + len(te) > 0  # vid 3 is holdout
    imgs, coords, vis = D.load_blurball_ball_batch(fake_blurball, tr[:2])
    assert imgs.shape == (2, 96, 128, 9)
    assert coords.shape == (2, 3, 2)
    # streak endpoints differ from the center (blur length 2, theta 30 deg)
    assert not np.allclose(coords[:, 1], coords[:, 2])


def test_blurball_table_keypoints(fake_blurball):
    """Reprojection-derived table keypoints: finite, and consistent with
    projecting TABLE_POINTS through the composed camera by hand."""
    from upliftingtabletennis_tpu.core.geometry import TABLE_HEIGHT, TABLE_POINTS
    from upliftingtabletennis_tpu.data import detection as D

    tr = D.load_blurball_table_index(fake_blurball, "train")
    assert len(tr) > 0
    imgs, kps, vis = D.load_blurball_table_batch(fake_blurball, tr[:2])
    assert kps.shape == (2, 13, 2) and np.isfinite(kps).all()
    assert (vis == 1).all()

    # hand-computed projection of keypoint 0 must match
    cam = {"rvec": [1.2, 0.0, 0.0], "tvec": [0.0, 0.5, 5.0], "f": 120.0}
    kp = D.blurball_table_keypoints(cam, (128, 96))
    R = D._rodrigues(np.asarray(cam["rvec"], np.float64))
    Mext = np.eye(4)
    Mext[:3, :3] = R
    Mext[:3, 3] = cam["tvec"]
    trans = np.array(
        [[0, -1, 0, 0], [1, 0, 0, 0], [0, 0, 1, -TABLE_HEIGHT], [0, 0, 0, 1]], np.float64
    )
    M = Mext @ trans
    p = M @ np.array([*np.asarray(TABLE_POINTS)[0], 1.0])
    x = 120.0 * p[0] / p[2] + (128 - 1) / 2
    y = 120.0 * p[1] / p[2] + (96 - 1) / 2
    np.testing.assert_allclose(kp[0, :2], [x, y], rtol=1e-5)


def test_pretrain_then_finetune_handoff(fake_blurball, fake_tthq, tmp_path):
    """BlurBall pretrain run -> warm-started TTHQ finetune, through the CLI
    (ref: balldetection/train.py:58-60, config.py:41-44)."""
    from upliftingtabletennis_tpu.train.run_detection import main

    save = tmp_path / "ckpt"
    main(
        [
            "--task", "ball", "--model", "wasb", "--data", "blurball",
            "--data_root", fake_blurball, "--batch_size", "2",
            "--val_iterations", "1", "--max_steps", "1",
            "--resolution", "128", "96", "--eval_resolution", "256", "192",
            "--save_dir", str(save), "--logdir", str(save / "runs"),
        ]
    )
    # locate the saved checkpoint and expose it at the pretraining path
    import glob
    import shutil

    run_dirs = glob.glob(str(save / "ball_wasb_*"))
    assert run_dirs, "pretraining run saved no checkpoint"
    pre = save / "pretraining_blurball" / "wasb"
    pre.mkdir(parents=True)
    shutil.copytree(os.path.join(run_dirs[0], "model"), str(pre / "model"))

    main(
        [
            "--task", "ball", "--model", "wasb", "--data", "tthq",
            "--data_root", fake_tthq, "--pretraining", "--batch_size", "2",
            "--val_iterations", "1", "--max_steps", "1",
            "--resolution", "128", "96", "--eval_resolution", "256", "192",
            "--save_dir", str(save), "--logdir", str(save / "runs"),
        ]
    )


@pytest.mark.parametrize("task,model,dp", [("ball", "wasb", 2), ("table", "vitpose", 1)])
def test_trainer_smoke(fake_tthq, task, model, dp, tmp_path):
    """Two real optimizer steps + a validation pass through the actual CLI;
    the ball case shards the batch over a 2-device dp mesh."""
    from upliftingtabletennis_tpu.train.run_detection import main

    main(
        [
            "--task", task, "--model", model, "--data_root", fake_tthq, "--dp", str(dp),
            "--batch_size", "2", "--num_epochs", "1", "--val_iterations", "2",
            "--max_steps", "2", "--resolution", "128", "96",
            "--eval_resolution", "256", "192",
            "--save_dir", str(tmp_path / "ckpt"), "--logdir", str(tmp_path / "runs"),
        ]
    )


def test_trainer_reference_flags(fake_tthq, tmp_path):
    """The reference's remaining trainer knobs through the CLI: in_frames=1,
    heatmap_sigma, not_use_invis, exp_id in the run identifier, and --debug
    routing to the *_tmp dirs (ref: balldetection/train.py:12-18,
    config.py:47-50)."""
    import glob

    from upliftingtabletennis_tpu.train.run_detection import main
    from upliftingtabletennis_tpu.utils.checkpoint import load_checkpoint

    save = tmp_path / "ckpt"
    main(
        [
            "--task", "ball", "--model", "wasb", "--data_root", fake_tthq,
            "--batch_size", "2", "--num_epochs", "1", "--val_iterations", "1",
            "--max_steps", "1", "--resolution", "128", "96",
            "--eval_resolution", "256", "192",
            "--in_frames", "1", "--heatmap_sigma", "4.0", "--not_use_invis",
            "--exp_id", "flagtest", "--debug",
            "--save_dir", str(save), "--logdir", str(tmp_path / "runs"),
        ]
    )
    # --debug must have redirected the save dir to <dir>_tmp
    assert not glob.glob(str(save / "ball_wasb*")), "--debug wrote to the non-tmp dir"
    run_dirs = glob.glob(str(save) + "_tmp/ball_wasb_exp:flagtest_*")
    assert run_dirs, "identifier missing the exp_id tag (or no checkpoint saved)"
    _, _, info = load_checkpoint(os.path.join(run_dirs[0], "model"))
    assert info["in_frames"] == 1
    assert info["heatmap_sigma"] == 4.0
    assert info["use_invis"] is False


def test_trainer_torch_init_flag(fake_tthq, tmp_path):
    """--torch_init wiring: a reference-layout `initialization/wasb/model.pth`
    (single-frame HRNet state dict) flows through the CLI's filtered load +
    stem widening and the run still trains (ref: wasb.py:580-589). The
    init *semantics* are parity-pinned in test_port_reference_weights.py;
    this covers the flag plumbing end-to-end."""
    import pathlib
    import sys

    import pytest

    if not pathlib.Path("/root/reference").exists():
        pytest.skip("reference repo not available")
    sys.path.insert(0, "/root/reference")
    import torch

    from balldetection.models.wasb import WASBNet as RefWASB
    from upliftingtabletennis_tpu.train.run_detection import main

    import paths as ref_paths

    (tmp_path / "initialization" / "wasb").mkdir(parents=True)
    old_wp = ref_paths.weights_path
    ref_paths.weights_path = str(tmp_path)
    try:
        torch.save({}, tmp_path / "initialization" / "wasb" / "model.pth")
        torch.manual_seed(3)
        donor_sd = RefWASB(in_frames=1, resolution=(1280, 704)).model.state_dict()
    finally:
        ref_paths.weights_path = old_wp
    init_pth = tmp_path / "wasb_init.pth"
    torch.save(donor_sd, init_pth)

    main(
        [
            "--task", "ball", "--model", "wasb", "--data_root", fake_tthq,
            "--torch_init", str(init_pth), "--batch_size", "2",
            "--num_epochs", "1", "--val_iterations", "1", "--max_steps", "1",
            "--resolution", "128", "96", "--eval_resolution", "256", "192",
            "--save_dir", str(tmp_path / "ckpt"),
            "--logdir", str(tmp_path / "runs"),
        ]
    )
