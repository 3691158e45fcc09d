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
    assert coords.shape == (2, 1, 2) and vis.shape == (2, 1)

    tt = D.load_tthq_table_index(fake_tthq, "train")
    imgs, kps, v = D.load_table_batch(fake_tthq, tt[:2])
    assert imgs.shape == (2, 96, 128, 3) and kps.shape == (2, 13, 2)


@pytest.mark.parametrize("task,model", [("ball", "wasb"), ("table", "vitpose")])
def test_trainer_smoke(fake_tthq, task, model, tmp_path):
    """Two real optimizer steps + a validation pass through the actual CLI."""
    from upliftingtabletennis_tpu.train.run_detection import main

    main(
        [
            "--task", task, "--model", model, "--data_root", fake_tthq,
            "--batch_size", "2", "--num_epochs", "1", "--val_iterations", "2",
            "--max_steps", "2", "--resolution", "128", "96",
            "--eval_resolution", "256", "192",
            "--save_dir", str(tmp_path / "ckpt"),
        ]
    )
