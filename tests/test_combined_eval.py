"""Combined-eval protocols (TTHQ + TTST) and the 3D/overlay visualization
on synthetic fixtures with tiny random models (ref:
inference/inference_combined.py:65-305, 310-456)."""
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_pipeline():
    from upliftingtabletennis_tpu.pipeline.interface import (
        BallDetector,
        TableDetector,
        TableTennisPipeline,
        UpliftingModel,
    )

    pipe = TableTennisPipeline.__new__(TableTennisPipeline)
    pipe.ball_detector = BallDetector("wasb", chunk=4, resolution=(96, 64))
    pipe.ball_detector_aux = BallDetector("wasb", chunk=4, resolution=(96, 64))
    pipe.table_detector = TableDetector("hrnet", chunk=4, resolution=(96, 64))
    pipe.table_detector_aux = TableDetector("hrnet", chunk=4, resolution=(96, 64))
    pipe.uplifting_model = UpliftingModel(name="connectstage", size="small")
    pipe.KEYPOINT_VISIBLE = 1
    return pipe


@pytest.fixture(scope="module")
def rally_frames():
    rng = np.random.default_rng(7)
    return [rng.integers(0, 255, (64, 96, 3)).astype(np.uint8) for _ in range(8)]


def test_evaluate_rally_tthq(tiny_pipeline, rally_frames):
    from upliftingtabletennis_tpu.eval.run_combined_eval import evaluate_rally

    out = evaluate_rally(tiny_pipeline, rally_frames, fps=50)
    assert set(out) >= {"spin", "pos3d", "table_reproj_px", "ball_reproj_px"}


def test_evaluate_rally_ttst(tiny_pipeline, rally_frames):
    from upliftingtabletennis_tpu.eval.run_combined_eval import evaluate_rally_ttst

    T = len(rally_frames) - 2  # annotations for the interior frames
    ann = {
        "r_img": np.random.default_rng(0).uniform(100, 2000, (T, 2)),
        "times": np.arange(T) / 50.0,
        "Mint": np.array([[2700.0, 0, 1280], [0, 2900.0, 720], [0, 0, 1]]),
        "Mext": np.eye(4),
        "spin_class": 1,
        "table_img": np.random.default_rng(1).uniform(100, 2000, (13, 2)),
    }
    out = evaluate_rally_ttst(tiny_pipeline, rally_frames, ann)
    assert set(out) >= {"spin", "table_px", "ball_detection_px", "ball_uplifting_px"}
    # with random models the ball filter may reject everything; metrics are
    # either finite floats or NaN, never exceptions
    for k in ("table_px", "ball_detection_px", "ball_uplifting_px"):
        assert isinstance(out[k], float)


def test_visualize_rally_writes_pngs(tiny_pipeline, rally_frames, tmp_path):
    from upliftingtabletennis_tpu.eval.run_combined_eval import visualize_rally

    visualize_rally(tiny_pipeline, rally_frames, 50, str(tmp_path), "t0000", spin_gt=1)
    assert os.path.exists(tmp_path / "t0000_2d.png")
    # the 3d render requires a surviving trajectory; if produced it is a PNG
    p3 = tmp_path / "t0000_3d.png"
    if p3.exists():
        assert p3.stat().st_size > 1000


def test_render_rally_3d(tmp_path):
    from upliftingtabletennis_tpu.eval.run_combined_eval import render_rally_3d

    t = np.linspace(0, 1, 30)
    pos3d = np.stack([-1 + 3 * t, 0.3 * np.sin(3 * t), 1.0 - 1.5 * t + 2 * t**2], -1)
    render_rally_3d(pos3d, str(tmp_path / "traj.png"))
    assert (tmp_path / "traj.png").stat().st_size > 5000


def test_spin_counts():
    from upliftingtabletennis_tpu.eval.run_combined_eval import SpinCounts

    s = SpinCounts()
    s.update(np.array([0, 5.0, 0]), 1)   # topspin correctly predicted
    s.update(np.array([0, -5.0, 0]), 2)  # backspin correctly predicted
    s.update(np.array([0, -5.0, 0]), 1)  # topspin missed
    s.update(np.array([0, 5.0, 0]), 0)   # unannotated -> ignored
    m = s.metrics()
    assert np.isclose(m["accuracy"], 2 / 3)
    assert s.tp == 1 and s.tn == 1 and s.fn == 1 and s.fp == 0
