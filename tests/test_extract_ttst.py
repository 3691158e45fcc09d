"""TTST extraction (data/extract_ttst.py) on synthetic annotation CSVs.

Builds raw `<vid>_{events,keypoints}.csv` files from a KNOWN camera and a
synthetic ball path, runs the full extraction, and checks the event state
machine, the timestamp/missing-frame handling, the bounce times, and that
the regressed camera reprojects the table to within a few pixels
(ref: dataprocessing/extract_ttst_data.py:28-177).
"""
import os

import numpy as np
import pytest

from upliftingtabletennis_tpu.core.geometry import TABLE_POINTS

W, H = 640, 360
FPS = 50


def _camera():
    """A simple synthetic broadcast-like camera."""
    f = 900.0
    Mint = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    # looking down the +x axis from 8 m away, 2 m up
    from upliftingtabletennis_tpu.core import geometry as G
    import jax.numpy as jnp

    c = jnp.asarray([-8.0, 0.0, 2.0])
    fwd = -c / jnp.linalg.norm(c)
    right = jnp.asarray([0.0, -1.0, 0.0])
    Mext = np.asarray(G.get_Mext(c, fwd, right))
    return Mint, Mext


def _project(Mint, Mext, pts3d):
    p = np.concatenate([pts3d, np.ones((len(pts3d), 1))], -1) @ Mext.T
    p = p[:, :3] / p[:, 3:4]
    q = p @ Mint.T
    return q[:, :2] / q[:, 2:3]


@pytest.fixture(scope="module")
def raw_annotations(tmp_path_factory):
    root = tmp_path_factory.mktemp("ttst_raw")
    Mint, Mext = _camera()
    table_px = _project(Mint, Mext, np.asarray(TABLE_POINTS))

    # ball flies over the table for 20 frames; frame 7 is unannotated
    t = np.arange(20) / FPS
    ball3d = np.stack(
        [-1.2 + 3.0 * t, 0.2 - 0.3 * t, 1.1 - 2.0 * t + 4.0 * t**2], -1
    )
    ball_px = _project(Mint, Mext, ball3d)

    header = "junk line to skip\nframe;ball_x;ball_y;ball_flag;" + ";".join(
        f"{p:02}_x;{p:02}_y;{p:02}_flag" for p in range(1, 14)
    )
    rows = [header]
    for i in range(25):
        frame = 100 + i
        annotated = 0 <= i < 20 and i != 7
        bx, by, bf = (ball_px[i][0], ball_px[i][1], 2) if annotated else (-1, -1, 0)
        # table annotated on every 2nd frame with +-0.5 px jitter
        cells = []
        rng = np.random.default_rng(i)
        for p in range(13):
            if i % 2 == 0:
                jx, jy = rng.uniform(-0.5, 0.5, 2)
                cells.append(f"{table_px[p, 0] + jx:.2f};{table_px[p, 1] + jy:.2f};2")
            else:
                cells.append("-1;-1;0")
        rows.append(f"{frame};{bx:.2f};{by:.2f};{bf};" + ";".join(cells))
    (root / "01_keypoints.csv").write_text("\n".join(rows))

    ev = [
        "junk line to skip",
        "frame;event",
        "100;Begin",
        "103;Frontspin",
        "108;Bounce",
        "119;End",
        # second event WITHOUT a spin annotation -> must be dropped
        "130;Begin",
        "135;Bounce",
        "140;End",
    ]
    (root / "01_events.csv").write_text("\n".join(ev))
    return str(root), Mint, Mext, ball_px


def test_transform_annotations(raw_annotations):
    from upliftingtabletennis_tpu.data import extract_ttst as X

    root, Mint, Mext, ball_px = raw_annotations
    r_imgs, times, Mints, Mexts, bounces, spins, vnf = X.transform_annotations(
        root, paths=("01",), resolution=(W, H)
    )
    # only the spin-annotated event survives (ref state machine :50-70)
    assert len(r_imgs) == 1 and spins == [1]
    # 20 annotated frames in [100, 119] minus missing frame 107
    assert len(r_imgs[0]) == 19
    # missing frame leaves a 2/FPS gap in the timestamps
    dt = np.diff(times[0])
    assert np.isclose(dt.max(), 2 / FPS) and np.isclose(dt.min(), 1 / FPS)
    # bounce at (108-100)/FPS
    np.testing.assert_allclose(bounces[0], [[8 / FPS]][0])
    # regressed camera reprojects the table accurately despite jitter
    proj = _project(np.asarray(Mints[0]), np.asarray(Mexts[0]), np.asarray(TABLE_POINTS))
    gt = _project(Mint, Mext, np.asarray(TABLE_POINTS))
    assert np.linalg.norm(proj - gt, axis=1).mean() < 2.0


def test_generate_inference_dataset_roundtrip(raw_annotations, tmp_path):
    from upliftingtabletennis_tpu.data import extract_ttst as X
    from upliftingtabletennis_tpu.data.ttst import load_ttst

    root, *_ = raw_annotations
    n = X.generate_inference_dataset(
        root, str(tmp_path / "ttst"), paths=("01",), resolution=(W, H), extract_frames=False
    )
    assert n == 1
    files = os.listdir(tmp_path / "ttst" / "trajectory_0000")
    assert {"r_img.npy", "times.npy", "Mint.npy", "Mext.npy", "hits.npy", "spin_class.npy"} <= set(files)
    assert int(np.load(tmp_path / "ttst" / "trajectory_0000" / "spin_class.npy")) == 1


def test_too_few_table_points_raises():
    from upliftingtabletennis_tpu.data.extract_ttst import regress_event_camera

    with pytest.raises(ValueError):
        regress_event_camera({1: [(10.0, 10.0)], 2: [(20.0, 20.0)]}, (W, H))
