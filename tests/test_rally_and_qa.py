"""Tests: rally dataset selection rules, annotation QA, camera statistics."""
import os

import numpy as np
import pytest


@pytest.fixture()
def tthq_with_trajectories(tmp_path):
    """Synthetic tthq tree with trajectories.csv + annotations + frames."""
    import cv2

    from upliftingtabletennis_tpu.data.extract_tthq import write_tables

    root = tmp_path
    tthq = root / "tthq"
    video = 1  # val/test video
    vdir = tthq / f"{video:02d}"
    vdir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for f in range(0, 30):
        img = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
        cv2.imwrite(str(vdir / f"{video:02d}_{f:06d}.png"), img)

    trajectories = [
        (video, 2, 8, 5, 1, "intermediate", True, 50.0),    # valid rally
        (video, 10, 14, 12, 2, "last", True, 50.0),         # excluded: last
        (video, 16, 20, 18, 0, "intermediate", False, 50.0),  # excluded: unusable
        (video, 22, 26, 24, 1, "intermediate", True, 50.0),  # excluded: annotated frame inside
        (video, 40, 45, 42, 1, "intermediate", True, 50.0),  # excluded: frames missing
    ]
    ball = {video: {24: (10.0, 20.0, 2)}}  # annotation inside rally 4
    table = {video: {}}
    write_tables(str(tthq), trajectories, ball, table)
    return str(root)


def test_rally_selection_rules(tthq_with_trajectories):
    from upliftingtabletennis_tpu.data.rally_dataset import (
        dataset_statistics,
        load_rally_frames,
        load_tthq_rallies,
    )

    rallies = load_tthq_rallies(tthq_with_trajectories)
    assert len(rallies) == 1
    r = rallies[0]
    assert r.spin_class == 1 and r.fps == 50.0
    assert r.frames[0] == (3, 2, 4) and r.frames[-1] == (7, 6, 8)

    frames = load_rally_frames(tthq_with_trajectories, r)
    assert len(frames) == 7  # frames 2..8
    assert frames[0].shape == (32, 48, 3)

    stats = dataset_statistics(tthq_with_trajectories)
    assert stats["tthq_trajectories"] == 5
    assert stats["tthq_test_rallies"] == 1


def test_left_right_swap_detection():
    import jax.numpy as jnp

    from upliftingtabletennis_tpu.core.geometry import TABLE_POINTS, get_Mext, world2img
    from upliftingtabletennis_tpu.data.annotation_qa import (
        LEFT_RIGHT_PAIRS,
        camera_statistics,
        detect_left_right_swaps,
        fix_left_right_swaps,
    )

    c = np.array([1.0, 9.0, 5.0])
    look = np.array([0.0, 0.0, 0.76])
    f = (look - c) / np.linalg.norm(look - c)
    r = np.cross(f, [0, 0, 1.0])
    r /= np.linalg.norm(r)
    Mext = np.asarray(get_Mext(jnp.asarray(c), jnp.asarray(f), jnp.asarray(r)))
    Mint = np.array([[2710.0, 0, 1280], [0, 2907.0, 720], [0, 0, 1]])
    pts = np.asarray(world2img(jnp.asarray(TABLE_POINTS), jnp.asarray(Mext), jnp.asarray(Mint)))
    kps = np.concatenate([pts, np.ones((13, 1))], -1).astype(np.float32)

    flagged, base = detect_left_right_swaps(kps, (2560, 1440))
    assert flagged == [] and base < 3.0

    # swap the close-left/close-right pair like a bad annotation
    bad = kps.copy()
    a, b = LEFT_RIGHT_PAIRS[0]
    bad[[a, b], :2] = bad[[b, a], :2]
    flagged, base_bad = detect_left_right_swaps(bad, (2560, 1440))
    assert 0 in flagged and base_bad > base

    fixed, n = fix_left_right_swaps(bad, (2560, 1440))
    assert n >= 1
    np.testing.assert_allclose(fixed[:, :2], kps[:, :2], atol=1e-4)

    stats = camera_statistics([(Mint, Mext)])
    assert abs(stats["fx"][0] - 2710) < 1e-3
    assert abs(stats["distance"][0] - np.linalg.norm(c)) < 1e-3


def test_render_annotation_check(tmp_path):
    """Headless annotation-QA render: flags a swapped pair in red, writes a
    PNG (ref: dataprocessing/check_annotations.py, interactive there)."""
    import jax.numpy as jnp

    from upliftingtabletennis_tpu.core import geometry as G
    from upliftingtabletennis_tpu.data.annotation_qa import render_annotation_check

    W, H = 640, 360
    Mint = jnp.asarray([[900.0, 0, W / 2], [0, 900.0, H / 2], [0, 0, 1]])
    c = jnp.asarray([-8.0, 0.0, 2.0])
    fwd = -c / jnp.linalg.norm(c)
    Mext = G.get_Mext(c, fwd, jnp.asarray([0.0, -1.0, 0.0]))
    px = np.asarray(G.world2img(jnp.asarray(G.TABLE_POINTS, jnp.float32), Mext, Mint))
    kps = np.concatenate([px, np.ones((13, 1))], -1).astype(np.float32)
    kps[[0, 1]] = kps[[1, 0]]  # swap a mirrored pair
    kps[[0, 1], 2] = 1

    img = np.zeros((H, W, 3), np.uint8)
    out = str(tmp_path / "check.png")
    render = render_annotation_check(img, kps, (W, H), out_path=out)
    assert render.ndim == 3 and render.shape[2] == 3
    import os

    assert os.path.exists(out)
