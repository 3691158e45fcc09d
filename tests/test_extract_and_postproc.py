"""Tests: TTHQ event parsing vs reference, heatmap decode, OneEuro filter."""
import numpy as np
import pandas as pd
import pytest

from upliftingtabletennis_tpu.data.extract_tthq import (
    load_ball_keypoints,
    load_table_keypoints,
    load_trajectories,
    write_tables,
)


def _events_df(rows):
    return pd.DataFrame({"frame": [r[0] for r in rows], "event": [r[1] for r in rows]})


def test_trajectory_state_machine_matches_reference(reference_path):
    import sys

    sys.path.insert(0, str(reference_path))
    from dataprocessing.extract_tthq_data import load_trajectories as ref_load

    rows = [
        (10, "Begin"), (12, "Frontspin"), (20, "Bounce"), (30, "Hit"),
        (35, "Backspin"), (40, "Bounce"), (41, "Bounce"), (50, "Hit"),
        (55, "Netz"), (60, "Bounce"), (70, "End"),
        (80, "Hit"), (81, "Hit"), (90, "Bounce"), (100, "Hit"), (110, "End"),
    ]
    df = _events_df(rows)
    ours = load_trajectories(df, "vid", 50.0)
    theirs = ref_load(df, "vid", 50.0)
    assert ours == theirs
    # sanity on semantics: first traj keeps 'first' status + frontspin + bounce 20
    assert ours[0][:6] == ("vid", 10, 30, 20, 1, "first")
    # double bounce midpoint
    assert ours[1][3] == 40.5
    # Netz marks unusable
    netz_traj = [t for t in ours if not t[6]]
    assert len(netz_traj) == 1 and netz_traj[0][5] == "last"
    # consecutive hits: later frame wins as start
    assert any(t[1] == 81 for t in ours)


def test_keypoint_tables_roundtrip(tmp_path):
    kdf = pd.DataFrame(
        {
            "frame": [1, 2],
            "ball center_x": [100.0, 110.0],
            "ball center_y": [200.0, 210.0],
            "ball center_flag": [2, 0],
            **{
                f"{k:02d}_{c}": [float(k * 10 + i), float(k * 10 + i)]
                for k in range(1, 14)
                for i, c in enumerate(("x", "y"))
            },
            **{f"{k:02d}_flag": [2, 2] for k in range(1, 14)},
        }
    )
    balls = load_ball_keypoints(kdf, "vid")
    assert 1 in balls and 2 not in balls  # flag 0 dropped
    tables = load_table_keypoints(kdf)
    assert set(tables) == {1, 2} and len(tables[1]) == 13

    write_tables(str(tmp_path), [("vid", 1, 2, None, 0, "intermediate", True, 50.0)],
                 {"vid": balls}, {"vid": tables})
    bd = pd.read_csv(tmp_path / "ball_detection.csv", sep=";")
    assert len(bd) == 1 and bd["ball_x"][0] == 100.0
    td = pd.read_csv(tmp_path / "table_detection.csv", sep=";")
    assert "point_13_flag" in td.columns and len(td) == 2


def test_heatmap_decode_dark():
    import jax.numpy as jnp

    from upliftingtabletennis_tpu.ops.heatmap_decode import keypoints_from_heatmaps

    H, W = 48, 64
    ys, xs = np.mgrid[0:H, 0:W]
    rng = np.random.default_rng(0)
    centers = np.stack([rng.uniform(5, W - 5, 6), rng.uniform(5, H - 5, 6)], -1)
    hm = np.stack(
        [np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * 2.0**2)) for cx, cy in centers]
    ).astype(np.float32)
    hm = hm.reshape(2, 3, H, W)
    for mode, tol in (("default", 0.6), ("unbiased", 0.2)):
        coords, maxvals = keypoints_from_heatmaps(jnp.asarray(hm), post_process=mode)
        err = np.linalg.norm(np.asarray(coords).reshape(-1, 2) - centers, axis=1)
        assert err.mean() < tol, (mode, err)
        assert (np.asarray(maxvals) > 0.9).all()


def test_one_euro_filter_forms_agree():
    from upliftingtabletennis_tpu.utils.smoothing import OneEuroFilter, one_euro_trajectory

    rng = np.random.default_rng(1)
    t = np.arange(1, 100) / 50.0
    clean = np.sin(t * 3)
    noisy = clean + rng.normal(0, 0.05, len(t))

    f = OneEuroFilter(t[0], noisy[0])
    seq = [noisy[0]] + [f(tt, x) for tt, x in zip(t[1:], noisy[1:])]
    batch = np.asarray(one_euro_trajectory(t, noisy))
    np.testing.assert_allclose(np.asarray(seq), batch, atol=1e-5)
    # smoother than the input
    assert np.abs(np.diff(batch)).mean() < np.abs(np.diff(noisy)).mean()
