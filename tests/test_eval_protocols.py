"""End-to-end eval-protocol tests on physics-generated TTST/TT3D layouts."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from upliftingtabletennis_tpu.core import geometry as G
from upliftingtabletennis_tpu.data import datagen as DG
from upliftingtabletennis_tpu.eval import robustness as R


@pytest.fixture(scope="module")
def traj_data():
    key = jax.random.PRNGKey(0)
    res = DG.generate_dataset(key, 12, "intermediate", "left_to_right", batch=256)
    return res


@pytest.fixture(scope="module")
def ttst_dir(tmp_path_factory, traj_data):
    """Write a synthetic TTST layout at the 2560x1440 working resolution."""
    root = tmp_path_factory.mktemp("ttst_root")
    path = root / "ttst"
    path.mkdir()
    Mext, Mint_sim = np.asarray(DG.sim_camera()[0]), np.asarray(DG.sim_camera()[1])
    # rescale the sim camera (1920x1080) to the 2560x1440 working res
    Mint = np.asarray(
        G.rescale_intrinsics(jnp.asarray(Mint_sim), (1920, 1080), (G.WIDTH, G.HEIGHT))
    )
    fps = 50
    for i in range(len(traj_data["positions"])):
        valid = traj_data["frame_valid"][i]
        pos = traj_data["positions"][i][valid]
        # sample at eval fps
        step = 500 // fps
        pos = pos[::step][:40]
        times = np.arange(len(pos)) / fps
        r_img = np.asarray(
            G.world2img(jnp.asarray(pos), jnp.asarray(Mext), jnp.asarray(Mint))
        )
        d = path / f"trajectory_{i:04d}"
        d.mkdir()
        np.save(d / "r_img.npy", r_img)
        np.save(d / "times.npy", times)
        np.save(d / "hits.npy", traj_data["bounces"][i][: traj_data["n_bounces"][i]])
        np.save(d / "Mint.npy", Mint)
        np.save(d / "Mext.npy", Mext)
        # spin class from the local flight frame (topspin=1 / backspin=2)
        w_local = np.asarray(
            G.transform_rotation_axes(
                jnp.asarray(traj_data["rotations"][i][0]), jnp.asarray(pos)
            )
        )
        np.save(d / "spin_class.npy", np.array(1.0 if w_local[1] > 0 else 2.0))
    return str(root)


def test_ttst_loader(ttst_dir):
    from upliftingtabletennis_tpu.data.ttst import load_ttst

    val = load_ttst(os.path.join(ttst_dir, "ttst"), "val")
    test = load_ttst(os.path.join(ttst_dir, "ttst"), "test")
    assert len(val) + len(test) == 12
    assert test.r_img.shape[1:] == (50, 2)
    assert (test.mask.sum(1) > 0).all()
    assert set(np.unique(test.spin_class)) <= {1.0, 2.0}


def test_robustness_transforms(ttst_dir):
    from upliftingtabletennis_tpu.data.ttst import load_ttst

    t = load_ttst(os.path.join(ttst_dir, "ttst"), "test")
    data = {
        "r_img": t.r_img / np.array([G.WIDTH, G.HEIGHT], np.float32),
        "table_img": t.table_img.copy(),
        "mask": t.mask.copy(),
        "times": t.times.copy(),
    }
    n0 = data["mask"].sum(1)
    half = R.HalfFPS()(data)
    # half the detections (rounded up) survive, left-compacted
    np.testing.assert_array_equal(half["mask"].sum(1), np.ceil(n0 / 2))
    m = half["mask"][0].astype(bool)
    assert m[: int(m.sum())].all()
    # times strictly increasing in compacted region
    tv = half["times"][0][m]
    assert np.all(np.diff(tv) > 0)

    dropped = R.Drop(0.3, 0.5)(data)
    assert (dropped["mask"].sum(1) <= n0).all()
    assert (dropped["table_img"][..., 2] == 0).any()

    comb = R.Combine(0.1, 0.1)(data)
    assert (comb["mask"].sum(1) <= np.ceil(n0 / 2)).all()


def test_eval_ttst_protocol_runs(ttst_dir):
    """Full eval path with a small random model: sane metric structure."""
    from upliftingtabletennis_tpu.data.ttst import load_ttst
    from upliftingtabletennis_tpu.eval.run_uplifting_eval import eval_ttst
    from upliftingtabletennis_tpu.models import get_uplifting_model

    model = get_uplifting_model("connectstage", "small")
    t = load_ttst(os.path.join(ttst_dir, "ttst"), "test")
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 50, 2)), jnp.zeros((1, 13, 3)), jnp.ones((1, 50)), jnp.zeros((1, 50)),
    )["params"]
    for name, make in R.STANDARD_SUITE:
        m = eval_ttst(model, params, "global", t, make())
        assert np.isfinite(m["mean_2d_px"]) and m["mean_2d_px"] > 0
        assert 0 <= m["spin_accuracy"] <= 1
        assert 0 <= m["spin_macro_f1"] <= 1


def test_tt3d_loader_and_eval(tmp_path, traj_data):
    """Synthetic TT3D layout -> loader conventions -> 3D eval protocol."""
    import yaml

    base = tmp_path
    view_dir = base / "tt3d" / "data" / "evaluation" / "back"
    view_dir.mkdir(parents=True)
    # camera in the TT3D (Thomas) coordinate system: ours = TRANS^-1 thomas
    f, h, w = 1800.0, 1080, 1920
    rvec = np.array([1.2, 0.1, -0.1])
    tvec = np.array([0.3, 1.0, 8.0])
    with open(base / "tt3d" / "data" / "evaluation" / "back.yaml", "w") as fh:
        yaml.safe_dump({"rvec": rvec.tolist(), "tvec": tvec.tolist(), "f": f, "h": h, "w": w}, fh)

    from upliftingtabletennis_tpu.data.tt3d import _TRANS, _rodrigues

    Mext = np.eye(4)
    Mext[:3, :3] = _rodrigues(rvec)
    Mext[:3, 3] = tvec
    Mext_ours = Mext @ _TRANS
    Mint = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]])

    import pandas as pd

    for i in range(4):
        valid = traj_data["frame_valid"][i]
        pos = traj_data["positions"][i][valid][::10][:40]  # 50 fps
        times = np.arange(len(pos)) / 50
        # world->thomas coords: thomas = TRANS @ ours_h
        ph = np.concatenate([pos, np.ones((len(pos), 1))], -1)
        thomas = (_TRANS @ ph.T).T[:, :3]
        cam = (Mext_ours @ ph.T).T
        img = (Mint @ (cam[:, :3] / cam[:, 3:4]).T).T
        uv = img[:, :2] / img[:, 2:3]
        pd.DataFrame(
            {"u": uv[:, 0], "v": uv[:, 1], "X": thomas[:, 0], "Y": thomas[:, 1],
             "Z": thomas[:, 2], "Timestamp": times}
        ).to_csv(view_dir / f"traj_{i}.csv", index=False)

    from upliftingtabletennis_tpu.data.tt3d import load_tt3d

    data = load_tt3d(str(base), "back", True)
    assert len(data) == 4
    # the loader's world coords must round-trip back to our original frame
    valid = traj_data["frame_valid"][0]
    pos0 = traj_data["positions"][0][valid][::10][:40]
    n = int(data.mask[0].sum())
    np.testing.assert_allclose(data.r_world[0, :n], pos0[:n], atol=1e-4)
    assert abs(data.framerate[0] - 50) < 0.5

    from upliftingtabletennis_tpu.eval.run_uplifting_eval import eval_tt3d
    from upliftingtabletennis_tpu.models import get_uplifting_model

    model = get_uplifting_model("connectstage", "small")
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 50, 2)), jnp.zeros((1, 13, 3)), jnp.ones((1, 50)), jnp.zeros((1, 50)),
    )["params"]
    res = eval_tt3d(model, params, "global", str(base))
    assert ("back", True) in res
    mean_cm, std_cm = res[("back", True)]
    assert np.isfinite(mean_cm) and mean_cm > 0

    # the physics-fit arm runs the SAME protocol on the same layout
    import argparse

    from upliftingtabletennis_tpu.eval.run_physics_fit_eval import eval_tt3d_fit

    fres = eval_tt3d_fit(argparse.Namespace(
        tt3d_dir=str(base), n_starts=2, adam_steps=2, lm_steps=1, batch=4,
        huber_px=None, seed=0, out=None))
    assert fres["back"]["n_traj"] == 4
    assert np.isfinite(fres["back"]["err3d_cm_mean"])


def test_make_synthetic_ttst_roundtrip(tmp_path):
    """The synthetic-TTST writer produces the layout load_ttst consumes
    (data/make_synthetic_ttst.py; layout ref: extract_ttst_data.py:161-177)."""
    from upliftingtabletennis_tpu.data.make_synthetic_ttst import write_synthetic_ttst
    from upliftingtabletennis_tpu.data.ttst import load_ttst

    n = write_synthetic_ttst(str(tmp_path), num=6, seed=5, modes=("intermediate",))
    assert n == 6
    batch = load_ttst(str(tmp_path / "ttst"), "all")
    assert len(batch) == 6
    assert set(np.unique(batch.spin_class)) <= {1.0, 2.0}
    # annotated detections live inside the 2560x1440 working frame
    m = batch.mask.astype(bool)
    assert batch.r_img[m][:, 0].max() <= G.WIDTH and batch.r_img[m][:, 1].max() <= G.HEIGHT
    assert (batch.r_img[m] >= 0).all()


def test_synthetic_tt3d_writer_roundtrip(tmp_path):
    """make_synthetic_tt3d writes the exact TT3D layout: the reader's
    reconstructed cameras reproject the stored world points onto the
    stored (u, v) to sub-pixel for every view."""
    from upliftingtabletennis_tpu.core.geometry import world2img
    from upliftingtabletennis_tpu.data.make_synthetic_tt3d import write_synthetic_tt3d
    from upliftingtabletennis_tpu.data.tt3d import load_tt3d

    n = write_synthetic_tt3d(str(tmp_path), 3, seed=31, modes=("intermediate",))
    assert n >= 1
    for view in ("back", "side", "oblique"):
        b = load_tt3d(str(tmp_path), view, noise=False)
        T = int(b.mask[0].sum())
        px = np.asarray(
            world2img(jnp.asarray(b.r_world[0, :T]), jnp.asarray(b.Mext[0]),
                      jnp.asarray(b.Mint[0]))
        )
        stored = b.r_img[0, :T] * np.array([1920.0, 1080.0])
        assert np.abs(px - stored).max() < 0.1
        assert b.framerate[0] > 0
    # noisy variant differs but only at the detection-noise scale
    bn = load_tt3d(str(tmp_path), "back", noise=True)
    b0 = load_tt3d(str(tmp_path), "back", noise=False)
    d = np.abs(bn.r_img[0] - b0.r_img[0]) * np.array([1920.0, 1080.0])
    assert 0 < d.max() < 12.0
