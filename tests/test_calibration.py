"""Calibration tests: RQ/euler identities, DLT accuracy, LM refinement, and
accuracy parity with the reference scipy-BFGS implementation."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from upliftingtabletennis_tpu.core import calibration as C
from upliftingtabletennis_tpu.core.geometry import TABLE_POINTS, get_Mext, world2img

RES = (2560, 1440)


def _gt_camera(rng, fx=2710.0, fy=2907.0):
    c = np.array([rng.uniform(-3, 3), rng.uniform(6, 12), rng.uniform(3, 7)])
    look = np.array([rng.uniform(-0.2, 0.2), rng.uniform(-0.2, 0.2), 0.76])
    f = look - c
    f = f / np.linalg.norm(f)
    r = np.cross(f, [0.0, 0.0, 1.0])
    r = r / np.linalg.norm(r)
    Mext = np.asarray(get_Mext(jnp.asarray(c), jnp.asarray(f), jnp.asarray(r)))
    Mint = np.array([[fx, 0, RES[0] // 2], [0, fy, RES[1] // 2], [0, 0, 1.0]])
    return Mint, Mext


def _project(Mint, Mext, noise, rng):
    pts = np.asarray(
        world2img(jnp.asarray(TABLE_POINTS), jnp.asarray(Mext), jnp.asarray(Mint))
    )
    return pts + rng.normal(0, noise, pts.shape)


def test_rq3_reconstruction():
    rng = np.random.default_rng(0)
    for _ in range(5):
        M = rng.normal(size=(3, 3))
        K, Q = C.rq3(jnp.asarray(M))
        K, Q = np.asarray(K), np.asarray(Q)
        np.testing.assert_allclose(K @ Q, M, atol=1e-5)
        np.testing.assert_allclose(Q @ Q.T, np.eye(3), atol=1e-5)
        assert abs(K[1, 0]) < 1e-6 and abs(K[2, 0]) < 1e-6 and abs(K[2, 1]) < 1e-6


def test_euler_roundtrip_and_scipy_convention():
    from scipy.spatial.transform import Rotation as R

    rng = np.random.default_rng(1)
    angles = rng.uniform(-1.5, 1.5, (10, 3))
    ours = np.asarray(C.euler_xyz_to_matrix(jnp.asarray(angles)))
    ref = R.from_euler("xyz", angles).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-6)
    back = np.asarray(C.matrix_to_euler_xyz(jnp.asarray(ours)))
    np.testing.assert_allclose(back, angles, atol=1e-5)


def test_dlt_matches_reference(reference_path):
    """Raw DLT on the near-coplanar table is ill-conditioned BY DESIGN (11 of
    13 keypoints share the z=0.76 plane) — the reference uses it only as a
    refinement seed. Assert bit-level parity with the reference DLT rather
    than absolute accuracy; the refinement tests below cover accuracy."""
    import sys

    sys.path.insert(0, str(reference_path))
    from dataprocessing.my_dlt import dlt_calib as ref_dlt_calib

    rng = np.random.default_rng(2)
    Mint, Mext = _gt_camera(rng)
    pts2d = _project(Mint, Mext, 0.0, rng)
    K, E = C.dlt_calib(jnp.asarray(TABLE_POINTS), jnp.asarray(pts2d, jnp.float32))
    Kr, Er = ref_dlt_calib(TABLE_POINTS.astype(np.float64), pts2d)
    np.testing.assert_allclose(np.asarray(K), Kr, rtol=5e-3, atol=0.5)
    np.testing.assert_allclose(np.asarray(E)[:3], Er, rtol=5e-3, atol=0.05)


@pytest.mark.parametrize("use_ransac", [False, True])
def test_calibrate_noisy(use_ransac):
    rng = np.random.default_rng(3)
    Mint, Mext = _gt_camera(rng)
    pts2d = _project(Mint, Mext, 1.5, rng)
    vis = np.ones(13)
    Ki, Ei, n_in = C.calibrate_camera(
        jnp.asarray(pts2d, jnp.float32), jnp.asarray(vis, jnp.float32), RES,
        jax.random.PRNGKey(0), use_ransac, "l1",
    )
    proj = np.asarray(world2img(jnp.asarray(TABLE_POINTS), Ei, Ki))
    err = np.linalg.norm(proj - pts2d, axis=-1).mean()
    # NB the table is near-planar, so focal/distance are weakly constrained
    # at sigma=1.5px noise: the reference scipy-BFGS lands at 11.8px mean
    # reprojection (fx=49742!) on this exact case; we require clearly better.
    assert err < 6.0, err
    if use_ransac:
        assert int(n_in) >= 6


def test_calibrate_with_outlier_ransac():
    """RANSAC must reject a gross outlier keypoint."""
    rng = np.random.default_rng(4)
    Mint, Mext = _gt_camera(rng)
    pts2d = _project(Mint, Mext, 0.5, rng)
    pts2d[3] += np.array([300.0, -200.0])  # gross outlier
    vis = np.ones(13)
    Ki, Ei, n_in = C.calibrate_camera(
        jnp.asarray(pts2d, jnp.float32), jnp.asarray(vis, jnp.float32), RES,
        jax.random.PRNGKey(1), True, "l1",
    )
    proj = np.asarray(world2img(jnp.asarray(TABLE_POINTS), Ei, Ki))
    err = np.linalg.norm(proj - pts2d, axis=-1)
    inlier_err = np.delete(err, 3).mean()
    assert inlier_err < 3.0, inlier_err
    assert err[3] > 50  # the outlier stays out


def test_basin_hop_polish_beats_inlier_refit():
    """The final basin-hopping L2 polish must bring the calibrated camera
    close to ground truth at realistic (closed-loop) detector noise.

    Regression for the round-5 finding (tools/probe_calibration_floor.py):
    LM from the RANSAC inlier refit lands in a nearby local basin ~1.6 px
    from GT; with the polish the median camera is < 1.2 px vs GT."""
    errs_gt = []
    for i in range(6):
        rng = np.random.default_rng(50 + i)
        Mint, Mext = _gt_camera(rng)
        gt = _project(Mint, Mext, 0.0, rng)
        pts2d = gt + rng.normal(0, 0.9, gt.shape)  # ~1.1 px mean radial
        vis = np.ones(13)
        Ki, Ei, _ = C.calibrate_camera(
            jnp.asarray(pts2d, jnp.float32), jnp.asarray(vis, jnp.float32), RES,
            jax.random.PRNGKey(10 + i), True, "l1",
        )
        proj = np.asarray(world2img(jnp.asarray(TABLE_POINTS), Ei, Ki))
        errs_gt.append(np.linalg.norm(proj - gt, axis=-1).mean())
    assert np.median(errs_gt) < 1.2, errs_gt


def test_parity_with_reference_bfgs(reference_path):
    """Accuracy parity: our jitted LM vs the reference scipy-BFGS pipeline on
    the same noisy detections."""
    import sys

    sys.path.insert(0, str(reference_path))
    from dataprocessing.regress_cameramatrices import calc_cameramatrices

    rng = np.random.default_rng(5)
    ours_err, ref_err = [], []
    for trial in range(3):
        Mint, Mext = _gt_camera(rng)
        pts2d = _project(Mint, Mext, 1.0, rng)
        kp_dict = {i + 1: [tuple(pts2d[i])] for i in range(13)}
        Mint_r, Mext_r, _ = calc_cameramatrices(kp_dict, RES, use_prints=False, use_ransac=False)
        proj_r = np.asarray(
            world2img(jnp.asarray(TABLE_POINTS), jnp.asarray(Mext_r, jnp.float32), jnp.asarray(Mint_r[:3, :3], jnp.float32))
        )
        ref_err.append(np.linalg.norm(proj_r - pts2d, axis=-1).mean())

        Ki, Ei, _ = C.calibrate_camera(
            jnp.asarray(pts2d, jnp.float32), jnp.ones(13, jnp.float32), RES,
            jax.random.PRNGKey(trial), False, "l1",
        )
        proj_o = np.asarray(world2img(jnp.asarray(TABLE_POINTS), Ei, Ki))
        ours_err.append(np.linalg.norm(proj_o - pts2d, axis=-1).mean())

    ours, ref = np.mean(ours_err), np.mean(ref_err)
    # within 20% of the scipy BFGS optimum (or better)
    assert ours < ref * 1.2 + 0.2, (ours, ref)
