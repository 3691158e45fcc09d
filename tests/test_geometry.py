"""Unit tests for core.geometry against analytic cases and the torch reference."""
import numpy as np
import jax.numpy as jnp
import pytest

from upliftingtabletennis_tpu.core import geometry as G


def _random_camera(rng):
    c = rng.normal(size=3) * 5 + np.array([0, 8, 4])
    lookat = rng.normal(size=3) * 0.2
    f = lookat - c
    f = f / np.linalg.norm(f)
    r = np.cross(f, np.array([0.0, 0.0, 1.0]))
    r = r / np.linalg.norm(r)
    return c, f, r


def test_mext_roundtrip():
    rng = np.random.default_rng(0)
    c, f, r = _random_camera(rng)
    M = np.asarray(G.get_Mext(jnp.asarray(c), jnp.asarray(f), jnp.asarray(r)))
    assert M.shape == (4, 4)
    np.testing.assert_allclose(np.asarray(G.get_camera_location(M)), c, atol=1e-5)
    np.testing.assert_allclose(np.asarray(G.get_forward(M)), f, atol=1e-5)
    np.testing.assert_allclose(np.asarray(G.get_right(M)), r, atol=1e-5)
    # rotation block orthonormal
    R = M[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_projection_matches_reference_impl(reference_path):
    """Golden test: world2cam/cam2img match the reference numpy functions."""
    import sys

    sys.path.insert(0, str(reference_path))
    from uplifting import helper as ref  # noqa

    rng = np.random.default_rng(1)
    c, f, r = _random_camera(rng)
    Mext_ref = ref.get_Mext(c, f, r)
    Mext_jax = np.asarray(G.get_Mext(jnp.asarray(c), jnp.asarray(f), jnp.asarray(r)))
    np.testing.assert_allclose(Mext_jax, Mext_ref, atol=1e-5)

    Mint = np.array([[2710.0, 0, 1279.5], [0, 2907.0, 719.5], [0, 0, 1]])
    pts = rng.normal(size=(7, 3)) * np.array([1.5, 0.8, 0.5]) + np.array([0, 0, 1.0])

    cam_ref = ref.world2cam(pts, Mext_ref)
    img_ref = ref.cam2img(cam_ref, Mint)
    cam_jax = np.asarray(G.world2cam(jnp.asarray(pts, jnp.float32), jnp.asarray(Mext_ref, jnp.float32)))
    img_jax = np.asarray(G.cam2img(jnp.asarray(cam_jax), jnp.asarray(Mint, jnp.float32)))
    np.testing.assert_allclose(cam_jax, cam_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(img_jax, img_ref, rtol=1e-3, atol=2e-2)

    # batched: per-frame matrices broadcast like the reference 3D/3D case
    Mexts = np.stack([Mext_ref] * 4)
    cam_b = np.asarray(G.world2cam(jnp.asarray(pts[None].repeat(4, 0), jnp.float32), jnp.asarray(Mexts, jnp.float32)))
    np.testing.assert_allclose(cam_b[2], cam_ref, rtol=1e-4, atol=1e-4)


def test_spin_axis_transform_roundtrip():
    rng = np.random.default_rng(2)
    traj = rng.normal(size=(4, 10, 3)).astype(np.float32)
    rot = rng.normal(size=(4, 3)).astype(np.float32) * 50
    local = G.transform_rotation_axes(jnp.asarray(rot), jnp.asarray(traj))
    back = G.inverse_transform_rotation_axes(local, jnp.asarray(traj))
    np.testing.assert_allclose(np.asarray(back), rot, rtol=1e-4, atol=1e-3)


def test_spin_axis_transform_matches_reference(reference_path):
    import sys

    sys.path.insert(0, str(reference_path))
    import torch
    from uplifting import helper as ref

    rng = np.random.default_rng(3)
    traj = rng.normal(size=(4, 10, 3)).astype(np.float32)
    rot = (rng.normal(size=(4, 3)) * 50).astype(np.float32)
    ref_local = ref.transform_rotationaxes(torch.tensor(rot), torch.tensor(traj)).numpy()
    jax_local = np.asarray(G.transform_rotation_axes(jnp.asarray(rot), jnp.asarray(traj)))
    np.testing.assert_allclose(jax_local, ref_local, rtol=1e-4, atol=1e-4)

    ref_glob = ref.inversetransform_rotationaxes(torch.tensor(ref_local), torch.tensor(traj)).numpy()
    jax_glob = np.asarray(G.inverse_transform_rotation_axes(jnp.asarray(jax_local), jnp.asarray(traj)))
    np.testing.assert_allclose(jax_glob, ref_glob, rtol=1e-4, atol=1e-4)


def test_rescale_pixel_center_convention():
    pts = jnp.array([[0.0, 0.0], [2559.0, 1439.0]])
    out = np.asarray(G.rescale_points(pts, (2560, 1440), (1280, 720)))
    # pixel-center mapping: (x+0.5)*s-0.5
    np.testing.assert_allclose(out[0], [-0.25, -0.25], atol=1e-6)
    np.testing.assert_allclose(out[1], [1279.25, 719.25], atol=1e-3)

    Mint = jnp.array([[2710.0, 0, 1279.5], [0, 2907.0, 719.5], [0, 0, 1]])
    M2 = np.asarray(G.rescale_intrinsics(Mint, (2560, 1440), (1280, 720)))
    assert abs(M2[0, 0] - 1355.0) < 1e-3
    assert abs(M2[0, 2] - 639.5) < 1e-3
