"""Tests for the batched image augmentation + detection metrics."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from upliftingtabletennis_tpu.data.image_transforms import (
    ImageAugmentConfig,
    augment_detection_batch,
    normalize_image,
    sample_affines,
    transform_coords,
    warp_images,
)
from upliftingtabletennis_tpu.eval import metrics as M


def test_eval_resize_matches_reference_convention():
    """Eval path = pure resize; coords follow (x+0.5)*s-0.5 exactly
    (ref: transforms.py:43-48)."""
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (2, 64, 96, 3)).astype(np.float32)
    coords = jnp.asarray([[[30.0, 20.0]], [[10.0, 50.0]]])
    vis = jnp.ones((2, 1))
    out, c, v = augment_detection_batch(
        jax.random.PRNGKey(0), jnp.asarray(img), coords, vis, (48, 32), train=False
    )
    assert out.shape == (2, 32, 48, 3)
    sx, sy = 48 / 96, 32 / 64
    np.testing.assert_allclose(
        np.asarray(c[0, 0]), [(30 + 0.5) * sx - 0.5, (20 + 0.5) * sy - 0.5], atol=1e-4
    )
    # eval warp == cv2.resize INTER_LINEAR (the reference's resize — bilinear
    # point sampling, no antialiasing; jax.image.resize would antialias)
    import cv2

    ref = np.stack([cv2.resize(img[b], (48, 32), interpolation=cv2.INTER_LINEAR) for b in range(2)])
    ref = np.asarray(normalize_image(jnp.asarray(ref)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=0.05)


def test_train_augment_coord_image_consistency():
    """A bright dot at the ball position must land where the transformed
    coordinates say (coords and pixels ride the same affine)."""
    B, H, W = 4, 64, 96
    rng = np.random.default_rng(1)
    coords_src = np.stack([rng.uniform(20, 70, B), rng.uniform(20, 44, B)], -1)
    imgs = np.zeros((B, H, W, 3), np.float32)
    for b in range(B):
        x, y = int(round(coords_src[b, 0])), int(round(coords_src[b, 1]))
        imgs[b, y - 1 : y + 2, x - 1 : x + 2] = 255.0

    cfg = ImageAugmentConfig(jitter_prob=0.0)
    out, c, v = augment_detection_batch(
        jax.random.PRNGKey(3), jnp.asarray(imgs), jnp.asarray(coords_src)[:, None],
        jnp.ones((B, 1)), (96, 64), cfg, train=True,
    )
    out = np.asarray(out)
    c = np.asarray(c)[:, 0]
    v = np.asarray(v)[:, 0]
    # un-normalize to find the dot
    mag = out.max(-1)
    for b in range(B):
        if v[b] < 0.5:
            continue
        yy, xx = np.unravel_index(np.argmax(mag[b]), mag[b].shape)
        d = np.hypot(xx - c[b, 0], yy - c[b, 1])
        assert d < 2.5, (b, (xx, yy), c[b])


def test_visibility_outside_frame():
    B, H, W = 2, 32, 32
    imgs = jnp.zeros((B, H, W, 3))
    coords = jnp.asarray([[[1.0, 1.0]], [[30.0, 30.0]]])
    cfg = ImageAugmentConfig(flip_prob=0, rot_prob=0, transl_prob=1.0, max_transl=0.9,
                             crop_prob=0, jitter_prob=0)
    # huge forced translation: some points must leave the frame across seeds
    lost = 0
    for seed in range(6):
        _, _, v = augment_detection_batch(
            jax.random.PRNGKey(seed), imgs, coords, jnp.ones((B, 1)), (32, 32), cfg, True
        )
        lost += int((np.asarray(v) == 0).sum())
    assert lost > 0


def test_weighted_mse_matches_reference(reference_path):
    import sys

    sys.path.insert(0, str(reference_path))
    import torch
    from balldetection.helper_balldetection import weighted_mse_loss as ref_loss

    rng = np.random.default_rng(2)
    pred = rng.normal(size=(2, 1, 16, 16)).astype(np.float32)
    tgt = np.clip(rng.normal(0.1, 0.2, (2, 1, 16, 16)), 0, 1).astype(np.float32)
    ours = float(M.weighted_mse_loss(jnp.asarray(pred), jnp.asarray(tgt)))
    ref = float(ref_loss(torch.tensor(pred), torch.tensor(tgt)))
    assert abs(ours - ref) < 1e-4


def test_pck_ball_matches_reference(reference_path):
    import sys

    sys.path.insert(0, str(reference_path))
    from balldetection.helper_balldetection import calculate_pck_fixed_tolerance

    rng = np.random.default_rng(3)
    N = 40
    gts = rng.uniform(100, 900, (N, 2))
    gts_min = gts - rng.uniform(0, 10, (N, 2))
    gts_max = gts + rng.uniform(0, 10, (N, 2))
    preds = np.concatenate([gts + rng.normal(0, 5, (N, 2)), np.ones((N, 1))], -1)
    preds[5, 2] = 0  # one invisible detection
    for tol in (2, 5, 10):
        ref = calculate_pck_fixed_tolerance(preds, gts, gts_min, gts_max, tol)
        ours = float(M.pck_ball(jnp.asarray(preds), jnp.asarray(gts), jnp.asarray(gts_min), jnp.asarray(gts_max), tol))
        assert abs(ours - ref) < 1e-6, (tol, ours, ref)


def test_heatmap_render_matches_reference_formula():
    """Same formula as the reference's create_heatmap (a dataset method,
    ref: balldetection/dataset.py:434-440): exp(-((x-bx)^2+(y-by)^2)/(2 s^2))."""
    coords = jnp.asarray([[55.3, 40.7]])
    ours = np.asarray(M.render_gaussian_heatmaps(coords, jnp.ones((1,)), 72, 108, 6.0))[0]
    y, x = np.ogrid[:72, :108]
    ref = np.exp(-((x - 55.3) ** 2 + (y - 40.7) ** 2) / (2 * 6.0**2))
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    # invisible -> all-zero map (ref: dataset.py:416-419)
    zero = np.asarray(M.render_gaussian_heatmaps(coords, jnp.zeros((1,)), 72, 108, 6.0))[0]
    assert zero.max() == 0.0


def test_i420_roundtrip_and_cv2_parity():
    """Device-side I420->RGB matches cv2's converter within chroma-upsample
    tolerance; round trip through rgb_to_i420 stays close on smooth images."""
    import jax.numpy as jnp
    import numpy as np
    import scipy.ndimage as ndi

    from upliftingtabletennis_tpu.data.image_transforms import i420_to_rgb, rgb_to_i420

    rng = np.random.default_rng(0)
    base = rng.normal(size=(2, 16, 24, 3)).astype(np.float32)
    rgb = np.clip(128 + 40 * ndi.gaussian_filter(base, (0, 2, 2, 0)), 0, 255).astype(np.uint8)
    i420 = rgb_to_i420(rgb)
    assert i420.shape == (2, 24, 24)
    back = np.asarray(i420_to_rgb(jnp.asarray(i420), 16, 24))
    err = np.abs(back.astype(int) - rgb.astype(int))
    assert err.mean() < 6 and err.max() < 40
    try:
        import cv2

        ref = np.stack([cv2.cvtColor(f, cv2.COLOR_YUV2RGB_I420) for f in i420])
        d = np.abs(ref.astype(int) - back.astype(int))
        assert d.max() <= 6  # nearest vs bilinear chroma upsampling
    except ImportError:
        pass
