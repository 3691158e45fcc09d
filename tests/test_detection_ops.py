"""Tests for peak extraction (golden vs reference scipy) and SegFormer."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from upliftingtabletennis_tpu.ops.peak import extract_peaks
from upliftingtabletennis_tpu.models.segformer import SegFormerNet


def _make_heatmaps(rng, B, H, W, sigma=2.0):
    ys, xs = np.mgrid[0:H, 0:W]
    hms = np.zeros((B, H, W), np.float32)
    centers = np.stack(
        [rng.uniform(3, W - 3, B), rng.uniform(3, H - 3, B)], -1
    )
    for b in range(B):
        cx, cy = centers[b]
        hms[b] = np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * sigma**2))
    hms += rng.normal(0, 0.01, hms.shape).astype(np.float32)
    return hms, centers


def test_peak_extraction_accuracy():
    rng = np.random.default_rng(0)
    H, W = 64, 96
    hms, centers = _make_heatmaps(rng, 16, H, W)
    out = np.asarray(extract_peaks(jnp.asarray(hms), W, H))
    err = np.linalg.norm(out[:, :2] - centers, axis=-1)
    assert err.mean() < 0.25, err.mean()
    assert (out[:, 2] == 1).all()


def test_peak_extraction_matches_reference(reference_path):
    """Same objective as the reference's scipy L-BFGS-B window fit."""
    import sys

    sys.path.insert(0, str(reference_path))
    import torch
    from balldetection.helper_balldetection import extract_position_torch_gaussian

    rng = np.random.default_rng(1)
    H, W = 48, 64
    hms, _ = _make_heatmaps(rng, 8, H, W)
    img_w, img_h = 1920, 1080

    ref = extract_position_torch_gaussian(torch.tensor(hms), img_w, img_h)
    ours = np.asarray(extract_peaks(jnp.asarray(hms), img_w, img_h))
    # both refine within the same 3x3 window: sub-pixel agreement, scaled to
    # image coords (scale ~30x => 1px window difference would be ~30px)
    d = np.abs(ours[:, :2] - ref[:, :2])
    assert d.max() < 3.0, d.max()


def test_peak_extraction_scaling_convention():
    """A peak exactly at heatmap pixel (x, y) maps to ((x+.5)*s-.5)."""
    hm = np.zeros((1, 10, 20), np.float32)
    hm[0, 4, 7] = 1.0  # lone spike: fit falls back to window center
    out = np.asarray(extract_peaks(jnp.asarray(hm), 200, 100))
    # scale 10x: x = (7+0.5)*10-0.5 = 74.5, y = (4+0.5)*10-0.5 = 44.5
    assert abs(out[0, 0] - 74.5) < 1.0, out
    assert abs(out[0, 1] - 44.5) < 1.0, out


def test_peak_threshold_visibility():
    hm = np.full((2, 8, 8), 0.01, np.float32)
    hm[0, 4, 4] = 0.5
    out = np.asarray(extract_peaks(jnp.asarray(hm), 8, 8, threshold=0.1))
    assert out[0, 2] == 1.0 and out[1, 2] == 0.0


@pytest.mark.parametrize("size,out_ch,in_frames", [("b0", 1, 3), ("b2", 13, 1)])
def test_segformer_shapes(size, out_ch, in_frames):
    model = SegFormerNet(out_channels=out_ch, in_frames=in_frames, model_size=size)
    x = jnp.zeros((1, 64, 96, 3 * in_frames))
    v = model.init(jax.random.PRNGKey(0), x)
    heat, cls = model.apply(v, x)
    assert heat.shape == (1, 16, 24, out_ch)  # 1/4 resolution
    assert cls is None


def test_segformer_param_count_plausible():
    """MiT-B0 ~3.7M params, B2 ~27M (paper table 1; +head)."""
    m0 = SegFormerNet(out_channels=1, in_frames=1, model_size="b0")
    v0 = m0.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    n0 = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v0["params"]))
    assert 3.0e6 < n0 < 6.0e6, n0

    m2 = SegFormerNet(out_channels=1, in_frames=3, model_size="b2")
    v2 = m2.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 9)))
    n2 = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v2["params"]))
    assert 24e6 < n2 < 35e6, n2


def test_segformer_classify_head():
    model = SegFormerNet(out_channels=1, in_frames=3, model_size="b0", classify_invisible=True)
    x = jnp.zeros((2, 64, 64, 9))
    v = model.init(jax.random.PRNGKey(0), x)
    heat, cls = model.apply(v, x)
    assert cls.shape == (2, 2)


def test_flip_test_heatmaps():
    """Flip-test TTA: for a W-symmetric model the averaged output must be
    (near) W-symmetric; flip_back swaps paired channels and un-flips W
    (ref: topdown_heatmap_simple_head.py:188-218)."""
    import jax.numpy as jnp

    from upliftingtabletennis_tpu.ops.heatmap_decode import flip_back, flip_test_heatmaps

    rng = np.random.default_rng(0)
    heat = jnp.asarray(rng.uniform(size=(2, 4, 6, 3)), jnp.float32)
    # no pairs, no shift: flip_back(flip(x)) == x
    np.testing.assert_allclose(
        np.asarray(flip_back(heat[:, :, ::-1, :], (), shift=False)), np.asarray(heat)
    )
    # channel pairs swap
    out = flip_back(heat, ((0, 2),), shift=False)
    np.testing.assert_allclose(np.asarray(out[..., 0]), np.asarray(heat[:, :, ::-1, 2]))
    # shift moves content right by one pixel
    out = flip_back(heat, (), shift=True)
    np.testing.assert_allclose(np.asarray(out[:, :, 1:, :]), np.asarray(heat[:, :, ::-1, :][:, :, :-1, :]))

    # identity 'model': flip_back exactly undoes the input flip -> avg == x
    apply_fn = lambda x: x
    img = jnp.asarray(rng.uniform(size=(1, 4, 6, 1)), jnp.float32)
    avg = flip_test_heatmaps(apply_fn, img, (), shift=False)
    np.testing.assert_allclose(np.asarray(avg), np.asarray(img), rtol=1e-6)

    # flip-sensitive 'model' (prefers left half): averaging symmetrizes
    wgt = jnp.linspace(1.0, 0.0, 6).reshape(1, 1, 6, 1)
    apply_fn2 = lambda x: x * wgt
    avg2 = np.asarray(flip_test_heatmaps(apply_fn2, img, (), shift=False))
    expect = 0.5 * (np.asarray(img) * np.asarray(wgt)
                    + (np.asarray(img)[:, :, ::-1] * np.asarray(wgt))[:, :, ::-1])
    np.testing.assert_allclose(avg2, expect, rtol=1e-6)

