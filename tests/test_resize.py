"""Parity of the rational-group bilinear downscale vs jax.image.resize.

The fast path must be numerically indistinguishable (to bf16-matmul noise
on u8-valued frames) from the `jax.image.resize` call it replaces in
pipeline/interface.postprocess — same half-pixel convention as the
reference's cv2.INTER_LINEAR (ref: balldetection/transforms.py:44-48).
"""
import numpy as np
import pytest

from upliftingtabletennis_tpu.ops.resize import (
    can_fast_resize,
    resize_bilinear_down,
)

# every (in, out) pair the detector pipeline can request at 1080p ingest
PIPELINE_PAIRS = [
    ((1080, 1920), (896, 1600)),   # segformerpp_b2
    ((1080, 1920), (704, 1280)),   # wasb / hrnet
    ((1080, 1920), (640, 1152)),   # vitpose
    ((896, 1600), (704, 1280)),    # hrnet after host downscale to b2 res
    ((1080, 1920), (544, 960)),    # closed-loop render res
]


@pytest.mark.parametrize("in_hw,out_hw", PIPELINE_PAIRS)
def test_fast_path_applies(in_hw, out_hw):
    assert can_fast_resize(in_hw, out_hw)


@pytest.mark.parametrize(
    "in_hw,out_hw", PIPELINE_PAIRS + [((135, 24), (112, 20)), ((64, 64), (48, 48))]
)
def test_parity_vs_jax_image(in_hw, out_hw):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, size=(2, *in_hw, 3), dtype=np.uint8)
    want = np.asarray(
        jax.image.resize(
            jnp.asarray(x, jnp.float32), (2, *out_hw, 3), "bilinear", antialias=False
        )
    )
    # exact mode: pins the tap indices/weights (the convention) tightly
    got_exact = np.asarray(resize_bilinear_down(jnp.asarray(x), *out_hw, exact=True))
    assert got_exact.shape == want.shape
    # 0.05 on the 255 scale = 2e-4 relative: f32 weight-computation noise
    # (a tap-convention error would be O(1) intensity)
    assert np.max(np.abs(got_exact - want)) < 5e-2, np.max(np.abs(got_exact - want))
    # fast bf16 mode: error bounded by operand rounding — the same rounding
    # the TPU applies to jax.image.resize's dense matmul at default precision
    got = np.asarray(resize_bilinear_down(jnp.asarray(x), *out_hw))
    assert np.max(np.abs(got - want)) < 2.0, np.max(np.abs(got - want))
    assert np.mean(np.abs(got - want)) < 0.35


def test_upscale_falls_back():
    import jax.numpy as jnp

    x = np.random.default_rng(1).integers(0, 256, (1, 32, 32, 3), np.uint8)
    assert not can_fast_resize((32, 32), (48, 48))
    y = np.asarray(resize_bilinear_down(jnp.asarray(x), 48, 48))
    assert y.shape == (1, 48, 48, 3)


def test_identity_axis():
    import jax.numpy as jnp

    x = np.random.default_rng(2).integers(0, 256, (1, 64, 48, 3), np.uint8)
    y = np.asarray(resize_bilinear_down(jnp.asarray(x), 48, 48))
    assert y.shape == (1, 48, 48, 3)
