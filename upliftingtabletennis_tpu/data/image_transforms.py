"""Batched, jittable image augmentation for the detection models.

Rebuilds the reference's per-sample cv2 dict-pipeline
(ref: balldetection/transforms.py, tabledetection/transforms.py) as one
composed affine warp per sample, executed as a single batched bilinear
gather on device:

  Flip(0.5) -> Rotation(+-10 deg about center) -> Translation(+-20%) ->
  Crop(scale in [0.8, 1], random corner) -> Resize(model res, pixel-center)
  -> ColorJitter(brightness/contrast/saturation/hue) -> ImageNet Normalize
  (ref order: transforms.py:480-510; Flip disabled for the table detector,
  ref: tabledetection/transforms.py:53)

Composing the geometric ops into one affine keeps shapes static (the
reference materializes a variable-size crop before resizing) and costs one
resampling pass instead of three. Coordinates ride the same matrices;
visibility is re-evaluated at each conceptual stage's bounds like the
reference (transforms.py:126-127, 192-194, 263-265).

Images are float32 in [0, 255] NHWC (C = 3*frames; the same geometric and
color params apply to all frames of a triplet, matching the reference's
prev/next handling).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


class ImageAugmentConfig(NamedTuple):
    flip_prob: float = 0.5       # 0 for the table detector
    rot_prob: float = 0.5
    max_rot_deg: float = 10.0
    transl_prob: float = 0.5
    max_transl: float = 0.2
    crop_prob: float = 0.5
    min_crop: float = 0.8
    jitter_prob: float = 0.5
    brightness: float = 0.2
    contrast: float = 0.2
    saturation: float = 0.2
    hue: float = 0.1


def _affine3(a, b, c, d, tx, ty):
    """Rows -> (..., 3, 3) affine [[a, b, tx], [c, d, ty], [0, 0, 1]]."""
    zero = jnp.zeros_like(a)
    one = jnp.ones_like(a)
    return jnp.stack(
        [
            jnp.stack([a, b, tx], -1),
            jnp.stack([c, d, ty], -1),
            jnp.stack([zero, zero, one], -1),
        ],
        -2,
    )


def sample_affines(key, batch, src_hw, dst_wh, cfg: ImageAugmentConfig, train: bool):
    """Sample per-sample source->destination affine matrices + stage data.

    Returns (A (B, 3, 3), stages) where stages carries the intermediate
    matrices/bounds needed for visibility re-evaluation.
    """
    H, W = src_hw
    DW, DH = dst_wh
    B = batch
    ks = jax.random.split(key, 8)
    u = lambda k: jax.random.uniform(k, (B,))  # noqa: E731

    if train:
        do_flip = u(ks[0]) < cfg.flip_prob
        do_rot = u(ks[1]) < cfg.rot_prob
        rot = jnp.deg2rad(jax.random.uniform(ks[2], (B,), minval=-cfg.max_rot_deg, maxval=cfg.max_rot_deg)) * do_rot
        do_tr = u(ks[3]) < cfg.transl_prob
        tx = jax.random.uniform(ks[4], (B,), minval=-cfg.max_transl * W, maxval=cfg.max_transl * W) * do_tr
        ty = jax.random.uniform(ks[4], (B,), minval=-cfg.max_transl * H, maxval=cfg.max_transl * H) * do_tr
        do_crop = u(ks[5]) < cfg.crop_prob
        scale = jnp.where(do_crop, jax.random.uniform(ks[6], (B,), minval=cfg.min_crop, maxval=1.0), 1.0)
        crop_w = jnp.round(W * scale)
        crop_h = jnp.round(H * scale)
        ox = jax.random.uniform(ks[7], (B,)) * (W - crop_w + 1)
        oy = jax.random.uniform(ks[7], (B,)) * (H - crop_h + 1)
        ox = jnp.floor(ox)
        oy = jnp.floor(oy)
    else:
        zero = jnp.zeros((B,))
        do_flip = jnp.zeros((B,), bool)
        rot, tx, ty = zero, zero, zero
        crop_w = jnp.full((B,), float(W))
        crop_h = jnp.full((B,), float(H))
        ox, oy = zero, zero

    one = jnp.ones((B,))
    zero = jnp.zeros((B,))

    # flip: x -> (W-1) - x (ref: transforms.py:78-80)
    F = _affine3(jnp.where(do_flip, -one, one), zero, zero, one, jnp.where(do_flip, W - 1.0, 0.0), zero)
    # rotation about (W/2, H/2), cv2 convention (ref: :169-176)
    ca, sa = jnp.cos(rot), jnp.sin(rot)
    cx, cy = W / 2.0, H / 2.0
    R = _affine3(ca, sa, -sa, ca, (1 - ca) * cx - sa * cy, sa * cx + (1 - ca) * cy)
    # translation (ref: :113-125)
    T = _affine3(one, zero, zero, one, tx, ty)
    # crop + resize, pixel-center-aware (ref: :43-48, 231-258)
    C = _affine3(one, zero, zero, one, -ox, -oy)
    S = _affine3(
        DW / crop_w, zero, zero, DH / crop_h,
        0.5 * DW / crop_w - 0.5, 0.5 * DH / crop_h - 0.5,
    )

    A = S @ C @ T @ R @ F
    stages = {
        "RF": R @ F, "TRF": T @ R @ F, "CTRF": C @ T @ R @ F,
        "crop_wh": jnp.stack([crop_w, crop_h], -1),
        "src_wh": jnp.asarray([float(W), float(H)]),
    }
    return A, stages


def transform_coords(A, coords):
    """Apply (B, 3, 3) affines to (B, ..., 2) coordinates."""
    h = jnp.concatenate([coords, jnp.ones((*coords.shape[:-1], 1), coords.dtype)], -1)
    out = jnp.einsum("bij,b...j->b...i", A, h)
    return out[..., :2]


def update_visibility(stages, coords, visibility):
    """Visibility becomes 0 if the point leaves the frame at any stage
    (rotation, translation: [0, W) x [0, H); crop: within the crop box)."""
    W, H = stages["src_wh"][0], stages["src_wh"][1]

    def inside(c, wh):
        return (
            (c[..., 0] >= 0) & (c[..., 0] < wh[..., 0]) & (c[..., 1] >= 0) & (c[..., 1] < wh[..., 1])
        )

    full = jnp.stack([jnp.full_like(visibility, W), jnp.full_like(visibility, H)], -1)
    ok = inside(transform_coords(stages["RF"], coords), full)
    ok &= inside(transform_coords(stages["TRF"], coords), full)
    crop_wh = stages["crop_wh"]
    crop_wh = crop_wh.reshape(crop_wh.shape[0], *([1] * (coords.ndim - 2)), 2)
    ok &= inside(transform_coords(stages["CTRF"], coords), crop_wh)
    return visibility * ok


def warp_images(images, A, dst_wh):
    """Inverse-warp NHWC images through per-sample affines, zero padding.

    images (B, H, W, C) -> (B, DH, DW, C), bilinear.
    """
    B = images.shape[0]
    DW, DH = dst_wh
    A_inv = jnp.linalg.inv(A)
    xs = jnp.arange(DW, dtype=jnp.float32)
    ys = jnp.arange(DH, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # (DH, DW)
    grid = jnp.stack([gx.ravel(), gy.ravel(), jnp.ones(DH * DW)], 0)  # (3, N)
    src = jnp.einsum("bij,jn->bin", A_inv, grid)  # (B, 3, N)
    sx, sy = src[:, 0], src[:, 1]

    def sample_one(img, sx, sy):
        # map_coordinates expects (row, col) order
        def chan(c):
            return jax.scipy.ndimage.map_coordinates(c, [sy, sx], order=1, mode="constant", cval=0.0)

        return jax.vmap(chan, in_axes=2, out_axes=1)(img)  # (N, C)

    out = jax.vmap(sample_one)(images, sx, sy)  # (B, N, C)
    return out.reshape(B, DH, DW, -1)


def color_jitter(key, images, cfg: ImageAugmentConfig):
    """Brightness (add) -> contrast (mul) -> saturation/hue in HSV, with
    per-sample random params shared across the frame triplet (ref: :321-371).
    images float32 [0, 255], C = 3*frames."""
    B, H, W, C = images.shape
    frames = C // 3
    ks = jax.random.split(key, 5)
    do = (jax.random.uniform(ks[0], (B,)) < cfg.jitter_prob)[:, None, None, None]
    r = lambda k, f: jax.random.uniform(k, (B, 1, 1, 1), minval=-f, maxval=f)  # noqa: E731

    x = images.reshape(B, H, W, frames, 3) / 255.0
    x = x.reshape(B, H, W * frames, 3)  # treat frames as width tiles

    x = jnp.clip(x + r(ks[1], cfg.brightness), 0, 1)
    x = jnp.clip(x * (1.0 + r(ks[2], cfg.contrast)), 0, 1)

    # HSV adjustments
    maxc = jnp.max(x, axis=-1)
    minc = jnp.min(x, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    rr, gg, bb = x[..., 0], x[..., 1], x[..., 2]
    safe = jnp.maximum(delta, 1e-12)
    h = jnp.where(
        maxc == rr, (gg - bb) / safe,
        jnp.where(maxc == gg, 2.0 + (bb - rr) / safe, 4.0 + (rr - gg) / safe),
    )
    h = (h / 6.0) % 1.0

    s = jnp.clip(s * (1.0 + r(ks[3], cfg.saturation)[..., 0]), 0, 1)
    h = (h + r(ks[4], cfg.hue)[..., 0]) % 1.0

    # HSV -> RGB
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = (i.astype(jnp.int32) % 6)[..., None]
    rgb = jnp.select(
        [i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
        [
            jnp.stack([v, t, p], -1), jnp.stack([q, v, p], -1), jnp.stack([p, v, t], -1),
            jnp.stack([p, q, v], -1), jnp.stack([t, p, v], -1), jnp.stack([v, p, q], -1),
        ],
    )
    out = rgb.reshape(B, H, W, C) * 255.0
    return jnp.where(do, out, images)


def normalize_image(images):
    """[0,255] -> ImageNet-normalized, applied per frame (ref: :374-399)."""
    B, H, W, C = images.shape
    frames = C // 3
    x = images.reshape(B, H, W, frames, 3) / 255.0
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return x.reshape(B, H, W, C)


@partial(jax.jit, static_argnames=("dst_wh", "train", "cfg"))
def augment_detection_batch(key, images, coords, visibility, dst_wh: Tuple[int, int],
                            cfg: ImageAugmentConfig = ImageAugmentConfig(), train: bool = True):
    """Full pipeline: geometric warp + jitter + normalize.

    images (B, H, W, 3*frames) float32 [0,255]; coords (B, ..., 2) in source
    pixels; visibility (B, ...). Returns (images (B, DH, DW, C) normalized,
    coords at dst resolution, visibility).
    """
    k1, k2 = jax.random.split(key)
    B, H, W, _ = images.shape
    DW, DH = dst_wh
    if not train:
        # eval path is a pure resize: jax.image.resize without antialiasing
        # is exactly cv2 INTER_LINEAR and avoids the gather-based warp
        # (map_coordinates gathers are very slow on TPU)
        out_imgs = jax.image.resize(images, (B, DH, DW, images.shape[-1]), "bilinear",
                                    antialias=False)
        sx, sy = DW / W, DH / H
        out_coords = jnp.stack(
            [(coords[..., 0] + 0.5) * sx - 0.5, (coords[..., 1] + 0.5) * sy - 0.5], -1
        )
        return normalize_image(out_imgs), out_coords, visibility

    A, stages = sample_affines(k1, B, (H, W), dst_wh, cfg, train)
    out_imgs = warp_images(images, A, dst_wh)
    out_coords = transform_coords(A, coords)
    visibility = update_visibility(stages, coords, visibility)
    out_imgs = color_jitter(k2, out_imgs, cfg)
    out_imgs = normalize_image(out_imgs)
    return out_imgs, out_coords, visibility


# ---------------------------------------------------------------------------
# Video-native ingest: planar I420 (YUV 4:2:0) -> RGB on device
# ---------------------------------------------------------------------------

def i420_to_rgb(frames_i420, height: int, width: int):
    """Convert planar I420 frames to RGB uint8 on device.

    frames_i420: (T, height * 3 // 2, width) uint8 in the standard I420
    memory layout — rows [0, H) the Y plane, the next H//4 rows the U plane
    ((H/2, W/2) stored W-wide), the last H//4 rows the V plane.

    Video decoders natively emit YUV 4:2:0 (12 bits/px); converting to RGB
    on device instead of on host halves the host->device bytes — the
    dominant cost of the streaming pipeline on hosts with a slow link
    (SURVEY §7.3). Full-range BT.601 ("JPEG") coefficients, matching what
    cv2.cvtColor(..., COLOR_YUV2RGB_I420) computes.
    """
    H, W = height, width
    y = frames_i420[:, :H, :].astype(jnp.float32)
    u = frames_i420[:, H : H + H // 4, :].reshape(-1, H // 2, W // 2).astype(jnp.float32)
    v = frames_i420[:, H + H // 4 :, :].reshape(-1, H // 2, W // 2).astype(jnp.float32)
    # chroma upsample: nearest x2 (cv2's I420 converter replicates chroma)
    u = jnp.repeat(jnp.repeat(u, 2, axis=1), 2, axis=2) - 128.0
    v = jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2) - 128.0
    r = y + 1.402 * v
    g = y - 0.344136 * u - 0.714136 * v
    b = y + 1.772 * u
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(jnp.round(rgb), 0, 255).astype(jnp.uint8)


def rgb_to_i420(frames_rgb: "np.ndarray") -> "np.ndarray":
    """Host-side exact inverse layout builder (numpy): RGB uint8 (T, H, W, 3)
    -> planar I420 uint8 (T, H * 3 // 2, W). Full-range BT.601. Chroma is
    box-averaged 2x2. For tests and for synthesizing video-native input."""
    import numpy as np

    f = frames_rgb.astype(np.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    T, H, W = y.shape
    u2 = u.reshape(T, H // 2, 2, W // 2, 2).mean(axis=(2, 4))
    v2 = v.reshape(T, H // 2, 2, W // 2, 2).mean(axis=(2, 4))
    out = np.empty((T, H * 3 // 2, W), np.uint8)
    out[:, :H] = np.clip(np.round(y), 0, 255)
    out[:, H : H + H // 4] = np.clip(np.round(u2), 0, 255).reshape(T, H // 4, W)
    out[:, H + H // 4 :] = np.clip(np.round(v2), 0, 255).reshape(T, H // 4, W)
    return out


def host_downscale(frames: "np.ndarray", dst_wh, pixel_format: str = "rgb"):
    """Host-side (cv2) bilinear downscale of decoded uint8 video frames to
    `dst_wh` = (width, height) BEFORE upload.

    The pipeline resizes frames to each model's input resolution on device
    anyway (pipeline/interface.py `_slab_body`), so uploading at any
    resolution >= the largest model resolution carries zero extra
    information — only extra host->device bytes. Downscaling 1920x1080 to
    the production models' 1600x896 on host cuts every uploaded piece by
    31% (i420: 3.11 -> 2.15 MB/frame), which converts directly into e2e fps
    whenever the link, not the chip, is the bottleneck (PERF.md "End-to-end
    budget"). cv2.INTER_LINEAR uses the same half-pixel-center convention
    as the device resize (jax.image.resize, antialias=False), so this only
    reorders an existing resampling chain.

    pixel_format "rgb": frames (T, H, W, 3). "i420": frames
    (T, H*3//2, W) planar (layout as in `i420_to_rgb`); the Y plane is
    resized at full res and U/V at half res, preserving the planar layout.
    Returns uint8 frames in the same pixel format at the new resolution.
    """
    import cv2
    import numpy as np

    w, h = int(dst_wh[0]), int(dst_wh[1])
    if pixel_format == "rgb":
        return np.stack(
            [cv2.resize(f, (w, h), interpolation=cv2.INTER_LINEAR) for f in frames]
        )
    if pixel_format != "i420":
        raise ValueError(f"unknown pixel_format {pixel_format!r}")
    if h % 4 or w % 2:
        raise ValueError(f"i420 target resolution must have h % 4 == 0, w % 2 == 0; got {(w, h)}")
    T = frames.shape[0]
    H = frames.shape[1] * 2 // 3
    W = frames.shape[2]
    out = np.empty((T, h * 3 // 2, w), np.uint8)
    for t in range(T):
        f = frames[t]
        out[t, :h] = cv2.resize(f[:H], (w, h), interpolation=cv2.INTER_LINEAR)
        u = f[H : H + H // 4].reshape(H // 2, W // 2)
        v = f[H + H // 4 :].reshape(H // 2, W // 2)
        out[t, h : h + h // 4] = cv2.resize(
            u, (w // 2, h // 2), interpolation=cv2.INTER_LINEAR
        ).reshape(h // 4, w)
        out[t, h + h // 4 :] = cv2.resize(
            v, (w // 2, h // 2), interpolation=cv2.INTER_LINEAR
        ).reshape(h // 4, w)
    return out
