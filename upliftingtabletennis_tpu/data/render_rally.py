"""Synthetic broadcast-frame renderer for the closed-loop pipeline protocol.

No real video data exists in this environment (no egress), so end-to-end
pipeline accuracy is obtained CLOSED-LOOP: physics trajectories are
projected through sampled cameras and rendered into video-like frames
(arena-gradient background, filled table quad with white line markings on
the reference's 13-keypoint topology, net, Gaussian ball blob, sensor
noise); detectors trained on these frames drive the full
detect -> filter -> calibrate -> uplift pipeline, scored against the
physics ground truth (eval/closed_loop.py).

Everything is jitted and batched: rendering happens on device inside the
detector-training loop — no frames ever touch the disk or the host.

ref anchors: table topology uplifting/helper.py:36-69; heatmap sigma and
eval resolution balldetection/dataset.py:434-440.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from upliftingtabletennis_tpu.core.geometry import TABLE_CONNECTIONS

# quad of the table surface in TABLE_POINTS indices (close-left,
# close-right, far-right, far-left)
_QUAD = (0, 1, 5, 4)
_SEGS = np.asarray(TABLE_CONNECTIONS, np.int32)  # (14, 2)

# World-anchored scene context (floor plane z=0): a court floor quad plus two
# SMALL ASYMMETRIC markers — an umpire-table quad on the fixed +y side of the
# net and an advertising-banner quad past the fixed +x table end. The bare
# table+net is mirror-symmetric across both the net plane and the long
# centerline, so from a context-free render the four corner IDENTITIES are
# only decidable by line-pattern chirality — which heatmap detectors fail to
# resolve (round-2/3 closed-loop collapse: corners localized to ~1 px but
# assigned to the wrong channel, 200+ px identity errors). Real broadcast
# frames carry abundant world-anchored context; these quads restore exactly
# that cue. Extents stay within ~4.5 m of the origin so every vertex projects
# in front of the sampled cameras (distance >= 7 m, camera height >= 3.1 m).
CONTEXT_QUADS_WORLD = np.array(
    [
        [[-4.5, -3.0, 0], [4.5, -3.0, 0], [4.5, 3.0, 0], [-4.5, 3.0, 0]],  # floor
        [[-0.5, 1.5, 0], [0.5, 1.5, 0], [0.5, 2.3, 0], [-0.5, 2.3, 0]],  # umpire +y
        [[2.2, -0.6, 0], [3.2, -0.6, 0], [3.2, 0.6, 0], [2.2, 0.6, 0]],  # banner +x
    ],
    dtype=np.float32,
)


def project_context(Mint, Mext):
    """Project CONTEXT_QUADS_WORLD through a camera -> (..., 3, 4, 2) px (at
    the resolution Mint is expressed in). Broadcasts over leading camera
    batch dims like geometry.world2img."""
    from upliftingtabletennis_tpu.core.geometry import world2img

    pts = jnp.asarray(CONTEXT_QUADS_WORLD).reshape(12, 3)
    px = world2img(pts, Mext[..., None, :, :], Mint[..., None, :, :])
    return px.reshape(*px.shape[:-2], 3, 4, 2)


def _seg_dist2(px, py, a, b):
    """Squared distance of every pixel to segment a-b. px/py (H, W); a/b (2,)."""
    d = b - a
    len2 = jnp.maximum(jnp.sum(d * d), 1e-6)
    t = ((px - a[0]) * d[0] + (py - a[1]) * d[1]) / len2
    t = jnp.clip(t, 0.0, 1.0)
    cx = a[0] + t * d[0]
    cy = a[1] + t * d[1]
    return (px - cx) ** 2 + (py - cy) ** 2


def _inside_quad(px, py, quad):
    """Point-in-convex-quad via consistent cross-product signs. quad (4, 2)."""
    inside_pos = jnp.ones_like(px, bool)
    inside_neg = jnp.ones_like(px, bool)
    for i in range(4):
        a = quad[i]
        b = quad[(i + 1) % 4]
        cross = (b[0] - a[0]) * (py - a[1]) - (b[1] - a[1]) * (px - a[0])
        inside_pos &= cross >= 0
        inside_neg &= cross <= 0
    return inside_pos | inside_neg


@partial(jax.jit, static_argnames=("height", "width"))
def render_frames(key, ball_px, ball_vis, table_px, height: int = 1080,
                  width: int = 1920, context_px=None):
    """Render a batch of frames.

    key: PRNG key (per-frame sensor noise);
    ball_px (B, 2) ball pixel positions; ball_vis (B,) {0,1};
    table_px (13, 2) projected table keypoints (shared; static camera);
    context_px (3, 4, 2) projected CONTEXT_QUADS_WORLD (floor + two
    asymmetric markers, see project_context) or None for the bare scene;
    -> (B, height, width, 3) uint8.
    """
    B = ball_px.shape[0]
    yy, xx = jnp.mgrid[0:height, 0:width]
    xx = xx.astype(jnp.float32)
    yy = yy.astype(jnp.float32)

    # arena background gradient (smooth, video-like)
    base = 70.0 + 60.0 * (xx / width) + 40.0 * (yy / height)
    frame = base
    side_m = end_m = None
    if context_px is not None:
        # draw order = depth order: floor, markers (on the floor), then the
        # table (above the floor plane — occludes markers where they overlap)
        frame = jnp.where(_inside_quad(xx, yy, context_px[0]), 58.0, frame)
        side_m = _inside_quad(xx, yy, context_px[1])
        end_m = _inside_quad(xx, yy, context_px[2])
        frame = jnp.where(side_m, 150.0, frame)
        frame = jnp.where(end_m, 140.0, frame)

    # table surface + white markings along the reference topology
    quad = table_px[jnp.asarray(_QUAD)]
    table_mask = _inside_quad(xx, yy, quad)
    frame = jnp.where(table_mask, 45.0, frame)
    line_w2 = (0.0015 * width) ** 2  # ~3 px at 1920
    for a_i, b_i in TABLE_CONNECTIONS:
        d2 = _seg_dist2(xx, yy, table_px[a_i], table_px[b_i])
        frame = jnp.where(d2 < line_w2, 230.0, frame)

    if context_px is not None:
        # keep the markers colored where the table does not occlude them
        side_m = side_m & ~table_mask
        end_m = end_m & ~table_mask

    # per-frame ball blob (sigma ~ the label heatmap's 6 px at 1920,
    # ref: balldetection/dataset.py:434-440) + sensor noise
    sigma = 6.0 * width / 1920.0
    d2b = (xx[None] - ball_px[:, 0, None, None]) ** 2 + (
        yy[None] - ball_px[:, 1, None, None]
    ) ** 2
    blob = 185.0 * jnp.exp(-d2b / (2.0 * sigma**2)) * ball_vis[:, None, None]
    noise = 2.0 * jax.random.normal(key, (B, height, width))
    out = jnp.clip(frame[None] + blob + noise, 0.0, 255.0)
    # mild channel tint so the frames are not pure grayscale
    r = out
    g = out * 0.97 + 3.0
    b = out * 0.94 + 5.0
    if context_px is not None:
        # chromatic shifts make the asymmetric markers trivially separable:
        # umpire quad reddish, banner quad bluish (additive so the ball blob
        # and line markings stay visible on top)
        r = r + 45.0 * side_m - 35.0 * end_m
        g = g - 25.0 * side_m - 10.0 * end_m
        b = b - 35.0 * side_m + 50.0 * end_m
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(rgb, 0, 255).astype(jnp.uint8)


def rescale_px(coords, src_wh, dst_wh):
    """Pixel-center-aware coordinate rescale ((x+0.5)*s-0.5, the
    reference's convention, ref: balldetection/transforms.py:44-48)."""
    coords = jnp.asarray(coords, jnp.float32)
    sx = dst_wh[0] / src_wh[0]
    sy = dst_wh[1] / src_wh[1]
    return jnp.stack(
        [(coords[..., 0] + 0.5) * sx - 0.5, (coords[..., 1] + 0.5) * sy - 0.5], -1
    )
