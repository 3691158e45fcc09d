"""Pure-JAX camera geometry and table constants.

TPU-native rebuild of the reference geometry layer
(ref: uplifting/helper.py:26-223, syntheticdataset/helper.py:121-260,
tabledetection/helper_tabledetection.py:21-35). Instead of the reference's
shape if-ladders (1D/2D/3D x shared/per-frame matrices), every function here
is written once against trailing dimensions and broadcasts over arbitrary
leading batch dims, so it composes with jit/vmap/pjit without special cases.

All functions are jittable and differentiable. float32 by default; pass
float64 inputs under an `jax.experimental.enable_x64` scope when calibration
precision requires it.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Constants (ref: uplifting/helper.py:26-34, syntheticdataset/helper.py:14-29)
# ---------------------------------------------------------------------------

# Working resolution in which the uplifting model consumes 2D coordinates.
HEIGHT, WIDTH = 1440, 2560
# RoPE time base: minimum timestep resolved by the rotary time embedding.
MAX_FPS = 500
# Focal lengths regressed from a real broadcast video (ref: helper.py:30).
BASE_FX, BASE_FY = 2710, 2907

# Official ITTF table dimensions in meters.
TABLE_HEIGHT = 0.76
TABLE_WIDTH = 1.525
TABLE_LENGTH = 2.74
NET_POST_OFFSET = 0.1525
NET_HEIGHT_ABOVE_TABLE = 0.1525
NET_TOTAL_HEIGHT = TABLE_HEIGHT + NET_HEIGHT_ABOVE_TABLE
NET_TOTAL_WIDTH = TABLE_WIDTH + 2 * NET_POST_OFFSET

# Keypoint visibility flags (ref: tabledetection/helper_tabledetection.py:37-38)
KEYPOINT_VISIBLE = 1
KEYPOINT_INVISIBLE = 0

# The 13 named 3D keypoints of the table + net in world coordinates.
# World frame: origin at table center on the floor, z up, x along the table
# length, y along the width. (ref: uplifting/helper.py:36-50)
TABLE_POINTS = np.array(
    [
        [-TABLE_LENGTH / 2, TABLE_WIDTH / 2, TABLE_HEIGHT],   # 0 close left
        [-TABLE_LENGTH / 2, -TABLE_WIDTH / 2, TABLE_HEIGHT],  # 1 close right
        [0.0, TABLE_WIDTH / 2, TABLE_HEIGHT],                 # 2 center left
        [0.0, -TABLE_WIDTH / 2, TABLE_HEIGHT],                # 3 center right
        [TABLE_LENGTH / 2, TABLE_WIDTH / 2, TABLE_HEIGHT],    # 4 far left
        [TABLE_LENGTH / 2, -TABLE_WIDTH / 2, TABLE_HEIGHT],   # 5 far right
        [0.0, TABLE_WIDTH / 2 + NET_POST_OFFSET, TABLE_HEIGHT],    # 6 net lb
        [0.0, -(TABLE_WIDTH / 2 + NET_POST_OFFSET), TABLE_HEIGHT], # 7 net rb
        [0.0, 0.0, TABLE_HEIGHT],                             # 8 net center b
        [0.0, TABLE_WIDTH / 2 + NET_POST_OFFSET, NET_TOTAL_HEIGHT],    # 9 net lt
        [0.0, -(TABLE_WIDTH / 2 + NET_POST_OFFSET), NET_TOTAL_HEIGHT], # 10 net rt
        [-TABLE_LENGTH / 2, 0.0, TABLE_HEIGHT],               # 11 close center
        [TABLE_LENGTH / 2, 0.0, TABLE_HEIGHT],                # 12 far center
    ],
    dtype=np.float32,
)
NUM_TABLE_KEYPOINTS = 13

# Drawing topology (ref: uplifting/helper.py:51-69).
TABLE_CONNECTIONS = (
    (0, 2), (2, 4), (1, 3), (3, 5), (0, 1), (4, 5),
    (6, 2), (2, 3), (3, 7), (6, 9), (7, 10), (9, 10),
    (11, 8), (12, 8),
)
TABLE_LINES = (
    (0, 2, 4), (1, 3, 5), (11, 8, 12), (0, 11, 1),
    (4, 12, 5), (6, 8, 7), (9, 10), (6, 9), (7, 10),
)


# ---------------------------------------------------------------------------
# Homogeneous helpers
# ---------------------------------------------------------------------------

def to_homogeneous(x: jnp.ndarray) -> jnp.ndarray:
    """Append a column of ones along the last dimension.

    (ref: `concat`, uplifting/helper.py:207-223 — here a single broadcasting
    implementation instead of numpy/torch type dispatch.)
    """
    ones = jnp.ones((*x.shape[:-1], 1), dtype=x.dtype)
    return jnp.concatenate([x, ones], axis=-1)


def _matvec(M: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Apply matrix M (..., i, j) to points v (..., j) with broadcasting.

    M may have fewer leading dims than v (a shared camera) or matching
    leading dims (per-frame cameras); standard broadcasting covers both,
    replacing the reference's explicit shape if-ladders
    (ref: uplifting/helper.py:137-204).

    Geometry feeds camera calibration, so matmuls run at HIGHEST precision
    (full f32 accumulate) rather than the TPU default bf16 MXU passthrough.
    These are 3x3/4x4 systems — precision is free here.
    """
    return jnp.einsum("...ij,...j->...i", M, v, precision=jax.lax.Precision.HIGHEST)


def _align_matrix(M: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Align a batched matrix (*Bm, r, c) against points (*Bv, d).

    Matrix batch dims are matched to the LEADING point batch dims — a camera
    batch (B, 4, 4) applies to points (B, T, 3) per-batch, shared across T —
    which is the reference's 'b i j, b t j -> b t i' convention
    (ref: uplifting/helper.py:180-199). Singleton dims are inserted after the
    matrix batch dims so plain einsum broadcasting does the rest.
    """
    extra = (v.ndim - 1) - (M.ndim - 2)
    if M.ndim > 2 and extra > 0:
        M = M.reshape(*M.shape[:-2], *((1,) * extra), *M.shape[-2:])
    return M


# ---------------------------------------------------------------------------
# World <-> camera <-> image transforms
# ---------------------------------------------------------------------------

def world2cam(r_world: jnp.ndarray, Mext: jnp.ndarray) -> jnp.ndarray:
    """Transform world points (..., 3) to camera coords via Mext (..., 4, 4).

    Broadcasts over leading dims of both arguments
    (ref: uplifting/helper.py:168-204).
    """
    r_h = to_homogeneous(r_world)
    r_cam = _matvec(_align_matrix(Mext, r_h), r_h)
    return r_cam[..., :3] / r_cam[..., 3:4]


def cam2img(r_cam: jnp.ndarray, Mint: jnp.ndarray) -> jnp.ndarray:
    """Project camera-frame points (..., 3) to pixels via Mint (..., 3, 3).

    Accepts 3x3 or 3x4/4x4 intrinsics; only the top-left 3x3 block is used
    (ref: uplifting/helper.py:137-165).
    """
    K = Mint[..., :3, :3]
    r_img = _matvec(_align_matrix(K, r_cam), r_cam)
    return r_img[..., :2] / r_img[..., 2:3]


def world2img(r_world: jnp.ndarray, Mext: jnp.ndarray, Mint: jnp.ndarray) -> jnp.ndarray:
    """Full projection: world (..., 3) -> pixel (..., 2)."""
    return cam2img(world2cam(r_world, Mext), Mint)


# ---------------------------------------------------------------------------
# Extrinsic matrix construction / decomposition
# ---------------------------------------------------------------------------

def get_Mext(c: jnp.ndarray, f: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Build a 4x4 extrinsic matrix from camera position, forward and right.

    Rows of R are [right; up; forward] with up = normalize(f x r); the camera
    looks down +z in its own frame (ref: uplifting/helper.py:106-134).
    Broadcasts over leading batch dims.
    """
    up = jnp.cross(f, r)
    up = up / jnp.linalg.norm(up, axis=-1, keepdims=True)
    R = jnp.stack([r, up, f], axis=-2)  # (..., 3, 3)
    t = -_matvec(R, c)  # (..., 3)
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)  # (..., 3, 4)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), (*top.shape[:-2], 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def get_camera_location(Mext: jnp.ndarray) -> jnp.ndarray:
    """Camera center in world coords: c = -R^T t (ref: helper.py:72-82)."""
    R = Mext[..., :3, :3]
    t = Mext[..., :3, 3]
    return -jnp.einsum("...ji,...j->...i", R, t)


def get_forward(Mext: jnp.ndarray) -> jnp.ndarray:
    """Normalized forward direction (ref: helper.py:85-89)."""
    f = Mext[..., 2, :3]
    return f / jnp.linalg.norm(f, axis=-1, keepdims=True)


def get_up(Mext: jnp.ndarray) -> jnp.ndarray:
    """Normalized up direction (ref: helper.py:92-96)."""
    u = -Mext[..., 1, :3]
    return u / jnp.linalg.norm(u, axis=-1, keepdims=True)


def get_right(Mext: jnp.ndarray) -> jnp.ndarray:
    """Normalized right direction (ref: helper.py:99-103)."""
    r = Mext[..., 0, :3]
    return r / jnp.linalg.norm(r, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# Pixel-center-aware resolution rescaling
# ---------------------------------------------------------------------------

def rescale_points(pts: jnp.ndarray, src_wh, dst_wh) -> jnp.ndarray:
    """Rescale pixel coordinates between resolutions, pixel-center-aware.

    Uses the `(x + 0.5) * s - 0.5` convention that the reference applies
    consistently across ~10 call sites (ref: uplifting/data.py:527-553,
    balldetection/transforms.py:44-48). Last dim must have x at index 0 and
    y at index 1; extra trailing channels (e.g. visibility) pass through.
    """
    sx = dst_wh[0] / src_wh[0]
    sy = dst_wh[1] / src_wh[1]
    x = (pts[..., 0] + 0.5) * sx - 0.5
    y = (pts[..., 1] + 0.5) * sy - 0.5
    rest = pts[..., 2:]
    return jnp.concatenate([x[..., None], y[..., None], rest], axis=-1)


def rescale_intrinsics(Mint: jnp.ndarray, src_wh, dst_wh) -> jnp.ndarray:
    """Rescale an intrinsic matrix between resolutions, pixel-center-aware.

    (ref: uplifting/data.py:547-552)
    """
    sx = dst_wh[0] / src_wh[0]
    sy = dst_wh[1] / src_wh[1]
    Mint = Mint.at[..., 0, 0].multiply(sx)
    Mint = Mint.at[..., 1, 1].multiply(sy)
    Mint = Mint.at[..., 0, 2].set((Mint[..., 0, 2] + 0.5) * sx - 0.5)
    Mint = Mint.at[..., 1, 2].set((Mint[..., 1, 2] + 0.5) * sy - 0.5)
    return Mint


# ---------------------------------------------------------------------------
# Spin coordinate transforms (local flight frame <-> world frame)
# ---------------------------------------------------------------------------

def _flight_frame(r_traj: jnp.ndarray):
    """Local frame from the first trajectory step: e_x = initial x-y flight
    direction, e_z = world z, e_y = e_z x e_x (ref: helper.py:394-420)."""
    v0_xy = r_traj[..., 1, :2] - r_traj[..., 0, :2]  # (..., 2)
    v0 = jnp.concatenate([v0_xy, jnp.zeros_like(v0_xy[..., :1])], axis=-1)
    e_x = v0 / jnp.linalg.norm(v0, axis=-1, keepdims=True)
    e_z = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], dtype=r_traj.dtype), e_x.shape)
    e_y = jnp.cross(e_z, e_x)
    return e_x, e_y, e_z


def transform_rotation_axes(rotation: jnp.ndarray, r_traj: jnp.ndarray) -> jnp.ndarray:
    """Project a world-frame angular velocity into the local flight frame.

    rotation: (..., 3) world-frame spin; r_traj: (..., T, 3) trajectory whose
    first two samples define the flight direction (ref: helper.py:394-420).
    """
    e_x, e_y, e_z = _flight_frame(r_traj)
    w = jnp.stack(
        [
            jnp.sum(rotation * e_x, axis=-1),
            jnp.sum(rotation * e_y, axis=-1),
            jnp.sum(rotation * e_z, axis=-1),
        ],
        axis=-1,
    )
    return w


def inverse_transform_rotation_axes(local_rotation: jnp.ndarray, r_traj: jnp.ndarray) -> jnp.ndarray:
    """Map a flight-frame spin back into the world frame (ref: helper.py:423-456)."""
    e_x, e_y, e_z = _flight_frame(r_traj)
    R_T = jnp.stack([e_x, e_y, e_z], axis=-1)  # columns are the basis vectors
    return _matvec(R_T, local_rotation)
