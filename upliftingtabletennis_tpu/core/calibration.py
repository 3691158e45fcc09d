"""Camera calibration: normalized DLT + RQ + LM refinement + vmapped RANSAC.

TPU-native rebuild of the reference calibration stack
(ref: dataprocessing/my_dlt.py, dataprocessing/regress_cameramatrices.py).
Design differences:

* Everything is jittable and fixed-shape: keypoints are a (13, 2) array plus
  a visibility mask instead of the reference's dict-of-lists; invisible
  points contribute zero rows to the DLT design matrix and zero residual
  weight to the refinement.
* The scipy BFGS refinement (regress_cameramatrices.py:38-118) becomes a
  fixed-iteration Levenberg-Marquardt loop over the same 8-parameter camera
  (fx, fy, tx, ty, tz, euler xyz; principal point fixed at W//2, H//2) with
  IRLS weighting so the default objective matches the reference's
  sum-of-distances (L1-of-norms) BFGS objective.
* RANSAC (regress_cameramatrices.py:121-181) runs its 100 hypotheses as one
  vmapped batch instead of a serial Python loop; each hypothesis always
  contains keypoints 9 and 10 (0-based; the net-top points — the only
  non-coplanar ones, ref: :137-139), plus 4 sampled visible points.
* RQ decomposition is built from QR of the antidiagonally-reversed matrix
  (no scipy), with the reference's sign fixes (my_dlt.py:119-137).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from upliftingtabletennis_tpu.core.geometry import (
    BASE_FX,
    BASE_FY,
    TABLE_HEIGHT,
    TABLE_POINTS,
    get_Mext,
    world2img,
)

HI = jax.lax.Precision.HIGHEST

# RANSAC constants (ref: regress_cameramatrices.py:131-139)
RANSAC_ITERS = 100
RANSAC_POINTS = 6
RANSAC_FIXED = (9, 10)  # 0-based net-top keypoints (= reference keys 10, 11)
INLIER_THRESHOLD = 3.5
LM_ITERS = 40


# ---------------------------------------------------------------------------
# Euler <-> matrix ('xyz' extrinsic, scipy convention: R = Rz(c) Ry(b) Rx(a))
# ---------------------------------------------------------------------------

def euler_xyz_to_matrix(angles: jnp.ndarray) -> jnp.ndarray:
    """angles (..., 3) = (a, b, c) -> R = Rz(c) @ Ry(b) @ Rx(a)."""
    a, b, c = angles[..., 0], angles[..., 1], angles[..., 2]
    ca, sa = jnp.cos(a), jnp.sin(a)
    cb, sb = jnp.cos(b), jnp.sin(b)
    cc, sc = jnp.cos(c), jnp.sin(c)
    return jnp.stack(
        [
            jnp.stack([cc * cb, -sc * ca + cc * sb * sa, sc * sa + cc * sb * ca], -1),
            jnp.stack([sc * cb, cc * ca + sc * sb * sa, -cc * sa + sc * sb * ca], -1),
            jnp.stack([-sb, cb * sa, cb * ca], -1),
        ],
        -2,
    )


def matrix_to_euler_xyz(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse of euler_xyz_to_matrix (gimbal-safe via clamped asin)."""
    b = -jnp.arcsin(jnp.clip(R[..., 2, 0], -1.0, 1.0))
    a = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    c = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return jnp.stack([a, b, c], -1)


# ---------------------------------------------------------------------------
# Normalized DLT (ref: my_dlt.py:5-91)
# ---------------------------------------------------------------------------

def _normalize(points, w):
    """Masked zero-mean/unit-std normalization -> (normed, T) (ref: :5-37)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    mean = jnp.sum(points * w[:, None], 0) / wsum
    var = jnp.sum(((points - mean) ** 2) * w[:, None], 0) / wsum
    std = jnp.sqrt(var)
    std = jnp.where(std < 1e-10, 1e-10, std)
    d = points.shape[1]
    T = jnp.zeros((d + 1, d + 1), points.dtype)
    T = T.at[jnp.arange(d), jnp.arange(d)].set(1.0 / std)
    T = T.at[:d, d].set(-mean / std)
    T = T.at[d, d].set(1.0)
    return (points - mean) / std, T


def dlt(points_3d, points_2d, weights=None):
    """Projection matrix P (3, 4) from >=6 correspondences via normalized DLT.

    points_3d (N, 3), points_2d (N, 2), weights (N,) in [0, 1]: rows with
    weight 0 are excluded (zero rows of the design matrix).
    """
    N = points_3d.shape[0]
    w = jnp.ones((N,), points_3d.dtype) if weights is None else weights
    p3n, T3 = _normalize(points_3d, w)
    p2n, T2 = _normalize(points_2d, w)

    X, Y, Z = p3n[:, 0], p3n[:, 1], p3n[:, 2]
    x, y = p2n[:, 0], p2n[:, 1]
    zero = jnp.zeros_like(X)
    one = jnp.ones_like(X)
    row_x = jnp.stack([-X, -Y, -Z, -one, zero, zero, zero, zero, x * X, x * Y, x * Z, x], -1)
    row_y = jnp.stack([zero, zero, zero, zero, -X, -Y, -Z, -one, y * X, y * Y, y * Z, y], -1)
    A = jnp.concatenate([row_x * w[:, None], row_y * w[:, None]], axis=0)  # (2N, 12)

    # nullspace via SVD (ref: :77-80)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    P_norm = Vt[-1].reshape(3, 4)
    P = jnp.linalg.inv(T2) @ P_norm @ T3
    # normalize such that P[2,3] = 1, with Frobenius fallback (ref: :86-89)
    P = jnp.where(jnp.abs(P[2, 3]) > 1e-12, P / P[2, 3], P / jnp.linalg.norm(P))
    return P


def rq3(M):
    """RQ decomposition of a 3x3 matrix via QR of the reversed matrix."""
    Prev = jnp.asarray([[0.0, 0, 1], [0, 1, 0], [1, 0, 0]], M.dtype)
    A = Prev @ M
    Q, R = jnp.linalg.qr(A.T)
    K = Prev @ R.T @ Prev
    Qm = Prev @ Q.T
    return K, Qm


def decompose_projection_matrix(P):
    """P (3,4) -> (K (3,3), R (3,3), t (3,)) with the reference's sign fixes
    (ref: my_dlt.py:94-137)."""
    M = P[:, :3]
    p4 = P[:, 3]
    K, R = rq3(M)
    signs = jnp.sign(jnp.diagonal(K))
    signs = jnp.where(signs == 0, 1.0, signs)
    K = K * signs[None, :]
    R = R * signs[:, None]
    K = K / K[2, 2]
    detR = jnp.linalg.det(R)
    R = R.at[:, 2].multiply(jnp.where(detR < 0, -1.0, 1.0))
    t = jnp.linalg.solve(K, p4)
    return K, R, t


def dlt_calib(points_3d, points_2d, weights=None):
    """(Mint (3,3), Mext (4,4)) from correspondences (ref: my_dlt.py:140-161)."""
    P = dlt(points_3d, points_2d, weights)
    K, R, t = decompose_projection_matrix(P)
    Mext = jnp.eye(4, dtype=P.dtype)
    Mext = Mext.at[:3, :3].set(R).at[:3, 3].set(t)
    return K, Mext


# ---------------------------------------------------------------------------
# 8-parameter LM refinement (ref: regress_cameramatrices.py:38-118)
# ---------------------------------------------------------------------------

def _params_to_cams(x, resolution):
    W, H = resolution
    fx, fy, tx, ty, tz = x[0], x[1], x[2], x[3], x[4]
    R = euler_xyz_to_matrix(x[5:8])
    Mint = jnp.asarray(
        [[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]], x.dtype
    )
    Mint = Mint.at[0, 0].set(fx).at[1, 1].set(fy)
    Mint = Mint.at[0, 2].set(W // 2).at[1, 2].set(H // 2)
    Mext = jnp.eye(4, dtype=x.dtype)
    Mext = Mext.at[:3, :3].set(R)
    Mext = Mext.at[0, 3].set(tx).at[1, 3].set(ty).at[2, 3].set(tz)
    return Mint, Mext


def _residual_dists(x, points_3d, points_2d, resolution):
    Mint, Mext = _params_to_cams(x, resolution)
    proj = world2img(points_3d, Mext, Mint)
    return jnp.sqrt(jnp.sum((proj - points_2d) ** 2, axis=-1) + 1e-12)


def _cams_to_params(Mint, Mext):
    angles = matrix_to_euler_xyz(Mext[:3, :3])
    # map to [-pi, pi] (ref: :88-89)
    angles = jnp.mod(angles + jnp.pi, 2 * jnp.pi) - jnp.pi
    return jnp.concatenate(
        [
            jnp.stack([Mint[0, 0], Mint[1, 1], Mext[0, 3], Mext[1, 3], Mext[2, 3]]),
            angles,
        ]
    )


def refine_camera(
    points_3d,
    points_2d,
    weights,
    resolution,
    start: Tuple[jnp.ndarray, jnp.ndarray],
    objective: str = "l1",
    iters: int = LM_ITERS,
):
    """LM refinement of the 8-parameter camera from a DLT start.

    objective 'l1' reweights residuals (IRLS) to match the reference's BFGS
    sum-of-distances objective (ref: :71-72, :98); 'l2' is plain LM on the
    distance residuals (the reference's use_lm=True path, ref: :93-95).
    Returns (Mint (3,3), Mext (4,4), mean residual over weighted points).
    """
    x0 = _cams_to_params(*start)

    def residuals(x):
        return _residual_dists(x, points_3d, points_2d, resolution)

    def lm_step(carry, _):
        x, lam = carry
        r = residuals(x)
        if objective == "l1":
            w = weights / jnp.sqrt(jnp.maximum(r, 1e-3))  # IRLS for sum |d|
        else:
            w = weights
        J = jax.jacfwd(residuals)(x)  # (N, 8)
        Jw = J * w[:, None]
        rw = r * w
        A = Jw.T @ Jw + lam * jnp.eye(8, dtype=x.dtype)
        g = Jw.T @ rw
        delta = jnp.linalg.solve(A, g)
        x_new = x - delta
        cost = jnp.sum(weights * r)
        cost_new = jnp.sum(weights * residuals(x_new))
        accept = cost_new < cost
        x = jnp.where(accept, x_new, x)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        lam = jnp.clip(lam, 1e-8, 1e8)
        return (x, lam), None

    (x, _), _ = jax.lax.scan(lm_step, (x0, jnp.asarray(1e-2, x0.dtype)), None, length=iters)
    Mint, Mext = _params_to_cams(x, resolution)
    mean_res = jnp.sum(weights * residuals(x)) / jnp.maximum(jnp.sum(weights), 1e-9)
    return Mint, Mext, mean_res


def canonical_starts(dtype=jnp.float32):
    """Typical broadcast-camera poses used as extra refinement starts.

    The table keypoints are near-coplanar, so DLT starts are often garbage
    (the reference BFGS then lands in poor minima, e.g. fx=50k). Multi-start
    LM from a few canonical poses (distance 10 m, elevation ~40 deg, three
    azimuths, regressed broadcast focal lengths) makes the refinement robust
    — a deliberate improvement over the reference.
    """
    outs = []
    for phi_deg in (40.0, 90.0, 140.0):
        phi = np.deg2rad(phi_deg)
        theta = np.deg2rad(50.0)
        c = np.array(
            [10 * np.sin(theta) * np.cos(phi), 10 * np.sin(theta) * np.sin(phi), 10 * np.cos(theta) + TABLE_HEIGHT]
        )
        look = np.array([0.0, 0.0, TABLE_HEIGHT])
        f = look - c
        f = f / np.linalg.norm(f)
        r = np.cross(f, [0.0, 0.0, 1.0])
        r = r / np.linalg.norm(r)
        Mext = get_Mext(jnp.asarray(c, dtype), jnp.asarray(f, dtype), jnp.asarray(r, dtype))
        Mint = jnp.asarray(
            [[BASE_FX, 0, 0], [0, BASE_FY, 0], [0, 0, 1.0]], dtype
        )
        outs.append((Mint, Mext))
    return outs


def refine_camera_multistart(
    points_3d, points_2d, weights, resolution, dlt_start, objective="l1", iters=LM_ITERS
):
    """Run LM from the DLT start plus the canonical starts; keep the best."""
    starts = [dlt_start] + canonical_starts(points_2d.dtype)
    Mints0 = jnp.stack([s[0] for s in starts])
    Mexts0 = jnp.stack([s[1] for s in starts])

    def one(Mi0, Me0):
        return refine_camera(points_3d, points_2d, weights, resolution, (Mi0, Me0), objective, iters)

    Mints, Mexts, res = jax.vmap(one)(Mints0, Mexts0)
    best = jnp.argmin(res)
    return Mints[best], Mexts[best], res[best]


# ---------------------------------------------------------------------------
# RANSAC (ref: regress_cameramatrices.py:121-181)
# ---------------------------------------------------------------------------

def _sample_hypothesis_weights(key, visibility):
    """One hypothesis: fixed net-top points + 4 random visible others."""
    N = visibility.shape[0]
    fixed = jnp.zeros((N,)).at[jnp.asarray(RANSAC_FIXED)].set(1.0)
    candidates = visibility * (1.0 - fixed)
    # random priority; invisible/fixed pushed to the end
    u = jax.random.uniform(key, (N,))
    priority = jnp.where(candidates > 0, u, 2.0)
    order = jnp.argsort(priority)
    chosen = jnp.zeros((N,)).at[order[: RANSAC_POINTS - len(RANSAC_FIXED)]].set(1.0)
    chosen = chosen * candidates  # safety: never select invisible
    return jnp.clip(chosen + fixed * visibility, 0.0, 1.0)


@partial(jax.jit, static_argnames=("resolution", "use_ransac", "objective"))
def calibrate_camera(
    points_2d,
    visibility,
    resolution: Tuple[int, int],
    key: Optional[jax.Array] = None,
    use_ransac: bool = False,
    objective: str = "l1",
):
    """Full calibration: DLT init -> (RANSAC-)LM refinement.

    points_2d: (13, 2) detected table keypoints in pixels.
    visibility: (13,) {0,1}.
    Returns (Mint (3,3), Mext (4,4), num_inliers). Mirrors
    calc_cameramatrices (ref: regress_cameramatrices.py:199-231); caller
    must ensure >= 6 visible points (ref: :208).
    """
    points_3d = jnp.asarray(TABLE_POINTS, points_2d.dtype)
    vis = visibility.astype(points_2d.dtype)

    Mint0, Mext0 = dlt_calib(points_3d, points_2d, vis)

    if not use_ransac:
        Mint, Mext, _ = refine_camera_multistart(
            points_3d, points_2d, vis, resolution, (Mint0, Mext0), objective
        )
        return Mint, Mext, jnp.sum(visibility).astype(jnp.int32)

    if key is None:
        key = jax.random.PRNGKey(42)
    keys = jax.random.split(key, RANSAC_ITERS)

    def hypothesis(k):
        w = _sample_hypothesis_weights(k, vis)
        Mint_h, Mext_h, _ = refine_camera_multistart(
            points_3d, points_2d, w, resolution, (Mint0, Mext0), objective
        )
        proj = world2img(points_3d, Mext_h, Mint_h)
        err = jnp.linalg.norm(proj - points_2d, axis=-1)
        inlier = (err < INLIER_THRESHOLD) & (visibility > 0)
        return Mint_h, Mext_h, inlier

    Mints, Mexts, inliers = jax.vmap(hypothesis)(keys)
    n_in = jnp.sum(inliers, axis=1)
    best = jnp.argmax(n_in)

    # refit on the best hypothesis' inliers (ref: :176-179)
    w_best = inliers[best].astype(points_2d.dtype)
    Mint, Mext, _ = refine_camera(
        points_3d, points_2d, w_best, resolution, (Mints[best], Mexts[best]), objective
    )
    Mint, Mext = _basin_hop_polish(
        points_3d, points_2d, visibility, resolution, Mint, Mext, key
    )
    return Mint, Mext, n_in[best].astype(jnp.int32)


POLISH_RESTARTS = 32
POLISH_ROUNDS = 2


def _basin_hop_polish(points_3d, points_2d, visibility, resolution, Mint, Mext, key):
    """Final L2 polish with jittered multi-restart basin hopping.

    The 13 table keypoints are near-coplanar, so the refinement landscape
    around the RANSAC winner has several nearby local minima; LM from the
    inlier refit reliably lands in one that is ~0.5-1 px (vs ground truth)
    away from the maximum-likelihood camera. Measured on closed-loop-noise
    synthetic cameras (tools/probe_calibration_floor.py): RANSAC winner
    1.67 px reproj vs detections / 1.61 px vs GT; after this polish
    1.05 / 0.78 — i.e. the polish recovers most of the gap to the GT-start
    optimum (1.23 / 0.53). Two rounds of 32 vmapped jittered LM restarts
    (~3% focal, 15 cm translation, 0.6 deg angles) keep the lowest-cost
    basin; weights are a GENEROUS inlier set under the RANSAC winner
    (< 2x INLIER_THRESHOLD), so gross detector outliers stay excluded while
    near-threshold good points rejoin the fit. L2 (not the RANSAC stage's
    L1-IRLS) because the final estimate is a Gaussian-noise MLE problem.
    No reference counterpart: the reference stops at the BFGS inlier refit
    (ref: regress_cameramatrices.py:176-181)."""
    proj = world2img(points_3d, Mext, Mint)
    err = jnp.linalg.norm(proj - points_2d, axis=-1)
    w = ((err < 2.0 * INLIER_THRESHOLD) & (visibility > 0)).astype(points_2d.dtype)
    # need >= 4 points beyond the 8-param dof to be worth polishing
    enough = jnp.sum(w) >= 6.0

    def refit_from(x):
        Mi0, Me0 = _params_to_cams(x, resolution)
        return refine_camera(points_3d, points_2d, w, resolution, (Mi0, Me0), "l2", 60)

    best_Mi, best_Me, best_res = refit_from(_cams_to_params(Mint, Mext))
    bx = _cams_to_params(best_Mi, best_Me)
    for rd in range(POLISH_ROUNDS):
        ks = jax.random.split(jax.random.fold_in(key, 1000 + rd), POLISH_RESTARTS)

        def one(k):
            j = jax.random.normal(k, (8,), bx.dtype)
            x = (
                bx.at[:2].multiply(1.0 + j[:2] * 0.03)
                .at[2:5].add(j[2:5] * 0.15)
                .at[5:8].add(j[5:8] * 0.01)
            )
            return refit_from(x)

        Mis, Mes, res = jax.vmap(one)(ks)
        bi = jnp.argmin(res)
        better = res[bi] < best_res
        best_Mi = jnp.where(better, Mis[bi], best_Mi)
        best_Me = jnp.where(better, Mes[bi], best_Me)
        best_res = jnp.minimum(res[bi], best_res)
        bx = _cams_to_params(best_Mi, best_Me)

    Mint = jnp.where(enough, best_Mi, Mint)
    Mext = jnp.where(enough, best_Me, Mext)
    return Mint, Mext


def calibrate_from_keypoints(keypoints, resolution, use_ransac=True, key=None):
    """Convenience wrapper: keypoints (13, 3) = (x, y, visibility)."""
    return calibrate_camera(
        keypoints[:, :2], keypoints[:, 2], tuple(resolution), key, use_ransac
    )


calibrate_camera_batch = jax.vmap(
    calibrate_camera, in_axes=(0, 0, None, 0, None, None), out_axes=0
)
