"""Differentiable-physics trajectory + spin fitting from 2D detections.

Recovers the full 3D flight and the initial spin vector of a rally segment
directly from observed 2D ball positions by gradient-optimizing the initial
conditions (r0, v0, w0) of `core.physics` through the camera projection:

    minimize_{r0,v0,w0}  mean_t || project(simulate(r0,v0,w0)(t)) - obs_t ||^2

This capability has NO counterpart in the reference: its physics engine is
MuJoCo (external C library, non-differentiable — ref:
syntheticdataset/mujocosimulation.py), so the reference can only *train a
network* on simulated data (ref: uplifting/train.py). Here the implicit-
Euler integrator (core/physics.py, MuJoCo-parity-tested) is pure JAX, so the
whole simulate->project->loss graph is differentiable and the estimation
problem is solved directly — a training-free, physically-exact alternative
to the uplifting transformer, and a hybrid refinement of its output (pass
the network prediction as `init_state`: it joins the FULL multi-start and
wins loss ties via seed-aware robust selection; do not shrink `n_starts`
to make it a pure polish — that inherits the network's systematic depth
error, see artifacts/physfit/tt3d_fit_polish.json vs tt3d_fit_hybrid.json).

TPU-first design: the global search is a VMAPPED MULTI-START — all `n_starts`
candidate initializations integrate, project and take Adam steps together as
one batched program (no per-hypothesis Python loop), the same pattern as the
vmapped RANSAC in core/calibration.py. A damped Gauss-Newton (Levenberg-
Marquardt) polish then sharpens every start in parallel with `jacfwd` (9
forward tangents through the simulation — cheap). Everything is one jitted
program per (T, n_frames, n_starts) shape; the 50-token eval protocol
compiles exactly once.

Spin observability comes from Magnus curvature in flight and from the bounce
kick (the impulse map couples spin to the tangential velocity change), so
segments that include a bounce pin the spin sign far better than pre-bounce
flight alone — the same physical mechanism the paper's network exploits.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from upliftingtabletennis_tpu.core import geometry as G
from upliftingtabletennis_tpu.core.physics import (
    DT,
    FPS,
    BallState,
    simulate,
)

# Scales that bring r0 (m), v0 (m/s), w0 (rad/s) to O(1) optimization
# variables — one Adam learning rate then fits all three blocks.
V_SCALE = 10.0
W_SCALE = 100.0

# Physical plausibility bounds (soft): the datagen priors sample speeds
# 3-30 m/s and spins 0-500 rad/s (ref: mujocosimulation.py:30-51).
MAX_SPEED = 35.0
MAX_SPIN = 600.0


class FitResult(NamedTuple):
    state0: BallState  # best-start initial conditions, (3,) arrays
    r_world: jnp.ndarray  # (T, 3) fitted 3D positions at the obs times
    loss: jnp.ndarray  # best-start final mean px^2 reprojection loss
    all_loss: jnp.ndarray  # (n_starts,) final losses of every start
    best: jnp.ndarray  # index of the winning start
    # masked-mean px distance between the winning start's reprojection and
    # the OBSERVED track — computable without ground truth, so it is the
    # convergence gate: fits that locked onto a wrong bounce hypothesis sit
    # far above the detection-noise floor here, and downstream metrics
    # should report {error on gated fits, coverage} instead of raw means
    # (a small fraction of meters-off wrong-basin fits otherwise poisons
    # every published mean).
    reproj_px: jnp.ndarray
    # GT-free DEPTH-IDENTIFIABILITY diagnostic (VERDICT r4 #3): max distance
    # (m) between the winning start's initial position and that of any other
    # start whose final loss is within the tie band (1.3x + 0.5). A small
    # reprojection residual alone admits meter-scale depth error on
    # monocular tracks (round-4 closed loop: converged median 8.8 cm but
    # mean 101 cm); when several basins explain the 2D track equally well,
    # this spread is large and the fit should NOT be trusted in 3D. Gate on
    # BOTH: reproj_px <= gate AND basin_spread_m <= ~0.3.
    basin_spread_m: jnp.ndarray


def _params_to_state(q: jnp.ndarray) -> BallState:
    """(..., 9) scaled optimization vector -> BallState of (..., 3) arrays."""
    return BallState(
        r=q[..., 0:3], v=q[..., 3:6] * V_SCALE, w=q[..., 6:9] * W_SCALE
    )


def _state_to_params(state: BallState) -> jnp.ndarray:
    return jnp.concatenate(
        [state.r, state.v / V_SCALE, state.w / W_SCALE], axis=-1
    )


def positions_at_times(traj_r: jnp.ndarray, times: jnp.ndarray) -> jnp.ndarray:
    """Linear interpolation of simulated positions onto observation times.

    traj_r (F, ..., 3) on the FPS save grid (frame k at time k/FPS, the
    datagen convention — physics.simulate docstring); times (T,) seconds.
    Returns (T, ..., 3). Differentiable w.r.t. traj_r (the gather indices
    depend only on the constant times).
    """
    idx = times * FPS
    i0 = jnp.clip(jnp.floor(idx).astype(jnp.int32), 0, traj_r.shape[0] - 2)
    frac = jnp.clip(idx - i0, 0.0, 1.0)
    r0 = jnp.take(traj_r, i0, axis=0)
    r1 = jnp.take(traj_r, i0 + 1, axis=0)
    frac = frac.reshape(frac.shape + (1,) * (traj_r.ndim - 1))
    return r0 * (1.0 - frac) + r1 * frac


def _simulated_obs(state0: BallState, times, Mint, Mext, n_frames, substeps, dt):
    """Project the simulated trajectory onto the observation times.

    state0 arrays (..., 3) -> (T, ..., 2) pixels and (T, ..., 3) world.
    """
    traj = simulate(state0, n_frames, substeps, dt)
    r_t = positions_at_times(traj.r, times)  # (T, ..., 3)
    return G.world2img(r_t, Mext, Mint), r_t


def _loss_terms(q, obs, times, mask, Mint, Mext, n_frames, substeps, dt,
                huber_px):
    """Per-start (masked mean px^2 data term, soft plausibility penalty).

    q (S, 9); obs (T, 2); mask (T,). Returns ((S,), (S,))."""
    state0 = _params_to_state(q)
    proj, _ = _simulated_obs(state0, times, Mint, Mext, n_frames, substeps, dt)
    d2 = jnp.sum((proj - obs[:, None, :]) ** 2, axis=-1)  # (T, S)
    if huber_px is not None:
        # Huber on the px distance: quadratic core, linear tail — keeps
        # spurious detections from dominating the fit
        d = jnp.sqrt(d2 + 1e-12)
        d2 = jnp.where(
            d < huber_px, d2, huber_px * (2.0 * d - huber_px)
        )
    data = jnp.sum(d2 * mask[:, None], axis=0) / jnp.maximum(
        jnp.sum(mask), 1.0
    )
    speed = jnp.linalg.norm(state0.v, axis=-1)
    spin = jnp.linalg.norm(state0.w, axis=-1)
    penalty = (
        jnp.maximum(speed - MAX_SPEED, 0.0) ** 2
        + jnp.maximum((spin - MAX_SPIN) / W_SCALE, 0.0) ** 2
        + jnp.maximum(-state0.r[..., 2], 0.0) ** 2
    ) * 100.0
    return data, penalty


def default_inits(
    key, obs, times, mask, Mint, Mext, n_starts: int
) -> BallState:
    """Observation-driven multi-start initializations, (n_starts, 3) arrays.

    Back-projects the first visible detection onto the camera ray at a
    sampled flight height, estimates the velocity direction from the first
    two visible detections at matched forward depth, and samples the spin
    from the datagen prior's scale — the vmapped analogue of a RANSAC
    hypothesis set.
    """
    T = obs.shape[0]
    i0 = jnp.argmax(mask > 0)
    # velocity baseline: a visible detection ~6 frames after the first (a
    # 2-frame baseline amplifies pixel noise 3x) — fall back to the next
    # visible one if the track is that short
    later6 = (jnp.arange(T) >= i0 + 5) & (mask > 0)
    later1 = (jnp.arange(T) > i0) & (mask > 0)
    i1 = jnp.where(jnp.any(later6), jnp.argmax(later6), jnp.argmax(later1))

    K = Mint[:3, :3]
    R = Mext[:3, :3]
    c = G.get_camera_location(Mext)
    fwd = G.get_forward(Mext)
    Kinv = jnp.linalg.inv(K)

    def ray(uv):
        d_cam = Kinv @ jnp.concatenate([uv, jnp.ones((1,), uv.dtype)])
        d = R.T @ d_cam
        return d / jnp.linalg.norm(d)

    d0, d1 = ray(obs[i0]), ray(obs[i1])
    k_z, k_v, k_w, k_m = jax.random.split(key, 4)

    # flight height hypotheses -> depth along the first ray
    z_t = jax.random.uniform(k_z, (n_starts,), minval=0.85, maxval=1.9)
    s0 = jnp.clip((z_t - c[2]) / jnp.where(jnp.abs(d0[2]) < 1e-3, 1e-3, d0[2]),
                  1.5, 30.0)
    p0 = c + s0[:, None] * d0  # (S, 3)

    # second point at matched forward depth -> velocity estimate
    s1 = s0 * jnp.dot(d0, fwd) / jnp.maximum(jnp.dot(d1, fwd), 1e-3)
    p1 = c + s1[:, None] * d1
    dt_obs = jnp.maximum(times[i1] - times[i0], 1e-3)
    # ballistic correction: p1 ~ p0 + v dt - g/2 dt^2 z  =>  v_z gets +g dt/2
    v_est = (p1 - p0) / dt_obs + jnp.array([0.0, 0.0, 4.905]) * dt_obs
    v = v_est * jax.random.uniform(k_m, (n_starts, 1), minval=0.7, maxval=1.3)
    v = v + 1.5 * jax.random.normal(k_v, (n_starts, 3))
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    v = v * jnp.minimum(1.0, 32.0 / jnp.maximum(vn, 1e-6))

    w = 150.0 * jax.random.normal(k_w, (n_starts, 3))
    r0 = p0 - v * times[i0]  # extrapolate back to the t=0 grid origin
    return BallState(r=r0, v=v, w=w)


@partial(jax.jit, static_argnames=("n_frames", "substeps", "adam_steps",
                                   "lm_steps", "huber_px", "seed_rel"))
def _run_fit(q0, obs, times, mask, Mint, Mext, *, n_frames, substeps, dt,
             adam_steps, lm_steps, lr, huber_px, seed_q=None, seed_rel=0.0):
    """Batched Adam search (coarse-to-fine horizon) + vmapped LM polish.

    q0 (S, 9) scaled multi-start params -> FitResult for the winning start.
    """
    import optax

    def total_loss(q, t_cut):
        m = mask * (times <= t_cut)
        data, pen = _loss_terms(q, obs, times, m, Mint, Mext, n_frames,
                                substeps, dt, huber_px)
        return jnp.sum(data + pen)

    # --- phase 1: Adam on all starts at once (elementwise moments == an
    # independent Adam per start; one batched physics program), with a
    # COARSE-TO-FINE TIME CURRICULUM: the horizon t_cut grows from the
    # early flight (where the landscape is near-quadratic in r0, v0) to the
    # full segment (where the bounce kick makes it rugged — a cold start
    # there gets stuck matching the wrong bounce index) ---
    t_vis = jnp.where(mask > 0, times, 0.0)
    t_max = jnp.max(t_vis)
    # start the curriculum once ~25% of the visible track is covered
    order = jnp.sort(jnp.where(mask > 0, times, jnp.inf))
    n_vis = jnp.sum(mask > 0).astype(jnp.int32)
    t_lo = order[jnp.clip(n_vis // 4, 1, obs.shape[0] - 1)]
    sched = optax.cosine_decay_schedule(lr, max(adam_steps, 1), alpha=0.05)
    tx = optax.adam(sched)
    ramp_end = max(int(0.6 * adam_steps), 1)

    def adam_step(carry, i):
        q, opt = carry
        frac = jnp.minimum(i.astype(jnp.float32) / ramp_end, 1.0)
        t_cut = t_lo + (t_max - t_lo + 1e-3) * frac
        g = jax.grad(total_loss)(q, t_cut)
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        upd, opt = tx.update(g, opt, q)
        return (optax.apply_updates(q, upd), opt), None

    (q, _), _ = jax.lax.scan(
        adam_step, (q0, tx.init(q0)), jnp.arange(adam_steps)
    )

    # --- phase 2: damped Gauss-Newton on each start (vmapped) ---
    def residuals(q_s):
        state0 = _params_to_state(q_s)
        proj, _ = _simulated_obs(state0, times, Mint, Mext, n_frames,
                                 substeps, dt)
        return ((proj - obs) * mask[:, None]).reshape(-1)  # (2T,)

    def scalar_loss(q_s):
        data, pen = _loss_terms(q_s[None], obs, times, mask, Mint, Mext,
                                n_frames, substeps, dt, huber_px)
        return (data + pen)[0]

    def lm_one(q_s):
        def lm_step(carry, _):
            q_c, lam, f_c = carry
            r = residuals(q_c)
            J = jax.jacfwd(residuals)(q_c)  # (2T, 9)
            JtJ = J.T @ J
            g = J.T @ r
            A = JtJ + lam * jnp.diag(jnp.diag(JtJ)) + 1e-6 * jnp.eye(9)
            dq = -jnp.linalg.solve(A, g)
            q_n = q_c + dq
            f_n = scalar_loss(q_n)
            ok = jnp.isfinite(f_n) & (f_n < f_c)
            q_c = jnp.where(ok, q_n, q_c)
            f_c = jnp.where(ok, f_n, f_c)
            lam = jnp.where(ok, jnp.maximum(lam * 0.3, 1e-8),
                            jnp.minimum(lam * 4.0, 1e6))
            return (q_c, lam, f_c), None

        f0 = scalar_loss(q_s)
        (q_f, _, f_f), _ = jax.lax.scan(
            lm_step, (q_s, jnp.asarray(1e-2), f0), None, length=lm_steps
        )
        return q_f, f_f

    if lm_steps > 0:
        q, losses = jax.vmap(lm_one)(q)
    else:
        data, pen = _loss_terms(q, obs, times, mask, Mint, Mext, n_frames,
                                substeps, dt, huber_px)
        losses = data + pen

    finite = jnp.where(jnp.isfinite(losses), losses, jnp.inf)
    best = jnp.argmin(finite)
    if seed_q is not None and seed_rel > 1.0:
        # Robust seeded selection: pure argmin over the final 2D loss is
        # unstable on monocularly-ambiguous tracks — a wrong-bounce basin
        # can edge out the true one by a hair of reprojection error while
        # being meters off in 3D (the heavy tail in the TT3D fit means).
        # Among starts whose loss is within `seed_rel` of the minimum
        # (plus a small absolute slack), prefer the one closest to the
        # seed (the uplifting network's prediction) in scaled param space:
        # when the data can't decide, defer to the learned prior.
        ok = finite <= finite[best] * seed_rel + 0.5
        dist = jnp.linalg.norm(q - seed_q, axis=-1)
        best = jnp.argmin(jnp.where(ok, dist, jnp.inf))
    state0 = _params_to_state(q[best])
    proj, r_world = _simulated_obs(state0, times, Mint, Mext, n_frames,
                                   substeps, dt)
    d = jnp.linalg.norm(proj - obs, axis=-1)
    reproj_px = jnp.sum(d * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    # depth identifiability: 3D spread of the near-tied basins (see
    # FitResult.basin_spread_m). r0 lives unscaled in q[..., :3]. The tie
    # band anchors at the GLOBAL min (best may be the seed-arbitrated pick,
    # not the argmin).
    tie = finite <= jnp.min(finite) * 1.3 + 0.5
    r0_d = jnp.linalg.norm(q[:, :3] - q[best, :3], axis=-1)
    basin_spread = jnp.max(jnp.where(tie, r0_d, 0.0))
    return FitResult(state0=state0, r_world=r_world, loss=losses[best],
                     all_loss=losses, best=best, reproj_px=reproj_px,
                     basin_spread_m=basin_spread)


def fit_trajectory(
    obs: jnp.ndarray,
    times: jnp.ndarray,
    mask: jnp.ndarray,
    Mint: jnp.ndarray,
    Mext: jnp.ndarray,
    *,
    key: Optional[jax.Array] = None,
    n_starts: int = 32,
    adam_steps: int = 250,
    lm_steps: int = 12,
    lr: float = 0.03,
    n_frames: Optional[int] = None,
    substeps: int = int(round(1.0 / (FPS * DT))),
    dt: float = DT,
    init_state: Optional[BallState] = None,
    huber_px: Optional[float] = None,
    seed_select_rel: float = 1.3,
) -> FitResult:
    """Fit (r0, v0, w0) to observed 2D ball detections.

    obs (T, 2) pixels; times (T,) seconds on the datagen/eval convention
    (frame k of the 500 fps grid at k/FPS); mask (T,) 1=valid; Mint (3, 3)
    or (3+, 3+); Mext (4, 4). All visible times must lie inside the
    simulation horizon (n_frames / 500 s; default covers max(times)).

    `init_state` (arrays (3,) or (k, 3)) seeds extra starts — pass the
    uplifting model's prediction for the hybrid mode (seed + full search).
    When seeded, the winning start is chosen by robust selection: among
    starts within `seed_select_rel` of the minimum final loss, the one
    closest to the seed wins (`seed_select_rel=1.0` restores pure argmin).
    `huber_px` switches the data term to a Huber px distance (robust to
    spurious detections). Returns a FitResult; one compiled program per
    (T, n_frames, n_starts, steps) signature.
    """
    obs = jnp.asarray(obs, jnp.float32)
    times = jnp.asarray(times, jnp.float32)
    mask = jnp.asarray(mask, jnp.float32)
    Mint = jnp.asarray(Mint, jnp.float32)
    Mext = jnp.asarray(Mext, jnp.float32)
    if key is None:
        key = jax.random.PRNGKey(0)
    if n_frames is None:
        t_max = float(jnp.max(jnp.where(mask > 0, times, 0.0)))
        n_frames = max(int(t_max * FPS) + 2, 16)

    inits = default_inits(key, obs, times, mask, Mint, Mext, n_starts)
    if init_state is not None:
        seed = BallState(*(jnp.atleast_2d(jnp.asarray(a, jnp.float32))
                           for a in init_state))
        k = seed.r.shape[0]
        # seeded starts replace the first k sampled ones, plus spin-flipped
        # copies of the first seed (the sign is the hard part)
        inits = BallState(
            r=inits.r.at[:k].set(seed.r),
            v=inits.v.at[:k].set(seed.v),
            w=inits.w.at[:k].set(seed.w),
        )
        if n_starts >= k + 1:
            inits = BallState(
                r=inits.r.at[k].set(seed.r[0]),
                v=inits.v.at[k].set(seed.v[0]),
                w=inits.w.at[k].set(-seed.w[0]),
            )

    q0 = _state_to_params(inits)
    seed_q = (_state_to_params(BallState(*(jnp.asarray(a[0] if jnp.ndim(a) > 1
                                            else a, jnp.float32)
                                           for a in init_state)))
              if init_state is not None else None)
    return _run_fit(
        q0, obs, times, mask, Mint, Mext, n_frames=n_frames,
        substeps=substeps, dt=dt, adam_steps=adam_steps, lm_steps=lm_steps,
        lr=lr, huber_px=huber_px, seed_q=seed_q, seed_rel=seed_select_rel,
    )


def fit_trajectory_batch(
    obs: jnp.ndarray,
    times: jnp.ndarray,
    mask: jnp.ndarray,
    Mint: jnp.ndarray,
    Mext: jnp.ndarray,
    *,
    n_frames: int,
    key: Optional[jax.Array] = None,
    n_starts: int = 32,
    adam_steps: int = 250,
    lm_steps: int = 12,
    lr: float = 0.03,
    substeps: int = int(round(1.0 / (FPS * DT))),
    dt: float = DT,
    huber_px: Optional[float] = None,
    init_state: Optional[BallState] = None,
    seed_select_rel: float = 1.3,
) -> FitResult:
    """Fit a whole batch of rallies in one program: obs (B, T, 2), times
    (B, T), mask (B, T), Mint (B, 3, 3), Mext (B, 4, 4). `n_frames` must be
    given (static) and cover every rally's max visible time. All B * n_starts
    hypotheses integrate together — the eval protocol's trajectory set runs
    as one vmapped program instead of a per-rally loop. `init_state` (fields
    (B, 3)) seeds one start per rally with an external prediction (+ a
    spin-flipped copy) — the hybrid mode of `fit_trajectory`,
    batched; winning starts then use the seed-aware robust selection of
    `fit_trajectory` (`seed_select_rel`). Returns a FitResult of batched
    arrays (leading dim B)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    obs = jnp.asarray(obs, jnp.float32)
    times = jnp.asarray(times, jnp.float32)
    mask = jnp.asarray(mask, jnp.float32)
    Mint = jnp.asarray(Mint, jnp.float32)
    Mext = jnp.asarray(Mext, jnp.float32)
    B = obs.shape[0]
    keys = jax.random.split(key, B)
    inits = jax.vmap(
        lambda k, o, t, m, Ki, Ke: default_inits(k, o, t, m, Ki, Ke, n_starts)
    )(keys, obs, times, mask, Mint, Mext)
    if init_state is not None:
        seed = BallState(*(jnp.asarray(a, jnp.float32) for a in init_state))
        inits = BallState(
            r=inits.r.at[:, 0].set(seed.r),
            v=inits.v.at[:, 0].set(seed.v),
            w=inits.w.at[:, 0].set(seed.w),
        )
        if n_starts >= 2:  # spin sign is the hard part: seed the flip too
            inits = BallState(
                r=inits.r.at[:, 1].set(seed.r),
                v=inits.v.at[:, 1].set(seed.v),
                w=inits.w.at[:, 1].set(-seed.w),
            )
    q0 = _state_to_params(inits)  # (B, S, 9)
    run = partial(
        _run_fit, n_frames=n_frames, substeps=substeps, dt=dt,
        adam_steps=adam_steps, lm_steps=lm_steps, lr=lr, huber_px=huber_px,
    )
    if init_state is not None:
        seed_q = _state_to_params(seed)  # (B, 9)
        return jax.vmap(
            lambda q, o, t, m, Ki, Ke, s: run(
                q, o, t, m, Ki, Ke, seed_q=s, seed_rel=seed_select_rel)
        )(q0, obs, times, mask, Mint, Mext, seed_q)
    return jax.vmap(run)(q0, obs, times, mask, Mint, Mext)


def spin_class_from_fit(result: FitResult) -> jnp.ndarray:
    """Paper spin label from a fit: 1.0 if the LOCAL-frame w_y of the fitted
    initial spin is positive else 2.0 (the make_synthetic_ttst / reference
    convention, ref: extract_ttst_data.py + uplifting/helper.py:394-420)."""
    w_local = G.transform_rotation_axes(result.state0.w, result.r_world)
    return jnp.where(w_local[..., 1] > 0, 1.0, 2.0)
