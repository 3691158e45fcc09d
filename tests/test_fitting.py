"""Differentiable-physics trajectory/spin fitting (core/fitting.py).

No reference counterpart (MuJoCo is not differentiable) — these tests pin
the capability against the physics simulator itself: trajectories with a
table bounce are projected through a broadcast-like camera and must be
recovered from the 2D track alone.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from upliftingtabletennis_tpu.core import fitting as F
from upliftingtabletennis_tpu.core import geometry as G
from upliftingtabletennis_tpu.core.physics import BallState, simulate

N_FRAMES = 250  # 0.5 s horizon — covers the bounce at ~0.25 s


def _camera():
    """Broadcast-like view from behind the table (sim-camera intrinsics,
    ref: syntheticdataset/helper.py:14-50)."""
    c = jnp.array([0.0, -9.0, 2.2])
    look = jnp.array([0.0, 0.0, 0.9])
    f = (look - c) / jnp.linalg.norm(look - c)
    r = jnp.cross(f, jnp.array([0.0, 0.0, 1.0]))
    r = r / jnp.linalg.norm(r)
    Mext = G.get_Mext(c, f, r)
    Mint = jnp.array([[2033.0, 0, 960.0], [0, 2180.0, 540.0], [0, 0, 1.0]])
    return Mint, Mext


def _observe(state0, n_obs=24, stride=10):
    """Simulate and project onto a 50 fps observation grid."""
    traj = simulate(state0, N_FRAMES, 2)
    idx = jnp.arange(n_obs) * stride
    times = idx / 500.0
    Mint, Mext = _camera()
    obs = G.world2img(traj.r[idx], Mext, Mint)
    return obs, times, traj.r[idx], Mint, Mext


GT_TOP = BallState(
    r=jnp.array([-1.1, 0.25, 1.05]),
    v=jnp.array([7.0, -0.6, 0.8]),
    w=jnp.array([5.0, 90.0, -15.0]),  # topspin: local w_y > 0
)
GT_BACK = BallState(
    r=jnp.array([-1.0, -0.2, 1.2]),
    v=jnp.array([7.0, 0.4, -0.6]),
    w=jnp.array([-10.0, -100.0, 15.0]),  # backspin; clears the net,
    # bounces on the far table half at ~0.32 s
)


@pytest.fixture(scope="module")
def batch_fit():
    """One compiled program fits a topspin and a backspin trajectory."""
    obs_t, times, gt3_t, Mint, Mext = _observe(GT_TOP)
    obs_b, _, gt3_b, _, _ = _observe(GT_BACK)
    obs = jnp.stack([obs_t, obs_b])
    res = F.fit_trajectory_batch(
        obs, jnp.stack([times, times]), jnp.ones((2, obs.shape[1])),
        jnp.stack([Mint, Mint]), jnp.stack([Mext, Mext]),
        n_frames=N_FRAMES, n_starts=24, adam_steps=250, lm_steps=10,
        key=jax.random.PRNGKey(1),
    )
    return res, np.stack([np.asarray(gt3_t), np.asarray(gt3_b)])


def test_recovers_3d_trajectory(batch_fit):
    res, gt3 = batch_fit
    err_cm = 100 * np.linalg.norm(np.asarray(res.r_world) - gt3, axis=-1)
    assert np.isfinite(np.asarray(res.loss)).all()
    # noiseless observations: the 3D flight is pinned to a few cm
    assert err_cm.mean() < 12.0, err_cm.mean()
    assert float(np.max(np.asarray(res.loss))) < 5.0  # px^2
    # the GT-free convergence gate: on noiseless tracks a converged fit's
    # reprojection residual sits well inside the default 3 px gate
    reproj = np.asarray(res.reproj_px)
    assert reproj.shape == (2,)
    assert (reproj < 3.0).all(), reproj


def test_recovers_spin_class(batch_fit):
    res, _ = batch_fit
    cls = np.asarray(F.spin_class_from_fit(res))
    assert cls[0] == 1.0  # topspin
    assert cls[1] == 2.0  # backspin
    # the class-defining local w_y is quantitatively close
    w_local = np.asarray(
        G.transform_rotation_axes(res.state0.w, res.r_world))
    gt_top_local = np.asarray(G.transform_rotation_axes(
        GT_TOP.w, res.r_world[0]))
    assert abs(w_local[0, 1] - gt_top_local[1]) < 60.0


def test_velocity_recovered(batch_fit):
    res, _ = batch_fit
    v = np.asarray(res.state0.v)
    assert np.linalg.norm(v[0] - np.asarray(GT_TOP.v)) < 0.8
    assert np.linalg.norm(v[1] - np.asarray(GT_BACK.v)) < 0.8


def test_positions_at_times_interpolates():
    traj_r = jnp.arange(10, dtype=jnp.float32)[:, None] * jnp.ones((1, 3))
    # grid frame k at k/500 s; query halfway between frames 2 and 3
    out = F.positions_at_times(traj_r, jnp.array([2.5 / 500.0]))
    np.testing.assert_allclose(np.asarray(out), 2.5 * np.ones((1, 3)), atol=1e-6)


def test_default_inits_plausible():
    obs, times, _, Mint, Mext = _observe(GT_TOP)
    inits = F.default_inits(jax.random.PRNGKey(0), obs, times,
                            jnp.ones(obs.shape[0]), Mint, Mext, 8)
    r0 = np.asarray(inits.r)
    v = np.asarray(inits.v)
    assert r0.shape == (8, 3) and np.isfinite(r0).all()
    # heights within the sampled flight band, speeds physical
    assert (np.linalg.norm(v, axis=-1) <= 32.0 + 1e-3).all()
    # at least one start lands near the true initial position
    d = np.linalg.norm(r0 - np.asarray(GT_TOP.r), axis=-1)
    assert d.min() < 1.0, d


def test_pipeline_fit_physics_warm_start():
    """The public fit_physics polish path: seeded with a perturbed truth it
    converges tightly with a small search budget."""
    from upliftingtabletennis_tpu.pipeline.interface import TableTennisPipeline

    obs, times, gt3, Mint, Mext = _observe(GT_TOP)
    spin_local = G.transform_rotation_axes(GT_TOP.w, jnp.asarray(gt3))
    pos3d = np.asarray(gt3) + 0.02 * np.random.default_rng(0).normal(
        size=gt3.shape
    ).astype(np.float32)
    pipe = TableTennisPipeline.__new__(TableTennisPipeline)
    spin_fit, pos_fit, res = pipe.fit_physics(
        np.asarray(obs), np.asarray(times), np.asarray(Mint), np.asarray(Mext),
        init=(np.asarray(spin_local), pos3d),
        n_starts=6, adam_steps=60, lm_steps=8,
    )
    err_cm = 100 * np.linalg.norm(pos_fit - np.asarray(gt3), axis=-1)
    assert err_cm.mean() < 10.0, err_cm.mean()
    assert spin_fit.shape == (3,)
    assert np.sign(spin_fit[1]) == np.sign(np.asarray(spin_local)[1])


def test_batch_fit_with_init_state():
    """Batched physics-polish mode: an init_state seeded from (perturbed)
    truth lets a tiny search budget converge where random starts could not
    (the hybrid network-init path of run_physics_fit_eval --init_checkpoint)."""
    obs_t, times, gt3_t, Mint, Mext = _observe(GT_TOP)
    obs_b, _, gt3_b, _, _ = _observe(GT_BACK)
    rng = np.random.default_rng(3)
    seed = F.BallState(
        r=jnp.stack([GT_TOP.r, GT_BACK.r]) + 0.03 * rng.normal(size=(2, 3)).astype(np.float32),
        v=jnp.stack([GT_TOP.v, GT_BACK.v]) + 0.15 * rng.normal(size=(2, 3)).astype(np.float32),
        w=jnp.stack([GT_TOP.w, GT_BACK.w]) * 0.7,  # biased spin magnitude
    )
    res = F.fit_trajectory_batch(
        jnp.stack([obs_t, obs_b]), jnp.stack([times, times]),
        jnp.ones((2, obs_t.shape[0])), jnp.stack([Mint, Mint]),
        jnp.stack([Mext, Mext]), n_frames=N_FRAMES,
        n_starts=3, adam_steps=40, lm_steps=6, key=jax.random.PRNGKey(0),
        init_state=seed,
    )
    gt3 = np.stack([np.asarray(gt3_t), np.asarray(gt3_b)])
    err_cm = 100 * np.linalg.norm(np.asarray(res.r_world) - gt3, axis=-1)
    assert err_cm.mean() < 10.0, err_cm.mean()
    cls = np.asarray(F.spin_class_from_fit(res))
    assert cls[0] == 1.0 and cls[1] == 2.0


def test_seed_aware_robust_selection():
    """When several starts tie on final loss, the seeded fit must pick the
    one closest to the seed instead of argmin's arbitrary first index (the
    selection rule that kills the wrong-basin tail in hybrid TT3D fits).
    A fully-masked track makes every in-bounds start's loss identical (0),
    turning selection into a pure tie-break."""
    from upliftingtabletennis_tpu.core.fitting import (
        _run_fit, _state_to_params)

    T = 8
    obs = jnp.zeros((T, 2))
    times = jnp.arange(T, dtype=jnp.float32) / 50.0
    mask = jnp.zeros((T,))  # no data: all starts tie at loss 0
    Mint = jnp.eye(3) * jnp.array([1000.0, 1000.0, 1.0])
    Mext = jnp.eye(4)
    starts = F.BallState(
        r=jnp.array([[-1.0, 0.3, 1.2], [0.5, -0.2, 1.0], [-0.4, 0.1, 1.5]]),
        v=jnp.array([[6.0, 0.0, 2.0], [-4.0, 1.0, 3.0], [5.0, -1.0, 2.5]]),
        w=jnp.array([[0.0, 80.0, 0.0], [0.0, -60.0, 0.0], [30.0, 40.0, 0.0]]),
    )
    q0 = _state_to_params(starts)
    seed_q = _state_to_params(F.BallState(
        r=jnp.array([-0.45, 0.12, 1.48]), v=jnp.array([5.1, -0.9, 2.4]),
        w=jnp.array([28.0, 42.0, 0.0])))  # nearest to start index 2
    kw = dict(n_frames=16, substeps=10, dt=1e-3, adam_steps=0, lm_steps=0,
              lr=0.03, huber_px=None)
    res_plain = _run_fit(q0, obs, times, mask, Mint, Mext, **kw)
    res_seeded = _run_fit(q0, obs, times, mask, Mint, Mext,
                          seed_q=seed_q, seed_rel=1.3, **kw)
    assert int(res_plain.best) == 0          # argmin tie -> first index
    assert int(res_seeded.best) == 2         # robust -> closest to seed
    # and with data present the seeded selection must not override a start
    # whose loss is clearly better (outside the rel band)
    obs2, times2, _, Mint2, Mext2 = _observe(GT_TOP)
    q2 = _state_to_params(F.BallState(
        r=jnp.stack([GT_TOP.r, GT_TOP.r + 2.0]),
        v=jnp.stack([GT_TOP.v, GT_TOP.v * -0.5]),
        w=jnp.stack([GT_TOP.w, GT_TOP.w]),
    ))
    far_seed = _state_to_params(F.BallState(
        r=GT_TOP.r + 2.0, v=GT_TOP.v * -0.5, w=GT_TOP.w))
    # substeps=2 matches _observe's 500 fps save grid — positions_at_times
    # maps observation times assuming frame k sits at k/FPS, so a coarser
    # integration grid here would misalign even the ground-truth start
    res2 = _run_fit(q2, obs2, times2, jnp.ones_like(times2), Mint2, Mext2,
                    seed_q=far_seed, seed_rel=1.3, n_frames=N_FRAMES,
                    substeps=2, dt=1e-3, adam_steps=0, lm_steps=0,
                    lr=0.03, huber_px=None)
    assert int(res2.best) == 0  # truth beats the (bad) seed decisively
