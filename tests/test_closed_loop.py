"""Closed-loop synthetic pipeline-accuracy protocol (VERDICT round-1 #3).

Pins the WIRING of eval/closed_loop.py at toy sizes: physics -> on-device
rendering -> detector training on the rendered stream -> full pipeline
(detect, dual-model filter, DBSCAN fusion, RANSAC calibration, uplifting)
-> metrics vs physics ground truth. Accuracy itself needs real training
steps on the chip (see artifacts/closed_loop + README).
"""
import numpy as np

from upliftingtabletennis_tpu.eval import closed_loop as CL


def test_closed_loop_protocol(tmp_path):
    res = CL.main([
        "--out", str(tmp_path), "--train_steps", "2", "--batch_size", "2",
        "--n_eval", "2", "--render_res", "192", "112",
        # keep the physics-fit arm enabled so its wiring is exercised, but
        # tiny (it only actually runs when RANSAC calibration succeeds)
        "--physfit_starts", "2", "--physfit_adam_steps", "3",
        "--physfit_lm_steps", "1",
    ])
    assert res["n_rallies"] == 2
    # every metric field exists; values are finite when produced
    for k in ("ball_detection_px_mean", "table_detection_px_mean",
              "pos3d_err_cm_mean"):
        assert k in res
        if res[k] is not None:
            assert np.isfinite(res[k])
    assert (tmp_path / "closed_loop_results.json").exists()
    assert (tmp_path / "ball_detector").exists()
    assert (tmp_path / "table_detector").exists()
    # physfit sample counts are always reported; when enough rallies pass
    # the calibration gate, the convergence-gated view must ride along
    assert "physfit_n_rallies" in res
    if res["physfit_n_rallies"] >= 8:
        assert "physfit_coverage" in res
        assert "physfit_pos3d_err_cm_median_converged" in res


def test_ema_debiasing_exact_for_constant_params():
    """Regression for the stale-EMA bug: with the old params-initialized EMA,
    decay**t of the RANDOM init stayed blended into the saved weights (30%
    at 1200 steps). The zero-init + debias scheme recovers constant params
    EXACTLY at any step count."""
    import jax
    import jax.numpy as jnp

    p = {"w": jnp.asarray([1.5, -2.0]), "b": jnp.asarray(0.25)}
    for t in (1, 3, 50):
        ema = jax.tree.map(jnp.zeros_like, p)
        for _ in range(t):
            ema = CL.ema_update(ema, p)
        out = CL.ema_finalize(ema, t)
        for k in p:
            np.testing.assert_allclose(np.asarray(out[k]), np.asarray(p[k]),
                                       rtol=1e-5)


def test_ema_decay_scales_with_run_length():
    """Short closed-loop runs must not average over the whole (still fast-
    improving) trajectory: the horizon caps at ~10% of the run, and long
    runs keep the reference trainers' 0.999."""
    assert CL.ema_decay_for(1_000_000) == 0.999
    assert CL.ema_decay_for(150) == 1.0 - 10.0 / 150.0
    assert 0.0 < CL.ema_decay_for(1) <= 0.5


def test_render_rally_shapes_and_determinism():
    import jax
    import jax.numpy as jnp

    from upliftingtabletennis_tpu.data.render_rally import render_frames, rescale_px

    key = jax.random.PRNGKey(0)
    ball = jnp.asarray([[60.0, 40.0], [80.0, 42.0], [-50.0, 10.0]])
    vis = jnp.asarray([1.0, 1.0, 0.0])
    table = jnp.asarray(np.random.default_rng(0).uniform(10, 100, (13, 2)), jnp.float32)
    f = render_frames(key, ball, vis, table, height=72, width=128)
    assert f.shape == (3, 72, 128, 3) and f.dtype == np.uint8
    f2 = render_frames(key, ball, vis, table, height=72, width=128)
    np.testing.assert_array_equal(np.asarray(f), np.asarray(f2))
    # invisible ball renders no blob: frames 1 and 2 differ only by noise
    # around the ball site; check the ball pixel is bright in frame 0
    assert int(f[0, 40, 60].max()) > int(f[2, 40, 60].max())

    # pixel-center rescale round-trip
    c = jnp.asarray([[10.0, 20.0]])
    r = rescale_px(rescale_px(c, (1920, 1080), (960, 540)), (960, 540), (1920, 1080))
    np.testing.assert_allclose(np.asarray(r), np.asarray(c), atol=1e-4)


def test_render_rally_context_breaks_mirror_symmetry():
    """The scene context (floor + asymmetric umpire/banner quads) must make
    keypoint IDENTITY decidable from the image: a camera mirrored across the
    net plane sees a genuinely different frame, not the mirror image that
    made the round-2/3 table detectors collapse to 200+ px identity errors."""
    import jax
    import jax.numpy as jnp

    from upliftingtabletennis_tpu.core.geometry import TABLE_POINTS, world2img
    from upliftingtabletennis_tpu.data.render_rally import (
        CONTEXT_QUADS_WORLD,
        project_context,
        render_frames,
    )
    from upliftingtabletennis_tpu.data.synthetic import sample_cameras

    key = jax.random.PRNGKey(3)
    Mint, Mext = sample_cameras(key, ())
    table_px = world2img(jnp.asarray(TABLE_POINTS), Mext, Mint)
    ctx = project_context(Mint, Mext)
    assert ctx.shape == (3, 4, 2)
    # both asymmetric markers sit on the floor near the table -> every vertex
    # must land in front of the camera with finite pixel coords
    assert bool(jnp.all(jnp.isfinite(ctx)))

    W, H = 256, 144
    sx, sy = W / 2560.0, H / 1440.0
    scale = jnp.asarray([sx, sy])
    ball = jnp.asarray([[-100.0, -100.0]])
    vis = jnp.asarray([0.0])
    f = render_frames(jax.random.PRNGKey(0), ball, vis, table_px * scale,
                      height=H, width=W, context_px=ctx * scale)
    # mirror the WORLD across the net plane (x -> -x): table projects
    # identically up to keypoint relabeling, but the banner quad moves
    mirror = jnp.asarray([-1.0, 1.0, 1.0])
    tp_m = world2img(jnp.asarray(TABLE_POINTS) * mirror, Mext, Mint)
    ctx_m = world2img(
        jnp.asarray(CONTEXT_QUADS_WORLD.reshape(12, 3)) * mirror,
        Mext[None], Mint[None],
    ).reshape(3, 4, 2)
    f_m = render_frames(jax.random.PRNGKey(0), ball, vis, tp_m * scale,
                        height=H, width=W, context_px=ctx_m * scale)
    # the x-mirrored scene renders the banner elsewhere -> frames differ in
    # many pixels (a context-free render would be near-identical: the table
    # point set is x-mirror symmetric)
    diff = np.mean(np.any(np.asarray(f) != np.asarray(f_m), axis=-1))
    assert diff > 0.005, diff
    # colored markers present: red channel exceeds blue somewhere (umpire
    # quad) and blue exceeds red somewhere (banner quad)
    fi = np.asarray(f, np.int32)
    assert (fi[..., 0] - fi[..., 2]).max() > 20
    assert (fi[..., 2] - fi[..., 0]).max() > 20
