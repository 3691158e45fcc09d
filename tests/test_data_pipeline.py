"""Tests for datagen validation rules, batch assembly, and augmentations."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from upliftingtabletennis_tpu.data import datagen as DG
from upliftingtabletennis_tpu.data import synthetic as SYN
from upliftingtabletennis_tpu.data.augment import (
    AugmentConfig,
    normalize_img_coords,
    random_missing,
    random_stop,
    train_augment,
)
from upliftingtabletennis_tpu.core.geometry import TABLE_LENGTH, TABLE_WIDTH, TABLE_HEIGHT


def _np_count_hits(positions, direction):
    """Independent numpy re-implementation of the reference's _count_hits
    (ref: syntheticdataset/helper.py:282-321) used as an oracle."""
    hits = {"opponent": [], "own": [], "ground": []}
    x, y, z = positions[:, 0], positions[:, 1], positions[:, 2]
    if direction == "left_to_right":
        opp = (-0.01 > x) & (x > -TABLE_LENGTH / 2)
        own = (TABLE_LENGTH / 2 > x) & (x > 0.01)
    else:
        opp = (TABLE_LENGTH / 2 > x) & (x > 0.01)
        own = (-0.01 > x) & (x > -TABLE_LENGTH / 2)
    low = z < TABLE_HEIGHT + 0.04
    ony = np.abs(y) < TABLE_WIDTH / 2
    masks = {"opponent": low & ony & opp, "own": low & ony & own, "ground": z <= 0.08}
    for name, m in masks.items():
        start = None
        for i, b in enumerate(m):
            if b and (i == 0 or not m[i - 1]):
                start = i
            if not b and i != 0 and m[i - 1]:
                end = i - 1
                t = 0.75 * (end + start) / 2 / 500 + 0.25 * (np.argmin(z[start : end + 1]) + start) / 500
                hits[name].append(t)
    return hits


@pytest.mark.parametrize(
    "mode,direction",
    [("intermediate", "left_to_right"), ("intermediate", "right_to_left"), ("first_long", "left_to_right")],
)
def test_datagen_accepted_satisfy_oracle(mode, direction):
    key = jax.random.PRNGKey(0)
    c = DG.generate_candidates(key, 256, mode, direction)
    acc = np.asarray(c["accept"])
    assert acc.any(), "no accepted trajectories in 256 candidates"
    pos = np.asarray(c["positions"])
    fv = np.asarray(c["frame_valid"])
    sig = DG.BOUNCE_SIGNATURE[mode]
    for i in np.nonzero(acc)[0][:10]:
        n = int(fv[i].sum())
        hits = _np_count_hits(pos[i, :n], direction)
        assert len(hits["opponent"]) == sig[0], (i, hits)
        assert len(hits["own"]) == sig[1]
        assert len(hits["ground"]) == sig[2]
        # max height rule
        zmax = pos[i, :n, 2].max()
        assert zmax <= (1.4 if "first" in mode else 1.8) + 1e-6
        # min length
        assert n >= DG.MIN_TRAJ_LEN_FRAMES


def test_datagen_deterministic():
    key = jax.random.PRNGKey(7)
    a = DG.generate_candidates(key, 32, "intermediate", "left_to_right")
    b = DG.generate_candidates(key, 32, "intermediate", "left_to_right")
    np.testing.assert_array_equal(np.asarray(a["accept"]), np.asarray(b["accept"]))
    np.testing.assert_allclose(np.asarray(a["positions"]), np.asarray(b["positions"]))


@pytest.fixture(scope="module")
def small_store():
    key = jax.random.PRNGKey(1)
    res = DG.generate_dataset(key, 24, "intermediate", "left_to_right", batch=128)
    return jax.tree.map(jnp.asarray, SYN.store_from_datagen(res))


def test_assemble_batch_train(small_store):
    idx = jnp.arange(16) % len(small_store.rotations)
    s = SYN.assemble_batch(jax.random.PRNGKey(0), small_store, idx, train=True)
    B = 16
    assert s["r_img"].shape == (B, 50, 2)
    mask = np.asarray(s["mask"]).astype(bool)
    assert mask.any(1).all(), "every trajectory needs valid frames"
    # masked r_img inside image for valid-camera rows (the sampler retries
    # 100 cameras; at least most rows should be in-frame)
    r = np.asarray(s["r_img"])
    inside = ((r >= 0) & (r < np.asarray([2560, 1440]))).all(-1)
    frac = (inside | ~mask).mean()
    assert frac > 0.95, frac
    # times strictly increasing where valid
    t = np.asarray(s["times"])
    for b in range(B):
        tv = t[b][mask[b]]
        assert np.all(np.diff(tv) > 0)


def test_assemble_batch_eval_matches_sim_camera(small_store):
    """Eval batches project through the stored sim camera; reprojecting the
    ground-truth r_world must reproduce r_img exactly."""
    from upliftingtabletennis_tpu.core.geometry import world2img

    idx = jnp.arange(8) % len(small_store.rotations)
    s = SYN.assemble_batch(jax.random.PRNGKey(0), small_store, idx, train=False)
    mask = np.asarray(s["mask"]).astype(bool)
    reproj = world2img(s["r_world"], s["Mext"][:, None], s["Mint"][:, None])
    d = np.abs(np.asarray(reproj) - np.asarray(s["r_img"]))[mask]
    assert d.max() < 1e-2


def test_random_missing_compacts(small_store):
    idx = jnp.arange(8) % len(small_store.rotations)
    s = SYN.assemble_batch(jax.random.PRNGKey(0), small_store, idx, train=False)
    out = random_missing(jax.random.PRNGKey(3), s, 0.3)
    m_in = np.asarray(s["mask"]).astype(bool)
    m_out = np.asarray(out["mask"]).astype(bool)
    assert (m_out.sum(1) <= m_in.sum(1)).all()
    # left-compacted: mask is a prefix
    for b in range(m_out.shape[0]):
        n = m_out[b].sum()
        assert m_out[b, :n].all() and not m_out[b, n:].any()
        # surviving times are a subsequence of the original times, in order
        t_in = np.asarray(s["times"])[b][m_in[b]]
        t_out = np.asarray(out["times"])[b][m_out[b]]
        assert np.all(np.isin(np.round(t_out, 5), np.round(t_in, 5)))
        assert np.all(np.diff(t_out) > 0)


def test_random_stop_truncates_after_bounce(small_store):
    idx = jnp.arange(8) % len(small_store.rotations)
    s = SYN.assemble_batch(jax.random.PRNGKey(0), small_store, idx, train=False)
    out = random_stop(jax.random.PRNGKey(5), s, 1.0)  # always stop
    m_in = np.asarray(s["mask"]).astype(bool)
    m_out = np.asarray(out["mask"]).astype(bool)
    times = np.asarray(s["times"])
    hits = np.asarray(s["hits"])[:, 0]
    for b in range(8):
        if hits[b] <= 0:
            np.testing.assert_array_equal(m_out[b], m_in[b])
            continue
        hit_ind = np.argmin(np.abs(np.where(m_in[b], times[b], 1e6) - hits[b]))
        n = m_out[b].sum()
        if m_in[b].sum() - hit_ind >= 4:  # enough room to stop
            assert n >= hit_ind + 4
            assert n <= m_in[b].sum()


def test_full_train_augment_finite(small_store):
    idx = jnp.arange(16) % len(small_store.rotations)
    s = SYN.assemble_batch(jax.random.PRNGKey(2), small_store, idx, train=True)
    out = train_augment(jax.random.PRNGKey(4), s, AugmentConfig())
    for k, v in out.items():
        assert np.all(np.isfinite(np.asarray(v))), k
    r = np.asarray(out["r_img"])
    m = np.asarray(out["mask"]).astype(bool)
    assert np.abs(r[m]).max() < 2.0  # normalized coords (plus noise slack)


def test_train_step_reduces_loss(small_store):
    from upliftingtabletennis_tpu.models import get_uplifting_model
    from upliftingtabletennis_tpu.train.uplifting_train import (
        Batch,
        create_train_state,
        make_train_step,
    )
    from upliftingtabletennis_tpu.data.augment import eval_augment

    idx = jnp.arange(16) % len(small_store.rotations)
    s = eval_augment(SYN.assemble_batch(jax.random.PRNGKey(0), small_store, idx, train=False))
    batch = Batch(
        ball_img=s["r_img"], table_img=s["table_img"], mask=s["mask"],
        r_world=s["r_world"], rotation=s["rotation"], times=s["times"],
    )
    model = get_uplifting_model("connectstage", "small", mode="dynamic")
    state, tx = create_train_state(model, jax.random.PRNGKey(0), batch, lr=1e-3)
    step = make_train_step(model, tx)
    first = None
    for i in range(60):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last)
    # the rotation loss has scale ~|omega| (hundreds of rad/s), so even
    # overfitting a fixed batch moves slowly — require a clear downward trend
    assert last < first * 0.9, (first, last)
    # EMA trails the online params
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, state.ema_params)
    assert max(jax.tree.leaves(d)) > 0


def test_back_view_camera_enrichment():
    """back_frac > 0 draws cameras from behind-the-table azimuths (TT3D
    back-view enrichment, VERDICT r4 #4) while keeping every projected
    track in frame; back_frac=0 reproduces the reference's one-side prior
    (phi in (29, 209) deg, ref data.py:60-64)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from upliftingtabletennis_tpu.data import synthetic as SYN

    key = jax.random.PRNGKey(3)
    Mint, Mext = SYN.sample_cameras(key, (256,), back_frac=0.5)
    R, t = np.asarray(Mext)[:, :3, :3], np.asarray(Mext)[:, :3, 3]
    c = -np.einsum("bij,bi->bj", R, t)
    phi = np.rad2deg(np.arctan2(c[:, 1], c[:, 0]))
    # "back" = within the table corner angle of either length-axis end
    phi0 = SYN._PHI0
    is_back = (np.abs(phi) < phi0) | (np.abs(np.abs(phi) - 180.0) < phi0)
    assert 0.3 < is_back.mean() < 0.7  # ~back_frac plus side-range overlap
    Mint0, Mext0 = SYN.sample_cameras(key, (256,), back_frac=0.0)
    c0 = -np.einsum(
        "bij,bi->bj", np.asarray(Mext0)[:, :3, :3], np.asarray(Mext0)[:, :3, 3]
    )
    phi_0 = np.rad2deg(np.arctan2(c0[:, 1], c0[:, 0])) % 360.0
    assert (phi_0 > phi0 - 1).all() and (phi_0 < 180 + phi0 + 1).all()
