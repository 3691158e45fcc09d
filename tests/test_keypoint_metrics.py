"""Parity tests: eval/keypoint_metrics vs the vendored mmpose originals.

Each test drives the vectorized jnp port and the reference numpy
implementation (vit_pose/vit_utils/top_down_eval.py) with the same random
inputs — including the quirk cases: zero rows in `normalize`, keypoints
with no valid samples, and nonpositive heatmap maxima.
"""
import numpy as np
import pytest

from upliftingtabletennis_tpu.eval import keypoint_metrics as km


@pytest.fixture(scope="module")
def ref(reference_path):
    import sys

    sys.path.insert(0, str(reference_path / "vit_pose"))
    from vit_utils import top_down_eval

    return top_down_eval


def _rand_case(rng, N=7, K=5, D=2, zero_norm_row=True, dead_keypoint=True):
    pred = rng.normal(size=(N, K, D)).astype(np.float32) * 10
    gt = rng.normal(size=(N, K, D)).astype(np.float32) * 10
    mask = rng.random((N, K)) > 0.3
    normalize = rng.uniform(0.5, 8.0, size=(N, D)).astype(np.float32)
    if zero_norm_row:
        normalize[1, 0] = 0.0  # whole row must be invalidated
        normalize[2, 1] = -3.0  # clamped to 1e6, row stays valid
    if dead_keypoint:
        mask[:, 3] = False  # keypoint with no valid sample -> acc -1
    return pred, gt, mask, normalize


def test_calc_distances_and_acc_parity(ref):
    rng = np.random.default_rng(0)
    pred, gt, mask, normalize = _rand_case(rng)
    got = np.asarray(km._calc_distances(pred, gt, mask, normalize))
    want = ref._calc_distances(pred.copy(), gt.copy(), mask.copy(), normalize.copy())
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    for thr in (0.05, 0.5, 2.0):
        for k in range(want.shape[0]):
            np.testing.assert_allclose(
                np.asarray(km._distance_acc(got[k], thr)),
                ref._distance_acc(want[k], thr),
                rtol=1e-6,
            )


def test_pck_parity(ref):
    rng = np.random.default_rng(1)
    pred, gt, mask, normalize = _rand_case(rng)
    acc, avg, cnt = km.keypoint_pck_accuracy(pred, gt, mask, 0.7, normalize)
    racc, ravg, rcnt = ref.keypoint_pck_accuracy(
        pred.copy(), gt.copy(), mask.copy(), 0.7, normalize.copy()
    )
    np.testing.assert_allclose(np.asarray(acc), racc, rtol=1e-5)
    assert np.isclose(float(avg), ravg, rtol=1e-5)
    assert int(cnt) == rcnt


def test_pose_pck_from_heatmaps_parity(ref):
    rng = np.random.default_rng(2)
    N, K, H, W = 3, 4, 12, 9
    out = rng.normal(size=(N, K, H, W)).astype(np.float32)
    tgt = rng.normal(size=(N, K, H, W)).astype(np.float32)
    out[0, 1] = -np.abs(out[0, 1])  # nonpositive max -> preds = -1
    mask = rng.random((N, K)) > 0.2
    acc, avg, cnt = km.pose_pck_accuracy(out, tgt, mask)
    racc, ravg, rcnt = ref.pose_pck_accuracy(out.copy(), tgt.copy(), mask.copy())
    np.testing.assert_allclose(np.asarray(acc), racc, rtol=1e-5)
    assert np.isclose(float(avg), ravg, rtol=1e-5)
    assert int(cnt) == rcnt

    p, v = km.get_max_preds(out)
    rp, rv = ref._get_max_preds(out)
    np.testing.assert_allclose(np.asarray(p), rp)
    np.testing.assert_allclose(np.asarray(v), rv)


def test_get_max_preds_3d_parity(ref):
    rng = np.random.default_rng(3)
    vol = rng.normal(size=(2, 3, 4, 5, 6)).astype(np.float32)
    vol[1, 2] = -np.abs(vol[1, 2])
    p, v = km.get_max_preds_3d(vol)
    rp, rv = ref._get_max_preds_3d(vol)
    np.testing.assert_allclose(np.asarray(p), rp)
    np.testing.assert_allclose(np.asarray(v), rv)


def test_auc_nme_epe_parity(ref):
    rng = np.random.default_rng(4)
    pred, gt, mask, normalize = _rand_case(rng, zero_norm_row=False)
    assert np.isclose(
        float(km.keypoint_auc(pred, gt, mask, 6.5)),
        ref.keypoint_auc(pred.copy(), gt.copy(), mask.copy(), 6.5),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(km.keypoint_nme(pred, gt, mask, normalize)),
        ref.keypoint_nme(pred.copy(), gt.copy(), mask.copy(), normalize.copy()),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(km.keypoint_epe(pred, gt, mask)),
        ref.keypoint_epe(pred.copy(), gt.copy(), mask.copy()),
        rtol=1e-5,
    )
