"""NMS tests: C++ extension and Pallas/JAX kernel vs the reference algorithm."""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")


def _ref_greedy_nms(dets, thresh):
    """Pure-python reimplementation of cpu_nms.pyx semantics (oracle)."""
    x1, y1, x2, y2, scores = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3], dets[:, 4]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    suppressed = np.zeros(len(dets), bool)
    keep = []
    for _i in range(len(dets)):
        i = order[_i]
        if suppressed[i]:
            continue
        keep.append(int(i))
        for _j in range(_i + 1, len(dets)):
            j = order[_j]
            if suppressed[j]:
                continue
            xx1, yy1 = max(x1[i], x1[j]), max(y1[i], y1[j])
            xx2, yy2 = min(x2[i], x2[j]), min(y2[i], y2[j])
            w, h = max(0.0, xx2 - xx1 + 1), max(0.0, yy2 - yy1 + 1)
            inter = w * h
            if inter / (areas[i] + areas[j] - inter) >= thresh:
                suppressed[j] = True
    return keep


def _random_dets(rng, n):
    x1 = rng.uniform(0, 800, n)
    y1 = rng.uniform(0, 500, n)
    w = rng.uniform(10, 200, n)
    h = rng.uniform(10, 200, n)
    s = rng.uniform(0, 1, n)
    return np.stack([x1, y1, x1 + w, y1 + h, s], -1).astype(np.float32)


def test_cpp_nms_matches_oracle():
    from native.build import cpu_nms

    rng = np.random.default_rng(0)
    for n in (1, 7, 60, 300):
        dets = _random_dets(rng, n)
        for thresh in (0.3, 0.5, 0.7):
            assert cpu_nms(dets, thresh) == _ref_greedy_nms(dets, thresh)


@pytest.mark.parametrize("use_pallas", [False])
def test_jax_nms_matches_oracle(use_pallas):
    from upliftingtabletennis_tpu.ops.nms import nms

    rng = np.random.default_rng(1)
    for n in (1, 13, 130, 400):
        dets = _random_dets(rng, n)
        for thresh in (0.3, 0.5):
            got = nms(dets, thresh, use_pallas=use_pallas)
            assert got == _ref_greedy_nms(dets, thresh), (n, thresh)


def test_pallas_overlap_matrix_interpret():
    """Pallas kernel (interpret mode on CPU) == dense XLA overlap matrix."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from upliftingtabletennis_tpu.ops import nms as N

    rng = np.random.default_rng(2)
    dets = _random_dets(rng, 100)
    N8 = 128
    padded = np.zeros((N8, 8), np.float32)
    padded[:, :4] = -1e9
    padded[:100, :5] = dets

    out = pl.pallas_call(
        N._iou_tile_kernel,
        out_shape=jax.ShapeDtypeStruct((N8, N8), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(1, 1),
            in_specs=[
                pl.BlockSpec((N.TILE, 8), lambda i, j: (i, 0)),
                pl.BlockSpec((N.TILE, 8), lambda i, j: (j, 0)),
                pl.BlockSpec(memory_space=None),
            ],
            out_specs=pl.BlockSpec((N.TILE, N.TILE), lambda i, j: (i, j)),
        ),
        interpret=True,
    )(jnp.asarray(padded), jnp.asarray(padded), jnp.asarray([0.5], jnp.float32))

    b = padded
    x1 = np.maximum(b[:, None, 0], b[None, :, 0])
    y1 = np.maximum(b[:, None, 1], b[None, :, 1])
    x2 = np.minimum(b[:, None, 2], b[None, :, 2])
    y2 = np.minimum(b[:, None, 3], b[None, :, 3])
    inter = np.maximum(x2 - x1 + 1, 0) * np.maximum(y2 - y1 + 1, 0)
    area = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    ref = (inter / (area[:, None] + area[None, :] - inter) >= 0.5).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_oks_nms_basic():
    from upliftingtabletennis_tpu.ops.nms import oks_nms

    rng = np.random.default_rng(3)
    kp1 = rng.uniform(0, 100, (17, 3))
    kp1[:, 2] = 1
    kp2 = kp1 + rng.normal(0, 0.5, (17, 3))  # near-duplicate
    kp3 = kp1 + 500  # far away
    db = [
        {"keypoints": kp1, "score": 0.9, "area": 1000.0},
        {"keypoints": kp2, "score": 0.8, "area": 1000.0},
        {"keypoints": kp3, "score": 0.7, "area": 1000.0},
    ]
    keep = oks_nms(db, thr=0.5)
    assert 0 in keep and 2 in keep and 1 not in keep


def test_oks_iou_vectorized_matches_reference_loop():
    """The vectorized oks_iou must match the reference's per-candidate loop
    (ref: vit_pose/vit_utils/nms/nms.py oks_iou)."""
    from upliftingtabletennis_tpu.ops.nms import COCO_SIGMAS, oks_iou

    rng = np.random.default_rng(0)
    K = 17
    g = rng.uniform(0, 100, 3 * K)
    d = rng.uniform(0, 100, (5, 3 * K))
    a_g, a_d = 50.0, rng.uniform(30, 80, 5)

    def ref_loop(g, d, a_g, a_d, vis_thr=None):
        vars_ = (COCO_SIGMAS * 2) ** 2
        xg, yg, vg = g[0::3], g[1::3], g[2::3]
        ious = np.zeros(len(d))
        for n_d in range(len(d)):
            xd, yd, vd = d[n_d, 0::3], d[n_d, 1::3], d[n_d, 2::3]
            e = ((xd - xg) ** 2 + (yd - yg) ** 2) / vars_ / ((a_g + a_d[n_d]) / 2 + np.spacing(1)) / 2
            if vis_thr is not None:
                ind = (vg > vis_thr) & (vd > vis_thr)
                e = e[ind]
            ious[n_d] = np.sum(np.exp(-e)) / len(e) if len(e) else 0.0
        return ious

    np.testing.assert_allclose(oks_iou(g, d, a_g, a_d), ref_loop(g, d, a_g, a_d), rtol=1e-10)
    np.testing.assert_allclose(
        oks_iou(g, d, a_g, a_d, vis_thr=50.0), ref_loop(g, d, a_g, a_d, vis_thr=50.0), rtol=1e-10
    )


def test_soft_oks_nms():
    """Soft NMS keeps the top pose, decays overlapping poses, and orders by
    decayed score (ref: vit_pose/vit_utils/nms/nms.py:137-177)."""
    from upliftingtabletennis_tpu.ops.nms import soft_oks_nms

    rng = np.random.default_rng(1)
    K = 17
    base = rng.uniform(20, 80, (K, 3))
    near = base + rng.normal(0, 0.5, (K, 3))  # near-duplicate of base
    far = base + 500.0
    db = [
        {"score": 0.9, "keypoints": base, "area": 100.0},
        {"score": 0.8, "keypoints": near, "area": 100.0},
        {"score": 0.5, "keypoints": far, "area": 100.0},
    ]
    keep = soft_oks_nms(db, thresh=0.3)
    assert keep[0] == 0
    # the far pose keeps its score; the near-duplicate is decayed below it
    assert keep.index(2) < keep.index(1)
    assert set(keep) == {0, 1, 2}  # soft NMS never hard-drops (within max_dets)
