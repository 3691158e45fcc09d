"""Pipeline tests: filters (reference semantics), chunked inference, and the
full TableTennisPipeline wiring on a synthetic rally."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from upliftingtabletennis_tpu.pipeline import filters as F


def test_ball_filter_semantics():
    T = 10
    p1 = np.zeros((T, 3))
    p2 = np.zeros((T, 3))
    p1[:, :2] = 100
    p2[:, :2] = 100
    p1[:, 2] = 1
    p2[:, 2] = 1
    p2[3, :2] = 150  # disagreement > 20 px
    p1[5, 2] = 0  # model 1 invisible
    pos, idx, times = F.filter_trajectory_ball(p1, p2, fps=50)
    assert 3 not in idx and 5 not in idx
    assert len(idx) == T - 2
    np.testing.assert_allclose(times, idx / 50.0)


def test_table_filter_dbscan_outlier():
    T = 20
    rng = np.random.default_rng(0)
    p1 = np.zeros((T, 13, 3))
    p2 = np.zeros((T, 13, 3))
    p1[..., 2] = 1
    p2[..., 2] = 1
    base = rng.uniform(100, 900, (13, 2))
    noise1 = rng.normal(0, 1, (T, 13, 2))
    p1[..., :2] = base + noise1
    p2[..., :2] = base + noise1 + rng.normal(0, 1, (T, 13, 2))
    # keypoint 4: a minority of far-off outliers that still agree pairwise
    p1[:5, 4, :2] = base[4] + 300
    p2[:5, 4, :2] = base[4] + 300 + rng.normal(0, 1, (5, 2))
    # keypoint 7: almost never visible
    p1[:, 7, 2] = 0
    p1[0, 7, 2] = 1
    out = F.filter_trajectory_table(p1, p2)
    assert out.shape == (13, 3)
    d = np.linalg.norm(out[:, :2] - base, axis=1)
    assert d[0] < 2 and d[4] < 5  # outlier cluster rejected by DBSCAN
    assert out[7, 2] == 0  # invisible keypoint


def test_density_labels_matches_sklearn():
    from sklearn.cluster import DBSCAN

    rng = np.random.default_rng(1)
    pts = np.concatenate([rng.normal(0, 2, (20, 2)), rng.normal(50, 2, (8, 2))])
    ref = DBSCAN(eps=10, min_samples=3).fit(pts).labels_
    ours = F._density_labels(pts, 10, 3)
    # same partition up to label permutation
    for lab in set(ours) - {-1}:
        members = ours == lab
        ref_labs = set(ref[members])
        assert len(ref_labs) == 1 and -1 not in ref_labs
    np.testing.assert_array_equal(ours == -1, ref == -1)


def test_uplifting_inputs_padding():
    ball = np.random.default_rng(0).uniform(0, 1000, (30, 2))
    table = np.random.default_rng(1).uniform(0, 1000, (13, 3))
    times = np.arange(30) / 50
    b, t, tt, m = F.uplifting_inputs(ball, table, times, 1920, 1080)
    assert b.shape == (1, 50, 2) and m.shape == (1, 50)
    assert m.sum() == 30
    assert b.max() <= 1.0 and (b[0, 30:] == 0).all()
    assert t[0, :, 0].max() <= 1.0


def test_chunked_detector_inference():
    """T not divisible by chunk: static-shape padding, correct output count."""
    from upliftingtabletennis_tpu.pipeline.interface import BallDetector

    det = BallDetector("wasb", chunk=4)
    det.resolution = (96, 64)
    rng = np.random.default_rng(2)
    triples = [
        tuple(rng.uniform(0, 255, (64, 96, 3)).astype(np.float32) for _ in range(3))
        for _ in range(6)
    ]
    preds, cls = det.predict(triples)
    assert preds.shape == (6, 3)
    assert np.isfinite(preds).all()
    # coordinates live in the 1920x1080 eval space
    assert (preds[:, 0] < 1920.5).all() and (preds[:, 1] < 1080.5).all()


def test_ball_predict_arbitrary_triples():
    """predict() must honor arbitrary (prev, cur, next) triples — the
    reference API places no adjacency requirement (ref interface.py:93-120).
    Feeding the same triple list in a different order must permute outputs."""
    from upliftingtabletennis_tpu.pipeline.interface import BallDetector

    det = BallDetector("wasb", chunk=4)
    det.resolution = (96, 64)
    rng = np.random.default_rng(5)
    frames = [rng.uniform(0, 255, (64, 96, 3)).astype(np.float32) for _ in range(7)]
    # non-adjacent triples: stride-2 neighbors
    triples = [(frames[i - 2], frames[i], frames[i + 2]) for i in range(2, 5)]
    preds, _ = det.predict(triples)
    perm = [2, 0, 1]
    preds_perm, _ = det.predict([triples[i] for i in perm])
    np.testing.assert_allclose(preds_perm, preds[perm], rtol=1e-5, atol=1e-5)


def test_full_pipeline_wiring():
    """End-to-end predict() on a synthetic rally with small random models:
    exercises chunking, both filters, padding glue and the uplifting model."""
    from upliftingtabletennis_tpu.pipeline.interface import (
        BallDetector,
        TableDetector,
        TableTennisPipeline,
        UpliftingModel,
    )

    pipe = TableTennisPipeline.__new__(TableTennisPipeline)
    pipe.ball_detector = BallDetector("wasb", chunk=4, resolution=(96, 64))
    pipe.ball_detector_aux = BallDetector("wasb", chunk=4, resolution=(96, 64))
    pipe.table_detector = TableDetector("hrnet", chunk=4, resolution=(96, 64))
    pipe.table_detector_aux = TableDetector("hrnet", chunk=4, resolution=(96, 64))
    pipe.uplifting_model = UpliftingModel(name="connectstage", size="small")
    pipe.KEYPOINT_VISIBLE = 1

    rng = np.random.default_rng(3)
    frames = [rng.uniform(0, 255, (64, 96, 3)).astype(np.float32) for _ in range(8)]
    spin, pos3d = pipe.predict(frames, fps=50)
    assert spin.shape == (3,)
    assert pos3d.ndim == 2 and pos3d.shape[1] == 3
    assert np.isfinite(spin).all()

    # reprojection round trip
    Mint = np.array([[2033.0, 0, 959.5], [0, 2180.0, 539.5], [0, 0, 1]])
    Mext = np.eye(4)
    Mext[2, 3] = 5.0
    pts = pipe.reproject(np.array([[0.0, 0.0, 1.0]]), Mint, Mext)
    assert pts.shape == (1, 2)


def test_pipeline_uint8_stride_and_i420_paths():
    """Streaming engine variants: uint8 ndarray input, table_stride > 1, and
    the I420 ingest path must all produce the same-shaped outputs as the
    RGB list path (pixel-format conversion is lossy only in chroma)."""
    from upliftingtabletennis_tpu.data.image_transforms import rgb_to_i420
    from upliftingtabletennis_tpu.pipeline.interface import (
        BallDetector,
        TableDetector,
        TableTennisPipeline,
        UpliftingModel,
    )

    pipe = TableTennisPipeline.__new__(TableTennisPipeline)
    pipe.ball_detector = BallDetector("wasb", chunk=4, resolution=(96, 64))
    pipe.ball_detector_aux = BallDetector("wasb", chunk=4, resolution=(96, 64))
    pipe.table_detector = TableDetector("hrnet", chunk=4, resolution=(96, 64))
    pipe.table_detector_aux = TableDetector("hrnet", chunk=4, resolution=(96, 64))
    pipe.uplifting_model = UpliftingModel(name="connectstage", size="small")
    pipe.KEYPOINT_VISIBLE = 1

    rng = np.random.default_rng(11)
    frames = rng.integers(0, 255, (9, 64, 96, 3), dtype=np.uint8)

    out_ref = pipe.run_rally(frames, fps=50)
    out_list = pipe.run_rally([f for f in frames], fps=50)
    np.testing.assert_allclose(out_list["table"], out_ref["table"], atol=1e-4)
    np.testing.assert_allclose(out_list["ball"], out_ref["ball"], atol=1e-4)

    out_stride = pipe.run_rally(frames, fps=50, table_stride=2)
    assert out_stride["table"].shape == (13, 3)

    out_i420 = pipe.run_rally(rgb_to_i420(frames), fps=50, pixel_format="i420")
    assert out_i420["table"].shape == (13, 3)
    assert out_i420["ball"].shape[1:] == (2,)


def test_host_downscale_matches_device_resize():
    """cv2 INTER_LINEAR (the host downscale) and jax.image.resize with
    antialias=False (the on-device resize) implement the same half-pixel
    bilinear — uploading pre-downscaled frames only reorders the existing
    resampling chain. Tolerance 1 for uint8 rounding."""
    import jax.image

    from upliftingtabletennis_tpu.data.image_transforms import host_downscale, rgb_to_i420

    rng = np.random.default_rng(7)
    frames = rng.integers(0, 255, (2, 128, 192, 3), dtype=np.uint8)
    ours = host_downscale(frames, (96, 64))
    ref = np.asarray(
        jax.image.resize(frames.astype(np.float32), (2, 64, 96, 3), "bilinear", antialias=False)
    )
    assert np.abs(ours.astype(np.float32) - ref).max() <= 1.0

    # i420: planar layout is preserved and planes resize independently
    fi = rgb_to_i420(frames)
    di = host_downscale(fi, (96, 64), pixel_format="i420")
    assert di.shape == (2, 96, 96)  # 64 * 3 // 2 rows
    y_ref = np.asarray(
        jax.image.resize(
            fi[:, :128].astype(np.float32), (2, 64, 96), "bilinear", antialias=False
        )
    )
    assert np.abs(di[:, :64].astype(np.float32) - y_ref).max() <= 1.0


def test_upload_res_equals_predownscaled_frames():
    """run_rally's upload_res path must equal feeding host-downscaled frames
    directly (identical device inputs), for RGB and i420, and the default
    "model" target must resolve to the largest detector resolution."""
    from upliftingtabletennis_tpu.data.image_transforms import host_downscale, rgb_to_i420
    from upliftingtabletennis_tpu.pipeline.interface import (
        BallDetector,
        TableDetector,
        TableTennisPipeline,
        UpliftingModel,
    )

    pipe = TableTennisPipeline.__new__(TableTennisPipeline)
    pipe.ball_detector = BallDetector("wasb", chunk=4, resolution=(96, 64))
    pipe.ball_detector_aux = BallDetector("wasb", chunk=4, resolution=(96, 64))
    pipe.table_detector = TableDetector("hrnet", chunk=4, resolution=(96, 64))
    pipe.table_detector_aux = TableDetector("hrnet", chunk=4, resolution=(96, 64))
    pipe.uplifting_model = UpliftingModel(name="connectstage", size="small")
    pipe.KEYPOINT_VISIBLE = 1

    rng = np.random.default_rng(13)
    frames = rng.integers(0, 255, (9, 128, 192, 3), dtype=np.uint8)

    out_auto = pipe.run_rally(frames, fps=50)  # default upload_res="model"
    out_explicit = pipe.run_rally(frames, fps=50, upload_res=(96, 64))
    out_pre = pipe.run_rally(host_downscale(frames, (96, 64)), fps=50, upload_res=None)
    np.testing.assert_array_equal(out_auto["ball"], out_explicit["ball"])
    np.testing.assert_array_equal(out_auto["ball"], out_pre["ball"])
    np.testing.assert_array_equal(out_auto["table"], out_pre["table"])

    fi = rgb_to_i420(frames)
    out_i = pipe.run_rally(fi, fps=50, pixel_format="i420")
    out_i_pre = pipe.run_rally(
        host_downscale(fi, (96, 64), pixel_format="i420"), fps=50,
        pixel_format="i420", upload_res=None,
    )
    np.testing.assert_array_equal(out_i["ball"], out_i_pre["ball"])
    np.testing.assert_array_equal(out_i["table"], out_i_pre["table"])

    # frames at/below model resolution upload untouched
    small = rng.integers(0, 255, (9, 64, 96, 3), dtype=np.uint8)
    out_small = pipe.run_rally(small, fps=50)
    out_small_off = pipe.run_rally(small, fps=50, upload_res=None)
    np.testing.assert_array_equal(out_small["ball"], out_small_off["ball"])
