"""Associative-embedding grouping + pose visualization tests
(ref: vit_pose/vit_utils/post_processing/group.py, visualization.py)."""
import numpy as np
import pytest

from upliftingtabletennis_tpu.ops.ae_grouping import (
    HeatmapParser,
    match_by_tag,
    nms_heatmaps,
    top_k_candidates,
)

K, H, W = 4, 48, 64


def _gauss(y, x, sigma=1.5):
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    return np.exp(-((xx - x) ** 2 + (yy - y) ** 2) / (2 * sigma**2))


def two_person_scene():
    """Two people: person A joints near the left (tag 0), person B near
    the right (tag 5)."""
    pts_a = [(10, 10), (14, 12), (20, 11), (26, 13)]
    pts_b = [(12, 50), (16, 52), (22, 51), (28, 53)]
    heat = np.zeros((1, K, H, W), np.float32)
    tags = np.zeros((1, K, H, W, 1), np.float32)
    for k in range(K):
        heat[0, k] = np.maximum(_gauss(*pts_a[k]), _gauss(*pts_b[k]))
        tags[0, k, :, :, 0] = 5.0 * (np.mgrid[0:H, 0:W][1] > 32)
    return heat, tags, pts_a, pts_b


def test_nms_keeps_local_maxima_only():
    heat, _, pts_a, pts_b = two_person_scene()
    out = np.asarray(nms_heatmaps(heat, kernel=5))
    # exactly 2 surviving nonzeros per joint channel (one per person)
    for k in range(K):
        nz = np.nonzero(out[0, k])
        assert len(nz[0]) == 2
        ys, xs = nz
        got = {(int(y), int(x)) for y, x in zip(ys, xs)}
        assert got == {pts_a[k], pts_b[k]}


def test_top_k_gathers_tags_at_peaks():
    heat, tags, pts_a, pts_b = two_person_scene()
    val_k, loc_k, tag_k = map(np.asarray, top_k_candidates(heat, tags, max_people=5))
    assert val_k.shape == (1, K, 5) and loc_k.shape == (1, K, 5, 2)
    for k in range(K):
        top2 = {(int(loc_k[0, k, i, 1]), int(loc_k[0, k, i, 0])) for i in range(2)}
        assert top2 == {pts_a[k], pts_b[k]}
        # tag at the right-side peak is 5, left-side 0
        for i in range(2):
            expect = 5.0 if loc_k[0, k, i, 0] > 32 else 0.0
            assert tag_k[0, k, i, 0] == expect


def test_match_by_tag_separates_people():
    heat, tags, pts_a, pts_b = two_person_scene()
    val_k, loc_k, tag_k = map(np.asarray, top_k_candidates(heat, tags, max_people=5))
    poses = match_by_tag(val_k[0], loc_k[0], tag_k[0], detection_threshold=0.3)
    assert poses.shape == (2, K, 4)  # 2 people, (x, y, score, tag)
    # each pose is tag-pure and joint-complete
    for pose in poses:
        assert (pose[:, 2] > 0.3).all()
        assert len(np.unique(pose[:, 3])) == 1
    by_tag = {pose[0, 3]: pose for pose in poses}
    assert set(by_tag) == {0.0, 5.0}
    for k in range(K):
        assert (by_tag[0.0][k, 0], by_tag[0.0][k, 1]) == (pts_a[k][1], pts_a[k][0])
        assert (by_tag[5.0][k, 0], by_tag[5.0][k, 1]) == (pts_b[k][1], pts_b[k][0])


def test_parse_adjust_and_scores():
    heat, tags, pts_a, pts_b = two_person_scene()
    parser = HeatmapParser(
        {"num_joints": K, "max_num_people": 5, "detection_threshold": 0.3,
         "tag_threshold": 1.0, "use_detection_val": True,
         "ignore_too_much": False, "tag_per_joint": True, "nms_kernel": 5}
    )
    results, scores = parser.parse(heat, tags, adjust=True, refine=True)
    poses = results[0]
    assert poses.shape[0] == 2
    assert len(scores) == 2 and all(0.5 < s <= 1.0 for s in scores)
    # adjust moves peaks by +-0.25 + 0.5 -> within 0.75 px of the integer peak
    for pose in poses:
        ref_pts = pts_a if pose[0, 3] == 0.0 else pts_b
        for k in range(K):
            assert abs(pose[k, 0] - ref_pts[k][1]) <= 0.75
            assert abs(pose[k, 1] - ref_pts[k][0]) <= 0.75


def test_refine_fills_missing_joint():
    heat, tags, pts_a, _ = two_person_scene()
    parser = HeatmapParser(
        {"num_joints": K, "detection_threshold": 0.3, "tag_threshold": 1.0,
         "tag_per_joint": True, "nms_kernel": 5}
    )
    val_k, loc_k, tag_k = map(np.asarray, top_k_candidates(heat, tags, max_people=5))
    poses = parser.match(val_k, loc_k, tag_k)[0]
    person_a = poses[[i for i, p in enumerate(poses) if p[0, 3] == 0.0][0]].copy()
    person_a[2] = 0.0  # drop joint 2 as if undetected
    from upliftingtabletennis_tpu.ops.ae_grouping import refine_pose

    refined = refine_pose(heat[0], tags[0], person_a.copy())
    assert refined[2, 2] > 0.3  # score filled from the heatmap
    assert abs(refined[2, 0] - pts_a[2][1]) <= 1.0
    assert abs(refined[2, 1] - pts_a[2][0]) <= 1.0


def test_single_tag_map_shared_across_joints():
    heat, tags, _, _ = two_person_scene()
    shared = tags[:, :1]  # (1, 1, H, W, 1): tag_per_joint=False layout
    val_k, loc_k, tag_k = map(
        np.asarray,
        top_k_candidates(heat, shared, max_people=5, tag_per_joint=False),
    )
    assert tag_k.shape == (1, K, 5, 1)
    poses = match_by_tag(val_k[0], loc_k[0], tag_k[0], detection_threshold=0.3)
    assert poses.shape[0] == 2


def test_pose_viz_draws_without_error():
    from upliftingtabletennis_tpu.utils.pose_viz import (
        draw_points_and_skeleton,
        joints_dict,
        pad_image,
    )

    sk = joints_dict()["coco"]["skeleton"]
    img = np.zeros((120, 160, 3), np.uint8)
    pts = np.zeros((17, 3), np.float32)
    pts[:, 0] = np.linspace(10, 110, 17)  # y
    pts[:, 1] = np.linspace(10, 150, 17)  # x
    pts[:, 2] = 1.0
    out = draw_points_and_skeleton(img.copy(), pts, sk)
    assert out.shape == img.shape and out.sum() > 0

    padded, (left, top) = pad_image(img, 2.0)
    assert padded.shape[1] / padded.shape[0] == pytest.approx(2.0, abs=0.05)
    assert left > 0 and top == 0
