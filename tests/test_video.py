"""Video ingest (data/video.py): write a tiny mp4 with cv2, read it back in
both pixel formats. Skips when no codec is available in this cv2 build."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_video(tmp_path_factory):
    import cv2

    path = str(tmp_path_factory.mktemp("vid") / "clip.mp4")
    H, W, T = 64, 96, 10
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25, (W, H))
    if not wr.isOpened():
        pytest.skip("no mp4 codec in this cv2 build")
    rng = np.random.default_rng(0)
    frames = []
    for t in range(T):
        f = np.full((H, W, 3), 30 + 10 * t, np.uint8)
        f[10:20, 10 + 5 * t : 20 + 5 * t] = 220
        frames.append(f)
        wr.write(f[..., ::-1])  # BGR
    wr.release()
    return path, np.stack(frames)


def test_read_video_rgb(tiny_video):
    from upliftingtabletennis_tpu.data.video import read_video, video_info

    path, gt = tiny_video
    n, h, w, fps = video_info(path)
    assert (h, w) == gt.shape[1:3] and n == len(gt)
    frames = read_video(path)
    assert frames.shape == gt.shape and frames.dtype == np.uint8
    # lossy codec: average error small
    assert np.abs(frames.astype(int) - gt.astype(int)).mean() < 12


def test_read_video_i420_matches_device_converter(tiny_video):
    import jax.numpy as jnp

    from upliftingtabletennis_tpu.data.image_transforms import i420_to_rgb
    from upliftingtabletennis_tpu.data.video import read_video

    path, gt = tiny_video
    i420 = read_video(path, pixel_format="i420")
    H, W = gt.shape[1:3]
    assert i420.shape == (len(gt), H * 3 // 2, W)
    rgb = np.asarray(i420_to_rgb(jnp.asarray(i420), H, W))
    assert np.abs(rgb.astype(int) - gt.astype(int)).mean() < 14


def test_iter_video_chunks(tiny_video):
    from upliftingtabletennis_tpu.data.video import iter_video_chunks

    path, gt = tiny_video
    chunks = list(iter_video_chunks(path, chunk=4))
    assert sum(len(c) for c in chunks) == len(gt)
    assert all(c.shape[1:] == gt.shape[1:] for c in chunks)
