"""download_example_images contract (ref: hubconf.py:34-88).

The reference downloads real example frames; this framework GENERATES them
locally (physics rally -> sampled camera -> render_rally), keeping the same
contract: idempotent, returns a folder of numbered PNG frames.
"""
import json
import os

import numpy as np


def test_download_example_images_generates_and_is_idempotent(tmp_path):
    import cv2

    import hubconf

    folder = str(tmp_path / "examples")
    out = hubconf.download_example_images(folder, n_frames=3)
    assert out == folder
    pngs = sorted(f for f in os.listdir(folder) if f.endswith(".png"))
    assert pngs == ["frame_0000.png", "frame_0001.png", "frame_0002.png"]
    img = cv2.imread(os.path.join(folder, pngs[0]))
    assert img.shape == (1080, 1920, 3)

    with open(os.path.join(folder, "meta.json")) as f:
        meta = json.load(f)
    assert meta["n_frames"] == 3
    assert meta["fps"] > 0
    assert np.isfinite(np.asarray(meta["pos3d_world_m"])).all()
    assert len(meta["ball_px_1920x1080"]) == 3

    # idempotent: a second call must not regenerate (same contract as the
    # reference's skip-if-present check)
    mtimes = {p: os.path.getmtime(os.path.join(folder, p)) for p in pngs}
    out2 = hubconf.download_example_images(folder, n_frames=3)
    assert out2 == folder
    for p in pngs:
        assert os.path.getmtime(os.path.join(folder, p)) == mtimes[p]
