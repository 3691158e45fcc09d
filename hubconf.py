"""Hub-style entry points (ref: hubconf.py:11-88 of the reference).

Usage (in-repo analogue of torch.hub.load):

    from hubconf import full_pipeline, ball_detection, table_detection
    pipeline = full_pipeline(checkpoints={...})

Checkpoints are this framework's Orbax directories (utils/checkpoint.py);
`checkpoints` maps {'ball_main', 'ball_aux', 'table_main', 'table_aux',
'uplifting'} to paths. The reference auto-downloads a weights zip from the
internet (ref: interface.py:29-79); this environment has no egress, so
weights must be provided locally — `weights_root` points at a directory
with the same sub-layout and is wired through automatically when given.
"""
from __future__ import annotations

import os
from typing import Optional

dependencies = ["jax", "flax", "optax", "numpy"]


def _checkpoints_from_root(weights_root: Optional[str]):
    if weights_root is None:
        return {}
    layout = {
        "ball_main": "inference_balldetection/segformerpp_b2/model",
        "ball_aux": "inference_balldetection/wasb/model",
        "table_main": "inference_tabledetection/segformerpp_b2/model",
        "table_aux": "inference_tabledetection/hrnet/model",
        "uplifting": "inference_uplifting/ours/model",
    }
    out = {}
    for key, rel in layout.items():
        path = os.path.join(weights_root, rel)
        if os.path.isdir(path):
            out[key] = path
    return out


def ball_detection(model_name: str = "segformerpp_b2", checkpoint: Optional[str] = None, **kw):
    """Ball detector (ref: hubconf.py:11-18)."""
    from upliftingtabletennis_tpu.pipeline import BallDetector

    return BallDetector(model_name, checkpoint, **kw)


def table_detection(model_name: str = "segformerpp_b2", checkpoint: Optional[str] = None, **kw):
    """Table keypoint detector (ref: hubconf.py:19-26)."""
    from upliftingtabletennis_tpu.pipeline import TableDetector

    return TableDetector(model_name, checkpoint, **kw)


def uplifting(checkpoint: Optional[str] = None, **kw):
    """2D->3D uplifting model."""
    from upliftingtabletennis_tpu.pipeline import UpliftingModel

    return UpliftingModel(checkpoint, **kw)


def full_pipeline(checkpoints: Optional[dict] = None, weights_root: Optional[str] = None, **kw):
    """Complete video -> 3D + spin pipeline (ref: hubconf.py:27-31)."""
    from upliftingtabletennis_tpu.pipeline import TableTennisPipeline

    ck = dict(_checkpoints_from_root(weights_root))
    ck.update(checkpoints or {})
    return TableTennisPipeline(ck, **kw)


def download_example_images(*args, **kwargs):
    """The reference downloads example frames from its GitHub release
    (ref: hubconf.py:34-88). This environment has no network egress —
    point `full_pipeline` at local frames instead."""
    raise RuntimeError(
        "no network egress available; provide local example frames instead"
    )
