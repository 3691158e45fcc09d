"""Detector factories + per-model native input resolutions.

Mirrors the reference's get_model functions and resolution table
(ref: balldetection/train.py:249-271, balldetection/config.py:75-87,
tabledetection/train.py:205-226, tabledetection/config.py).
"""
from __future__ import annotations

from typing import Tuple

from upliftingtabletennis_tpu.models.hrnet import TableHRNet, WASBNet
from upliftingtabletennis_tpu.models.segformer import SegFormerNet
from upliftingtabletennis_tpu.models.vit import VitPoseNet

# (W, H) native input resolutions (ref: balldetection/config.py:75-87)
DETECTOR_RESOLUTIONS = {
    "segformerpp_b0": (1920, 1088),
    "segformerpp_b2": (1600, 896),
    "vitpose": (1152, 640),
    "wasb": (1280, 704),
    "hrnet": (1280, 704),
}

BALL_MODELS = ("segformerpp_b0", "segformerpp_b2", "vitpose", "wasb")
TABLE_MODELS = ("segformerpp_b0", "segformerpp_b2", "vitpose", "hrnet")


def get_detector(name: str, task: str = "ball", in_frames: int = None, train: bool = False,
                 classify_invisible: bool = False, remat: bool = False,
                 head_style: str = "nvlabs", decoder_dim: int = 0):
    """Build a detector. Returns (model, (W, H) native resolution).

    task 'ball': 3-frame input, 1 heatmap channel (ref: balldetection).
    task 'table': 1-frame input, 13 channels (ref: tabledetection).
    remat: per-block rematerialization for the HRNet family — identical
    params/outputs, ~10x lower activation memory in fwd+bwd (needed to
    train full-res HRNet on a 16 GB chip).
    head_style/decoder_dim: SegFormer decode-head variant — "mmseg" (+ the
    checkpoint's decoder width) reconstructs ported reference segformerpp
    checkpoints (the external hub model is mmseg-based); the framework's
    own training uses the default NVlabs head.
    """
    assert task in ("ball", "table")
    out_channels = 1 if task == "ball" else 13
    frames = in_frames if in_frames is not None else (3 if task == "ball" else 1)
    res = DETECTOR_RESOLUTIONS[name]

    if name.startswith("segformerpp_"):
        size = name.split("_")[1]
        model = SegFormerNet(out_channels, frames, size, classify_invisible, train,
                             head_style=head_style, decoder_dim=decoder_dim)
    elif name == "vitpose":
        model = VitPoseNet(out_channels, frames, "small", train=train)
    elif name == "wasb":
        assert task == "ball"
        model = WASBNet(frames, train, remat)
    elif name == "hrnet":
        assert task == "table"
        model = TableHRNet(13, train, remat)
    else:
        raise ValueError(f"unknown detector {name!r}")
    return model, res
