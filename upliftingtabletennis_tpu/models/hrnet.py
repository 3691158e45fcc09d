"""HRNet (WASB w18-small config) in flax, NHWC, TPU-first.

Rebuilds the reference HRNet used for ball detection (WASB) and table
keypoint detection (ref: balldetection/models/wasb.py:255-608,
tabledetection/models/hrnet.py — identical net, 13 output channels, both
with full-resolution stems STRIDES=[1,1]).

Module naming mirrors the torch state_dict paths (conv1, layer1.0.conv1,
stage2.0.branches.1.0.bn2, transition1.0.0, fuse_layers.i.j.k, ...) so that
reference checkpoints port mechanically (utils/port_torch.port_cnn_state_dict)
and golden-parity tests can compare against the torch implementation
directly.

TPU notes: NHWC layout throughout (feeds the MXU's native convolution
layout); BatchNorm runs in inference mode by default with a `train` flag
for training; nearest-neighbor branch upsampling is an exact jnp.repeat.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

BN_MOMENTUM_TORCH = 0.1  # flax momentum = 1 - torch momentum


def _bn(name, train):
    return nn.BatchNorm(
        use_running_average=not train, momentum=1.0 - BN_MOMENTUM_TORCH, name=name
    )


def _conv(features, kernel, stride=1, name=None, bias=False):
    pad = kernel // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        use_bias=bias,
        name=name,
    )


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    train: bool = False

    @nn.compact
    def __call__(self, x):
        residual = x
        y = _conv(self.planes, 3, self.stride, "conv1")(x)
        y = _bn("bn1", self.train)(y)
        y = nn.relu(y)
        y = _conv(self.planes, 3, 1, "conv2")(y)
        y = _bn("bn2", self.train)(y)
        if self.has_downsample:
            residual = _conv(self.planes, 1, self.stride, "downsample_0")(x)
            residual = _bn("downsample_1", self.train)(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    train: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        residual = x
        y = _conv(self.planes, 1, 1, "conv1")(x)
        y = _bn("bn1", self.train)(y)
        y = nn.relu(y)
        y = _conv(self.planes, 3, self.stride, "conv2")(y)
        y = _bn("bn2", self.train)(y)
        y = nn.relu(y)
        y = _conv(self.planes * self.expansion, 1, 1, "conv3")(y)
        y = _bn("bn3", self.train)(y)
        if self.has_downsample:
            residual = _conv(self.planes * self.expansion, 1, self.stride, "downsample_0")(x)
            residual = _bn("downsample_1", self.train)(residual)
        return nn.relu(y + residual)


def _upsample_nearest(x, factor: int):
    x = jnp.repeat(x, factor, axis=1)
    return jnp.repeat(x, factor, axis=2)


class HighResolutionModule(nn.Module):
    """Parallel branches + full cross-resolution fusion (ref: wasb.py:106-245)."""

    num_branches: int
    block: str  # 'BASIC' | 'BOTTLENECK'
    num_blocks: Sequence[int]
    num_inchannels: Sequence[int]
    num_channels: Sequence[int]
    train: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
        blk = BasicBlock if self.block == "BASIC" else Bottleneck
        if self.remat:
            blk = nn.remat(blk)
        expansion = 1 if self.block == "BASIC" else 4
        out_ch = [c * expansion for c in self.num_channels]

        ys = []
        for i in range(self.num_branches):
            y = xs[i]
            for b in range(self.num_blocks[i]):
                has_ds = b == 0 and self.num_inchannels[i] != out_ch[i]
                y = blk(
                    self.num_channels[i],
                    1,
                    has_ds,
                    self.train,
                    name=f"branches_{i}_{b}",
                )(y)
            ys.append(y)

        if self.num_branches == 1:
            return ys

        fused = []
        for i in range(self.num_branches):
            acc = None
            for j in range(self.num_branches):
                if j == i:
                    t = ys[j]
                elif j > i:
                    t = _conv(out_ch[i], 1, 1, f"fuse_layers_{i}_{j}_0")(ys[j])
                    t = _bn(f"fuse_layers_{i}_{j}_1", self.train)(t)
                    t = _upsample_nearest(t, 2 ** (j - i))
                else:  # j < i: downsample chain
                    t = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = out_ch[i] if last else out_ch[j]
                        t = _conv(ch, 3, 2, f"fuse_layers_{i}_{j}_{k}_0")(t)
                        t = _bn(f"fuse_layers_{i}_{j}_{k}_1", self.train)(t)
                        if not last:
                            t = nn.relu(t)
                acc = t if acc is None else acc + t
            fused.append(nn.relu(acc))
        return fused


# WASB w18-small configuration (ref: balldetection/models/wasb.py:514-573)
WASB_CFG: Dict[str, Any] = {
    "stem_inplanes": 64,
    "stem_strides": (1, 1),
    "stage1": {"block": "BOTTLENECK", "num_blocks": (1,), "num_channels": (32,)},
    "stage2": {"block": "BASIC", "num_blocks": (2, 2), "num_channels": (16, 32)},
    "stage3": {"block": "BASIC", "num_blocks": (2, 2, 2), "num_channels": (16, 32, 64)},
    "stage4": {"block": "BASIC", "num_blocks": (2, 2, 2, 2), "num_channels": (16, 32, 64, 128)},
    "final_conv_kernel": 1,
}


class HRNet(nn.Module):
    """HRNet backbone + per-scale final conv (ref: wasb.py:255-507).

    Input (B, H, W, 3*in_frames) NHWC; returns (heatmaps (B, H', W', out_channels),
    features list). With stem strides (1, 1), H' = H.
    """

    out_channels: int = 3
    in_frames: int = 1
    cfg: Any = None
    train: bool = False
    remat: bool = False  # per-block rematerialization: same params, ~10x
    # less activation memory in fwd+bwd (full-res HRNet training OOMs a
    # 16 GB chip without it; inference is unaffected)

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg or WASB_CFG
        train = self.train

        x = _conv(cfg["stem_inplanes"], 3, cfg["stem_strides"][0], "conv1")(x)
        x = _bn("bn1", train)(x)
        x = nn.relu(x)
        x = _conv(cfg["stem_inplanes"], 3, cfg["stem_strides"][1], "conv2")(x)
        x = _bn("bn2", train)(x)
        x = nn.relu(x)

        # stage 1 (ref: _make_layer, wasb.py:398-413)
        s1 = cfg["stage1"]
        blk = Bottleneck if s1["block"] == "BOTTLENECK" else BasicBlock
        if self.remat:
            blk = nn.remat(blk)
        expansion = 4 if s1["block"] == "BOTTLENECK" else 1
        planes = s1["num_channels"][0]
        inplanes = cfg["stem_inplanes"]
        for b in range(s1["num_blocks"][0]):
            has_ds = b == 0 and inplanes != planes * expansion
            x = blk(planes, 1, has_ds, train, name=f"layer1_{b}")(x)
        prev_channels = [planes * expansion]

        ys = [x]
        for si, stage_name in ((2, "stage2"), (3, "stage3"), (4, "stage4")):
            scfg = cfg[stage_name]
            exp = 1 if scfg["block"] == "BASIC" else 4
            cur_channels = [c * exp for c in scfg["num_channels"]]
            # transition (ref: _make_transition_layer, wasb.py:364-396)
            xs = []
            for i in range(len(cur_channels)):
                if i < len(prev_channels):
                    if cur_channels[i] != prev_channels[i]:
                        t = _conv(cur_channels[i], 3, 1, f"transition{si-1}_{i}_0")(ys[i])
                        t = _bn(f"transition{si-1}_{i}_1", train)(t)
                        xs.append(nn.relu(t))
                    else:
                        xs.append(ys[i])
                else:
                    t = ys[-1]
                    for j in range(i + 1 - len(prev_channels)):
                        out_c = cur_channels[i] if j == i - len(prev_channels) else prev_channels[-1]
                        t = _conv(out_c, 3, 2, f"transition{si-1}_{i}_{j}_0")(t)
                        t = _bn(f"transition{si-1}_{i}_{j}_1", train)(t)
                        t = nn.relu(t)
                    xs.append(t)
            ys = HighResolutionModule(
                len(cur_channels),
                scfg["block"],
                scfg["num_blocks"],
                tuple(cur_channels),
                scfg["num_channels"],
                train,
                self.remat,
                name=f"{stage_name}_0",
            )(xs)
            prev_channels = cur_channels

        k = cfg["final_conv_kernel"]
        heat = nn.Conv(
            self.out_channels, (k, k), padding="VALID" if k == 1 else [(k // 2,) * 2] * 2,
            use_bias=True, name="final_layers_0",
        )(ys[0])
        return heat, ys


class WASBNet(nn.Module):
    """Ball-detection wrapper: 3-frame input, returns the middle frame's
    heatmap channel (ref: WASBNet, wasb.py:510-608)."""

    in_frames: int = 3
    train: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        heat, feats = HRNet(3, self.in_frames, None, self.train, self.remat,
                            name="model")(x)
        return heat[..., 1:2], None  # middle of the 3 output frames


class TableHRNet(nn.Module):
    """Table-keypoint wrapper: single frame, 13 channels
    (ref: tabledetection/models/hrnet.py:510-589)."""

    num_keypoints: int = 13
    train: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        heat, _ = HRNet(self.num_keypoints, 1, None, self.train, self.remat,
                        name="model")(x)
        return heat
