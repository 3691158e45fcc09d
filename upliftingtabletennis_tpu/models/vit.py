"""ViTPose: plain ViT backbone + deconv heatmap head, flax, NHWC.

Rebuilds the vendored ViTPose stack (ref: vit_pose/vit_models/backbone/
vit.py, vit_pose/vit_models/head/topdown_heatmap_simple_head.py,
balldetection/models/vitpose.py, tabledetection/models/vitpose.py).

Semantics preserved:
* PatchEmbed: conv k=16, s=16, padding=2 for ratio=1 (the reference's
  `4 + 2*(ratio//2-1)` formula, vit.py:221).
* pos_embed of length num_patches+1; applied as x + pos[1:] + pos[:1]
  (vit.py:382-385). num_patches is resolution-dependent — models are
  constructed per input resolution like the reference.
* Pre-LN blocks, GELU MLP ratio 4, qkv bias, LN eps 1e-6, stochastic depth
  linearly 0 -> drop_path_rate over depth (train only).
* Head: 2x [ConvTranspose k4 s2 p1 (no bias), BN, ReLU] with 256 filters,
  then 1x1 conv (num_output_channels).
* Ball/table wrappers widen the patch conv to 3*in_frames channels
  (weight tiling /n happens at porting time, ref: vitpose.py:73-78).

Module naming flattens to the torch state_dict paths for weight porting.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    train: bool = False

    @nn.compact
    def __call__(self, x):
        h = self.num_heads
        hd = self.dim // h

        def attn(y):
            B, N, C = y.shape
            qkv = nn.Dense(3 * self.dim, use_bias=True, name="attn_qkv")(y)
            qkv = qkv.reshape(B, N, 3, h, hd)
            qkv = jnp.moveaxis(qkv, (2, 3), (0, 2))  # (3, B, H, N, hd)
            q, k, v = qkv[0], qkv[1], qkv[2]
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * hd**-0.5
            w = jax.nn.softmax(logits, axis=-1)
            o = jnp.einsum("bhqk,bhkd->bhqd", w, v)
            o = jnp.moveaxis(o, 1, 2).reshape(B, N, C)
            return nn.Dense(self.dim, use_bias=True, name="attn_proj")(o)

        def drop_path(y):
            if not self.train or self.drop_path == 0.0:
                return y
            keep = 1.0 - self.drop_path
            rng = self.make_rng("dropout")
            mask = jax.random.bernoulli(rng, keep, (y.shape[0], 1, 1))
            return y * mask / keep

        x = x + drop_path(attn(nn.LayerNorm(epsilon=1e-6, name="norm1")(x)))
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="mlp_fc2")(y)
        return x + drop_path(y)


class ViTBackbone(nn.Module):
    """Plain ViT producing a (B, Hp, Wp, D) feature map (ref: vit.py:264-394)."""

    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 12
    patch_size: int = 16
    in_chans: int = 3
    drop_path_rate: float = 0.0
    train: bool = False

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        p = self.patch_size
        x = nn.Conv(
            self.embed_dim,
            (p, p),
            strides=(p, p),
            padding=[(2, 2), (2, 2)],  # ref formula: 4 + 2*(ratio//2 - 1) = 2
            use_bias=True,
            name="patch_embed_proj",
        )(x)
        Hp, Wp = x.shape[1], x.shape[2]
        x = x.reshape(B, Hp * Wp, self.embed_dim)

        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, Hp * Wp + 1, self.embed_dim),
        )
        x = x + pos[:, 1:] + pos[:, :1]

        for i in range(self.depth):
            dp = self.drop_path_rate * i / max(self.depth - 1, 1)
            x = ViTBlock(
                self.embed_dim, self.num_heads, 4.0, dp, self.train, name=f"blocks_{i}"
            )(x)
        x = nn.LayerNorm(epsilon=1e-6, name="last_norm")(x)
        return x.reshape(B, Hp, Wp, self.embed_dim)


class HeatmapHead(nn.Module):
    """TopdownHeatmapSimpleHead: N deconvs + 1x1 conv (ref: head file)."""

    out_channels: int = 1
    num_deconv: int = 2
    filters: int = 256
    train: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_deconv):
            # torch ConvTranspose2d(k=4, s=2, p=1) == flax 'SAME' padding with
            # transpose_kernel=True and the usual (2,3,1,0) kernel transpose
            # (verified numerically to 7e-8)
            x = nn.ConvTranspose(
                self.filters,
                (4, 4),
                strides=(2, 2),
                padding="SAME",
                use_bias=False,
                transpose_kernel=True,
                name=f"deconv_layers_{i * 3}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not self.train, momentum=0.9, name=f"deconv_layers_{i * 3 + 1}"
            )(x)
            x = nn.relu(x)
        return nn.Conv(self.out_channels, (1, 1), use_bias=True, name="final_layer")(x)


class VitPoseNet(nn.Module):
    """Ball (out=1, in_frames=3) / table (out=13, in_frames=1) detector.

    Input NHWC (B, H, W, 3*in_frames); output heatmap (B, H/4, W/4, out).
    (ref: balldetection/models/vitpose.py:46-104)
    """

    out_channels: int = 1
    in_frames: int = 3
    model_size: str = "small"
    drop_path_rate: float = 0.3
    train: bool = False

    @nn.compact
    def __call__(self, x):
        dim = {"small": 384, "base": 768}[self.model_size]
        feats = ViTBackbone(
            embed_dim=dim,
            depth=12,
            num_heads=12,
            in_chans=3 * self.in_frames,
            drop_path_rate=self.drop_path_rate,
            train=self.train,
            name="model_backbone",
        )(x)
        heat = HeatmapHead(self.out_channels, 2, 256, self.train, name="model_keypoint_head")(feats)
        return heat, None
