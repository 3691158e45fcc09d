"""SegFormer (MiT-B0/B2) heatmap detector, flax, NHWC, TPU-first.

Rebuilds the reference's primary detection backbone, which it pulls from the
external hub repo KieDani/SegformerPlusPlus (ref:
balldetection/models/segformer_pp.py:12-19, tabledetection/models/
segformer_pp.py:12-19). The architecture is the standard SegFormer
("SegFormer: Simple and Efficient Design for Semantic Segmentation with
Transformers", Xie et al. 2021) Mix-Transformer encoder + all-MLP decode
head:

* 4 stages of overlapping patch embeddings (k7s4 then k3s2) with LayerNorm;
* efficient self-attention with spatial-reduction ratios (8, 4, 2, 1);
* MixFFN (fc1 -> 3x3 depthwise conv -> GELU -> fc2);
* decode head: per-stage linear projection, bilinear upsample to the 1/4
  scale, concat, 1x1 fuse conv + BN + ReLU, classifier conv.

Wrapper semantics preserved from the reference: widened first patch-embed
conv for 3*in_frames channels, out_channels 1 (ball) / 13 (table) heatmap
head, optional visible/invisible classifier from pooled stage-4 features
(ref: balldetection/models/segformer_pp.py:22-80).

The "++" token-merging (ToMe 'bsm_hq') of the hub repo is implemented in
ops/token_merge.py and enabled with `tome_ratio > 0` (fraction of query
tokens merged inside each attention, unmerged right after — the paper's
high-quality schedule). Default off: detection accuracy is exactly the
plain-SegFormer path and golden tests pin it.

Output heatmap is at 1/4 input resolution; the trainer upsamples logits
bilinearly to the target size exactly like the reference
(balldetection/train.py:110-118).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from upliftingtabletennis_tpu.ops.dwconv import depthwise_conv3x3
from upliftingtabletennis_tpu.ops.flash_attention import cross_attention
from upliftingtabletennis_tpu.ops.token_merge import (
    bipartite_soft_matching,
    merge_tokens,
    unmerge_tokens,
)

CFG = {
    "b0": {"dims": (32, 64, 160, 256), "depths": (2, 2, 2, 2), "decoder_dim": 256},
    "b1": {"dims": (64, 128, 320, 512), "depths": (2, 2, 2, 2), "decoder_dim": 256},
    "b2": {"dims": (64, 128, 320, 512), "depths": (3, 4, 6, 3), "decoder_dim": 768},
    "b3": {"dims": (64, 128, 320, 512), "depths": (3, 4, 18, 3), "decoder_dim": 768},
    "b4": {"dims": (64, 128, 320, 512), "depths": (3, 8, 27, 3), "decoder_dim": 768},
    "b5": {"dims": (64, 128, 320, 512), "depths": (3, 6, 40, 3), "decoder_dim": 768},
}
HEADS = (1, 2, 5, 8)
SR_RATIOS = (8, 4, 2, 1)
MLP_RATIOS = (4, 4, 4, 4)


class EfficientAttention(nn.Module):
    """Self-attention with spatial reduction of K/V (SegFormer eq. 2).

    tome_ratio > 0 enables the SegFormer++ 'bsm_hq' schedule: bipartite
    soft matching merges that fraction of QUERY tokens before attention and
    unmerges right after, keeping full resolution for the residual/FFN
    (ops/token_merge.py; ref backbone: balldetection/models/
    segformer_pp.py:12-19)."""

    dim: int
    num_heads: int
    sr_ratio: int
    tome_ratio: float = 0.0

    @nn.compact
    def __call__(self, x, H, W):
        B, N, C = x.shape
        h = self.num_heads
        hd = C // h

        plan = None
        xq = x
        if self.tome_ratio > 0.0 and N >= 256:
            plan = bipartite_soft_matching(x, int(N * self.tome_ratio))
            xq = merge_tokens(plan, x)
        Nq = xq.shape[1]
        q = nn.Dense(C, name="q")(xq).reshape(B, Nq, h, hd)

        if self.sr_ratio > 1:
            kv_in = x.reshape(B, H, W, C)
            kv_in = nn.Conv(
                C, (self.sr_ratio, self.sr_ratio), strides=(self.sr_ratio, self.sr_ratio),
                name="sr",
            )(kv_in)
            kv_in = kv_in.reshape(B, -1, C)
            kv_in = nn.LayerNorm(name="sr_norm")(kv_in)
        else:
            kv_in = x
        kv = nn.Dense(2 * C, name="kv")(kv_in).reshape(B, -1, 2, h, hd)
        k, v = kv[:, :, 0], kv[:, :, 1]

        # The spatial reduction keeps Nkv <= ~1400 at any detector
        # resolution while Nq reaches ~100k in stage 1: exactly the
        # many-queries/resident-KV case the Pallas one-pass flash kernel
        # is built for (never materializes the (Nq, Nkv) logits in HBM).
        # Dense XLA fallback on non-TPU backends (ops/flash_attention.py).
        o = cross_attention(q, k, v).reshape(B, Nq, C)
        if plan is not None:
            o = unmerge_tokens(plan, o)
        return nn.Dense(C, name="proj")(o)


class DWConv3x3(nn.Module):
    """Depthwise 3x3 with nn.Conv's param tree (kernel (3,3,1,C), bias (C,));
    computed by the Pallas kernel on TPU (ops/dwconv.py) — XLA's grouped-conv
    lowering is both slow and a compile-time hog at detector resolutions."""

    features: int

    @nn.compact
    def __call__(self, y):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, 1, self.features), y.dtype
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), y.dtype)
        return depthwise_conv3x3(y, kernel.astype(y.dtype), bias.astype(y.dtype))


class MixFFN(nn.Module):
    dim: int
    ratio: int

    @nn.compact
    def __call__(self, x, H, W):
        B, N, C = x.shape
        hidden = self.dim * self.ratio
        y = nn.Dense(hidden, name="fc1")(x)
        y = y.reshape(B, H, W, hidden)
        y = DWConv3x3(hidden, name="dwconv")(y)
        y = y.reshape(B, N, hidden)
        y = nn.gelu(y, approximate=False)
        return nn.Dense(self.dim, name="fc2")(y)


class MiTBlock(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int
    mlp_ratio: int
    tome_ratio: float = 0.0
    train: bool = False

    @nn.compact
    def __call__(self, x, H, W):
        # Both half-block kernels are differentiable via recompute-backward
        # wrappers (fused_ln_ffn_trainable / fused_attention_block_trainable),
        # so detector training runs the full fused path too.
        fused_ok = jax.default_backend() == "tpu" and H % 4 == 0
        use_fused = fused_ok
        use_fused_ffn = fused_ok
        if use_fused and self.tome_ratio == 0.0:
            # fused LN1+q-proj+attention+out-proj+residual kernel
            # (ops/fused_attention.py); K/V (spatially reduced, tiny) are
            # computed here with XLA from the same params
            nn.LayerNorm(epsilon=1e-6, name="norm1")(x[:, :1])
            EfficientAttention(self.dim, self.num_heads, self.sr_ratio,
                               self.tome_ratio, name="attn")(x[:, :1], 1, 1)
            p1 = self.get_variable("params", "norm1")
            pa = self.get_variable("params", "attn")
            from upliftingtabletennis_tpu.ops.fused_attention import (
                fused_attention_block_trainable,
            )

            dt = x.dtype
            B, N, C = x.shape
            h, hd = self.num_heads, self.dim // self.num_heads
            xf = x.astype(jnp.float32)
            mean = xf.mean(-1, keepdims=True)
            var = jnp.square(xf - mean).mean(-1, keepdims=True)
            y = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
            y = (y * p1["scale"].astype(jnp.float32)
                 + p1["bias"].astype(jnp.float32)).astype(dt)
            if self.sr_ratio > 1:
                kv_in = jax.lax.conv_general_dilated(
                    y.reshape(B, H, W, C), pa["sr"]["kernel"].astype(dt),
                    (self.sr_ratio, self.sr_ratio), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + pa["sr"]["bias"].astype(dt)
                kv_in = kv_in.reshape(B, -1, C).astype(jnp.float32)
                m2 = kv_in.mean(-1, keepdims=True)
                v2 = jnp.square(kv_in - m2).mean(-1, keepdims=True)
                kv_in = (kv_in - m2) * jax.lax.rsqrt(v2 + 1e-6)
                kv_in = (kv_in * pa["sr_norm"]["scale"].astype(jnp.float32)
                         + pa["sr_norm"]["bias"].astype(jnp.float32)).astype(dt)
            else:
                kv_in = y
            kv = (kv_in @ pa["kv"]["kernel"].astype(dt)
                  + pa["kv"]["bias"].astype(dt)).reshape(B, -1, 2, h, hd)
            x = fused_attention_block_trainable(
                H, W, h, False, x,
                p1["scale"].astype(dt), p1["bias"].astype(dt),
                pa["q"]["kernel"].astype(dt), pa["q"]["bias"].astype(dt),
                kv[:, :, 0], kv[:, :, 1],
                pa["proj"]["kernel"].astype(dt), pa["proj"]["bias"].astype(dt),
            )
        else:
            y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
            x = x + EfficientAttention(self.dim, self.num_heads, self.sr_ratio,
                                       self.tome_ratio, name="attn")(y, H, W)
        if use_fused_ffn:
            # fused LN+FFN+residual Pallas half-block: the hidden (N, 4C)
            # tensor never touches HBM (ops/fused_ffn.py). Params are
            # created by stub sub-module calls (dead code, DCE'd) so the
            # tree matches the unfused path exactly. Differentiable wrapper
            # (recompute backward) keeps this path active in TRAINING too.
            nn.LayerNorm(epsilon=1e-6, name="norm2")(x[:, :1])
            MixFFN(self.dim, self.mlp_ratio, name="ffn")(x[:, :1], 1, 1)
            p2 = self.get_variable("params", "norm2")
            pf = self.get_variable("params", "ffn")
            from upliftingtabletennis_tpu.ops.fused_ffn import fused_ln_ffn_trainable

            dt = x.dtype
            return fused_ln_ffn_trainable(
                H, W, False, x,
                p2["scale"].astype(dt), p2["bias"].astype(dt),
                pf["fc1"]["kernel"].astype(dt), pf["fc1"]["bias"].astype(dt),
                pf["dwconv"]["kernel"][:, :, 0].astype(dt),
                pf["dwconv"]["bias"].astype(dt),
                pf["fc2"]["kernel"].astype(dt), pf["fc2"]["bias"].astype(dt),
            )
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        x = x + MixFFN(self.dim, self.mlp_ratio, name="ffn")(y, H, W)
        return x


class MiTBackbone(nn.Module):
    """Mix Transformer encoder: 4 stages at 1/4, 1/8, 1/16, 1/32 scale."""

    size: str = "b2"
    in_chans: int = 3
    tome_ratio: float = 0.0
    num_stages: int = 4  # truncation hook for profiling/feature extraction
    train: bool = False

    @nn.compact
    def __call__(self, x):
        cfg = CFG[self.size]
        feats = []
        for s in range(self.num_stages):
            if s == 0:
                # NB: a space-to-depth reformulation of this embed (pack 4x4
                # pixel phases into channels + rearranged (2,2,16C,F) kernel)
                # measured SLOWER on v5e (31 vs 20 ms/chunk8): XLA
                # materializes the pad/transpose instead of fusing it into
                # the producer, costing more than the 9->128 lane-padding
                # read it avoids. Keep the plain conv.
                x = nn.Conv(cfg["dims"][0], (7, 7), strides=(4, 4), padding=[(3, 3), (3, 3)],
                            name="patch_embed_0")(x)
            else:
                x = nn.Conv(cfg["dims"][s], (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                            name=f"patch_embed_{s}")(x)
            B, H, W, C = x.shape
            x = x.reshape(B, H * W, C)
            x = nn.LayerNorm(epsilon=1e-6, name=f"patch_norm_{s}")(x)
            for b in range(cfg["depths"][s]):
                x = MiTBlock(
                    cfg["dims"][s], HEADS[s], SR_RATIOS[s], MLP_RATIOS[s],
                    self.tome_ratio, self.train, name=f"stage{s}_block{b}",
                )(x, H, W)
            x = nn.LayerNorm(epsilon=1e-6, name=f"stage_norm_{s}")(x)
            x = x.reshape(B, H, W, C)
            feats.append(x)
        return feats


def _resize_bilinear(x, hw):
    return jax.image.resize(x, (x.shape[0], hw[0], hw[1], x.shape[-1]), method="bilinear")


class SegFormerHead(nn.Module):
    """All-MLP decode head -> heatmap at 1/4 input resolution.

    Algebraically restructured for TPU: the reference computes
    `fuse_conv(concat_i(resize(linear_c_i(f_i))))` — a 3072->768 1x1 conv
    over the FULL 1/4-scale grid (3.4 TFLOP/chunk, the single most
    expensive op in the net). Bilinear resize mixes only space and the 1x1
    convs mix only channels, so they commute:
        fuse(concat(resize(f_i @ Wc_i + bc_i)))
          = sum_i resize(f_i @ (Wc_i @ Wf_i)) + sum_i bc_i @ Wf_i
    with Wf_i the fuse kernel's per-stage row block (stage order reversed,
    matching the reference's `proj[::-1]` concat). Each stage is projected
    at its OWN resolution (4-64x fewer pixels for stages 2-4), eliminating
    the full-grid wide matmul exactly (same params, float-assoc-level
    identical outputs; pinned by test_segformer_head_restructure)."""

    out_channels: int
    decoder_dim: int
    train: bool = False

    @nn.compact
    def __call__(self, feats):
        D = self.decoder_dim
        target_hw = feats[0].shape[1:3]
        # declare the reference param tree: per-stage projections + fuse
        dense = [nn.Dense(D, name=f"linear_c{i}") for i in range(len(feats))]
        fuse = nn.Conv(D, (1, 1), use_bias=False, name="linear_fuse")
        # bind fuse params by running it on a dummy 3072-channel pixel
        dummy = jnp.zeros((1, 1, 1, D * len(feats)), feats[0].dtype)
        fuse(dummy)
        wf = self.get_variable("params", "linear_fuse")["kernel"].reshape(
            len(feats) * D, D
        )
        acc = None
        bias_acc = None
        for i, f in enumerate(feats):
            d = dense[i]
            d(f[:1, :1])  # create/bind linear_c{i} params
            pv = self.get_variable("params", f"linear_c{i}")
            wc = pv["kernel"].astype(f.dtype)
            bc = pv["bias"].astype(f.dtype)
            # fuse block for stage i: concat order is proj[::-1]
            blk = wf[(len(feats) - 1 - i) * D : (len(feats) - i) * D].astype(f.dtype)
            m = wc @ blk  # (C_i, D)
            t = f @ m
            if i > 0:
                t = _resize_bilinear(t, target_hw)
            acc = t if acc is None else acc + t
            b = bc @ blk
            bias_acc = b if bias_acc is None else bias_acc + b
        x = acc + bias_acc
        x = nn.BatchNorm(use_running_average=not self.train, momentum=0.9, name="fuse_bn")(x)
        x = nn.relu(x)
        return nn.Conv(self.out_channels, (1, 1), name="conv_seg")(x)


class MMSegHead(nn.Module):
    """mmseg-style `SegformerHead` — the decode head of the EXTERNAL hub
    model the reference actually runs (KieDani/SegformerPlusPlus is an
    mmsegmentation fork; ref: balldetection/models/segformer_pp.py:12-19,
    40-50). Differs from the NVlabs head (`SegFormerHead` above) by a
    per-stage BN+ReLU after each 1x1 projection and a stage-ORDER concat:

        conv_seg(relu(bn_f(fusion(concat_i resize(relu(bn_i(conv_i(f_i))))))))

    Only used when loading ported reference `segformerpp_*` checkpoints
    (utils/port_reference_weights.py) — the framework's own training keeps
    the NVlabs head. Same resize/1x1 commute trick as SegFormerHead: the
    fusion kernel's per-stage row block multiplies each stage at its OWN
    resolution (ReLU happens before the resize in mmseg too, so the
    restructure is exact up to float association)."""

    out_channels: int
    decoder_dim: int
    train: bool = False

    @nn.compact
    def __call__(self, feats):
        D = self.decoder_dim
        target_hw = feats[0].shape[1:3]
        fuse = nn.Conv(D, (1, 1), use_bias=False, name="fusion_conv")
        fuse(jnp.zeros((1, 1, 1, D * len(feats)), feats[0].dtype))
        wf = self.get_variable("params", "fusion_conv")["kernel"].reshape(
            len(feats) * D, D
        )
        acc = None
        for i, f in enumerate(feats):
            t = nn.Conv(D, (1, 1), use_bias=False, name=f"conv_{i}")(f)
            t = nn.BatchNorm(use_running_average=not self.train, momentum=0.9,
                             name=f"bn_{i}")(t)
            t = nn.relu(t)
            # mmseg concats in stage order 0..3 (SegformerHead.forward)
            t = t @ wf[i * D : (i + 1) * D].astype(f.dtype)
            if i > 0:
                t = _resize_bilinear(t, target_hw)
            acc = t if acc is None else acc + t
        x = nn.BatchNorm(use_running_average=not self.train, momentum=0.9,
                         name="fusion_bn")(acc)
        x = nn.relu(x)
        return nn.Conv(self.out_channels, (1, 1), name="conv_seg")(x)


class SegFormerNet(nn.Module):
    """Ball (out=1, in_frames=3) / table (out=13, in_frames=1) detector.

    Input NHWC (B, H, W, 3*in_frames); output (heatmap (B, H/4, W/4, out),
    optional visible/invisible logits).

    head_style "nvlabs" (default; the framework's own training) or "mmseg"
    (the external hub model's head — required for ported reference
    segformerpp checkpoints to reproduce reference outputs).
    """

    out_channels: int = 1
    in_frames: int = 3
    model_size: str = "b2"
    classify_invisible: bool = False
    train: bool = False
    tome_ratio: float = 0.0  # SegFormer++ 'bsm_hq' token merging (0 = off)
    head_style: str = "nvlabs"
    decoder_dim: int = 0  # 0 = the size's CFG default; ported reference
    # checkpoints override with the width found in the checkpoint itself

    @nn.compact
    def __call__(self, x):
        feats = MiTBackbone(self.model_size, 3 * self.in_frames, self.tome_ratio,
                            train=self.train, name="backbone")(x)
        head_cls = {"nvlabs": SegFormerHead, "mmseg": MMSegHead}[self.head_style]
        heat = head_cls(
            self.out_channels,
            self.decoder_dim or CFG[self.model_size]["decoder_dim"],
            self.train, name="decode_head",
        )(feats)
        cls_out = None
        if self.classify_invisible:
            pooled = jnp.mean(feats[-1], axis=(1, 2))
            cls_out = nn.Dense(2, name="visible_classification")(pooled)
        return heat, cls_out
