"""Lane-packed HRNet inference: batch-into-lanes conv execution on TPU.

Why: the WASB/HRNet config (ref: balldetection/models/wasb.py:514-573) runs
its branches at FULL input resolution with 16/32 channels (stem strides
(1,1)). TPU tensors pad the minor (lane) dimension to 128, so a 16-channel
NHWC conv at 1280x704 moves 8x more HBM bytes than its payload — measured
on a v5e chip, EVERY full-res conv costs a flat ~16 ms at batch 8 whether
it is 1x1 16->16 (0.2 TFLOP/s) or 3x3 128->128 (93 TFLOP/s).

Fix: pack G frames of the batch into the lane dimension — (B, H, W, C)
-> (B/G, H, W, G*C) — and give each conv a block-diagonal kernel
(G copies of the original (kh, kw, Ci, Co) on the diagonal). The math is
EXACT (frames never mix: the off-diagonal blocks are zero), lanes fill up
to 128+, and the measured cost of a branch-0 conv drops ~2-6x. G is chosen
per conv by a static cost model balancing HBM traffic against the G-fold
block-diagonal compute waste. BatchNorm (inference mode) is folded into
conv weights, eliminating all standalone normalization passes.

This module is a pure-function re-execution of `models.hrnet.HRNet`'s
graph against the SAME flax variable tree — training, checkpointing and
torch-porting still go through the flax module; parity is pinned by
tests/test_hrnet_packed.py.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp

from upliftingtabletennis_tpu.models.hrnet import WASB_CFG

def _choose_g(B, H, W, Ci, Co, k, stride):
    """Static lane-packing group for a conv with Ci -> Co channels.

    Rule (validated empirically on a v5e chip): fill the input side up to
    128 lanes and allow the wider side up to 256 — i.e.
    G = min(8, 128 // min(Ci, Co), 256 // max(Ci, Co)). This gives every
    HRNet branch exactly C * G = 128 (branch0 16ch -> G8, branch1 32ch ->
    G4, branch2 64ch -> G2, branch3 128ch -> G1), so consecutive branch
    ops share one packed layout and regroups only happen on fusion edges.
    Isolated-conv measurements overstate packing cost (they pay a one-off
    relayout); in-graph chains at a consistent G run at the packed rate.
    """
    if min(Ci, Co) >= 64:
        # wide convs are MXU-bound: the G-fold block-diagonal compute waste
        # exceeds the lane-padding saving (measured: 64->64 full-res is
        # fastest at G=1). Only narrow convs benefit from packing.
        return 1
    if stride == 2 and Co > Ci:
        # channel-expanding downsamples are compute-heavy relative to their
        # (4x smaller) output traffic: fill the input side only
        g = min(8, 128 // max(1, Ci), 128 // Co * 2)
        g = max(1, g)
        while g > 1 and (g > B or B % g):
            g //= 2
        return g
    g = min(8, 128 // max(1, min(Ci, Co)), 256 // max(Ci, Co))
    g = max(1, g)
    while g > 1 and (g > B or B % g):
        g //= 2
    return g


def lane_pack(x, G):
    """(B, H, W, C) -> (B/G, H, W, G*C); frame g of a group occupies
    channels [g*C, (g+1)*C)."""
    if G == 1:
        return x
    B, H, W, C = x.shape
    return jnp.transpose(x.reshape(B // G, G, H, W, C), (0, 2, 3, 1, 4)).reshape(
        B // G, H, W, G * C
    )


def lane_unpack(x, G, C):
    if G == 1:
        return x
    Bp, H, W, GC = x.shape
    return jnp.transpose(x.reshape(Bp, H, W, G, C), (0, 3, 1, 2, 4)).reshape(
        Bp * G, H, W, C
    )


def _regroup(x, g_from, g_to, C):
    if g_from == g_to:
        return x
    return lane_pack(lane_unpack(x, g_from, C), g_to)


def _block_diag(w, G):
    """(kh, kw, Ci, Co) -> (kh, kw, G*Ci, G*Co) with w on the diagonal."""
    if G == 1:
        return w
    kh, kw, ci, co = w.shape
    eye = jnp.eye(G, dtype=w.dtype)
    wb = eye[None, None, :, None, :, None] * w[:, :, None, :, None, :]
    return wb.reshape(kh, kw, G * ci, G * co)


def fold_bn(kernel, bn_p, bn_s, eps=1e-5):
    """Fold inference BatchNorm into the preceding conv: returns (w, b)."""
    scale = bn_p["scale"] / jnp.sqrt(bn_s["var"] + eps)
    return kernel * scale, bn_p["bias"] - bn_s["mean"] * scale


class _P:
    """Param accessor over the (nested) flax tree: params + batch_stats.
    BN folding runs in float32 regardless of storage dtype."""

    def __init__(self, params, stats, dtype=jnp.bfloat16):
        self.p = params
        self.s = stats
        self.dtype = dtype

    def sub(self, scope: str) -> "_P":
        return _P(self.p[scope], self.s.get(scope, {}), self.dtype)

    def conv_bn(self, conv_name, bn_name):
        bn_p = {k: v.astype(jnp.float32) for k, v in self.p[bn_name].items()}
        bn_s = {k: v.astype(jnp.float32) for k, v in self.s[bn_name].items()}
        w, b = fold_bn(self.p[conv_name]["kernel"].astype(jnp.float32), bn_p, bn_s)
        return w.astype(self.dtype), b.astype(self.dtype)

    def conv(self, name):
        c = self.p[name]
        w = c["kernel"].astype(self.dtype)
        b = c.get("bias")
        return w, (b.astype(self.dtype) if b is not None else None)


# Fused conv+bias+relu(+residual) Pallas path (ops/fused_conv.py): XLA on
# TPU does not fuse elementwise epilogues into convolutions, so every conv
# output round-trips HBM once extra (the 152 ms/slab-8 "bias+relu+copies"
# roofline line, PERF.md round 5). Flag-gated: flipped on only where the
# full-slab A/B on the chip proves a win.
FUSED_CONV = False


def _conv(x, w, b, G, stride=1, relu=False, residual=None):
    """Block-diagonal lane-packed conv (+bias, optional relu, optional
    fused residual add). `x` is already packed at G; `w` is the unpacked
    (kh, kw, Ci, Co) kernel."""
    kh = w.shape[0]
    if FUSED_CONV and stride == 1 and kh in (1, 3):
        from upliftingtabletennis_tpu.ops import fused_conv as fc

        B, H, W, _ = x.shape
        Cig, Cog = G * w.shape[2], G * w.shape[3]
        interp = jax.default_backend() != "tpu"
        bt = jnp.tile(b, G) if b is not None else None
        if kh == 3 and fc.fusable_3x3(H, W, Cig, Cog, stride):
            return fc.conv3x3_bias_act(x, _block_diag(w, G), bt, residual,
                                       relu=relu, interpret=interp)
        if kh == 1 and fc.fusable_1x1(H, W, Cig, Cog, stride):
            return fc.conv1x1_bias_act(x, _block_diag(w, G)[0, 0], bt,
                                       residual, relu=relu, interpret=interp)
    pad = (kh // 2, kh // 2)
    y = jax.lax.conv_general_dilated(
        x,
        _block_diag(w, G),
        (stride, stride),
        [pad, pad] if kh > 1 else "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        y = y + jnp.tile(b, G)
    if residual is not None:
        y = y + residual
    return jax.nn.relu(y) if relu else y


def _upsample(x, factor):
    x = jnp.repeat(x, factor, axis=1)
    return jnp.repeat(x, factor, axis=2)


def _basic_block(x, blk: _P, Ci, Co, G):
    """BasicBlock at grouping G (ref: wasb.py BasicBlock; models/hrnet.py:46)."""
    w1, b1 = blk.conv_bn("conv1", "bn1")
    w2, b2 = blk.conv_bn("conv2", "bn2")
    y = _conv(x, w1, b1, G, relu=True)
    if Ci != Co:
        wd, bd = blk.conv_bn("downsample_0", "downsample_1")
        res = _conv(x, wd, bd, G)
    else:
        res = x
    # residual add + relu ride the second conv's fused epilogue
    return _conv(y, w2, b2, G, relu=True, residual=res)


def hrnet_packed_apply(variables, x, out_channels, root="model", max_stage=4):
    """Inference-only forward of models.hrnet.HRNet with BN folding and
    lane packing. x: (B, H, W, 3*in_frames), B a power of 2 (chunk size).
    Returns the heatmap (B, H, W, out_channels); numerics match
    `HRNet(...).apply` to bf16 tolerance."""
    cfg = WASB_CFG
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    if root is not None and root in params:  # WASBNet/TableHRNet wrap HRNet as 'model'
        params, stats = params[root], stats.get(root, {})
    P = _P(params, stats, dtype=x.dtype)
    B, H, W, _ = x.shape

    def choose(Ci, Co, h, w, k=3, s=1):
        return _choose_g(B, h, w, Ci, Co, k, s)

    # ---- stem (full res, C=64) ----
    # The stem/layer1 island runs at ONE uniform grouping: per-op-optimal
    # G fragments the layout with full-res regroups that cost more than
    # they save (measured: mixed-G island 109 ms vs unpacked 52 ms vs
    # uniform G=2 below). G=2 fills the 64-ch ops to 128 lanes while only
    # doubling the (small) MXU waste of the wide ops.
    g = 2 if B % 2 == 0 else 1
    y = lane_pack(x, g)
    w1, b1 = P.conv_bn("conv1", "bn1")
    y = _conv(y, w1, b1, g, relu=True)
    g2 = g
    y = _regroup(y, g, g2, 64)
    w2, b2 = P.conv_bn("conv2", "bn2")
    y = _conv(y, w2, b2, g2, relu=True)

    # ---- layer1: one Bottleneck 64 -> 32*4 (ref: wasb.py:398-413) ----
    L = P.sub("layer1_0")
    gb = g
    y = _regroup(y, g2, gb, 64)
    wc1, bc1 = L.conv_bn("conv1", "bn1")
    t = _conv(y, wc1, bc1, gb, relu=True)
    g3 = g
    t = _regroup(t, gb, g3, 32)
    wc2, bc2 = L.conv_bn("conv2", "bn2")
    t = _conv(t, wc2, bc2, g3, relu=True)
    g4 = g
    t = _regroup(t, g3, g4, 32)
    wc3, bc3 = L.conv_bn("conv3", "bn3")
    t = _conv(t, wc3, bc3, g4)
    gd = g
    y = _regroup(y, gb, gd, 64)
    wd, bd = L.conv_bn("downsample_0", "downsample_1")
    res = _conv(y, wd, bd, gd)
    y = jax.nn.relu(_regroup(t, g4, gd, 128) + res)
    prev_channels = [128]
    g_prev = [gd]
    res_prev = [(H, W)]
    ys = [y]

    # ---- stages 2..4 (ref: models/hrnet.py:200-231) ----
    for si, stage_name in ((2, "stage2"), (3, "stage3"), (4, "stage4")):
        if si > max_stage:  # debug/profiling truncation
            return lane_unpack(ys[0], g_prev[0], prev_channels[0])
        scfg = cfg[stage_name]
        cur = list(scfg["num_channels"])  # BASIC blocks: expansion 1
        n_br = len(cur)
        # transitions
        xs, g_cur, res_cur = [], [], []
        for i in range(n_br):
            if i < len(prev_channels):
                h, w = res_prev[i]
                if cur[i] != prev_channels[i]:
                    gt = choose(prev_channels[i], cur[i], h, w)
                    t = _regroup(ys[i], g_prev[i], gt, prev_channels[i])
                    wt, bt = P.conv_bn(
                        f"transition{si-1}_{i}_0", f"transition{si-1}_{i}_1"
                    )
                    xs.append(_conv(t, wt, bt, gt, relu=True))
                    g_cur.append(gt)
                else:
                    xs.append(ys[i])
                    g_cur.append(g_prev[i])
                res_cur.append((h, w))
            else:
                t = ys[-1]
                gt = g_prev[-1]
                h, w = res_prev[-1]
                cprev = prev_channels[-1]
                for j in range(i + 1 - len(prev_channels)):
                    out_c = cur[i] if j == i - len(prev_channels) else cprev
                    gj = choose(cprev, out_c, h, w, s=2)
                    t = _regroup(t, gt, gj, cprev)
                    wt, bt = P.conv_bn(
                        f"transition{si-1}_{i}_{j}_0", f"transition{si-1}_{i}_{j}_1"
                    )
                    t = _conv(t, wt, bt, gj, stride=2, relu=True)
                    gt, cprev = gj, out_c
                    h, w = h // 2, w // 2
                xs.append(t)
                g_cur.append(gt)
                res_cur.append((h, w))

        # branches: per-branch optimal grouping for the block convs
        M = P.sub(f"{stage_name}_0")
        ys_new = []
        for i in range(n_br):
            h, w = res_cur[i]
            gi = choose(cur[i], cur[i], h, w)
            t = _regroup(xs[i], g_cur[i], gi, cur[i])
            for b in range(scfg["num_blocks"][i]):
                t = _basic_block(t, M.sub(f"branches_{i}_{b}"), cur[i], cur[i], gi)
            ys_new.append(t)
            g_cur[i] = gi

        # full cross-resolution fusion (ref: models/hrnet.py:128-149)
        fused, g_fused = [], []
        for i in range(n_br):
            hi, wi = res_cur[i]
            gi = g_cur[i]
            acc = ys_new[i]
            for j in range(n_br):
                if j == i:
                    continue
                if j > i:
                    # 1x1 at branch-j res, regroup cheaply at low res, upsample
                    hj, wj = res_cur[j]
                    gj = choose(cur[j], cur[i], hj, wj, k=1)
                    t = _regroup(ys_new[j], g_cur[j], gj, cur[j])
                    wf, bf = M.conv_bn(f"fuse_layers_{i}_{j}_0", f"fuse_layers_{i}_{j}_1")
                    t = _conv(t, wf, bf, gj)
                    t = _regroup(t, gj, gi, cur[i])
                    t = _upsample(t, 2 ** (j - i))
                else:
                    t = ys_new[j]
                    gt = g_cur[j]
                    h, w = res_cur[j]
                    cj = cur[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = cur[i] if last else cur[j]
                        gk = choose(cj, ch, h, w, s=2)
                        t = _regroup(t, gt, gk, cj)
                        wf, bf = M.conv_bn(
                            f"fuse_layers_{i}_{j}_{k}_0", f"fuse_layers_{i}_{j}_{k}_1"
                        )
                        t = _conv(t, wf, bf, gk, stride=2, relu=not last)
                        gt, cj = gk, ch
                        h, w = h // 2, w // 2
                    t = _regroup(t, gt, gi, cur[i])
                acc = acc + t
            fused.append(jax.nn.relu(acc))
            g_fused.append(gi)
        ys, g_prev, prev_channels, res_prev = fused, g_fused, cur, res_cur

    # ---- final conv on branch 0 (1x1, full res) ----
    wf, bf = P.conv("final_layers_0")
    gF = g_prev[0]
    heat = _conv(ys[0], wf, bf, gF)
    return lane_unpack(heat, gF, out_channels)


def wasb_packed_apply(variables, x):
    """WASBNet wrapper: 3-frame input, middle-frame heatmap channel
    (ref: models/hrnet.py:241-252)."""
    heat = hrnet_packed_apply(variables, x, 3, root="model")
    return heat[..., 1:2], None


def table_hrnet_packed_apply(variables, x):
    """TableHRNet wrapper: 13-channel heatmaps (ref: models/hrnet.py:254)."""
    return hrnet_packed_apply(variables, x, 13, root="model")
