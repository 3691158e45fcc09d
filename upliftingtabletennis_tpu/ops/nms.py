"""Box NMS: Pallas tiled-IoU TPU kernel + jittable greedy resolution,
plus OKS (keypoint-similarity) NMS ports.

TPU-native rebuild of the reference's native NMS pair
(ref: vit_pose/vit_utils/nms/cpu_nms.pyx — greedy serial C;
vit_pose/vit_utils/nms/nms_kernel.cu:23-143 — CUDA bitmask kernel that
tiles boxes into 64-wide blocks, compares all pairs per block in shared
memory, then resolves the bitmask serially on the host).

The TPU design keeps the same two-phase structure, mapped to the hardware:

  1. pairwise-overlap phase: a Pallas kernel tiles the (N, N) IoU
     comparison into (TILE, TILE) blocks held in VMEM (the analogue of the
     CUDA shared-memory block compare) and emits a boolean suppression
     matrix `over[i, j] = IoU > thresh` — bit-packing into u64 words, which
     the GPU needs for global-memory bandwidth, is unnecessary with the
     matrix resident on-chip;
  2. resolution phase: the inherently serial greedy scan runs as a
     lax.fori_loop of *vectorized* row updates on device (the CUDA version
     round-trips the mask to the host for this part).

Semantics match cpu_nms exactly: +1 pixel areas, suppression at
IoU >= thresh, descending-score order. For the tiny candidate counts of
this pipeline the C++ host path (native/build.py) is also provided.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def _iou_tile_kernel(boxes_row_ref, boxes_col_ref, thresh_ref, out_ref):
    """One (TILE, TILE) block of the suppression matrix.

    boxes_row/col: (TILE, 8) padded box rows (x1, y1, x2, y2, score, 0...).
    out: (TILE, TILE) float32 {0, 1} mask of IoU >= thresh.
    """
    r = boxes_row_ref[:]  # (TILE, 8)
    c = boxes_col_ref[:]
    x1 = jnp.maximum(r[:, 0:1], c[:, 0].reshape(1, TILE))
    y1 = jnp.maximum(r[:, 1:2], c[:, 1].reshape(1, TILE))
    x2 = jnp.minimum(r[:, 2:3], c[:, 2].reshape(1, TILE))
    y2 = jnp.minimum(r[:, 3:4], c[:, 3].reshape(1, TILE))
    w = jnp.maximum(x2 - x1 + 1.0, 0.0)
    h = jnp.maximum(y2 - y1 + 1.0, 0.0)
    inter = w * h
    area_r = ((r[:, 2] - r[:, 0] + 1.0) * (r[:, 3] - r[:, 1] + 1.0)).reshape(TILE, 1)
    area_c = ((c[:, 2] - c[:, 0] + 1.0) * (c[:, 3] - c[:, 1] + 1.0)).reshape(1, TILE)
    iou = inter / (area_r + area_c - inter)
    out_ref[:] = (iou >= thresh_ref[0]).astype(jnp.float32)


def _overlap_matrix_pallas(boxes_padded, thresh):
    """(N8, 8) padded boxes -> (N8, N8) suppression mask via Pallas tiles."""
    N8 = boxes_padded.shape[0]
    grid = (N8 // TILE, N8 // TILE)
    return pl.pallas_call(
        _iou_tile_kernel,
        out_shape=jax.ShapeDtypeStruct((N8, N8), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, 8), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ),
    )(boxes_padded, boxes_padded, jnp.asarray([thresh], jnp.float32))


@partial(jax.jit, static_argnames=("use_pallas",))
def nms_mask(dets, thresh, use_pallas: bool = True):
    """Greedy NMS on device. dets (N, 5); returns keep mask (N,) bool.

    Boxes are processed in descending score order; `keep[i]` marks
    survivors in the ORIGINAL indexing.
    """
    N = dets.shape[0]
    order = jnp.argsort(-dets[:, 4], stable=True)
    sorted_dets = dets[order]

    N8 = ((N + TILE - 1) // TILE) * TILE
    padded = jnp.zeros((N8, 8), dets.dtype)
    # pad boxes at -inf far away so they never overlap real ones
    padded = padded.at[:, :4].set(-1e9)
    padded = padded.at[:N, :5].set(sorted_dets[:, :5])

    if use_pallas:
        over = _overlap_matrix_pallas(padded, thresh) > 0.5
    else:
        b = padded
        x1 = jnp.maximum(b[:, None, 0], b[None, :, 0])
        y1 = jnp.maximum(b[:, None, 1], b[None, :, 1])
        x2 = jnp.minimum(b[:, None, 2], b[None, :, 2])
        y2 = jnp.minimum(b[:, None, 3], b[None, :, 3])
        inter = jnp.maximum(x2 - x1 + 1, 0) * jnp.maximum(y2 - y1 + 1, 0)
        area = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
        over = inter / (area[:, None] + area[None, :] - inter) >= thresh

    # greedy only suppresses LATER boxes in score order (the CUDA kernel's
    # start = threadIdx.x + 1): restrict to the strict upper triangle
    col = jnp.arange(N8)
    over = over & (col[None, :] > col[:, None])

    # serial greedy resolution with vectorized row suppression
    def body(i, suppressed):
        keep_i = ~suppressed[i]
        return suppressed | (keep_i & over[i])

    suppressed = jax.lax.fori_loop(0, N, body, jnp.zeros((N8,), bool).at[N:].set(True))
    keep_sorted = ~suppressed[:N]
    keep = jnp.zeros((N,), bool).at[order].set(keep_sorted)
    return keep


def nms(dets: np.ndarray, thresh: float, use_pallas: bool = None) -> list:
    """Keep-indices in descending score order (cpu_nms-compatible output)."""
    dets = np.asarray(dets, np.float32)
    if dets.shape[0] == 0:
        return []
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    keep = np.asarray(nms_mask(jnp.asarray(dets), float(thresh), use_pallas=use_pallas))
    idx = np.nonzero(keep)[0]
    return idx[np.argsort(-dets[idx, 4], kind="stable")].tolist()


# COCO keypoint sigmas (the standard per-joint falloff constants of the OKS
# metric, cocodataset.org/#keypoints-eval)
COCO_SIGMAS = np.array(
    [.26, .25, .25, .35, .35, .79, .79, .72, .72, .62, .62, 1.07, 1.07,
     .87, .87, .89, .89]) / 10.0


def oks_iou(g, d, a_g, a_d, sigmas=None, vis_thr=None):
    """Object-keypoint-similarity between one pose and N candidate poses.

    Vectorized over candidates AND joints (the reference loops candidates,
    ref: vit_pose/vit_utils/nms/nms.py oks_iou). g (3K,), d (N, 3K),
    a_g scalar area, a_d (N,).
    """
    if sigmas is None:
        sigmas = COCO_SIGMAS
    vars_ = (sigmas * 2) ** 2  # (K,)
    d = np.asarray(d, np.float64).reshape(len(d), -1, 3) if len(d) else np.zeros((0, len(vars_), 3))
    g = np.asarray(g, np.float64).reshape(-1, 3)
    a_d = np.asarray(a_d, np.float64)
    sq = (d[:, :, 0] - g[None, :, 0]) ** 2 + (d[:, :, 1] - g[None, :, 1]) ** 2  # (N, K)
    e = sq / vars_[None, :] / ((a_g + a_d[:, None]) / 2 + np.spacing(1)) / 2
    if vis_thr is not None:
        m = (g[None, :, 2] > vis_thr) & (d[:, :, 2] > vis_thr)  # (N, K)
        cnt = m.sum(axis=1)
        s = np.where(m, np.exp(-e), 0.0).sum(axis=1)
        return np.where(cnt > 0, s / np.maximum(cnt, 1), 0.0)
    return np.exp(-e).mean(axis=1) if e.shape[1] else np.zeros(len(d))


def rescore(overlap, scores, thresh, type="gaussian"):
    """Soft-NMS score decay (ref: vit_pose/vit_utils/nms/nms.py:126-134)."""
    assert overlap.shape[0] == scores.shape[0]
    scores = scores.copy()
    if type == "linear":
        inds = np.where(overlap >= thresh)[0]
        scores[inds] = scores[inds] * (1 - overlap[inds])
    else:
        scores = scores * np.exp(-(overlap**2) / thresh)
    return scores


def soft_oks_nms(kpts_db, thresh, sigmas=None, vis_thr=None, max_dets=20):
    """Soft OKS NMS: greedy selection with gaussian score decay instead of
    hard suppression (ref: vit_pose/vit_utils/nms/nms.py:137-177)."""
    if len(kpts_db) == 0:
        return []
    scores = np.array([k["score"] for k in kpts_db], np.float64)
    kpts = np.array([np.asarray(k["keypoints"]).flatten() for k in kpts_db])
    areas = np.array([k["area"] for k in kpts_db], np.float64)

    order = scores.argsort()[::-1]
    scores = scores[order]
    keep = []
    while order.size > 0 and len(keep) < max_dets:
        i = order[0]
        ovr = oks_iou(kpts[i], kpts[order[1:]], areas[i], areas[order[1:]], sigmas, vis_thr)
        order = order[1:]
        scores = rescore(ovr, scores[1:], thresh)
        resort = scores.argsort()[::-1]
        order = order[resort]
        scores = scores[resort]
        keep.append(int(i))
    return keep


def oks_nms(kpts_db, thr, sigmas=None, vis_thr=None):
    """Greedy OKS keypoint NMS (ref: vit_pose/vit_utils/nms/nms.py oks_nms)."""
    if len(kpts_db) == 0:
        return []
    scores = np.array([k["score"] for k in kpts_db])
    kpts = np.array([k["keypoints"].flatten() for k in kpts_db])
    areas = np.array([k["area"] for k in kpts_db])
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        ious = oks_iou(kpts[i], kpts[order[1:]], areas[i], areas[order[1:]], sigmas, vis_thr)
        order = order[1:][ious <= thr]
    return keep
