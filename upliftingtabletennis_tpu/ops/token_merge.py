"""Token merging (ToMe bipartite soft matching) for the SegFormer++ backbone.

The reference's detection backbone is SegFormer++ (Kienzle et al.), pulled
from an external hub repo (ref: balldetection/models/segformer_pp.py:12-19)
with the 'bsm_hq' strategy: Bipartite Soft Matching token merging (Bolya et
al., "Token Merging: Your ViT But Faster") applied INSIDE the attention
block and unmerged immediately afterwards, so dense prediction keeps full
resolution ("high quality" schedule). This module implements the same
algorithm with XLA-friendly static shapes:

  * tokens split alternately into sets A (even) and B (odd);
  * each A token's best cosine-similarity match in B is found;
  * the r A-tokens with the highest match similarity merge into their B
    partners (mean), shrinking N to N - r;
  * `unmerge_tokens` gathers merged features back to the source positions.

r is a compile-time constant; merging is a scatter-add and unmerging a
gather, so it scales to the ~100k-token stage-1 sequences (an explicit
merge-matrix matmul would be quadratic in N).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class TokenMerge(NamedTuple):
    dst: jnp.ndarray     # (B, N) destination slot of each source token
    counts: jnp.ndarray  # (B, nm) sources per destination slot
    n_merged: int        # nm = N - r


def bipartite_soft_matching(metric: jnp.ndarray, r: int) -> TokenMerge:
    """Compute the ToMe merge plan for tokens with features `metric`.

    metric: (B, N, C) similarity feature (token embeddings / attention keys).
    r: number of tokens to remove (static; clipped to min(|A|, |B|)).
    """
    B, N, _ = metric.shape
    na = (N + 1) // 2  # even indices: set A
    nb = N - na        # odd indices: set B
    r = int(min(r, nb, na))
    nm = N - r

    m = metric / (jnp.linalg.norm(metric, axis=-1, keepdims=True) + 1e-6)
    a, b = m[:, 0::2], m[:, 1::2]
    sim = jnp.einsum("bic,bjc->bij", a, b)  # (B, na, nb)

    best_val = jnp.max(sim, axis=-1)
    best_idx = jnp.argmax(sim, axis=-1)

    # the r most-similar A tokens merge into their B partners
    order = jnp.argsort(-best_val, axis=-1)
    rank = jnp.argsort(order, axis=-1)
    merged_mask = rank < r

    # merged layout: [unmerged A (compacted order)..., all B tokens...]
    unmerged_before = jnp.cumsum(~merged_mask, axis=-1) - 1
    a_dst = jnp.where(merged_mask, (na - r) + best_idx, unmerged_before)
    b_dst = (na - r) + jnp.arange(nb)[None, :].repeat(B, 0)

    dst = jnp.zeros((B, N), jnp.int32)
    dst = dst.at[:, 0::2].set(a_dst.astype(jnp.int32))
    dst = dst.at[:, 1::2].set(b_dst.astype(jnp.int32))

    counts = jnp.zeros((B, nm), metric.dtype)
    counts = counts.at[jnp.arange(B)[:, None], dst].add(1.0)
    return TokenMerge(dst, counts, nm)


def merge_tokens(plan: TokenMerge, x: jnp.ndarray) -> jnp.ndarray:
    """Mean-merge (B, N, C) -> (B, nm, C) via scatter-add."""
    B, N, C = x.shape
    out = jnp.zeros((B, plan.n_merged, C), x.dtype)
    out = out.at[jnp.arange(B)[:, None], plan.dst].add(x)
    return out / plan.counts[..., None].astype(x.dtype)


def unmerge_tokens(plan: TokenMerge, merged: jnp.ndarray) -> jnp.ndarray:
    """Gather merged features back to source positions: (B, nm, C) -> (B, N, C)."""
    return jnp.take_along_axis(
        merged, plan.dst[..., None].astype(jnp.int32), axis=1
    )
