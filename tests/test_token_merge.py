"""ToMe bipartite soft matching (ops/token_merge.py) — the SegFormer++
'bsm_hq' schedule (ref backbone: balldetection/models/segformer_pp.py:12-19)."""
import jax
import jax.numpy as jnp
import numpy as np

from upliftingtabletennis_tpu.ops.token_merge import (
    bipartite_soft_matching,
    merge_tokens,
    unmerge_tokens,
)


def test_merge_reduces_and_unmerge_restores_shape():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 16)), jnp.float32)
    plan = bipartite_soft_matching(x, r=16)
    assert plan.n_merged == 48
    merged = merge_tokens(plan, x)
    assert merged.shape == (2, 48, 16)
    restored = unmerge_tokens(plan, merged)
    assert restored.shape == (2, 64, 16)


def test_identical_tokens_merge_exactly():
    """Duplicated tokens merge losslessly: their mean equals each source,
    so merge->unmerge is exact for the merged pairs."""
    rng = np.random.default_rng(1)
    base = rng.normal(size=(1, 32, 8)).astype(np.float32)
    x = base.copy()
    x[0, 1::2] = x[0, 0::2]  # every B token duplicates its A neighbor
    xj = jnp.asarray(x)
    plan = bipartite_soft_matching(xj, r=16)
    restored = np.asarray(unmerge_tokens(plan, merge_tokens(plan, xj)))
    np.testing.assert_allclose(restored, x, atol=1e-5)


def test_unmerged_tokens_pass_through():
    """Tokens that do NOT merge must be bit-identical after the round trip."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 40, 8)), jnp.float32)
    r = 8
    plan = bipartite_soft_matching(x, r)
    restored = np.asarray(unmerge_tokens(plan, merge_tokens(plan, x)))
    counts_per_src = np.asarray(plan.counts)[0][np.asarray(plan.dst)[0]]
    solo = counts_per_src == 1
    np.testing.assert_allclose(restored[0][solo], np.asarray(x)[0][solo], rtol=1e-6)
    # exactly r extra sources landed in shared slots (several A tokens may
    # pick the same B partner, so shared slots can hold > 2 sources)
    counts = np.asarray(plan.counts)[0]
    assert int(np.clip(counts - 1, 0, None).sum()) == r


def test_segformer_tome_runs_and_approximates():
    """tome_ratio > 0 runs end-to-end and stays close to the exact model on
    smooth inputs (merging blurs only near-duplicate tokens)."""
    from upliftingtabletennis_tpu.models.segformer import SegFormerNet

    rng = np.random.default_rng(3)
    # smooth image -> neighboring tokens similar -> merging nearly lossless
    import scipy.ndimage as ndi

    img = ndi.gaussian_filter(rng.normal(size=(1, 64, 96, 9)), (0, 6, 6, 0)).astype(np.float32)
    x = jnp.asarray(img)
    net0 = SegFormerNet(out_channels=1, in_frames=3, model_size="b0")
    net1 = SegFormerNet(out_channels=1, in_frames=3, model_size="b0", tome_ratio=0.4)
    vs = net0.init(jax.random.PRNGKey(0), x)
    h0 = np.asarray(net0.apply(vs, x)[0])
    h1 = np.asarray(net1.apply(vs, x)[0])  # same params, merged attention
    assert h1.shape == h0.shape
    denom = np.abs(h0).mean() + 1e-6
    assert np.abs(h1 - h0).mean() / denom < 0.5
