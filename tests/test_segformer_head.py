"""SegFormerHead restructure: per-stage projection + resize-sum must equal
the reference formulation fuse_conv(concat(resize(linear_c(f)))) exactly
(linearity of bilinear resize in channels)."""
import jax
import jax.numpy as jnp
import numpy as np

from upliftingtabletennis_tpu.models.segformer import CFG, SegFormerHead, _resize_bilinear


def reference_head(params, feats, out_channels, D):
    """The reference decode-head math (mmseg SegFormer head; ref backbone
    behind balldetection/models/segformer_pp.py:12-19)."""
    target_hw = feats[0].shape[1:3]
    proj = []
    for i, f in enumerate(feats):
        p = f @ params[f"linear_c{i}"]["kernel"] + params[f"linear_c{i}"]["bias"]
        if i > 0:
            p = _resize_bilinear(p, target_hw)
        proj.append(p)
    x = jnp.concatenate(proj[::-1], axis=-1)
    x = x @ params["linear_fuse"]["kernel"].reshape(4 * D, D)
    # inference BatchNorm (init stats: mean 0 var 1) + relu + conv_seg
    bn = params["fuse_bn"]
    x = bn["scale"] * x / jnp.sqrt(1.0 + 1e-5) + bn["bias"]
    x = jax.nn.relu(x)
    return x @ params["conv_seg"]["kernel"][0, 0] + params["conv_seg"]["bias"]


def test_segformer_head_restructure():
    rng = np.random.default_rng(0)
    D = CFG["b2"]["decoder_dim"]
    feats = [
        jnp.asarray(rng.normal(size=(2, 16 // 2**i, 24 // 2**i, c)), jnp.float32)
        for i, c in enumerate((64, 128, 320, 512))
    ]
    head = SegFormerHead(13, D)
    v = head.init(jax.random.PRNGKey(0), feats)
    got = head.apply(v, feats)
    want = reference_head(v["params"], feats, 13, D)
    assert got.shape == want.shape == (2, 16, 24, 13)
    scale = float(jnp.max(jnp.abs(want))) + 1e-6
    err = float(jnp.max(jnp.abs(got - want)))
    assert err / scale < 1e-5, f"head restructure mismatch: {err} vs scale {scale}"
