"""Golden parity: flax ViTPose vs the vendored torch implementation."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from upliftingtabletennis_tpu.models.vit import VitPoseNet
from upliftingtabletennis_tpu.utils.port_torch import port_cnn_state_dict


def _ref_vitpose(reference_path, out_channels=1, in_chans=9, img=(64, 48)):
    import sys

    sys.path.insert(0, str(reference_path))
    import torch
    from vit_pose import ViTPoseModel

    cfg = dict(
        type="TopDown",
        pretrained=None,
        backbone=dict(
            type="ViT",
            img_size=img,
            patch_size=16,
            embed_dim=384,
            depth=12,
            num_heads=12,
            ratio=1,
            use_checkpoint=False,
            mlp_ratio=4,
            qkv_bias=True,
            drop_path_rate=0.3,
            in_chans=in_chans,
        ),
        keypoint_head=dict(
            type="TopdownHeatmapSimpleHead",
            in_channels=384,
            num_deconv_layers=2,
            num_deconv_filters=(256, 256),
            num_deconv_kernels=(4, 4),
            extra=dict(final_conv_kernel=1),
            out_channels=out_channels,
        ),
        train_cfg=dict(),
    )
    torch.manual_seed(0)
    model = ViTPoseModel(cfg)
    model.eval()
    return model


def test_vitpose_parity(reference_path):
    import torch

    H, W = 64, 48
    ref = _ref_vitpose(reference_path, out_channels=1, in_chans=9, img=(H, W))
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 9, H, W)).astype(np.float32)
    with torch.no_grad():
        feats = ref.forward_features(torch.tensor(x))
        out_ref = ref.keypoint_head(feats).numpy()

    model = VitPoseNet(out_channels=1, in_frames=3, model_size="small", train=False)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), x_nhwc)
    sd = {f"model.{k}": v for k, v in ref.state_dict().items()}
    ported = port_cnn_state_dict(sd, variables)
    out, _ = model.apply(ported, x_nhwc)
    out = np.asarray(out).transpose(0, 3, 1, 2)

    assert out.shape == out_ref.shape, (out.shape, out_ref.shape)
    np.testing.assert_allclose(out, out_ref, atol=5e-3, rtol=1e-3)


def test_vitpose_param_count(reference_path):
    ref = _ref_vitpose(reference_path, out_channels=13, in_chans=3, img=(64, 48))
    n_ref = sum(p.numel() for p in ref.parameters())
    model = VitPoseNet(out_channels=13, in_frames=1, model_size="small")
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 48, 3)))
    n_jax = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
    assert n_jax == n_ref, (n_jax, n_ref)
