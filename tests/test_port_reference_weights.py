"""Round-trip test for the reference weights-zip porting CLI.

Builds a fake reference weights directory (REAL reference torch model
classes, random weights, saved in the reference's checkpoint format,
ref: balldetection/helper_balldetection.py:510-529), runs
`port_reference_weights.main`, then loads the Orbax output through this
framework's own loaders and pins output parity against the torch originals.
"""
import re
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from upliftingtabletennis_tpu.utils import port_reference_weights as PRW
from upliftingtabletennis_tpu.utils.checkpoint import (
    load_checkpoint, load_model_from_checkpoint)

# small spatial size keeps the torch forwards fast; vitpose's pos_embed is
# resolution-dependent so its fake checkpoint declares this resolution too
H, W = 64, 96


def _hf_to_mmseg(hf_sd):
    """Rename a HuggingFace `SegformerModel` encoder state dict into the
    mmsegmentation `MixVisionTransformer` tensor naming that the external
    `KieDani/SegformerPlusPlus` hub model (an mmseg fork) saves under the
    reference wrapper's `model.` prefix (ref: balldetection/models/
    segformer_pp.py:12-19). HF implements the same MiT compute, so the
    renamed dict is a faithful stand-in for a real segformerpp checkpoint:
    same math, external tensor layout (incl. the packed
    nn.MultiheadAttention in_proj and the Conv2d-1x1 MixFFN layers)."""
    import torch

    out = {}
    for k, v in hf_sd.items():
        k = k.replace("segformer.", "")
        if not k.startswith("encoder."):
            continue
        k = k[len("encoder."):]
        if m := re.match(r"patch_embeddings\.(\d+)\.(.+)", k):
            s, rest = m.group(1), m.group(2)
            rest = rest.replace("proj.", "projection.").replace("layer_norm.", "norm.")
            out[f"model.backbone.layers.{s}.0.{rest}"] = v
        elif m := re.match(r"layer_norm\.(\d+)\.(.+)", k):
            out[f"model.backbone.layers.{m.group(1)}.2.{m.group(2)}"] = v
        elif m := re.match(r"block\.(\d+)\.(\d+)\.(.+)", k):
            s, b, rest = m.groups()
            pre = f"model.backbone.layers.{s}.1.{b}."
            if rest.startswith("layer_norm_1."):
                out[pre + "norm1." + rest.split(".", 1)[1]] = v
            elif rest.startswith("layer_norm_2."):
                out[pre + "norm2." + rest.split(".", 1)[1]] = v
            elif rest.startswith("attention.self.query."):
                pass  # packed below
            elif rest.startswith("attention.self.key.") or rest.startswith(
                    "attention.self.value."):
                pass
            elif rest.startswith("attention.output.dense."):
                out[pre + "attn.attn.out_proj." + rest.rsplit(".", 1)[1]] = v
            elif rest.startswith("attention.self.sr."):
                out[pre + "attn.sr." + rest.rsplit(".", 1)[1]] = v
            elif rest.startswith("attention.self.layer_norm."):
                out[pre + "attn.norm." + rest.rsplit(".", 1)[1]] = v
            elif rest.startswith("mlp.dense1."):
                suffix = rest.rsplit(".", 1)[1]
                out[pre + "ffn.layers.0." + suffix] = (
                    v[..., None, None] if suffix == "weight" else v)
            elif rest.startswith("mlp.dwconv.dwconv."):
                out[pre + "ffn.layers.1." + rest.rsplit(".", 1)[1]] = v
            elif rest.startswith("mlp.dense2."):
                suffix = rest.rsplit(".", 1)[1]
                out[pre + "ffn.layers.4." + suffix] = (
                    v[..., None, None] if suffix == "weight" else v)
            else:
                raise AssertionError(f"unmapped HF block key {k}")
        else:
            raise AssertionError(f"unmapped HF key {k}")

    # pack q|k|v into nn.MultiheadAttention's in_proj layout
    for k in list(hf_sd):
        kk = k.replace("segformer.", "")
        if m := re.match(r"encoder\.block\.(\d+)\.(\d+)\.attention\.self\.query\.(weight|bias)", kk):
            s, b, kind = m.groups()
            base = kk.rsplit("query.", 1)[0]
            packed = torch.cat([hf_sd[k],
                                hf_sd[k.replace("query", "key")],
                                hf_sd[k.replace("query", "value")]], dim=0)
            out[f"model.backbone.layers.{s}.1.{b}.attn.attn.in_proj_{kind}"] = packed
    return out


def _mmseg_head_sd(dims, decoder_dim, out_channels, seed):
    """Random mmseg `SegformerHead` tensors (ConvModule convs + fusion +
    conv_seg), named as saved by the hub model."""
    import torch

    g = torch.Generator().manual_seed(seed)
    sd = {}

    def convmodule(prefix, cin, cout):
        sd[prefix + ".conv.weight"] = torch.randn(cout, cin, 1, 1, generator=g) * 0.05
        sd[prefix + ".bn.weight"] = 1.0 + 0.1 * torch.randn(cout, generator=g)
        sd[prefix + ".bn.bias"] = 0.1 * torch.randn(cout, generator=g)
        sd[prefix + ".bn.running_mean"] = 0.1 * torch.randn(cout, generator=g)
        sd[prefix + ".bn.running_var"] = 0.5 + torch.rand(cout, generator=g)
        sd[prefix + ".bn.num_batches_tracked"] = torch.tensor(7)

    for i, c in enumerate(dims):
        convmodule(f"model.decode_head.convs.{i}", c, decoder_dim)
    convmodule("model.decode_head.fusion_conv", decoder_dim * len(dims), decoder_dim)
    sd["model.decode_head.conv_seg.weight"] = (
        torch.randn(out_channels, decoder_dim, 1, 1, generator=g) * 0.05)
    sd["model.decode_head.conv_seg.bias"] = 0.1 * torch.randn(out_channels, generator=g)
    return sd


def _mmseg_head_forward(sd, feats):
    """Torch oracle of mmseg SegformerHead.forward: per-stage ConvModule
    (conv->BN->ReLU), bilinear resize to stage-0 scale (align_corners
    False), stage-order concat, fusion ConvModule, conv_seg."""
    import torch
    import torch.nn.functional as F

    def convmodule(prefix, x):
        x = F.conv2d(x, sd[prefix + ".conv.weight"])
        x = F.batch_norm(x, sd[prefix + ".bn.running_mean"],
                         sd[prefix + ".bn.running_var"],
                         sd[prefix + ".bn.weight"], sd[prefix + ".bn.bias"],
                         False, 0.1, 1e-5)
        return F.relu(x)

    outs = []
    for i, f in enumerate(feats):
        t = convmodule(f"model.decode_head.convs.{i}", f)
        if i > 0:
            t = F.interpolate(t, size=feats[0].shape[2:], mode="bilinear",
                              align_corners=False)
        outs.append(t)
    x = convmodule("model.decode_head.fusion_conv", torch.cat(outs, dim=1))
    return F.conv2d(x, sd["model.decode_head.conv_seg.weight"],
                    sd["model.decode_head.conv_seg.bias"])


def _make_segformerpp_checkpoint(num_channels, out_channels, classify, seed):
    """(mmseg-named state dict, HF backbone model) for a fake reference
    segformerpp_b2 checkpoint — real b2 geometry, random weights."""
    import torch
    from transformers import SegformerConfig, SegformerModel

    torch.manual_seed(seed)
    cfg = SegformerConfig(
        num_channels=num_channels, num_encoder_blocks=4, depths=[3, 4, 6, 3],
        sr_ratios=[8, 4, 2, 1], hidden_sizes=[64, 128, 320, 512],
        patch_sizes=[7, 3, 3, 3], strides=[4, 2, 2, 2],
        num_attention_heads=[1, 2, 5, 8], mlp_ratios=[4, 4, 4, 4],
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0, layer_norm_eps=1e-6,
    )
    hf = SegformerModel(cfg).eval()
    sd = _hf_to_mmseg(hf.state_dict())
    sd.update(_mmseg_head_sd((64, 128, 320, 512), 768, out_channels, seed + 1))
    if classify:
        g = torch.Generator().manual_seed(seed + 2)
        sd["visible_classification.weight"] = torch.randn(2, 512, generator=g) * 0.05
        sd["visible_classification.bias"] = torch.zeros(2)
    return sd, hf


@pytest.fixture(scope="module")
def ported(reference_path, tmp_path_factory):
    """(dst_root, CLI results, torch models for parity checks)."""
    sys.path.insert(0, str(reference_path))
    import torch

    src = tmp_path_factory.mktemp("ref_zip")
    dst = tmp_path_factory.mktemp("orbax_zip")

    def save(rel, model_sd, info):
        d = src / rel
        d.mkdir(parents=True, exist_ok=True)
        torch.save({"model_state_dict": model_sd, "identifier": f"id_{rel}",
                    "additional_info": info}, d / "model.pt")

    # The reference wrapper constructors torch.load
    # `initialization/wasb/model.pth` unconditionally (wasb.py:580-582,
    # tabledetection hrnet.py:581-583, strict=False) — satisfy them with an
    # empty state dict and point paths.weights_path at src.
    import paths as ref_paths
    (src / "initialization" / "wasb").mkdir(parents=True)
    torch.save({}, src / "initialization" / "wasb" / "model.pth")
    old_wp = ref_paths.weights_path
    ref_paths.weights_path = str(src)
    try:
        torch.manual_seed(0)
        from balldetection.models.wasb import WASBNet as RefWASB

        wasb = RefWASB(in_frames=3, resolution=(1280, 704)).eval()
        save("inference_balldetection/wasb", wasb.state_dict(),
             {"model_name": "wasb", "in_frames": 3,
              "image_resolution": (1280, 704), "lr": 1e-3, "epoch": 1})

        from tabledetection.models.hrnet import MyHRNet as RefTableHRNet

        thrnet = RefTableHRNet(resolution=(1280, 704)).eval()
        save("inference_tabledetection/hrnet", thrnet.state_dict(),
             {"model_name": "hrnet", "image_resolution": (1280, 704),
              "lr": 1e-3, "epoch": 1})
    finally:
        ref_paths.weights_path = old_wp

    # vitpose: the zip checkpoint is saved from the VitPose wrapper whose
    # backbone lives under `model.` (balldetection/models/vitpose.py:52);
    # build the inner ViTPoseModel directly (no MAE init file needed) and
    # prefix, exactly like tests/test_vitpose.py
    from vit_pose import ViTPoseModel

    torch.manual_seed(1)
    vit_cfg = dict(
        type="TopDown", pretrained=None,
        backbone=dict(type="ViT", img_size=(H, W), patch_size=16,
                      embed_dim=384, depth=12, num_heads=12, ratio=1,
                      use_checkpoint=False, mlp_ratio=4, qkv_bias=True,
                      drop_path_rate=0.3, in_chans=9),
        keypoint_head=dict(type="TopdownHeatmapSimpleHead", in_channels=384,
                           num_deconv_layers=2, num_deconv_filters=(256, 256),
                           num_deconv_kernels=(4, 4),
                           extra=dict(final_conv_kernel=1), out_channels=1),
        train_cfg=dict(),
    )
    vit = ViTPoseModel(vit_cfg).eval()
    save("inference_balldetection/vitpose",
         {f"model.{k}": v for k, v in vit.state_dict().items()},
         {"model_name": "vitpose", "in_frames": 3,
          "image_resolution": (W, H), "lr": 1e-4, "epoch": 1})

    from uplifting.model import get_model as ref_get_uplifting

    torch.manual_seed(2)
    upl = ref_get_uplifting("connectstage", "small", mode="dynamic",
                            time_rotation="new").eval()
    save("inference_uplifting/ours", upl.state_dict(),
         {"name": "connectstage", "size": "small",
          "tabletoken_mode": "dynamic", "time_rotation": "new",
          "transform_mode": "global", "randdet_prob": 0.1,
          "randmiss_prob": 0.1, "tablemiss_prob": 0.1, "epoch": 1})

    # segformerpp checkpoints: mmseg-layout state dicts (what the external
    # KieDani/SegformerPlusPlus hub model saves) — real b2 geometry, random
    # weights, built from an HF SegformerModel renamed to the mmseg tensor
    # naming so torch output parity can be checked
    sppb_sd, sppb_hf = _make_segformerpp_checkpoint(9, 1, classify=True, seed=3)
    save("inference_balldetection/segformerpp_b2", sppb_sd,
         {"model_name": "segformerpp_b2", "in_frames": 3,
          "image_resolution": (W, H), "lr": 1e-4, "epoch": 1})
    sppt_sd, sppt_hf = _make_segformerpp_checkpoint(3, 13, classify=False, seed=4)
    save("inference_tabledetection/segformerpp_b2", sppt_sd,
         {"model_name": "segformerpp_b2",
          "image_resolution": (W, H), "lr": 1e-4, "epoch": 1})
    # a non-mmseg segformerpp dict must be SKIPPED loudly, not crash the CLI
    save("pretraining_blurball/segformerpp_b0", {"anything": torch.zeros(1)},
         {"model_name": "segformerpp_b0", "in_frames": 3,
          "image_resolution": (1920, 1088)})

    results = PRW.main(["--src", str(src), "--dst", str(dst)])
    return dst, results, {"wasb": wasb, "hrnet": thrnet, "vit": vit, "upl": upl,
                          "spp_ball": (sppb_sd, sppb_hf),
                          "spp_table": (sppt_sd, sppt_hf)}


def test_statuses(ported):
    _, results, _ = ported
    assert results["inference_balldetection/wasb/model"] == "ok"
    assert results["inference_tabledetection/hrnet/model"] == "ok"
    assert results["inference_balldetection/vitpose/model"] == "ok"
    assert results["inference_uplifting/ours/model"] == "ok"
    assert results["inference_balldetection/segformerpp_b2/model"] == "ok"
    assert results["inference_tabledetection/segformerpp_b2/model"] == "ok"
    # fork-drift / non-mmseg layouts are skipped loudly, never silently
    assert results["pretraining_blurball/segformerpp_b0/model"].startswith(
        "skipped")
    assert not any(s.startswith("FAILED") for s in results.values())


def test_hubconf_weights_root(ported):
    dst, _, _ = ported
    sys.path.insert(0, "/root/repo")
    import hubconf

    ck = hubconf._checkpoints_from_root(str(dst))
    # ALL FIVE pipeline slots fill from a ported reference weights zip,
    # incl. the segformerpp mains (the reference's hard-coded ensemble,
    # ref: interface.py:255-260)
    assert set(ck) == {"ball_main", "ball_aux", "table_main", "table_aux",
                       "uplifting"}

    pipe = hubconf.full_pipeline(weights_root=str(dst))
    for det in (pipe.ball_detector, pipe.table_detector):
        assert det._variables is not None
        assert det.model.head_style == "mmseg"
        assert det.model.decoder_dim == 768


def _rel_err(a, b):
    return np.abs(a - b).max() / (np.sqrt(np.mean(b**2)) + 1e-8)


def test_wasb_output_parity(ported):
    import torch

    dst, _, models = ported
    from upliftingtabletennis_tpu.models.factory import get_detector

    variables, ident, info = load_checkpoint(
        str(dst / "inference_balldetection" / "wasb" / "model"))
    assert info["model_name"] == "wasb" and info["in_frames"] == 3

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 9, H, W)).astype(np.float32)
    with torch.no_grad():
        ref_out, _ = models["wasb"](torch.tensor(x))
    model, _ = get_detector("wasb", "ball")
    out, _ = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    out = np.asarray(out).transpose(0, 3, 1, 2)
    assert out.shape == ref_out.numpy().shape
    assert _rel_err(out, ref_out.numpy()) < 2e-2


def test_table_hrnet_output_parity(ported):
    import torch

    dst, _, models = ported
    from upliftingtabletennis_tpu.models.factory import get_detector

    variables, _, _ = load_checkpoint(
        str(dst / "inference_tabledetection" / "hrnet" / "model"))
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 3, H, W)).astype(np.float32)
    with torch.no_grad():
        ref_out = models["hrnet"](torch.tensor(x))
    model, _ = get_detector("hrnet", "table")
    out = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    out = np.asarray(out).transpose(0, 3, 1, 2)
    assert out.shape == ref_out.numpy().shape
    assert _rel_err(out, ref_out.numpy()) < 2e-2


def test_vitpose_output_parity(ported):
    import torch

    dst, _, models = ported
    from upliftingtabletennis_tpu.models.factory import get_detector

    variables, _, info = load_checkpoint(
        str(dst / "inference_balldetection" / "vitpose" / "model"))
    assert tuple(info["image_resolution"]) == (W, H)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 9, H, W)).astype(np.float32)
    with torch.no_grad():
        feats = models["vit"].forward_features(torch.tensor(x))
        ref_out = models["vit"].keypoint_head(feats).numpy()
    model, _ = get_detector("vitpose", "ball")
    out, _ = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    out = np.asarray(out).transpose(0, 3, 1, 2)
    assert out.shape == ref_out.shape
    assert _rel_err(out, ref_out) < 2e-2


def test_wasb_torch_init_matches_reference(reference_path, tmp_path):
    """The --torch_init path (filtered load + stem widening) reproduces the
    reference's WASB initialization exactly: a fake `initialization/wasb/
    model.pth` flows through reference WASBNet(in_frames=3) construction
    (ref: wasb.py:580-589) and through torch_init_detector, and the two
    initialized models agree."""
    sys.path.insert(0, str(reference_path))
    import torch

    import paths as ref_paths
    from upliftingtabletennis_tpu.models.factory import get_detector
    from upliftingtabletennis_tpu.utils.port_torch import torch_init_detector

    (tmp_path / "initialization" / "wasb").mkdir(parents=True)
    old_wp = ref_paths.weights_path
    ref_paths.weights_path = str(tmp_path)
    try:
        from balldetection.models.wasb import WASBNet as RefWASB

        # a valid random "published WASB" state dict: the single-frame
        # backbone of the same architecture
        torch.save({}, tmp_path / "initialization" / "wasb" / "model.pth")
        torch.manual_seed(7)
        donor_sd = RefWASB(in_frames=1, resolution=(1280, 704)).model.state_dict()
        torch.save(donor_sd, tmp_path / "initialization" / "wasb" / "model.pth")

        torch.manual_seed(8)
        ref = RefWASB(in_frames=3, resolution=(1280, 704)).eval()
    finally:
        ref_paths.weights_path = old_wp

    model, _ = get_detector("wasb", "ball", in_frames=3)
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 9, H, W)).astype(np.float32)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), x_nhwc)
    variables, n_loaded, n_total = torch_init_detector(
        dict(variables), donor_sd, "wasb", in_frames=3)
    assert n_loaded == n_total  # donor covers the whole tree (conv1 via tiling)

    with torch.no_grad():
        ref_out, _ = ref(torch.tensor(x))
    out, _ = model.apply(variables, x_nhwc)
    out = np.asarray(out).transpose(0, 3, 1, 2)
    assert _rel_err(out, ref_out.numpy()) < 2e-2


def test_vitpose_mae_init_semantics(reference_path):
    """MAE init: backbone tensors are loaded name+shape-filtered, the patch
    embed is widened by tiling/3 (ref: vitpose.py:56-78), and head tensors
    keep their init values."""
    sys.path.insert(0, str(reference_path))
    import torch

    from vit_pose import ViTPoseModel
    from upliftingtabletennis_tpu.models.factory import get_detector
    from upliftingtabletennis_tpu.utils.port_torch import torch_init_detector

    torch.manual_seed(9)
    cfg = dict(
        type="TopDown", pretrained=None,
        backbone=dict(type="ViT", img_size=(H, W), patch_size=16,
                      embed_dim=384, depth=12, num_heads=12, ratio=1,
                      use_checkpoint=False, mlp_ratio=4, qkv_bias=True,
                      drop_path_rate=0.3, in_chans=3),
        keypoint_head=dict(type="TopdownHeatmapSimpleHead", in_channels=384,
                           num_deconv_layers=2, num_deconv_filters=(256, 256),
                           num_deconv_kernels=(4, 4),
                           extra=dict(final_conv_kernel=1), out_channels=1),
        train_cfg=dict(),
    )
    donor_sd = ViTPoseModel(cfg).backbone.state_dict()

    model, _ = get_detector("vitpose", "ball", in_frames=3)
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, H, W, 9)))
    init_head = np.asarray(jax.tree.leaves(
        variables["params"]["model_keypoint_head"])[0])
    ported, n_loaded, n_total = torch_init_detector(
        dict(variables), donor_sd, "vitpose", in_frames=3)
    assert 0 < n_loaded < n_total  # backbone loaded, head kept

    # widened patch embed: HWIO tiling of the donor's OIHW kernel / 3
    donor_pe = donor_sd["patch_embed.proj.weight"].numpy()  # (D, 3, k, k)
    expect = np.concatenate([donor_pe] * 3, axis=1).transpose(2, 3, 1, 0) / 3.0
    got = np.asarray(
        ported["params"]["model_backbone"]["patch_embed_proj"]["kernel"])
    np.testing.assert_allclose(got, expect, atol=1e-6)
    # a mid-block tensor ported verbatim
    np.testing.assert_allclose(
        np.asarray(ported["params"]["model_backbone"]["blocks_5"]["mlp_fc1"]
                   ["kernel"]),
        donor_sd["blocks.5.mlp.fc1.weight"].numpy().T, atol=1e-6)
    # head untouched
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(
            ported["params"]["model_keypoint_head"])[0]), init_head)


def test_uplifting_roundtrip_parity(ported):
    import torch

    dst, _, models = ported
    model, params, ident, info = load_model_from_checkpoint(
        str(dst / "inference_uplifting" / "ours" / "model"))
    assert info["transform_mode"] == "global"

    rng = np.random.default_rng(42)
    B, T = 2, 50
    ball = rng.normal(size=(B, T, 2)).astype(np.float32)
    table = rng.normal(size=(B, 13, 3)).astype(np.float32)
    mask = np.ones((B, T), np.float32)
    mask[:, 40:] = 0.0  # reference requires mixed 0/1 masks (model.py:540-546)
    times = np.cumsum(rng.uniform(0.01, 0.05, size=(B, T)), axis=1).astype(
        np.float32)

    with torch.no_grad():
        ref_rot, ref_pos = models["upl"](
            torch.tensor(ball), torch.tensor(table), torch.tensor(mask),
            torch.tensor(times))
    rot, pos = model.apply({"params": params}, jnp.asarray(ball),
                           jnp.asarray(table), jnp.asarray(mask),
                           jnp.asarray(times))
    valid = mask.astype(bool)
    assert _rel_err(np.asarray(rot), ref_rot.numpy()) < 2e-2
    assert _rel_err(np.asarray(pos)[valid], ref_pos.numpy()[valid]) < 2e-2


def _segformerpp_parity(ported, which, task, in_ch, classify, seed):
    """Shared body: ported segformerpp_b2 checkpoint vs the torch oracle
    (HF backbone forward + functional mmseg head on the saved tensors)."""
    import torch

    dst, _, models = ported
    sd, hf = models[which]
    sub = "inference_balldetection" if task == "ball" else "inference_tabledetection"
    variables, _, info = load_checkpoint(str(dst / sub / "segformerpp_b2" / "model"))
    assert info["flax_head_style"] == "mmseg" and info["decoder_dim"] == 768

    from upliftingtabletennis_tpu.models.factory import get_detector

    model, _ = get_detector("segformerpp_b2", task, in_frames=in_ch // 3,
                            classify_invisible=classify,
                            head_style="mmseg", decoder_dim=768)
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(1, in_ch, H, W)).astype(np.float32)
    with torch.no_grad():
        hs = hf(torch.tensor(x), output_hidden_states=True).hidden_states
        ref_heat = _mmseg_head_forward(sd, list(hs)).numpy()
    out, cls_out = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    out = np.asarray(out).transpose(0, 3, 1, 2)
    assert out.shape == ref_heat.shape
    assert _rel_err(out, ref_heat) < 2e-2
    if classify:
        with torch.no_grad():
            pooled = hs[-1].mean(dim=(2, 3))
            ref_cls = (pooled @ sd["visible_classification.weight"].T
                       + sd["visible_classification.bias"]).numpy()
        assert _rel_err(np.asarray(cls_out), ref_cls) < 2e-2
    else:
        assert cls_out is None


def test_segformerpp_ball_output_parity(ported):
    """The ported MAIN ball detector (ref: interface.py:255-256) reproduces
    the external-hub torch model's heatmap AND visible-classification
    outputs."""
    _segformerpp_parity(ported, "spp_ball", "ball", 9, classify=True, seed=11)


def test_segformerpp_table_output_parity(ported):
    _segformerpp_parity(ported, "spp_table", "table", 3, classify=False, seed=12)


def test_fetch_weights_file_url(tmp_path):
    """The auto-download machinery (ref: interface.py:34-79): zip download
    (file:// here — no egress in this environment), extraction, wrapping-
    folder descent, and download-once/extract-once caching semantics."""
    import os
    import zipfile

    from upliftingtabletennis_tpu.utils.port_reference_weights import fetch_weights

    # a zip with the reference's single wrapping folder
    src = tmp_path / "payload" / "tt_weights"
    (src / "inference_balldetection" / "wasb").mkdir(parents=True)
    (src / "inference_balldetection" / "wasb" / "model.pt").write_bytes(b"x")
    zpath = tmp_path / "weights.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for p in sorted(src.rglob("*")):
            z.write(p, p.relative_to(tmp_path / "payload"))

    cache = tmp_path / "cache"
    root = fetch_weights(f"file://{zpath}", cache_dir=str(cache))
    # descended through the wrapping folder to the layout root
    assert os.path.isfile(
        os.path.join(root, "inference_balldetection", "wasb", "model.pt")
    )
    # caching: the source zip can disappear, the cache still serves
    zpath.unlink()
    root2 = fetch_weights(f"file://{tmp_path}/weights.zip", cache_dir=str(cache))
    assert root2 == root
