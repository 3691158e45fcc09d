"""Round-trip test for the reference weights-zip porting CLI.

Builds a fake reference weights directory (REAL reference torch model
classes, random weights, saved in the reference's checkpoint format,
ref: balldetection/helper_balldetection.py:510-529), runs
`port_reference_weights.main`, then loads the Orbax output through this
framework's own loaders and pins output parity against the torch originals.
"""
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

    # segformerpp checkpoints carry the external hub repo's (unavailable)
    # tensor naming — the CLI must skip them with a warning, not fail
    save("inference_balldetection/segformerpp_b2", {"anything": torch.zeros(1)},
         {"model_name": "segformerpp_b2", "in_frames": 3,
          "image_resolution": (1600, 896)})

    results = PRW.main(["--src", str(src), "--dst", str(dst)])
    return dst, results, {"wasb": wasb, "hrnet": thrnet, "vit": vit, "upl": upl}


def test_statuses(ported):
    _, results, _ = ported
    assert results["inference_balldetection/wasb/model"] == "ok"
    assert results["inference_tabledetection/hrnet/model"] == "ok"
    assert results["inference_balldetection/vitpose/model"] == "ok"
    assert results["inference_uplifting/ours/model"] == "ok"
    assert results["inference_balldetection/segformerpp_b2/model"].startswith(
        "skipped")
    assert not any(s.startswith("FAILED") for s in results.values())


def test_hubconf_weights_root(ported):
    dst, _, _ = ported
    sys.path.insert(0, "/root/repo")
    import hubconf

    ck = hubconf._checkpoints_from_root(str(dst))
    # everything portable offline is wired up; the segformerpp mains are
    # documented-unsupported (external hub naming) and stay absent
    assert set(ck) == {"ball_aux", "table_aux", "uplifting"}


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
