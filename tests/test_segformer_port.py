"""Golden-parity test for the HF Segformer -> MiTBackbone weight port.

The reference initializes its SegFormer++ from ImageNet-pretrained MiT
weights pulled from an external hub (ref: balldetection/models/
segformer_pp.py:12-19) — not vendored, and no egress here. HuggingFace's
`SegformerModel` implements the same MiT encoder, so the port path is
validated OFFLINE against a randomly initialized HF model: port its state
dict, run both models on the same input, and require per-stage feature
parity. A user mounting real `nvidia/mit-bN` weights then has a verified
initialization path (utils/port_torch.port_hf_segformer_backbone).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from upliftingtabletennis_tpu.models.segformer import MiTBackbone
from upliftingtabletennis_tpu.utils.port_torch import port_hf_segformer_backbone


def test_hf_segformer_port_feature_parity():
    from transformers import SegformerConfig, SegformerModel

    torch.manual_seed(0)
    # mit-b0 geometry (matches CFG['b0']): 4 stages, depths 2/2/2/2
    cfg = SegformerConfig(
        num_channels=3, num_encoder_blocks=4, depths=[2, 2, 2, 2],
        sr_ratios=[8, 4, 2, 1], hidden_sizes=[32, 64, 160, 256],
        patch_sizes=[7, 3, 3, 3], strides=[4, 2, 2, 2],
        num_attention_heads=[1, 2, 5, 8], mlp_ratios=[4, 4, 4, 4],
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0, layer_norm_eps=1e-6,
    )
    hf = SegformerModel(cfg).eval()

    params = port_hf_segformer_backbone(hf.state_dict())
    model = MiTBackbone(size="b0")

    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 64, 96, 3)).astype(np.float32)  # H,W div by 32
    with torch.no_grad():
        out = hf(torch.tensor(x.transpose(0, 3, 1, 2)), output_hidden_states=True)
    feats = model.apply({"params": params}, jnp.asarray(x))

    assert len(out.hidden_states) == 4
    for s, (hf_f, jx_f) in enumerate(zip(out.hidden_states, feats)):
        ref = hf_f.numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC
        got = np.asarray(jx_f)
        assert got.shape == ref.shape, (s, got.shape, ref.shape)
        scale = np.abs(ref).mean() + 1e-6
        err = np.abs(got - ref).max() / scale
        assert err < 2e-3, (s, err)


def test_hf_backbone_cli_merge(tmp_path):
    """--hf_backbone end-to-end: save a random HF state dict, run one
    detector training step with the ported ImageNet-init path."""
    from transformers import SegformerConfig, SegformerModel

    cfg = SegformerConfig(
        depths=[2, 2, 2, 2], sr_ratios=[8, 4, 2, 1],
        hidden_sizes=[32, 64, 160, 256], num_attention_heads=[1, 2, 5, 8],
    )
    sd_path = tmp_path / "mit_b0.pt"
    torch.save(SegformerModel(cfg).state_dict(), sd_path)

    # minimal TTHQ layout for the trainer (shape of the detection fixture)
    import cv2

    root = tmp_path / "data"
    tthq = root / "tthq"
    rng = np.random.default_rng(0)
    rows = ["video;frame;ball_x;ball_y;ball_flag"]
    H, W = 96, 128
    for video in (1, 2):
        vdir = tthq / f"{video:02d}"
        vdir.mkdir(parents=True)
        for frame in range(8):
            img = rng.integers(0, 60, (H, W, 3), dtype=np.uint8)
            bx, by = rng.uniform(10, W - 10), rng.uniform(10, H - 10)
            cv2.circle(img, (int(bx), int(by)), 3, (255, 255, 255), -1)
            cv2.imwrite(str(vdir / f"{video:02d}_{frame:06d}.png"), img)
            if 1 <= frame <= 6:
                rows.append(f"{video};{frame};{bx:.1f};{by:.1f};2")
    (tthq / "ball_detection.csv").write_text("\n".join(rows))

    from upliftingtabletennis_tpu.train import run_detection

    run_detection.main([
        "--task", "ball", "--model", "segformerpp_b0", "--data_root", str(root),
        "--hf_backbone", str(sd_path), "--num_epochs", "1", "--max_steps", "1",
        "--batch_size", "2", "--resolution", "96", "64",
        "--save_dir", str(tmp_path / "sv"), "--logdir", str(tmp_path / "tb"),
        "--val_samples", "2",
    ])

    # regression: --in_frames 1 must widen the patch embed to 3 channels,
    # not the ball-task default 9 (n_in = 3*in_frames, not task-keyed)
    run_detection.main([
        "--task", "ball", "--model", "segformerpp_b0", "--data_root", str(root),
        "--in_frames", "1",
        "--hf_backbone", str(sd_path), "--num_epochs", "1", "--max_steps", "1",
        "--batch_size", "2", "--resolution", "96", "64",
        "--save_dir", str(tmp_path / "sv1"), "--logdir", str(tmp_path / "tb1"),
        "--val_samples", "2",
    ])
