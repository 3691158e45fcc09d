"""Hub-style entry points (ref: hubconf.py:11-88 of the reference).

Usage (in-repo analogue of torch.hub.load):

    from hubconf import full_pipeline, ball_detection, table_detection
    pipeline = full_pipeline(checkpoints={...})

Checkpoints are this framework's Orbax directories (utils/checkpoint.py);
`checkpoints` maps {'ball_main', 'ball_aux', 'table_main', 'table_aux',
'uplifting'} to paths. Weight sources, mirroring the reference's hub
auto-download (ref: interface.py:29-79):

* `weights_root=<dir>` — a local directory with the reference zip's
  sub-layout (already ported to Orbax);
* `weights_url=<zip url>` — the reference's actual flow: the zip is
  downloaded (https:// — or file:// for a local copy, since this dev
  environment has no egress), extracted, ported to Orbax
  (`utils/port_reference_weights.fetch_and_port`), and cached under
  ~/.cache/upliftingtabletennis_tpu/weights; subsequent calls reuse the
  cache exactly like the reference's torch.hub checkpoint dir.
"""
from __future__ import annotations

import os
from typing import Optional

dependencies = ["jax", "flax", "optax", "numpy"]


def _checkpoints_from_root(weights_root: Optional[str]):
    if weights_root is None:
        return {}
    layout = {
        "ball_main": "inference_balldetection/segformerpp_b2/model",
        "ball_aux": "inference_balldetection/wasb/model",
        "table_main": "inference_tabledetection/segformerpp_b2/model",
        "table_aux": "inference_tabledetection/hrnet/model",
        "uplifting": "inference_uplifting/ours/model",
    }
    out = {}
    for key, rel in layout.items():
        path = os.path.join(weights_root, rel)
        if os.path.isdir(path):
            out[key] = path
    return out


def ball_detection(model_name: str = "segformerpp_b2", checkpoint: Optional[str] = None, **kw):
    """Ball detector (ref: hubconf.py:11-18)."""
    from upliftingtabletennis_tpu.pipeline import BallDetector

    return BallDetector(model_name, checkpoint, **kw)


def table_detection(model_name: str = "segformerpp_b2", checkpoint: Optional[str] = None, **kw):
    """Table keypoint detector (ref: hubconf.py:19-26)."""
    from upliftingtabletennis_tpu.pipeline import TableDetector

    return TableDetector(model_name, checkpoint, **kw)


def uplifting(checkpoint: Optional[str] = None, **kw):
    """2D->3D uplifting model."""
    from upliftingtabletennis_tpu.pipeline import UpliftingModel

    return UpliftingModel(checkpoint, **kw)


def full_pipeline(checkpoints: Optional[dict] = None,
                  weights_root: Optional[str] = None,
                  weights_url: Optional[str] = None, **kw):
    """Complete video -> 3D + spin pipeline (ref: hubconf.py:27-31)."""
    from upliftingtabletennis_tpu.pipeline import TableTennisPipeline

    if weights_url and weights_root is None:
        from upliftingtabletennis_tpu.utils.port_reference_weights import (
            fetch_and_port,
        )

        weights_root = fetch_and_port(weights_url)
    ck = dict(_checkpoints_from_root(weights_root))
    ck.update(checkpoints or {})
    return TableTennisPipeline(ck, **kw)


def download_example_images(local_folder: str = "example_images",
                            n_frames: int = 40, seed: int = 0):
    """Provide a folder of example frames to run the pipeline on
    (ref: hubconf.py:34-88 — same contract: idempotent, returns the folder
    path containing numbered PNG frames of one rally).

    The reference downloads real example frames from its GitHub release;
    this environment has no network egress, so the frames are GENERATED
    locally instead: one physics-engine rally (core/physics + data/datagen)
    is projected through a sampled broadcast camera and rendered at the
    pipeline's working resolution (data/render_rally — the closed-loop
    protocol's renderer). A `meta.json` with fps and the physics ground
    truth (3D positions, spin) is written alongside so predictions can be
    checked.
    """
    import json

    if os.path.isdir(local_folder) and len(os.listdir(local_folder)) > 0:
        print(f"Images already present in '{local_folder}'. Skipping generation.")
        return local_folder
    os.makedirs(local_folder, exist_ok=True)

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from upliftingtabletennis_tpu.core.geometry import HEIGHT as UPL_H, WIDTH as UPL_W
    from upliftingtabletennis_tpu.data import datagen as DG
    from upliftingtabletennis_tpu.data import synthetic as SYN
    from upliftingtabletennis_tpu.data.render_rally import (
        project_context,
        render_frames,
        rescale_px,
    )

    EVAL_W, EVAL_H = 1920, 1080
    key = jax.random.PRNGKey(seed)
    res = DG.generate_dataset(key, 64, "intermediate", "left_to_right")
    store = jax.tree.map(jnp.asarray, SYN.store_from_datagen(res))
    sample = jax.jit(lambda k, s: SYN.assemble_batch(k, s, jnp.asarray([0]), train=True))(
        jax.random.PRNGKey(seed + 1), store
    )
    mask = np.asarray(sample["mask"][0])
    T = min(int(mask.sum()), n_frames)
    ball_eval = rescale_px(sample["r_img"][0], (UPL_W, UPL_H), (EVAL_W, EVAL_H))
    table_eval = rescale_px(
        sample["table_img"][0][:, :2], (UPL_W, UPL_H), (EVAL_W, EVAL_H)
    )
    ctx_eval = rescale_px(
        project_context(sample["Mint"][0], sample["Mext"][0]),
        (UPL_W, UPL_H), (EVAL_W, EVAL_H),
    )
    frames = np.asarray(
        render_frames(
            jax.random.PRNGKey(seed + 2), ball_eval[:T], jnp.asarray(mask[:T]),
            table_eval, height=EVAL_H, width=EVAL_W, context_px=ctx_eval,
        )
    )
    for i, frame in enumerate(frames):
        cv2.imwrite(
            os.path.join(local_folder, f"frame_{i:04d}.png"), frame[..., ::-1]
        )
    times = np.asarray(sample["times"][0][:T])
    fps = 1.0 / max(float(times[1] - times[0]), 1e-6)
    with open(os.path.join(local_folder, "meta.json"), "w") as f:
        json.dump(
            {
                "fps": fps,
                "n_frames": int(T),
                "ball_px_1920x1080": np.asarray(ball_eval[:T]).tolist(),
                "pos3d_world_m": np.asarray(sample["r_world"][0][:T]).tolist(),
                "spin_rad_s": np.asarray(sample["rotation"][0]).tolist(),
            },
            f,
        )
    print(f"Generated {T} example frames in '{local_folder}'.")
    return local_folder
