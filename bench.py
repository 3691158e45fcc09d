"""Benchmark: full-pipeline video frames/sec on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Protocol = the reference's headline workload (BASELINE.md north star;
ref: inference/inference_combined.py): per video frame run BOTH ball
detectors (segformerpp_b2 @1600x896 + wasb @1280x704 on 3-frame triplets)
and BOTH table detectors (segformerpp_b2 + hrnet), dual-model filtering,
the uplifting transformer and RANSAC camera calibration — i.e. everything
`TableTennisPipeline.predict` + `calibrate_camera` do — on a synthetic
1920x1080 rally. Detectors run in bf16 with fused resize/normalize/peak
extraction, chunked at 8 frames.

vs_baseline: the reference cannot run here (its detection backbones
auto-download from external hubs and need CUDA; this host has no egress
and no GPU), so the field reports the ratio against this machine's
torch-CPU on the only commonly-runnable component (the uplifting
transformer forward at batch 256) as a conservative proxy.
"""
import json
import time

import numpy as np


def pipeline_fps():
    import jax

    from upliftingtabletennis_tpu.pipeline.interface import TableTennisPipeline

    pipe = TableTennisPipeline(chunk=8)
    rng = np.random.default_rng(0)
    T = 33
    frames = [rng.uniform(0, 255, (1080, 1920, 3)).astype(np.float32) for _ in range(T)]

    # warmup: compiles all four detectors + uplifting + calibration
    spin, pos3d = pipe.predict(frames, fps=50)
    table = np.concatenate([rng.uniform(100, 900, (13, 2)), np.ones((13, 1))], -1)
    pipe.calibrate_camera(table)

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        pipe.predict(frames, fps=50)
        pipe.calibrate_camera(table)
    dt = time.perf_counter() - t0
    return T * iters / dt


def uplifting_ratio_vs_torch_cpu():
    """Conservative proxy baseline: uplifting fwd here vs torch CPU."""
    try:
        import jax
        import jax.numpy as jnp

        from upliftingtabletennis_tpu.models import get_uplifting_model

        B, T = 256, 50
        model = get_uplifting_model("connectstage", "large", mode="dynamic")
        rng = np.random.default_rng(0)
        ball = jnp.asarray(rng.uniform(size=(B, T, 2)), jnp.float32)
        table = jnp.asarray(
            np.concatenate([rng.uniform(size=(B, 13, 2)), np.ones((B, 13, 1))], -1), jnp.float32
        )
        mask_np = np.ones((B, T), np.float32)
        mask_np[:, 45:] = 0
        mask = jnp.asarray(mask_np)
        times = jnp.asarray((np.arange(T, dtype=np.float32) / 50)[None].repeat(B, 0) * mask_np)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), ball, table, mask, times)["params"]

        fwd = jax.jit(lambda *a: model.apply({"params": params}, *a))
        jax.block_until_ready(fwd(ball, table, mask, times))
        t0 = time.perf_counter()
        for _ in range(20):
            r = fwd(ball, table, mask, times)
        jax.block_until_ready(r)
        tpu_tps = B * 20 / (time.perf_counter() - t0)

        import sys

        sys.path.insert(0, "/root/reference")
        import torch
        from uplifting.model import get_model as ref_get_model

        tm = ref_get_model("connectstage", "large", mode="dynamic", time_rotation="new")
        tm.eval()
        tb = (torch.tensor(np.asarray(ball)), torch.tensor(np.asarray(table)),
              torch.tensor(mask_np), torch.tensor(np.asarray(times)))
        with torch.no_grad():
            tm(*tb)
            t0 = time.perf_counter()
            for _ in range(3):
                tm(*tb)
            ref_tps = B * 3 / (time.perf_counter() - t0)
        return tpu_tps / ref_tps
    except Exception:
        return None


def main():
    fps = pipeline_fps()
    ratio = uplifting_ratio_vs_torch_cpu()
    print(
        json.dumps(
            {
                "metric": "full_pipeline_frames_per_sec",
                "value": round(fps, 2),
                "unit": "video frames/sec/chip (1920x1080; b2+wasb ball, b2+hrnet table, uplifting-large, RANSAC calib; bf16)",
                "vs_baseline": round(ratio, 1) if ratio else None,
            }
        )
    )


if __name__ == "__main__":
    main()
