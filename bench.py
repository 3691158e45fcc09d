"""Benchmark: flagship uplifting-model inference throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol: connectstage-large forward (the paper model,
ref: uplifting/train.py:17-21) on padded 50-token trajectories, batch 256.
Unit = trajectories/sec (each trajectory = one rally uplifted to 3D + spin).
vs_baseline compares against the reference PyTorch implementation measured
on this host's CPU ONLY when TPU is unavailable; on TPU the baseline field
reports the same-host torch-CPU throughput ratio as a lower bound (the
reference publishes no numbers, BASELINE.md).
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from upliftingtabletennis_tpu.models import get_uplifting_model

    B, T = 256, 50
    model = get_uplifting_model("connectstage", "large", mode="dynamic")
    rng = np.random.default_rng(0)
    ball = jnp.asarray(rng.uniform(size=(B, T, 2)), jnp.float32)
    table = jnp.asarray(
        np.concatenate([rng.uniform(size=(B, 13, 2)), np.ones((B, 13, 1))], -1),
        jnp.float32,
    )
    mask_np = np.ones((B, T), np.float32)
    mask_np[:, 45:] = 0
    mask = jnp.asarray(mask_np)
    times = jnp.asarray((np.arange(T, dtype=np.float32) / 50)[None].repeat(B, 0) * mask_np)

    params = jax.jit(model.init)(jax.random.PRNGKey(0), ball, table, mask, times)["params"]

    @jax.jit
    def fwd(ball, table, mask, times):
        return model.apply({"params": params}, ball, table, mask, times)

    # warmup / compile
    r = fwd(ball, table, mask, times)
    jax.block_until_ready(r)

    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fwd(ball, table, mask, times)
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0
    traj_per_sec = B * iters / dt

    # reference torch-CPU throughput on the same protocol (best-effort)
    vs_baseline = None
    try:
        import sys

        sys.path.insert(0, "/root/reference")
        import torch
        from uplifting.model import get_model as ref_get_model

        tm = ref_get_model("connectstage", "large", mode="dynamic", time_rotation="new")
        tm.eval()
        tb = (
            torch.tensor(np.asarray(ball)),
            torch.tensor(np.asarray(table)),
            torch.tensor(mask_np),
            torch.tensor(np.asarray(times)),
        )
        with torch.no_grad():
            tm(*tb)
            n = 5
            t0 = time.perf_counter()
            for _ in range(n):
                tm(*tb)
            ref_dt = time.perf_counter() - t0
        ref_tps = B * n / ref_dt
        vs_baseline = traj_per_sec / ref_tps
    except Exception:
        pass

    print(
        json.dumps(
            {
                "metric": "uplifting_traj_per_sec",
                "value": round(traj_per_sec, 1),
                "unit": "trajectories/sec (connectstage-large, B=256, T=50)",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
            }
        )
    )


if __name__ == "__main__":
    main()
