"""Detector speed harness (ref: balldetection/models/compare_speed.py:10-32,
tabledetection/models/compare_speed.py).

  python -m upliftingtabletennis_tpu.eval.compare_speed [--task ball]
      [--models segformerpp_b0 wasb ...] [--batch 8] [--iters 50]

Per model at its native input resolution: average seconds/batch, FPS and
parameter count, on whatever accelerator jax selects (the reference runs
torch-CUDA). Batched random input, compile excluded (one warmup).
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def measure(task: str, name: str, batch: int, iters: int, resolution=None, dtype="bfloat16"):
    import jax
    import jax.numpy as jnp

    from upliftingtabletennis_tpu.models.factory import get_detector

    model, (W, H) = get_detector(name, task, train=False)
    if resolution:
        W, H = resolution
    C = 9 if task == "ball" else 3
    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    x = jnp.asarray(np.random.default_rng(0).normal(size=(batch, H, W, C)), dt)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    if dt == jnp.bfloat16:
        variables = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, variables
        )
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))

    @jax.jit
    def fwd(x):
        out = model.apply(variables, x)
        out = out[0] if isinstance(out, tuple) else out
        # scalar carry: forces real execution in the timing loop below
        return out, jnp.sum(out, dtype=jnp.float32)

    _, acc = fwd(x)  # compile
    np.asarray(acc)  # block_until_ready is unreliable on remoted backends
    t0 = time.perf_counter()
    for _ in range(iters):
        _, acc = fwd(x)
    np.asarray(acc)  # host readback = real completion barrier
    dt = (time.perf_counter() - t0) / iters
    return {
        "model": name,
        "resolution": (W, H),
        "sec_per_batch": dt,
        "fps": batch / dt,
        "params_M": n_params / 1e6,
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--task", choices=["ball", "table"], default="ball")
    p.add_argument("--models", nargs="*", default=None)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--resolution", type=int, nargs=2, default=None)
    p.add_argument("--dtype", choices=["bfloat16", "float32"], default="bfloat16",
                   help="inference dtype (bf16 = TPU-native; f32 needs small batches)")
    args = p.parse_args(argv)

    from upliftingtabletennis_tpu.models.factory import BALL_MODELS, TABLE_MODELS

    models = args.models or (BALL_MODELS if args.task == "ball" else TABLE_MODELS)
    for name in models:
        m = measure(args.task, name, args.batch, args.iters, args.resolution, args.dtype)
        print(
            f"{m['model']:16s} {m['resolution'][0]}x{m['resolution'][1]}  "
            f"{m['sec_per_batch'] * 1000:8.2f} ms/batch  {m['fps']:8.1f} FPS  "
            f"{m['params_M']:6.2f}M params"
        )


if __name__ == "__main__":
    main()
