"""One-off profiling harness for the full-pipeline perf work (round 2).

Times each pipeline stage in steady state on the real chip, plus raw
dispatch latency, to separate tunnel/dispatch overhead from compute.
Not part of the package; kept at repo root next to bench.py.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=5):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def main():
    from upliftingtabletennis_tpu.pipeline.interface import BallDetector, TableDetector

    # raw dispatch latency: trivial jitted op round-trip
    tiny = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,))
    d = timeit(tiny, x, iters=20)
    print(f"dispatch+sync latency (tiny op): {d*1000:.1f} ms")

    # transfer: 33 frames uint8 1080p -> device
    frames = np.random.default_rng(0).integers(0, 255, (33, 1080, 1920, 3), np.uint8)
    t0 = time.perf_counter()
    fd = jax.device_put(frames)
    jax.block_until_ready(fd)
    print(f"upload 33x1080p uint8 ({frames.nbytes/1e6:.0f} MB): {(time.perf_counter()-t0)*1000:.0f} ms")

    chunk = 8
    for name, cls, task in [
        ("ball segformerpp_b2", BallDetector, "ball"),
        ("ball wasb", BallDetector, "ball"),
        ("table segformerpp_b2", TableDetector, "table"),
        ("table hrnet", TableDetector, "table"),
    ]:
        model_name = name.split()[-1]
        det = cls(model_name, chunk=chunk)
        det._ensure_init(9 if task == "ball" else 3)
        idx = jnp.arange(1, 1 + chunk, dtype=jnp.int32)
        t = timeit(det._predict_chunk, fd, idx, iters=5)
        print(f"{name:22s} res={det.resolution} chunk={chunk}: {t*1000:7.1f} ms/chunk = {t/chunk*1000:6.1f} ms/frame")


if __name__ == "__main__":
    main()
