"""Bisect detector chunk time: forward vs preprocessing vs peak extraction.

Forces completion via a tiny device->host fetch (block_until_ready is a
no-op on the axon platform). One-off perf tooling, like profile_pipeline.py.
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def force(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jnp.ravel(leaf)[:1])


def timeit(fn, *args, iters=5):
    force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    force(r)
    return (time.perf_counter() - t0) / iters


def main():
    from upliftingtabletennis_tpu.models.factory import get_detector
    from upliftingtabletennis_tpu.ops.peak import extract_peaks
    from upliftingtabletennis_tpu.data.image_transforms import normalize_image

    chunk = 8
    rng = np.random.default_rng(0)

    for model_name, task in [
        ("segformerpp_b2", "ball"),
        ("wasb", "ball"),
        ("segformerpp_b2", "table"),
        ("hrnet", "table"),
    ]:
        model, (MW, MH) = get_detector(model_name, task, train=False)
        C_in = 9 if task == "ball" else 3
        x_f32 = jnp.asarray(rng.uniform(0, 255, (chunk, MH, MW, C_in)), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x_f32[:1])
        variables = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, variables
        )

        @jax.jit
        def fwd(x):
            out = model.apply(variables, x.astype(jnp.bfloat16))
            heat = out[0] if isinstance(out, tuple) else out
            return heat.astype(jnp.float32)

        @jax.jit
        def prep(raw):
            B = raw.shape[0]
            img = raw.astype(jnp.float32)
            x = jax.image.resize(img, (B, MH, MW, C_in), "bilinear", antialias=False)
            return normalize_image(x)

        raw = jnp.asarray(rng.integers(0, 255, (chunk, 1080, 1920, C_in)), jnp.uint8)
        heat = fwd(x_f32)
        hm = jnp.moveaxis(heat, -1, 1)

        @jax.jit
        def peaks(h):
            return extract_peaks(h, 1920, 1080, threshold=-np.inf)

        t_prep = timeit(prep, raw)
        t_fwd = timeit(fwd, x_f32)
        t_peak = timeit(peaks, hm)
        print(
            f"{model_name:15s} {task:5s} res=({MW},{MH}) heat={tuple(hm.shape)}: "
            f"prep {t_prep*1e3:7.1f} ms  fwd {t_fwd*1e3:7.1f} ms  peaks {t_peak*1e3:7.1f} ms"
        )


if __name__ == "__main__":
    main()
