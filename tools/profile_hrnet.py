"""Drill into HRNet/SegFormer forward time: raw conv costs at the hot
shapes, stem-vs-stages split, and chunk-size scaling."""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def force(x):
    np.asarray(jnp.ravel(jax.tree.leaves(x)[0])[:1])


def timeit(fn, *args, iters=5):
    force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    force(r)
    return (time.perf_counter() - t0) / iters


def conv_bench(B, H, W, Cin, Cout, k=3, stride=1, dtype=jnp.bfloat16, iters=10):
    x = jnp.zeros((B, H, W, Cin), dtype)
    w = jnp.zeros((k, k, Cin, Cout), dtype)

    @jax.jit
    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    t = timeit(f, x, w, iters=iters)
    flops = 2 * B * (H // stride) * (W // stride) * k * k * Cin * Cout
    print(
        f"conv {k}x{k} s{stride} {Cin:4d}->{Cout:4d} @{B}x{H}x{W}: "
        f"{t*1e3:7.2f} ms  {flops/t/1e12:6.1f} TFLOP/s"
    )


def main():
    print("=== raw conv costs (bf16, NHWC) ===")
    B = 8
    # HRNet stem + branch shapes at 1280x704
    conv_bench(B, 704, 1280, 27, 64)     # stem conv1 (ball, 9ch in x3 frames)
    conv_bench(B, 704, 1280, 64, 64)     # stem conv2
    conv_bench(B, 704, 1280, 32, 32)     # layer1 bottleneck conv2
    conv_bench(B, 704, 1280, 16, 16)     # branch0 basic blocks
    conv_bench(B, 352, 640, 32, 32)      # branch1
    conv_bench(B, 704, 1280, 64, 128, k=1)  # 1x1 at full res
    # SegFormer head fuse (as 1x1 conv == matmul)
    conv_bench(B, 224, 400, 3072, 768, k=1)

    print("=== matmul reference ===")
    a = jnp.zeros((8192, 4096), jnp.bfloat16)
    b = jnp.zeros((4096, 4096), jnp.bfloat16)

    @jax.jit
    def mm(a, b):
        return a @ b

    t = timeit(mm, a, b, iters=10)
    print(f"matmul 8192x4096x4096 bf16: {t*1e3:.2f} ms  {2*8192*4096*4096/t/1e12:.1f} TFLOP/s")

    print("=== hrnet table: full vs stem-only ===")
    from upliftingtabletennis_tpu.models.hrnet import HRNet
    import flax.linen as nn

    class StemOnly(nn.Module):
        @nn.compact
        def __call__(self, x):
            from upliftingtabletennis_tpu.models.hrnet import _bn, _conv, Bottleneck

            x = _conv(64, 3, 1, "conv1")(x)
            x = _bn("bn1", False)(x)
            x = nn.relu(x)
            x = _conv(64, 3, 1, "conv2")(x)
            x = _bn("bn2", False)(x)
            x = nn.relu(x)
            x = Bottleneck(32, 1, True, False, name="layer1_0")(x)
            return x

    for name, model in [("stem+layer1", StemOnly()), ("full", HRNet(13, 1))]:
        x = jnp.zeros((B, 704, 1280, 3), jnp.bfloat16)
        v = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
        v = jax.tree.map(lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, v)
        f = jax.jit(lambda x: model.apply(v, x))
        t = timeit(f, x)
        print(f"hrnet {name}: {t*1e3:.1f} ms/chunk8")

    print("=== segformer b2 ball: backbone vs head ===")
    from upliftingtabletennis_tpu.models.segformer import MiTBackbone, SegFormerHead, CFG

    x = jnp.zeros((B, 896, 1600, 9), jnp.bfloat16)
    bb = MiTBackbone("b2", 9)
    v = jax.jit(bb.init)(jax.random.PRNGKey(0), x[:1])
    v = jax.tree.map(lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, v)
    fb = jax.jit(lambda x: bb.apply(v, x))
    feats = fb(x)
    t = timeit(fb, x)
    print(f"b2 backbone: {t*1e3:.1f} ms/chunk8")

    hd = SegFormerHead(1, CFG["b2"]["decoder_dim"])
    vh = jax.jit(hd.init)(jax.random.PRNGKey(0), [f[:1] for f in feats])
    vh = jax.tree.map(lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, vh)
    fh = jax.jit(lambda fs: hd.apply(vh, fs))
    t = timeit(fh, feats)
    print(f"b2 head: {t*1e3:.1f} ms/chunk8")

    print("=== chunk scaling (hrnet table) ===")
    model = HRNet(13, 1)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 704, 1280, 3), jnp.bfloat16))
    v = jax.tree.map(lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, v)
    f = jax.jit(lambda x: model.apply(v, x))
    for bb_ in (1, 4, 8, 16):
        x = jnp.zeros((bb_, 704, 1280, 3), jnp.bfloat16)
        t = timeit(f, x, iters=3)
        print(f"chunk {bb_:2d}: {t*1e3:7.1f} ms = {t/bb_*1e3:6.1f} ms/frame")


if __name__ == "__main__":
    main()
