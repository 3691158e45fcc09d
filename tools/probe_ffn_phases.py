"""Phase split of the fused LN+MixFFN Pallas kernel (VERDICT r4 #1).

The round-4 trace shows fused_ln_ffn at 84.7 ms/slab running at
22 TFLOP/s and 32 GB/s — saturating neither roofline. Hypothesis: the
kernel is VPU-bound on the 9-tap f32 depthwise loop + exact-gelu
transcendentals while the MXU idles (phases are sequential within a grid
cell).

Measures, interleaved A/B at the b2 stage-1 and stage-2 detector shapes:
  full      : the production kernel
  no_dw     : depthwise loop replaced by a single tap (center)
  no_gelu   : gelu replaced by identity
  no_dwgelu : both removed (pure LN+fc1+fc2)
Also times the plain unfused XLA path for reference.

  python tools/probe_ffn_phases.py
"""
from __future__ import annotations

import functools
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from upliftingtabletennis_tpu.ops import fused_ffn as F

    # b2 detector shapes at chunk 8 (stage1, stage2); (B, H, W, C, HID)
    SHAPES = {
        "stage1": (8, 224, 400, 64, 256),
        "stage2": (8, 112, 200, 128, 512),
    }

    def variant_kernel(mode):
        def _kernel(xp_ref, xc_ref, xn_ref, g_ref, b_ref, w1_ref, b1_ref,
                    dw_ref, bdw_ref, w2_ref, b2_ref, o_ref, *, eps, th, H):
            i = pl.program_id(1)
            xc = xc_ref[0]
            top = xp_ref[0, -1:]
            bot = xn_ref[0, :1]
            x = jnp.concatenate([top, xc, bot], axis=0)
            R, W, C = x.shape
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
            y = (xf - mean) * jax.lax.rsqrt(var + eps)
            y = y * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
            h = jax.lax.dot_general(
                y.reshape(R * W, C).astype(xc.dtype), w1_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b1_ref[0].astype(jnp.float32)
            HID = h.shape[-1]
            g_row = jax.lax.broadcasted_iota(jnp.int32, (R * W, 1), 0) // W + i * th - 1
            ok = jnp.logical_and(g_row >= 0, g_row < H)
            h = jnp.where(ok, h, 0.0).reshape(R, W, HID).astype(xc.dtype)
            if mode in ("full", "no_gelu"):
                hp = jnp.pad(h, ((0, 0), (1, 1), (0, 0)))
                acc = jnp.zeros((th, W, HID), jnp.float32)
                for dy in range(3):
                    for dx in range(3):
                        acc = acc + hp[dy:dy + th, dx:dx + W] * dw_ref[3 * dy + dx]
            else:
                acc = h[1:th + 1].astype(jnp.float32) * dw_ref[4]
            zpre = acc + bdw_ref[0].astype(jnp.float32)
            if mode in ("full", "no_dw"):
                z = F._gelu_exact(zpre)
            else:
                z = zpre
            out = jax.lax.dot_general(
                z.reshape(th * W, HID).astype(xc.dtype), w2_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b2_ref[0].astype(jnp.float32)
            o_ref[0] = (xc.astype(jnp.float32) + out.reshape(th, W, C)).astype(o_ref.dtype)
        return _kernel

    def build(mode, B, H, W, C, HID, th=8):
        x = jnp.zeros((B, H, W, C), jnp.bfloat16)
        rng = np.random.default_rng(0)
        mk = lambda *s: jnp.asarray(rng.normal(0, 0.02, s), jnp.bfloat16)
        gamma, beta = mk(1, C), mk(1, C)
        w1, b1 = mk(C, HID), mk(1, HID)
        dw, bdw = mk(9, HID), mk(1, HID)
        w2, b2 = mk(HID, C), mk(1, C)
        grid = (B, H // th)
        n_tiles = H // th
        cur = lambda b, i: (b, i, 0, 0)
        prev = lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0)
        nxt = lambda b, i: (b, jnp.minimum(i + 1, n_tiles - 1), 0, 0)
        blk = pl.BlockSpec((1, th, W, C), cur, memory_space=pltpu.VMEM)
        full = lambda a: pl.BlockSpec(a.shape, lambda b, i: (0,) * a.ndim,
                                      memory_space=pltpu.VMEM)
        fn = pl.pallas_call(
            functools.partial(variant_kernel(mode), eps=1e-6, th=th, H=H),
            out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, th, W, C), prev, memory_space=pltpu.VMEM),
                blk,
                pl.BlockSpec((1, th, W, C), nxt, memory_space=pltpu.VMEM),
                full(gamma), full(beta), full(w1), full(b1), full(dw),
                full(bdw), full(w2), full(b2),
            ],
            out_specs=blk,
        )
        args = (x, x, x, gamma, beta, w1, b1, dw, bdw, w2, b2)
        return jax.jit(lambda *a: fn(*a)), args

    report = {}
    for sname, (B, H, W, C, HID) in SHAPES.items():
        fns = {}
        for mode in ("full", "no_dw", "no_gelu", "no_dwgelu"):
            try:
                fn, args = build(mode, B, H, W, C, HID)
                np.asarray(jax.tree.leaves(fn(*args))[0][0, 0, 0])  # warm
                fns[mode] = (fn, args)
            except Exception as e:
                print(f"{sname}/{mode}: BUILD FAILED {type(e).__name__}", flush=True)
        # public v1 vs v2 entry points (flat (B, N, C) input)
        rng = np.random.default_rng(0)
        mk = lambda *s: jnp.asarray(rng.normal(0, 0.02, s), jnp.bfloat16)
        pub_args = (jnp.zeros((B, H * W, C), jnp.bfloat16), H, W,
                    mk(C), mk(C), mk(C, HID), mk(HID), mk(3, 3, HID),
                    mk(HID), mk(HID, C), mk(C))
        for nm, f in (("v1_public", F.fused_ln_ffn), ("v2_public", F.fused_ln_ffn_v2)):
            try:
                fj = lambda f=f: f(*pub_args)
                np.asarray(fj()[0, 0, 0])
                fns[nm] = (lambda *a, fj=fj: fj(), (None,))
            except Exception as e:
                print(f"{sname}/{nm}: BUILD FAILED {type(e).__name__}", flush=True)
        # interleaved timing, 3 rounds x 5 reps each
        times = {m: [] for m in fns}
        for _ in range(3):
            for m, (fn, args) in fns.items():
                t0 = time.perf_counter()
                for _ in range(5):
                    o = fn(*args)
                np.asarray(o[0, 0, 0])
                times[m].append((time.perf_counter() - t0) / 5)
        rep = {m: round(1e3 * float(np.median(v)), 3) for m, v in times.items()}
        report[sname] = rep
        print(sname, json.dumps(rep), flush=True)

    with open("artifacts/profile/ffn_phase_probe.json", "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
