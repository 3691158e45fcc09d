"""Phase split of the fused attention half-block kernel (VERDICT r5 #1).

The round-4 trace shows fused_attention at 70 ms/slab, 60 TFLOP/s — 3.3x
its naive-peak roofline. Candidate explanations: (a) K=hd=64 contraction
and 64-lane outputs cap both matmuls at ~50% peak, (b) the softmax runs
~1e9 exp/call on the VPU serially between the MXU phases.

Variants, interleaved at the b2 detector stage shapes:
  full       : production kernel semantics
  no_softmax : softmax replaced by scale (isolates VPU transcendental+
               normalization cost; WRONG numerics, timing only)
  no_ln      : LayerNorm replaced by identity

  python tools/probe_attn_phases.py
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

    # (B, H, W, C, heads, sr) for segformerpp_b2 at 1600x896
    SHAPES = {
        "stage1": (8, 224, 400, 64, 1, 8),
        "stage2": (8, 112, 200, 128, 2, 4),
    }

    def variant_kernel(mode):
        def _kernel(x_ref, g_ref, b_ref, wq_ref, bq_ref, k_ref, v_ref,
                    wp_ref, bp_ref, o_ref, *, eps, scale, nkv, heads):
            x = x_ref[0]
            T, C = x.shape
            hd = C // heads
            xf = x.astype(jnp.float32)
            if mode == "no_ln":
                y = xf
            else:
                mean = jnp.mean(xf, axis=-1, keepdims=True)
                var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
                y = (xf - mean) * jax.lax.rsqrt(var + eps)
                y = y * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
            q = jax.lax.dot_general(
                y.astype(x.dtype), wq_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bq_ref[0].astype(jnp.float32)
            q = q.astype(x.dtype)
            outs = []
            for h in range(heads):
                qh = q[:, h * hd:(h + 1) * hd]
                kh = k_ref[0, h]
                vh = v_ref[0, h]
                logits = jax.lax.dot_general(
                    qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale
                if mode == "no_softmax":
                    w = (logits * (1.0 / logits.shape[-1])).astype(x.dtype)
                else:
                    m = jnp.max(logits, axis=-1, keepdims=True)
                    e = jnp.exp(logits - m)
                    w = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
                outs.append(jax.lax.dot_general(
                    w, vh, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ))
            o = jnp.concatenate(outs, axis=-1).astype(x.dtype)
            out = jax.lax.dot_general(
                o, wp_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bp_ref[0].astype(jnp.float32)
            o_ref[0] = (xf + out).astype(o_ref.dtype)
        return _kernel

    def build(mode, B, H, W, C, heads, sr):
        N = H * W
        hd = C // heads
        Nkv = (H // sr) * (W // sr)
        nkv_pad = (Nkv + 127) // 128 * 128
        rng = np.random.default_rng(0)
        mk = lambda *s: jnp.asarray(rng.normal(0, 0.02, s), jnp.bfloat16)
        x = jnp.zeros((B, N, C), jnp.bfloat16)
        gamma, beta = mk(1, C), mk(1, C)
        wq, bq = mk(C, C), mk(1, C)
        kt = mk(B, heads, nkv_pad, hd)
        vt = mk(B, heads, nkv_pad, hd)
        wp, bp = mk(C, C), mk(1, C)
        TQ = 1024
        n_pad = (N + TQ - 1) // TQ * TQ
        xp = jnp.pad(x, ((0, 0), (0, n_pad - N), (0, 0))) if n_pad != N else x
        grid = (B, n_pad // TQ)
        blk = pl.BlockSpec((1, TQ, C), lambda b, i: (b, i, 0),
                           memory_space=pltpu.VMEM)
        full = lambda a: pl.BlockSpec(a.shape, lambda b, i: (0,) * a.ndim,
                                      memory_space=pltpu.VMEM)
        kv_spec = pl.BlockSpec((1, heads, nkv_pad, hd), lambda b, i: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        fn = pl.pallas_call(
            functools.partial(variant_kernel(mode), eps=1e-6, scale=hd ** -0.5,
                              nkv=Nkv, heads=heads),
            out_shape=jax.ShapeDtypeStruct((B, n_pad, C), x.dtype),
            grid=grid,
            in_specs=[blk, full(gamma), full(beta), full(wq), full(bq),
                      kv_spec, kv_spec, full(wp), full(bp)],
            out_specs=blk,
        )
        args = (xp, gamma, beta, wq, bq, kt, vt, wp, bp)
        return jax.jit(lambda *a: fn(*a)), args

    report = {}
    for sname, shp in SHAPES.items():
        fns = {}
        for mode in ("full", "no_softmax", "no_ln"):
            fn, args = build(mode, *shp)
            np.asarray(fn(*args)[0, 0, 0])
            fns[mode] = (fn, args)
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

    with open("artifacts/profile/attn_phase_probe.json", "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
