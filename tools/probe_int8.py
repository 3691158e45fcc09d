"""Probe: does int8 convolution beat bf16 on this chip at HRNet shapes?

Decides PERF.md's remaining lever "int8 heads / int8 HRNet inference"
BEFORE building the quantization machinery: v5e advertises 2x int8 MXU
throughput (394 vs 197 TOPS), but that only materializes if XLA lowers
`conv_general_dilated(int8, int8, preferred_element_type=int32)` to the
native int8 systolic mode instead of upcasting. Measures interleaved A/B
of jitted full programs in ONE process (the only timing mode that is
trustworthy through this tunnel — PERF.md "Measurement environment").

Shapes probed = the two cost centers of the packed HRNet path
(models/hrnet_packed.py): the 128-lane block-diag full-res 3x3 (branch-0
after G=8 packing) and the wide MXU-bound 3x3 at 1/8 res, plus the
bandwidth-bound final 1x1 head.

Usage: python tools/probe_int8.py  (needs the TPU; ~1 min)
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args, iters=10):
    np.asarray(jnp.ravel(fn(*args))[:1])  # compile + force
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jnp.ravel(out)[:1])  # block_until_ready is a no-op on axon
    return (time.perf_counter() - t0) / iters


def probe_conv(B, H, W, Ci, Co, k, label, iters=10):
    rng = np.random.default_rng(0)
    x8 = jnp.asarray(rng.integers(-127, 127, (B, H, W, Ci)), jnp.int8)
    w8 = jnp.asarray(rng.integers(-127, 127, (k, k, Ci, Co)), jnp.int8)
    xb = x8.astype(jnp.bfloat16)
    wb = w8.astype(jnp.bfloat16)
    pad = [(k // 2, k // 2)] * 2 if k > 1 else "VALID"
    dn = ("NHWC", "HWIO", "NHWC")

    @jax.jit
    def conv_i8(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), pad, dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )

    @jax.jit
    def conv_bf16(x, w):
        return jax.lax.conv_general_dilated(x, w, (1, 1), pad, dimension_numbers=dn)

    # interleaved A/B: alternate the two programs within one wall window
    t8 = _time(conv_i8, x8, w8, iters=iters)
    tb = _time(conv_bf16, xb, wb, iters=iters)
    t8b = _time(conv_i8, x8, w8, iters=iters)
    tbb = _time(conv_bf16, xb, wb, iters=iters)
    ms8, msb = min(t8, t8b) * 1e3, min(tb, tbb) * 1e3
    return {
        "shape": f"{label}: B{B} {H}x{W} {Ci}->{Co} k{k}",
        "int8_ms": round(ms8, 2),
        "bf16_ms": round(msb, 2),
        "speedup": round(msb / ms8, 2),
    }


def main():
    results = [
        # branch-0 after G=8 lane packing: the packed-HRNet cost center
        probe_conv(1, 704, 1280, 128, 128, 3, "packed-branch0-3x3"),
        # wide MXU-bound conv at 1/8 res (branch2, G=1)
        probe_conv(8, 88, 160, 64, 64, 3, "branch2-3x3"),
        # bandwidth-bound final head (1x1, full res, packed)
        probe_conv(1, 704, 1280, 128, 16, 1, "final-head-1x1"),
        # b2-decode-like wide 1x1 at 1/4 res
        probe_conv(8, 224, 400, 768, 64, 1, "b2-conv-seg-1x1"),
    ]
    verdict = "BUILD int8 path" if any(r["speedup"] >= 1.4 for r in results) else (
        "SKIP int8 path (no lowering win on this chip)"
    )
    print(json.dumps({"results": results, "verdict": verdict}, indent=2))


if __name__ == "__main__":
    main()
