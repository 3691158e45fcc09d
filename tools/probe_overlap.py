"""Probe host->device transfer / compute OVERLAP on the tunneled chip.

PERF.md models e2e fps as min(link_MBps / MB_per_frame, compute_fps),
which assumes piece uploads overlap the fused slab program (run_rally
issues device_put for piece k+1 before dispatching program k). The
measured BENCH numbers (e2e 8.17 vs compute 12.45 at link 57 MB/s) sit
closer to the SERIAL model 1/(1/link_fps + 1/compute_fps) — this probe
measures which model the tunnel actually follows:

  A. upload-only:  device_put of N pieces back-to-back (committed)
  B. compute-only: the same matmul-heavy program on resident data, N times
  C. interleaved:  the run_rally pattern (put k+1, dispatch k)

overlap_efficiency = (t_A + t_B - t_C) / min(t_A, t_B): 1.0 = perfect
overlap, 0.0 = fully serial.

  python tools/probe_overlap.py [--mb 2.2] [--n 24] [--ms 70]
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mb", type=float, default=2.2,
                   help="piece size in MB (i420 frame at 1600x896 is 2.15)")
    p.add_argument("--n", type=int, default=24, help="pieces per arm")
    p.add_argument("--ms", type=float, default=70.0,
                   help="target per-program compute time (match the fused "
                        "slab's ~78 ms/frame)")
    args = p.parse_args()

    nbytes = int(args.mb * 1e6)
    piece = np.random.randint(0, 255, (nbytes,), np.uint8)

    # calibrate a matmul loop to ~args.ms on this chip
    dim = 2048
    a = jax.device_put(jnp.ones((dim, dim), jnp.bfloat16))

    def make_prog(iters):
        @jax.jit
        def prog(x, dummy):
            def body(c, _):
                return c @ a, None
            y, _ = jax.lax.scan(body, x, None, length=iters)
            # consume one byte of the uploaded piece so XLA cannot drop it
            return y + dummy[0].astype(jnp.bfloat16)
        return prog

    iters = 8
    dummy0 = jax.device_put(piece)
    while True:
        prog = make_prog(iters)
        prog(a, dummy0).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(3):
            prog(a, dummy0).block_until_ready()
        dt = (time.perf_counter() - t0) / 3 * 1e3
        if dt >= args.ms or iters > 4096:
            break
        iters = int(iters * max(args.ms / max(dt, 1e-3), 1.5))
    print(f"[calib] {iters} matmuls -> {dt:.1f} ms/program")

    # A: upload-only (block each put: measures raw link, like bench.py)
    t0 = time.perf_counter()
    for _ in range(args.n):
        jax.block_until_ready(jax.device_put(piece))
    t_a = time.perf_counter() - t0

    # B: compute-only on resident data
    out = prog(a, dummy0)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(args.n):
        out = prog(a, dummy0)
    out.block_until_ready()
    t_b = time.perf_counter() - t0

    # C: interleaved, run_rally pattern — async put of piece k+1, then
    # dispatch program k consuming piece k
    pieces = [jax.device_put(piece)]
    t0 = time.perf_counter()
    outs = []
    for k in range(args.n):
        if k + 1 < args.n:
            pieces.append(jax.device_put(piece))
        outs.append(prog(a, pieces[k]))
        if k >= 2:
            pieces[k - 2] = None
    jax.block_until_ready(outs[-1])
    t_c = time.perf_counter() - t0

    eff = (t_a + t_b - t_c) / max(min(t_a, t_b), 1e-9)
    res = {
        "piece_MB": args.mb,
        "n": args.n,
        "ms_per_program": dt,
        "upload_only_s": round(t_a, 3),
        "compute_only_s": round(t_b, 3),
        "interleaved_s": round(t_c, 3),
        "link_MBps": round(args.mb * args.n / t_a, 1),
        "overlap_efficiency": round(float(eff), 3),
        "model": ("overlapped (e2e ~= max(upload, compute))" if eff > 0.6
                  else "serial (e2e ~= upload + compute)" if eff < 0.25
                  else "partial overlap"),
    }
    print(json.dumps(res, indent=1))
    return res


if __name__ == "__main__":
    main()
