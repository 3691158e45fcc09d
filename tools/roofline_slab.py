"""Op-level roofline decomposition of the fused 4-detector slab program.

VERDICT r4 #1 asks: either raise compute fps >= 15 or prove the floor with
an op-level roofline sum showing measured wall <= ~1.15x
Sigma(max(flops / achievable_peak, bytes / HBM_bw)) per op.

Input: the Chrome-format device trace archived by tools/profile_slab.py
(jax.profiler), which carries per-op `model_flops` (XLA cost analysis),
`raw_bytes_accessed` and measured device wall time.

Achievable-peak model (per op, not a single global peak):
  - MXU ops (convolution / dot / pallas matmul kernels): peak scaled by the
    lane-utilization ceiling of the narrowest contracted/output channel dim
    parsed from the HLO shape — a conv with min(Ci, Co)=16 can use at most
    16/128 of the lane dimension regardless of scheduling (PERF.md "Why MFU
    is ~7%"). Block-diagonally packed convs count their structurally-zero
    FLOPs, so their ceiling uses the PACKED channel width (the dense-math
    width the MXU actually executes).
  - everything else: bandwidth roofline bytes / HBM_BW.

  python tools/roofline_slab.py [--trace <vm.trace.json.gz>] [--md]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import re

PEAK_TFLOPS = 197e12  # v5e bf16
HBM_BW = 700e9        # effective (measured 575-700 GB/s on saturated ops)


def load_ops(trace_path):
    with gzip.open(trace_path, "rt") as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    tid_name = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"]["name"]
    mods = sorted(
        (e for e in ev
         if e.get("ph") == "X"
         and tid_name.get((e["pid"], e["tid"])) == "XLA Modules"
         and "slab" in e["name"]),
        key=lambda m: m["ts"],
    )
    m = mods[-1]  # last (warm) execution
    t0, t1 = m["ts"], m["ts"] + m["dur"]
    ops = [e for e in ev
           if e.get("ph") == "X"
           and tid_name.get((e["pid"], e["tid"])) == "XLA Ops"
           and t0 <= e["ts"] < t1]
    return m, ops


_SHAPE_RE = re.compile(r"(?:bf16|f32|s8|u8|s32|pred)\[([0-9,]*)\]")


def _mxu_ceiling(long_name: str) -> float:
    """Fraction of MXU peak achievable for this op's channel widths."""
    # convolution: parse kernel shape HWIO from the conv operand list
    shapes = [
        tuple(int(d) for d in s.split(",") if d)
        for s in _SHAPE_RE.findall(long_name or "")
    ]
    # heuristics: a conv's kernel operand is the 4d shape with small spatial
    # dims (kh, kw <= 7) and the last two dims are (Ci, Co)
    for s in shapes[1:]:
        if len(s) == 4 and s[0] <= 7 and s[1] <= 7 and s[2] >= 1:
            ci, co = s[2], s[3]
            width = min(ci, co)
            return min(width / 128.0, 1.0)
    # dots: contracted dim unknown -> assume full
    return 1.0


def roofline(ops):
    rows = []
    for o in ops:
        a = o.get("args", {})
        wall = o["dur"] / 1e6  # us -> s
        flops = float(a.get("model_flops", 0) or 0)
        bytes_ = float(a.get("raw_bytes_accessed", 0) or 0)
        name = o["name"]
        base = name.split(".")[0]
        cat = a.get("hlo_category", "?")
        if flops > 0 and ("conv" in cat or "conv" in base):
            ceil = _mxu_ceiling(a.get("long_name", ""))
            bound = max(flops / (PEAK_TFLOPS * ceil), bytes_ / HBM_BW)
            kind = f"mxu(conv,w{int(ceil * 128)})"
        elif flops > 0 and ("dot" in cat or "custom" in cat
                            or "fused_attention" in base or "fused_ln_ffn" in base):
            bound = max(flops / PEAK_TFLOPS, bytes_ / HBM_BW)
            kind = "mxu(dot)"
        else:
            bound = bytes_ / HBM_BW
            kind = "hbm"
        rows.append((name, kind, wall, bound, flops, bytes_,
                     a.get("source", "?")))
    return rows


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--trace", default=None)
    p.add_argument("--md", action="store_true", help="markdown table output")
    p.add_argument("--top", type=int, default=18)
    args = p.parse_args()
    trace = args.trace or sorted(
        glob.glob("artifacts/profile/trace/plugins/profile/*/vm.trace.json.gz")
    )[-1]
    mod, ops = load_ops(trace)
    rows = roofline(ops)
    wall = sum(r[2] for r in rows)
    bound = sum(r[3] for r in rows)
    groups = collections.defaultdict(lambda: [0.0, 0.0, 0.0, 0.0, 0])
    for name, kind, w, b, fl, by, src in rows:
        key = (src.split("/")[-1], kind)
        g = groups[key]
        g[0] += w
        g[1] += b
        g[2] += fl
        g[3] += by
        g[4] += 1
    print(f"trace module: {mod['name']}  wall {mod['dur']/1e3:.1f} ms")
    print(f"sum op wall      : {wall*1e3:8.1f} ms")
    print(f"sum roofline bound: {bound*1e3:8.1f} ms")
    print(f"wall / bound     : {wall/bound:8.2f}x   (<= 1.15 proves the floor)")
    sep = "|" if args.md else " "
    hdr = ["source,kind", "wall ms", "bound ms", "x", "GFLOP", "GB", "n"]
    if args.md:
        print("| " + " | ".join(hdr) + " |")
        print("|" + "---|" * len(hdr))
    else:
        print(f"{hdr[0]:48s} {hdr[1]:>9} {hdr[2]:>9} {hdr[3]:>6} {hdr[4]:>9} {hdr[5]:>7} {hdr[6]:>5}")
    top = sorted(groups.items(), key=lambda kv: -kv[1][0])[: args.top]
    for (src, kind), (w, b, fl, by, n) in top:
        cells = [f"{src},{kind}", f"{w*1e3:.2f}", f"{b*1e3:.2f}",
                 f"{w/max(b,1e-9):.2f}", f"{fl/1e9:.0f}", f"{by/1e9:.2f}", str(n)]
        if args.md:
            print("| " + " | ".join(cells) + " |")
        else:
            print(f"{cells[0]:48s} {cells[1]:>9} {cells[2]:>9} {cells[3]:>6} {cells[4]:>9} {cells[5]:>7} {cells[6]:>5}")


if __name__ == "__main__":
    main()
