"""Benchmark: full-pipeline video frames/sec on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...extras}.

Protocol = the reference's headline workload (BASELINE.md north star;
ref: inference/inference_combined.py:65-175): per video frame run BOTH ball
detectors (segformerpp_b2 @1600x896 + wasb @1280x704 on 3-frame triplets)
and BOTH table detectors (segformerpp_b2 + hrnet), dual-model filtering,
the uplifting transformer and RANSAC camera calibration — i.e. everything
`TableTennisPipeline.predict` + `calibrate_camera` do — on a synthetic
1920x1080 rally held in HOST memory as decoded uint8 video frames.

Execution model being measured (pipeline/interface.py): chunked slab
uploads shared by all four detectors, fully asynchronous dispatch so
host->device transfer overlaps device compute, fused on-device
resize/normalize/forward/peak-extraction per chunk in bf16, one
device->host fetch per detector.

vs_baseline: the reference cannot run here (its detection backbones
auto-download from external hubs and need CUDA; this host has no egress
and no GPU), so the field reports the ratio against this machine's
torch-CPU on the only commonly-runnable component (the uplifting
transformer forward at batch 256) as a conservative proxy.

Extra keys: "breakdown" gives per-stage seconds for one rally
(upload = host->device bytes / measured link speed; detect = wall time of
the overlapped detector phase; post = filters+uplifting+calibration),
plus datagen trajectories/sec (BASELINE.md's second north-star metric).
"""
import json
import os
import time

import numpy as np

# Persistent XLA compilation cache: repeat driver runs skip the remote
# compiles (which dominate cold wall time on this tunneled chip). Set
# BEFORE any jax import touches the backend; honored lazily by jax.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def make_rally(T=33, seed=0):
    """Synthetic but video-like rally: smooth background, table-ish quad,
    a moving ball blob, mild sensor noise. Uniform random frames are the
    pathological worst case for any transport/codec in the ingest path and
    do not represent broadcast video; real frames are smooth."""
    rng = np.random.default_rng(seed)
    H, W = 1080, 1920
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    base = 60 + 80 * (xx / W) + 50 * (yy / H)  # arena gradient
    table = ((yy > 0.55 * H) & (yy < 0.8 * H) & (xx > 0.25 * W) & (xx < 0.75 * W))
    frames = np.empty((T, H, W, 3), np.uint8)
    for t in range(T):
        f = base + rng.normal(0, 2.0, (H, W)).astype(np.float32)
        f = np.where(table, 40.0, f)
        bx = int(W * (0.3 + 0.4 * t / max(T - 1, 1)))
        by = int(H * (0.5 + 0.15 * np.sin(3.0 * t / max(T - 1, 1))))
        blob = np.exp(-(((xx - bx) ** 2 + (yy - by) ** 2) / (2 * 6.0**2)))
        f = f + 180.0 * blob
        frames[t] = np.clip(f, 0, 255).astype(np.uint8)[..., None]
    return frames


def pipeline_fps(iters=3, T=33):
    """Median-of-rallies end-to-end fps + a phase breakdown.

    The host->device link of this tunneled chip swings 20-400 MB/s with
    time of day, so the breakdown separates `link_MBps` (measured fresh)
    and `compute_frames_per_sec` (detector programs on device-resident
    frames — the deployment-relevant number when frames arrive over a
    local PCIe/ICI link) from the end-to-end medians.
    """
    import jax
    import jax.numpy as jnp

    from upliftingtabletennis_tpu.pipeline.interface import TableTennisPipeline

    pipe = TableTennisPipeline(chunk=8)
    chunk = 8
    frames = make_rally(T)
    table = np.concatenate(
        [np.random.default_rng(0).uniform(100, 900, (13, 2)), np.ones((13, 1))], -1
    )

    # warmup: compiles the fused slab program + uplifting + calibration
    pipe.predict(frames, fps=50)
    pipe.calibrate_camera(table)

    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        pipe.predict(frames, fps=50)
        pipe.calibrate_camera(table)
        ts.append(time.perf_counter() - t0)
    fps = T / float(np.median(ts))

    # link bandwidth (fresh sample; varies by hour on the shared tunnel)
    x = frames[:8]
    t0 = time.perf_counter()
    dev = jax.device_put(x)
    np.asarray(jnp.ravel(dev)[:1])
    t_upload = time.perf_counter() - t0
    link = x.nbytes / 1e6 / t_upload

    # device-resident compute fps: fused 4-detector programs only
    slab_fn = pipe._slab_program("rgb", None)
    piece = jax.device_put(frames[:chunk])
    idx = np.arange(chunk, 2 * chunk, dtype=np.int32)
    idx3 = jnp.stack([jnp.asarray(np.maximum(idx - 1, chunk)), jnp.asarray(idx),
                      jnp.asarray(np.minimum(idx + 1, 2 * chunk - 1))])
    np.asarray(jax.tree.leaves(slab_fn(piece, piece, piece, idx3, idx3[1]))[0])  # warm
    n_slabs = (T + chunk - 1) // chunk
    t0 = time.perf_counter()
    outs = [slab_fn(piece, piece, piece, idx3, idx3[1]) for _ in range(n_slabs)]
    np.asarray(jax.tree.leaves(outs[-1])[0])
    compute_fps = n_slabs * chunk / (time.perf_counter() - t0)

    t0 = time.perf_counter()
    pipe.calibrate_camera(table)
    t_calib = time.perf_counter() - t0

    # video-native ingest: planar YUV 4:2:0 halves host->device bytes, and
    # the default upload_res="model" host-downscale (1920x1080 -> 1600x896,
    # -31% bytes/frame) trims them further — both attack the same
    # tunnel-limited link (PERF.md "End-to-end budget")
    from upliftingtabletennis_tpu.data.image_transforms import rgb_to_i420

    frames_i420 = rgb_to_i420(frames)
    pipe.predict(frames_i420, fps=50, pixel_format="i420")  # warmup
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        pipe.predict(frames_i420, fps=50, pixel_format="i420")
        pipe.calibrate_camera(table)
        ts.append(time.perf_counter() - t0)
    fps_i420 = T / float(np.median(ts))

    # same ingest WITHOUT the host downscale (the pre-round-2 definition,
    # kept for round-over-round comparability)
    pipe.predict(frames_i420, fps=50, pixel_format="i420", upload_res=None)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        pipe.predict(frames_i420, fps=50, pixel_format="i420", upload_res=None)
        pipe.calibrate_camera(table)
        ts.append(time.perf_counter() - t0)
    fps_i420_fullres = T / float(np.median(ts))

    breakdown = {
        "rgb_frames_per_sec": round(fps, 2),
        "i420_frames_per_sec": round(fps_i420, 2),
        "i420_fullres_upload_frames_per_sec": round(fps_i420_fullres, 2),
        "compute_frames_per_sec": round(compute_fps, 2),
        "link_MBps": round(link, 1),
        "calibrate_s": round(t_calib, 2),
        "frames_per_rally": T,
    }
    # headline = video-native ingest (decoders emit YUV; i420 halves the
    # host->device bytes of the tunnel-limited link) through the pipeline's
    # default upload path (host downscale to model res)
    return fps_i420, breakdown


def datagen_tps(n=4096, budget_s=420.0):
    """Vmapped physics datagen throughput (BASELINE.md second metric).

    Returns {"datagen_trajectories_per_sec": warm steady-state at the
    LARGEST shape that compiled within budget, "datagen_n": that shape,
    "datagen_warmup_s": compile+first-run wall}. Warm steady-state =
    2+ timed batches AFTER the compile batch (VERDICT r4 #7: BENCH_r04
    recorded 1,618 at n=4096 with a congested dispatch path while PERF.md
    claims 7,520 at n=32768 — the headline must state its shape and
    exclude compile, and reach for the saturating shape when the budget
    allows).

    Escalation: measure n=4096 first (cold compile is single-digit
    minutes — always lands an artifact), then attempt n=32768 (the
    chip-saturating shape, PERF.md datagen A/B) only while within
    budget_s; its program usually comes from the persistent compilation
    cache (~/.jax_cache) after the first driver run."""
    out = {}
    try:
        import jax

        from upliftingtabletennis_tpu.data.datagen import generate_candidates

        t_start = time.perf_counter()
        for shape in (n, 32768):
            t0 = time.perf_counter()
            cand = generate_candidates(
                jax.random.PRNGKey(0), shape, "intermediate", "left_to_right"
            )
            int(np.asarray(cand["accept"]).sum())  # compile + first run
            warmup = time.perf_counter() - t0
            t0 = time.perf_counter()
            iters = 3 if shape <= 8192 else 2
            tot = 0
            for i in range(iters):
                cand = generate_candidates(
                    jax.random.PRNGKey(i + 1), shape, "intermediate", "left_to_right"
                )
                tot += int(np.asarray(cand["accept"]).sum())
            dt = time.perf_counter() - t0
            out = {
                "datagen_trajectories_per_sec": round(tot / dt, 1),
                "datagen_n": shape,
                "datagen_warmup_s": round(warmup, 1),
            }
            yield dict(out)
            # only escalate to the saturating shape with budget left for
            # a (possibly cold) compile + 2 batches
            if time.perf_counter() - t_start > budget_s * 0.3:
                return
    except Exception:
        if not out:
            yield {"datagen_trajectories_per_sec": None}


def uplifting_ratio_vs_torch_cpu():
    """Conservative proxy baseline: uplifting fwd here vs torch CPU."""
    try:
        import jax
        import jax.numpy as jnp

        from upliftingtabletennis_tpu.models import get_uplifting_model

        B, T = 256, 50
        model = get_uplifting_model("connectstage", "large", mode="dynamic")
        rng = np.random.default_rng(0)
        ball = jnp.asarray(rng.uniform(size=(B, T, 2)), jnp.float32)
        table = jnp.asarray(
            np.concatenate([rng.uniform(size=(B, 13, 2)), np.ones((B, 13, 1))], -1), jnp.float32
        )
        mask_np = np.ones((B, T), np.float32)
        mask_np[:, 45:] = 0
        mask = jnp.asarray(mask_np)
        times = jnp.asarray((np.arange(T, dtype=np.float32) / 50)[None].repeat(B, 0) * mask_np)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), ball, table, mask, times)["params"]

        fwd = jax.jit(lambda *a: model.apply({"params": params}, *a))
        np.asarray(fwd(ball, table, mask, times)[0])
        t0 = time.perf_counter()
        for _ in range(20):
            r = fwd(ball, table, mask, times)
        np.asarray(r[0])  # force completion: block_until_ready is a no-op on axon
        tpu_tps = B * 20 / (time.perf_counter() - t0)

        import sys

        sys.path.insert(0, "/root/reference")
        import torch
        from uplifting.model import get_model as ref_get_model

        tm = ref_get_model("connectstage", "large", mode="dynamic", time_rotation="new")
        tm.eval()
        tb = (torch.tensor(np.asarray(ball)), torch.tensor(np.asarray(table)),
              torch.tensor(mask_np), torch.tensor(np.asarray(times)))
        with torch.no_grad():
            tm(*tb)
            t0 = time.perf_counter()
            for _ in range(3):
                tm(*tb)
            ref_tps = B * 3 / (time.perf_counter() - t0)
        return tpu_tps / ref_tps
    except Exception:
        return None


def torch_cpu_wasb_fps():
    """Honest same-host detector comparison: the reference's own WASB/HRNet
    (vendored, torch CPU) at its eval resolution, single frame-triplet.

    The reference's CUDA backbones cannot run here (no GPU, no egress for
    hub downloads), so this is the closest runnable point of its detection
    stack on this machine (ref: balldetection/models/wasb.py:510-608,
    compare_speed.py:10-32)."""
    try:
        import sys

        sys.path.insert(0, "/root/reference")
        import torch
        from balldetection.models.wasb import HRNet

        # WASBNet's exact w18-small config (ref: wasb.py:514-573), built
        # directly on HRNet to skip the unconditional init-weight load
        # (the weights zip is not downloadable here)
        stage = lambda br, ch: {  # noqa: E731
            "NUM_MODULES": 1, "NUM_BRANCHES": br, "BLOCK": "BASIC",
            "NUM_BLOCKS": [2] * br, "NUM_CHANNELS": ch, "FUSE_METHOD": "SUM",
        }
        cfg = {
            "name": "hrnet", "frames_in": 3, "frames_out": 3,
            "inp_height": 704, "inp_width": 1280,
            "out_height": 704, "out_width": 1280,
            "rgb_diff": False, "out_scales": [0],
            "MODEL": {
                "EXTRA": {
                    "FINAL_CONV_KERNEL": 1, "PRETRAINED_LAYERS": ["*"],
                    "STEM": {"INPLANES": 64, "STRIDES": [1, 1]},
                    "STAGE1": {
                        "NUM_MODULES": 1, "NUM_BRANCHES": 1, "BLOCK": "BOTTLENECK",
                        "NUM_BLOCKS": [1], "NUM_CHANNELS": [32], "FUSE_METHOD": "SUM",
                    },
                    "STAGE2": stage(2, [16, 32]),
                    "STAGE3": stage(3, [16, 32, 64]),
                    "STAGE4": stage(4, [16, 32, 64, 128]),
                    "DECONV": {"NUM_DECONVS": 0, "KERNEL_SIZE": [], "NUM_BASIC_BLOCKS": 2},
                },
                "INIT_WEIGHTS": True,
            },
        }
        tm = HRNet(cfg=cfg)
        tm.eval()
        x = torch.rand(1, 9, 704, 1280)
        with torch.no_grad():
            tm(x)  # warm
            t0 = time.perf_counter()
            for _ in range(2):
                tm(x)
            return round(2 / (time.perf_counter() - t0), 3)
    except Exception:
        return None


def wait_for_tpu(max_wait_s=900):
    """The tunneled chip has transient multi-minute outages (backend init
    raises UNAVAILABLE). Probe in a SUBPROCESS — an in-process init failure
    can stick to the jax backend cache — and give the tunnel up to
    max_wait_s to come back before running the bench. Returns True when a
    probe matmul round-trips; on timeout the bench exits non-zero without
    printing JSON (an honest no-measurement beats a fabricated one, and a
    first backend touch against the dead tunnel can hang FOREVER rather
    than error — never enter jax in-process after a failed probe)."""
    import subprocess
    import sys

    probe = (
        "import jax, numpy as np, jax.numpy as jnp;"
        "x = jnp.ones((128, 128)); np.asarray(jnp.ravel(x @ x)[:1])"
    )
    deadline = time.time() + max_wait_s
    while True:
        try:
            rc = subprocess.run(
                [sys.executable, "-c", probe], timeout=300,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            ).returncode
        except subprocess.TimeoutExpired:
            rc = -1
        if rc == 0:
            return True
        if time.time() > deadline:
            return False
        time.sleep(60)


def main():
    """Incremental emission: re-print the FULL (so-far) JSON line after every
    sub-benchmark completes, flushed. The driver parses the LAST JSON line of
    the tail, so even if a later sub-benchmark overruns the budget and the
    process is killed, every already-measured number survives. (Round 3 lost
    all measurements to a single oversized sub-benchmark — never again.)
    The headline pipeline numbers come first; optional extras follow in
    increasing order of risk."""
    if not wait_for_tpu():
        import sys

        print("bench: TPU tunnel unavailable after max_wait_s; no measurement",
              file=sys.stderr)
        sys.exit(1)

    payload = {
        "metric": "full_pipeline_frames_per_sec",
        "value": None,
        "unit": "video frames/sec/chip (1920x1080 i420 host frames, host downscale to model res + video-native ingest; b2+wasb ball, b2+hrnet table, uplifting-large, RANSAC calib; bf16)",
        # the reference cannot run its GPU pipeline on this host;
        # vs_baseline is an explicitly-labeled PROXY ratio, not the
        # 10x-vs-GPU north star (see module docstring)
        "vs_baseline": None,
        "baseline_kind": "torch_cpu_uplifting_proxy",
        "breakdown": {},
    }

    def emit():
        print(json.dumps(payload), flush=True)

    fps, breakdown = pipeline_fps()
    payload["value"] = round(fps, 2)
    payload["breakdown"] = breakdown
    # context for reading the headline under a varying tunnel: e2e ~=
    # min(link-bound, compute-bound); when link_bound_fps < compute fps the
    # headline is LINK-limited, not a compute regression (PERF.md
    # "End-to-end budget"; VERDICT r4 #7 — r04's 6.97 at 4 MB/s read as a
    # regression without this)
    link_bound = breakdown["link_MBps"] / 2.15
    breakdown["link_bound_fps"] = round(link_bound, 2)
    breakdown["link_limited"] = bool(link_bound < breakdown["compute_frames_per_sec"])
    emit()

    for dg in datagen_tps():
        breakdown.update(dg)
        emit()

    ratio = uplifting_ratio_vs_torch_cpu()
    payload["vs_baseline"] = round(ratio, 1) if ratio else None
    emit()

    breakdown["torch_cpu_wasb_frames_per_sec"] = torch_cpu_wasb_fps()
    emit()


if __name__ == "__main__":
    main()
