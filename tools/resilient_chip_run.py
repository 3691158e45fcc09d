"""Run a chip job to completion across axon-tunnel outages.

The tunneled TPU has transient multi-minute outages, and a process whose
first backend touch lands in one can hang FOREVER instead of erroring
(see bench.py:wait_for_tpu). Long training runs were losing hours to this:
a run that attached during an outage sat silently at backend init.

This wrapper makes chip jobs restartable:

  1. probe the tunnel in a SUBPROCESS until a matmul round-trips,
  2. launch the command appending to LOG,
  3. watch LOG growth — no new bytes for --stall seconds => kill + retry,
  4. if --warm_start_dir exists at (re)launch time, append
     `--init_from <dir>` to the command (eval/closed_loop.py persists its
     best-val snapshot there at every improvement, so a retry resumes from
     the best weights instead of from scratch).

  python tools/resilient_chip_run.py --log /tmp/run.log --stall 1200 \
      [--warm_start_dir <out>/best_snapshot] -- <command ...>
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

PROBE = ("import jax, numpy as np, jax.numpy as jnp;"
         "x = jnp.ones((128, 128)); np.asarray(jnp.ravel(x @ x)[:1])")


def snapshot_usable(dirpath):
    """True iff every *_detector checkpoint under `dirpath` restores.

    A stall-kill can land mid orbax save and leave the snapshot torn; a
    retry that appends `--init_from <torn dir>` then fails fast at restore
    on EVERY subsequent attempt, burning max_attempts without retraining
    (ADVICE r4 #4). Validate by actually loading (in this process — the
    load is host-only, no chip touch) before trusting it.
    """
    import glob
    import json

    # the framework package lives one directory above tools/ — make the
    # validation import independent of the launch cwd
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)

    dets = glob.glob(os.path.join(dirpath, "*_detector"))
    if not dets:
        return False
    for det in dets:
        try:
            with open(os.path.join(det, "meta.json")) as f:
                json.load(f)
            from upliftingtabletennis_tpu.utils.checkpoint import load_checkpoint

            load_checkpoint(det)
        except Exception as e:
            print(f"[resilient] snapshot {det} unusable ({e!r})", flush=True)
            return False
    return True


def tunnel_up(timeout_s=240):
    try:
        rc = subprocess.run(
            [sys.executable, "-c", PROBE], timeout=timeout_s,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        ).returncode
        return rc == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--log", required=True)
    p.add_argument("--stall", type=int, default=1200,
                   help="kill + retry after this many seconds without log "
                        "growth (cold remote compiles are silent ~15 min)")
    p.add_argument("--max_attempts", type=int, default=12)
    p.add_argument("--warm_start_dir", default=None,
                   help="append --init_from <dir> whenever this exists at "
                        "launch time")
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="-- <command ...>")
    args = p.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        p.error("no command given (use -- <command ...>)")

    for attempt in range(1, args.max_attempts + 1):
        while not tunnel_up():
            print(f"[resilient] tunnel down at {time.strftime('%H:%M:%S')}; "
                  "waiting", flush=True)
            time.sleep(45)
        run_cmd = list(cmd)
        if args.warm_start_dir and os.path.isdir(args.warm_start_dir):
            if snapshot_usable(args.warm_start_dir):
                run_cmd += ["--init_from", args.warm_start_dir]
            else:
                # rename the torn snapshot aside so the job can re-create it
                aside = args.warm_start_dir.rstrip("/") + f".corrupt{attempt}"
                print(f"[resilient] warm-start snapshot failed validation; "
                      f"moving aside to {aside} and cold-starting", flush=True)
                try:
                    os.rename(args.warm_start_dir, aside)
                except OSError as e:
                    print(f"[resilient] rename failed ({e}); cold-starting "
                          "anyway", flush=True)
        print(f"[resilient] attempt {attempt}: {' '.join(run_cmd)}", flush=True)
        with open(args.log, "ab") as lf:
            proc = subprocess.Popen(run_cmd, stdout=lf, stderr=lf)
        last_size, last_change = -1, time.time()
        rc = None
        while rc is None:
            rc = proc.poll()
            if rc is not None:
                break
            try:
                sz = os.path.getsize(args.log)
            except OSError:
                sz = -1
            if sz != last_size:
                last_size, last_change = sz, time.time()
            if time.time() - last_change > args.stall:
                print(f"[resilient] no log growth in {args.stall}s; killing",
                      flush=True)
                proc.kill()
                proc.wait()
                rc = -9
                break
            time.sleep(20)
        if rc == 0:
            print("[resilient] success", flush=True)
            return 0
        print(f"[resilient] rc={rc}; retrying", flush=True)
        time.sleep(10)
    print("[resilient] giving up", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
