"""Extract the EMA params from a resumable `latest` training state into a
`model`-style self-describing checkpoint.

The trainer's four best-model criteria (train/run_uplifting.py, ref:
uplifting/train.py:84-102) save `state.ema_params` when a val metric
improves; a fine-tune resumed with the PREVIOUS run's `best` dict may
never re-trigger them even when the fine-tune target (e.g. TT3D back-view
error) improved. This tool turns any `latest` full-state snapshot into an
eval-ready params checkpoint:

  python tools/extract_model_from_latest.py \
      --latest <run_dir>/latest --out <run_dir>/model_backview
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--latest", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from upliftingtabletennis_tpu.utils.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    state, identifier, info = load_checkpoint(args.latest)
    ema = state["ema_params"] if isinstance(state, dict) else state.ema_params
    extra = {k: v for k, v in info.items() if k != "best"}
    save_checkpoint(args.out, ema, identifier, {**extra, "from_latest": True})
    print(f"saved EMA params of epoch {info.get('epoch')} -> {args.out}")
    with open(os.path.join(args.out, "meta.json")) as f:
        print(json.load(f)["additional_info"].get("epoch"))


if __name__ == "__main__":
    main()
