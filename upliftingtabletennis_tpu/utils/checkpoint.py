"""Self-describing checkpoints (Orbax + JSON metadata).

Mirrors the reference checkpoint contract
(`{'model_state_dict', 'identifier', 'additional_info'}` with hparams that
let loaders reconstruct the architecture, ref: uplifting/helper.py:371-391,
inference/inference_uplifting.py:43-58). Always saves EMA parameters, like
the reference (uplifting/train.py:87-102).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(path: str, params, identifier: str, additional_info: Dict[str, Any]):
    """Save params + metadata under `path/` (params/ dir + meta.json)."""
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    params = jax.device_get(params)
    param_dir = os.path.join(path, "params")
    ckptr.save(param_dir, params, force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"identifier": identifier, "additional_info": additional_info}, f, indent=2)


def load_checkpoint(path: str, target=None) -> Tuple[Any, str, Dict[str, Any]]:
    """Load (params, identifier, additional_info) from `path/`."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    params = ckptr.restore(os.path.join(path, "params"), target)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return params, meta.get("identifier", ""), meta.get("additional_info", {})


def load_model_from_checkpoint(path: str):
    """Reconstruct the uplifting model from a self-describing checkpoint
    (architecture from additional_info, ref: inference_uplifting.py:43-58)."""
    from upliftingtabletennis_tpu.models import get_uplifting_model

    params, identifier, info = load_checkpoint(path)
    model = get_uplifting_model(
        name=info.get("name", "connectstage"),
        size=info.get("size", "large"),
        mode=info.get("tabletoken_mode", "dynamic"),
        time_rotation=info.get("time_rotation", "new"),
    )
    return model, params, identifier, info
