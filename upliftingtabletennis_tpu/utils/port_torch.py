"""Port reference PyTorch uplifting checkpoints into flax parameter trees.

The reference ships self-describing torch checkpoints
(`{'model_state_dict', 'identifier', 'additional_info'}`,
ref: uplifting/helper.py:371-391). This module maps a reference
`model_state_dict` (ref module tree: uplifting/model.py:303-571) onto the
parameter tree of upliftingtabletennis_tpu.models.uplifting. Used both for
loading released weights and for golden-parity tests against the torch
implementation.

Key transforms:
* torch Linear weight (out, in) -> flax Dense kernel (in, out): transpose.
* LayerNorm weight/bias -> scale/bias.
* `rotary_emb.inv_freq` buffers are dropped (recomputed in JAX).
* torch module paths `a.layers.3.attn.qkv.weight` -> flax path
  ('a', 'layers_3', 'attn', 'qkv', 'kernel').
"""
from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np


def _set_path(tree: Dict[str, Any], path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def port_uplifting_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Convert a reference uplifting `model_state_dict` to a flax params dict.

    Accepts torch tensors or numpy arrays as values. Returns a nested dict
    suitable for `model.apply({'params': params}, ...)`.
    """
    params: Dict[str, Any] = {}
    for key, value in state_dict.items():
        if "rotary_emb" in key:
            continue  # recomputed, not a parameter in the JAX model
        arr = np.asarray(getattr(value, "detach", lambda: value)().cpu()) if hasattr(value, "detach") else np.asarray(value)

        parts = key.split(".")
        # Collapse ModuleList indices into name_{i} segments and apply
        # structural renames (table stage lives under FirstStage/Single).
        out_parts = []
        i = 0
        while i < len(parts):
            p = parts[i]
            if i + 1 < len(parts) and re.fullmatch(r"\d+", parts[i + 1]):
                out_parts.append(f"{p}_{parts[i + 1]}")
                i += 2
            else:
                out_parts.append(p)
                i += 1

        # move table_embed / pos_layers_{i} under the table_stage submodule
        for j, p in enumerate(out_parts):
            if p == "table_embed" or p.startswith("pos_layers_"):
                out_parts = out_parts[:j] + ["table_stage"] + out_parts[j:]
                break

        leaf = out_parts[-1]
        parent = out_parts[-2] if len(out_parts) >= 2 else ""
        if leaf == "weight":
            if parent.startswith("norm"):
                out_parts[-1] = "scale"
            else:
                out_parts[-1] = "kernel"
                arr = arr.T
        elif leaf == "bias":
            pass  # same name in flax
        # cls_token keeps its name and shape (1, 1, D)

        _set_path(params, tuple(out_parts), arr.astype(np.float32))
    return params


def load_reference_checkpoint(path: str):
    """Load a reference .pt checkpoint and return (flax_params, additional_info).

    Architecture hyperparameters live in additional_info (self-describing
    checkpoints, ref: inference/inference_uplifting.py:43-58).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    params = port_uplifting_state_dict(ckpt["model_state_dict"])
    return params, ckpt.get("additional_info", {})
