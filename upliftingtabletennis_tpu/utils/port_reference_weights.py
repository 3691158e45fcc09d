"""Convert the reference's released weights zip into this framework's
Orbax checkpoint layout.

The reference auto-downloads a weights zip and points `paths.weights_path`
at it (ref: interface.py:29-79); its layout is

    inference_balldetection/{segformerpp_b0,segformerpp_b2,wasb,vitpose}/model.pt
    inference_tabledetection/{segformerpp_b0,segformerpp_b2,vitpose,hrnet}/model.pt
    inference_uplifting/{kienzleetal,mixed,ours}/model.pt
    pretraining_blurball/{segformerpp_b0,segformerpp_b2,wasb,vitpose}/model.pt
    initialization/...

Each `model.pt` is a self-describing torch checkpoint
(`{'model_state_dict', 'identifier', 'additional_info'}`,
ref: balldetection/helper_balldetection.py:510-529). This CLI walks that
layout and writes the SAME relative paths as Orbax checkpoint directories,
so a reference user can switch frameworks with two commands:

    python -m upliftingtabletennis_tpu.utils.port_reference_weights \
        --src /path/to/reference_weights --dst /path/to/weights
    # then, in python:
    from hubconf import full_pipeline
    pipe = full_pipeline(weights_root="/path/to/weights")

Scope (what is convertible offline, round-trip tested in
tests/test_port_reference_weights.py):

* uplifting checkpoints (all three paper variants) — port_uplifting_state_dict;
* wasb / hrnet / vitpose detector checkpoints — port_cnn_state_dict, with
  the architecture reconstructed from `additional_info` exactly like the
  reference's own loaders (ref: inference/inference_balldetection.py:49-56);
* segformerpp_* checkpoints — port_segformerpp_state_dict: the external
  `KieDani/SegformerPlusPlus` hub model is mmsegmentation-based
  (MixVisionTransformer + SegformerHead); its tensor layout maps onto
  `SegFormerNet(head_style="mmseg")`, validated leaf-by-leaf against the
  reconstructed model and output-parity-tested against a structural torch
  replica (tests/test_port_reference_weights.py). Anything unrecognized
  (fork drift) fails loudly with the offending keys. The
  ImageNet-pretrained MiT *backbone* initialization path is covered
  separately by `port_torch.port_hf_segformer_backbone` (HuggingFace
  `nvidia/mit-bN` naming, golden-tested in tests/test_segformer_port.py).
* `initialization/` raw state dicts (MAE ViT, WASB publish) are skipped:
  they are training-time init weights, not inference checkpoints; use
  `port_hf_segformer_backbone`/`port_cnn_state_dict` directly if needed.
"""
from __future__ import annotations

import argparse
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np


class UnsupportedCheckpoint(RuntimeError):
    pass


def _json_safe(obj):
    """additional_info values must survive json.dump (tuples -> lists,
    numpy scalars -> python)."""
    if isinstance(obj, dict):
        return {str(k): _json_safe(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_json_safe(v) for v in obj]
    if isinstance(obj, np.generic):
        return obj.item()
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    return str(obj)


def port_uplifting_checkpoint(pt_path: str) -> Tuple[Dict, str, Dict]:
    """Reference uplifting model.pt -> (flax params, identifier, info)."""
    import torch

    from upliftingtabletennis_tpu.utils.port_torch import port_uplifting_state_dict

    ckpt = torch.load(pt_path, map_location="cpu", weights_only=False)
    params = port_uplifting_state_dict(ckpt["model_state_dict"])
    return params, ckpt.get("identifier", ""), _json_safe(ckpt.get("additional_info", {}))


def port_detector_checkpoint(pt_path: str, task: Optional[str] = None
                             ) -> Tuple[Dict, str, Dict, str]:
    """Reference detector model.pt -> (flax variables, identifier, info, name).

    Architecture comes from additional_info like the reference's loaders
    (model_name / in_frames / image_resolution,
    ref: inference/inference_balldetection.py:49-56). `task` may be omitted
    and is then inferred from the head's out-channel count (1 ball / 13
    table).
    """
    import torch

    import jax
    import jax.numpy as jnp

    from upliftingtabletennis_tpu.models.factory import (
        DETECTOR_RESOLUTIONS, get_detector)
    from upliftingtabletennis_tpu.utils.port_torch import port_cnn_state_dict

    ckpt = torch.load(pt_path, map_location="cpu", weights_only=False)
    info = ckpt.get("additional_info", {})
    sd = ckpt["model_state_dict"]
    name = info.get("model_name")
    if name is None:
        raise UnsupportedCheckpoint(f"{pt_path}: no model_name in additional_info")
    if name.startswith("segformerpp"):
        return _port_segformerpp_checkpoint(ckpt, name, task, pt_path)

    if task is None:
        # out channels of the final conv: ball heads emit 1 (wasb: 3 frames,
        # middle returned), table heads 13
        out_ch = None
        for key in ("model.final_layers.0.weight", "model.keypoint_head.final_layer.weight"):
            if key in sd:
                out_ch = sd[key].shape[0]
        if out_ch is None:
            raise UnsupportedCheckpoint(f"{pt_path}: cannot infer task (no final layer)")
        task = "table" if out_ch == 13 else "ball"

    in_frames = int(info.get("in_frames", 3 if task == "ball" else 1))
    res = tuple(info.get("image_resolution", DETECTOR_RESOLUTIONS[name]))  # (W, H)
    model, _ = get_detector(name, task, in_frames=in_frames, train=False)
    x_spec = jax.ShapeDtypeStruct((1, res[1], res[0], 3 * in_frames), jnp.float32)
    var_shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x_spec)
    variables = port_cnn_state_dict(sd, var_shapes)
    return variables, ckpt.get("identifier", ""), _json_safe(info), name


def _port_segformerpp_checkpoint(ckpt, name, task, pt_path):
    """segformerpp_* checkpoints: the external hub model is mmseg-based
    (MixVisionTransformer backbone + SegformerHead) — map its tensor naming
    onto SegFormerNet(head_style="mmseg") and VALIDATE the ported tree
    leaf-by-leaf against the reconstructed model's shapes
    (ref: balldetection/models/segformer_pp.py:12-50,
    interface.py:255-260 — the pipeline's MAIN detectors)."""
    import jax
    import jax.numpy as jnp

    from upliftingtabletennis_tpu.models.factory import (
        DETECTOR_RESOLUTIONS, get_detector)
    from upliftingtabletennis_tpu.utils.port_torch import (
        UnmappedSegformerKeys, port_segformerpp_state_dict)

    info = dict(ckpt.get("additional_info", {}))
    sd = ckpt["model_state_dict"]
    sd = {k: v for k, v in sd.items()}

    fuse_key = "model.decode_head.fusion_conv.conv.weight"
    seg_key = "model.decode_head.conv_seg.weight"
    if fuse_key not in sd or seg_key not in sd:
        raise UnsupportedCheckpoint(
            f"{pt_path}: not an mmseg SegformerHead layout "
            f"(missing {fuse_key!r}) — cannot port")
    decoder_dim = int(sd[fuse_key].shape[0])
    out_ch = int(sd[seg_key].shape[0])
    if task is None:
        task = "table" if out_ch == 13 else "ball"
    classify = "visible_classification.weight" in sd
    # first patch embed is already widened in the saved tensors
    in_ch = int(sd["model.backbone.layers.0.0.projection.weight"].shape[1])
    in_frames = max(1, in_ch // 3)
    res = tuple(info.get("image_resolution", DETECTOR_RESOLUTIONS[name]))

    try:
        variables = port_segformerpp_state_dict(sd)
    except UnmappedSegformerKeys as e:
        raise UnsupportedCheckpoint(f"{pt_path}: {e}") from e

    model, _ = get_detector(name, task, in_frames=in_frames,
                            classify_invisible=classify,
                            head_style="mmseg", decoder_dim=decoder_dim)
    x_spec = jax.ShapeDtypeStruct((1, res[1], res[0], 3 * in_frames), jnp.float32)
    var_shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x_spec)

    got = {p: l.shape for p, l in
           jax.tree_util.tree_flatten_with_path(variables)[0]}
    want = {p: l.shape for p, l in
            jax.tree_util.tree_flatten_with_path(var_shapes)[0]}
    if got != want:
        extra = sorted(set(got) - set(want))[:4]
        missing = sorted(set(want) - set(got))[:4]
        mism = sorted(p for p in got.keys() & want.keys()
                      if got[p] != want[p])[:4]
        raise UnsupportedCheckpoint(
            f"{pt_path}: ported tree mismatches SegFormerNet(mmseg) — "
            f"extra={extra} missing={missing} shape-mismatch={mism}")

    info.update(flax_head_style="mmseg", decoder_dim=decoder_dim,
                in_frames=in_frames, classify_invisible=classify,
                model_name=name)
    return variables, ckpt.get("identifier", ""), _json_safe(info), name


# relative dirs in the zip -> (kind, task or None)
_LAYOUT = (
    ("inference_balldetection", "detector", "ball"),
    ("inference_tabledetection", "detector", "table"),
    ("pretraining_blurball", "detector", None),
    ("inference_uplifting", "uplifting", None),
)


def port_tree(src: str, dst: str) -> Dict[str, str]:
    """Walk an unzipped reference weights tree and write the same relative
    layout as Orbax checkpoints. Returns {relpath: status}."""
    from upliftingtabletennis_tpu.utils.checkpoint import save_checkpoint

    results: Dict[str, str] = {}
    for sub, kind, task in _LAYOUT:
        root = os.path.join(src, sub)
        if not os.path.isdir(root):
            continue
        for entry in sorted(os.listdir(root)):
            pt = os.path.join(root, entry, "model.pt")
            rel = os.path.join(sub, entry, "model")
            if not os.path.isfile(pt):
                continue
            try:
                if kind == "uplifting":
                    tree, ident, info = port_uplifting_checkpoint(pt)
                else:
                    tree, ident, info, _ = port_detector_checkpoint(pt, task)
                save_checkpoint(os.path.join(dst, rel), tree, ident, info)
                results[rel] = "ok"
            except UnsupportedCheckpoint as e:
                results[rel] = f"skipped: {e}"
            except Exception as e:  # keep walking; report at the end
                results[rel] = f"FAILED: {type(e).__name__}: {e}"
    return results


def fetch_weights(url: str, cache_dir: Optional[str] = None,
                  force: bool = False) -> str:
    """Download + extract the reference weights zip; return the layout root.

    The TPU-native equivalent of the reference's hub auto-download
    (ref: interface.py:34-79): same caching semantics — the zip is
    downloaded once into `cache_dir`, extracted once, and subsequent calls
    return the cached extraction immediately. `url` is anything urllib
    opens (https://, file://, or a bare local path), so the machinery is
    fully testable without egress (tests/test_port_reference_weights.py
    exercises it through a file:// zip). The returned root is the
    directory that actually contains the reference layout
    (inference_*/...), descending through a single wrapping folder the way
    the reference's EXTRACTED_FOLDER_NAME does.
    """
    import urllib.parse
    import urllib.request
    import zipfile

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "upliftingtabletennis_tpu", "weights"
        )
    os.makedirs(cache_dir, exist_ok=True)
    if "://" not in url:
        url = "file://" + os.path.abspath(url)
    name = os.path.basename(urllib.parse.urlparse(url).path) or "weights.zip"
    zip_path = os.path.join(cache_dir, name)
    extract_path = os.path.join(cache_dir, name + ".extracted")

    def _layout_root(path):
        # ignore zip junk and any .orbax tree a previous fetch_and_port
        # placed beside the layout folder
        entries = [e for e in os.listdir(path)
                   if not e.startswith("__MACOSX") and not e.endswith(".orbax")]
        if any(e.startswith(("inference_", "pretraining_", "initialization"))
               for e in entries):
            return path
        if len(entries) == 1 and os.path.isdir(os.path.join(path, entries[0])):
            return _layout_root(os.path.join(path, entries[0]))
        return path

    if force:
        for p in (zip_path, extract_path):
            if os.path.isdir(p):
                import shutil

                shutil.rmtree(p)
            elif os.path.isfile(p):
                os.remove(p)
    if os.path.isdir(extract_path):
        return _layout_root(extract_path)
    if not os.path.isfile(zip_path):
        print(f"[fetch_weights] downloading {url} -> {zip_path}")
        tmp = zip_path + ".part"
        with urllib.request.urlopen(url) as r, open(tmp, "wb") as f:
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
        os.replace(tmp, zip_path)
    print(f"[fetch_weights] extracting {zip_path}")
    tmp_extract = extract_path + ".part"
    with zipfile.ZipFile(zip_path) as z:
        z.extractall(tmp_extract)
    os.replace(tmp_extract, extract_path)
    return _layout_root(extract_path)


def fetch_and_port(url: str, dst: Optional[str] = None,
                   cache_dir: Optional[str] = None,
                   force: bool = False) -> str:
    """fetch_weights + port_tree with a cache: returns the Orbax weights
    root, porting only when the destination does not exist yet."""
    src = fetch_weights(url, cache_dir, force)
    if dst is None:
        dst = src + ".orbax"
    done_marker = os.path.join(dst, ".ported_ok")
    if not force and os.path.isfile(done_marker):
        return dst
    results = port_tree(src, dst)
    n_ok = sum(1 for s in results.values() if s == "ok")
    if n_ok:
        with open(done_marker, "w") as f:
            f.write("\n".join(f"{k}\t{v}" for k, v in results.items()))
    for rel, status in results.items():
        print(f"{rel}  {status}")
    return dst


def main(argv=None) -> Dict[str, str]:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--src", help="unzipped reference weights directory")
    g.add_argument("--url", help="weights zip URL (https:// or file://) — "
                                 "downloaded + extracted with the reference's "
                                 "caching semantics (ref: interface.py:34-79)")
    p.add_argument("--dst", required=True,
                   help="output root (same sub-layout, Orbax checkpoints)")
    args = p.parse_args(argv)

    src = args.src if args.src else fetch_weights(args.url)
    results = port_tree(src, args.dst)

    width = max((len(k) for k in results), default=0)
    for rel, status in results.items():
        print(f"{rel:<{width}}  {status}")
    n_ok = sum(1 for s in results.values() if s == "ok")
    print(f"[port_reference_weights] converted {n_ok}/{len(results)} checkpoints "
          f"-> {args.dst}")
    return results


if __name__ == "__main__":
    main()
