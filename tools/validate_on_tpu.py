"""Validate the Pallas kernels on REAL TPU hardware against their oracles.

The CPU test suite exercises these kernels in interpret mode only
(tests/test_tpu_ops.py, tests/test_nms.py); this script runs them compiled
on the actual chip and writes artifacts/tpu_validation.json:

  * Pallas tiled-IoU NMS vs the C++ greedy oracle (native/nms.cpp) and the
    dense-XLA path (ref algorithm: vit_pose/vit_utils/nms/nms_kernel.cu);
  * flash cross-attention vs dense XLA;
  * Pallas depthwise conv vs float64 numpy.

Run: python tools/validate_on_tpu.py   (requires the TPU backend)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu", f"need TPU, got {jax.default_backend()}"
    results = {"backend": str(jax.devices()[0])}
    rng = np.random.default_rng(0)

    # --- NMS: pallas-on-TPU vs dense vs C++ oracle ---
    from upliftingtabletennis_tpu.ops.nms import nms

    agree_cpp = agree_dense = total = 0
    for trial in range(5):
        n = int(rng.integers(10, 400))
        xy = rng.uniform(0, 800, (n, 2))
        wh = rng.uniform(5, 120, (n, 2))
        dets = np.concatenate([xy, xy + wh, rng.uniform(size=(n, 1))], -1).astype(np.float32)
        keep_pallas = nms(dets, 0.5, use_pallas=True)
        keep_dense = nms(dets, 0.5, use_pallas=False)
        agree_dense += int(keep_pallas == keep_dense)
        try:
            from native.build import cpu_nms

            keep_cpp = cpu_nms(dets, 0.5)
            agree_cpp += int(list(keep_pallas) == list(keep_cpp))
        except Exception:
            agree_cpp = -999
        total += 1
    results["nms_pallas_vs_dense_agree"] = f"{agree_dense}/{total}"
    results["nms_pallas_vs_cpp_agree"] = (
        f"{agree_cpp}/{total}" if agree_cpp >= 0 else "cpp oracle unavailable"
    )

    # --- flash attention vs dense ---
    from upliftingtabletennis_tpu.ops.flash_attention import (
        dense_cross_attention,
        flash_cross_attention,
    )

    q = jnp.asarray(rng.normal(size=(2, 4096, 2, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 700, 2, 64)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 700, 2, 64)), jnp.float32)
    err = float(jnp.max(jnp.abs(flash_cross_attention(q, k, v) - dense_cross_attention(q, k, v))))
    results["flash_attention_max_err"] = err

    # --- depthwise conv vs numpy float64 ---
    from upliftingtabletennis_tpu.ops.dwconv import _dw_pallas

    B, H, W, C = 2, 56, 100, 256
    xn = rng.normal(size=(B, H, W, C)).astype(np.float32)
    wn = rng.normal(size=(3, 3, 1, C)).astype(np.float32)
    bn = rng.normal(size=(C,)).astype(np.float32)
    xp = np.pad(xn.astype(np.float64), ((0, 0), (1, 1), (1, 1), (0, 0)))
    ref = np.zeros((B, H, W, C)) + bn
    for i in range(3):
        for j in range(3):
            ref += xp[:, i : i + H, j : j + W, :] * wn[i, j, 0]
    out = np.asarray(_dw_pallas(jnp.asarray(xn), jnp.asarray(wn), jnp.asarray(bn)))
    results["dwconv_max_err"] = float(np.abs(out - ref).max())

    out_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "artifacts", "tpu_validation.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
