"""Build + load the native NMS shared library (g++, ctypes).

Replaces the reference's CUDA-aware distutils build
(ref: vit_pose/vit_utils/nms/setup_linux.py): the C++ piece builds with
plain g++; the accelerator path is a Pallas TPU kernel
(upliftingtabletennis_tpu/ops/nms.py), not CUDA.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "nms.cpp")
_LIB = os.path.join(_DIR, "libnms.so")

_lib = None


def build(force: bool = False) -> str:
    """Compile libnms.so if missing/stale. Returns the library path."""
    if force or not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC], check=True
        )
    return _LIB


def load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build())
        lib.greedy_nms.restype = ctypes.c_int
        lib.greedy_nms.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_float,
            ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
    return _lib


def cpu_nms(dets: np.ndarray, thresh: float) -> list:
    """Greedy IoU NMS. dets (N, 5) float32 rows (x1, y1, x2, y2, score).
    Returns kept indices in descending-score order (ref cpu_nms contract)."""
    dets = np.ascontiguousarray(dets, np.float32)
    n = dets.shape[0]
    keep = np.zeros(n, np.int32)
    lib = load()
    n_keep = lib.greedy_nms(
        dets.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
        ctypes.c_float(thresh),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return keep[:n_keep].tolist()
