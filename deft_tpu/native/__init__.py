"""ctypes bindings for the C++ host-runtime kernels.

Builds ``libdeft_native.so`` from deft_native.cpp on first import (cached
beside the source; rebuilt when the source is newer) and exposes GIL-free
``lapjv``, ``iou_matrix`` and ``warp_affine``.  Everything degrades to the
numpy/scipy implementations when no compiler is available
(``deft_tpu.native.AVAILABLE`` is False then).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "deft_native.cpp")
_LIB = os.path.join(_HERE, "libdeft_native.so")

AVAILABLE = False
_lib = None


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", _LIB, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, AVAILABLE
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build()
        _lib = ctypes.CDLL(_LIB)
    except Exception as e:  # no compiler / load failure -> numpy fallbacks
        print(f"deft_native: build/load failed ({e}); using numpy fallbacks")
        return

    _lib.lapjv_limit.restype = ctypes.c_int
    _lib.lapjv_limit.argtypes = [
        ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_double,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    ]
    _lib.iou_matrix.restype = None
    _lib.iou_matrix.argtypes = [
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
    ]
    _lib.warp_affine_u8.restype = None
    _lib.warp_affine_u8.argtypes = [
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_int,
    ]
    AVAILABLE = True


_load()


def lapjv(cost: np.ndarray, thresh: float):
    """lap.lapjv(extend_cost=True, cost_limit=thresh) semantics.

    Returns (matches [K, 2], unmatched_rows, unmatched_cols).
    """
    cost = np.ascontiguousarray(
        np.nan_to_num(cost, nan=1e9, posinf=1e9), dtype=np.float64
    )
    n, m = cost.shape
    if n == 0 or m == 0:
        return (np.empty((0, 2), int), np.arange(n), np.arange(m))
    r2c = np.empty(n, np.int32)
    c2r = np.empty(m, np.int32)
    _lib.lapjv_limit(n, m, cost, float(thresh), r2c, c2r)
    rows = np.where(r2c >= 0)[0]
    matches = np.stack([rows, r2c[rows]], axis=1) if len(rows) else \
        np.empty((0, 2), int)
    return matches, np.where(r2c < 0)[0], np.where(c2r < 0)[0]


def iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    a = np.ascontiguousarray(a, dtype=np.float64)
    b = np.ascontiguousarray(b, dtype=np.float64)
    out = np.empty((len(a), len(b)), np.float64)
    if out.size:
        _lib.iou_matrix(a, len(a), b, len(b), out)
    return out


def warp_affine(src: np.ndarray, M: np.ndarray, dsize) -> np.ndarray:
    """cv2.warpAffine(src, M, dsize, INTER_LINEAR) equivalent (uint8)."""
    dw, dh = dsize
    src = np.ascontiguousarray(src, dtype=np.uint8)
    if src.ndim == 2:
        src = src[:, :, None]
    dst = np.empty((dh, dw, src.shape[2]), np.uint8)
    _lib.warp_affine_u8(src, src.shape[0], src.shape[1], src.shape[2],
                        np.ascontiguousarray(M, np.float64), dst, dh, dw)
    return dst[..., 0] if dst.shape[2] == 1 else dst
