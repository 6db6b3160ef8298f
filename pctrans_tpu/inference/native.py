"""ctypes bindings for the native metrics library (native/metrics.cpp).

The reference exposes its evaluation kernels through a compiled Cython
module (lib/evaluate/CVPPP_evaluate.pyx + prebuilt .so); here the native
layer is plain C++ with a C ABI, loaded lazily, and every entry point has a
pure-numpy fallback (metrics_cvppp.py / postprocess.py), so the framework
works with or without the build step (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                        "libpctrans_metrics.so")
    path = os.path.abspath(path)
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.symmetric_best_dice_i32.argtypes = [i32p, i32p, ctypes.c_int64, f64p]
    lib.symmetric_best_dice_i32.restype = ctypes.c_double
    lib.diff_fg_labels_i32.argtypes = [i32p, i32p, ctypes.c_int64]
    lib.diff_fg_labels_i32.restype = ctypes.c_double
    lib.pairwise_dice_u8.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64, f64p]
    lib.pairwise_dice_u8.restype = None
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def symmetric_best_dice(in_label: np.ndarray, gt_label: np.ndarray) -> Tuple[float, float, float]:
    """Returns (sbd, bd(in,gt), bd(gt,in)) or raises if the lib is absent."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native metrics library not built (make -C native)")
    a = np.ascontiguousarray(in_label, np.int32).ravel()
    b = np.ascontiguousarray(gt_label, np.int32).ravel()
    out = np.zeros(2, np.float64)
    sbd = lib.symmetric_best_dice_i32(a, b, a.size, out)
    return float(sbd), float(out[0]), float(out[1])


def diff_fg_labels(in_label: np.ndarray, gt_label: np.ndarray) -> float:
    lib = _load()
    if lib is None:
        raise RuntimeError("native metrics library not built (make -C native)")
    a = np.ascontiguousarray(in_label, np.int32).ravel()
    b = np.ascontiguousarray(gt_label, np.int32).ravel()
    return float(lib.diff_fg_labels_i32(a, b, a.size))


def pairwise_dice(masks: np.ndarray) -> np.ndarray:
    """Binary masks [N, H, W] -> [N, N] dice matrix (postprocess clustering)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native metrics library not built (make -C native)")
    m = np.ascontiguousarray(masks.reshape(masks.shape[0], -1) > 0, np.uint8)
    out = np.zeros((m.shape[0], m.shape[0]), np.float64)
    lib.pairwise_dice_u8(m, m.shape[0], m.shape[1], out)
    return out
