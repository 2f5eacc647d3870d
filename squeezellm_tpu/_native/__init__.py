"""ctypes loader for the native (C++/OpenMP) components.

Built from csrc/ via `make -C csrc` (no pybind11 in this environment — the
C ABI is loaded with ctypes). Every native entry point has a pure-numpy
fallback, so the package works without the build.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_NAME = "libsqueezellm_native.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    path = os.path.join(os.path.dirname(__file__), _LIB_NAME)
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.nuq_weighted_kmeans_batched.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_uint32, ctypes.c_double,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.nuq_weighted_kmeans_batched.restype = None
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return load() is not None


def weighted_kmeans_batched(
    values: np.ndarray,
    weights: np.ndarray,
    k: int,
    max_iter: int = 50,
    seed: int = 0,
    tol: float = 1e-8,
) -> Tuple[np.ndarray, np.ndarray]:
    """Native sorted-Lloyd weighted 1-D k-means. values/weights: (C, N)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library not built (make -C csrc)")
    values = np.ascontiguousarray(values, dtype=np.float32)
    weights = np.ascontiguousarray(weights, dtype=np.float32)
    C, N = values.shape
    cents = np.empty((C, k), dtype=np.float32)
    labels = np.empty((C, N), dtype=np.uint8)
    lib.nuq_weighted_kmeans_batched(
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        weights.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        C, N, k, max_iter, seed, tol,
        cents.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return cents, labels
