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


def open_library(path: str) -> ctypes.CDLL:
    """Load a built library and declare its C ABI. Raises OSError if the
    file is missing/unloadable. Used by load() for the committed binary
    and by tests for rebuild-provenance checks (tests/test_native.py
    rebuilds from csrc/ and compares behavior against the committed .so)."""
    lib = ctypes.CDLL(path)
    _declare_abi(lib)
    return lib


def load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    path = os.path.join(os.path.dirname(__file__), _LIB_NAME)
    if not os.path.exists(path):
        return None
    try:
        _lib = open_library(path)
    except OSError:
        _lib = None
    return _lib


def _declare_abi(lib: ctypes.CDLL) -> None:
    lib.nuq_weighted_kmeans_batched.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_uint32, ctypes.c_double,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.nuq_weighted_kmeans_batched.restype = None
    lib.spmv_plan.argtypes = [
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32, ctypes.c_int32,
        ctypes.c_double, ctypes.c_double, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.spmv_plan.restype = ctypes.c_int64


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


def spmv_plan(rows, cols, vals, oh: int, oh_true: int, slack: float,
              max_slack: float):
    """Native greedy spmv slot assignment (csrc/spmv_planner.cpp; same
    constraint model as ops/spmv.py's numpy greedy). Returns
    (meta (R, 128) int32, vals (R, 128) f32)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library not built (make -C csrc)")
    rows = np.ascontiguousarray(rows, dtype=np.int32)
    cols = np.ascontiguousarray(cols, dtype=np.int32)
    vals = np.ascontiguousarray(vals, dtype=np.float32)
    nnz = len(vals)
    if nnz:
        # the (class, dst-lane) bucket key (r//128, r%128) IS the row index
        max_bucket = int(np.bincount(rows).max())
    else:
        max_bucket = 1
    max_rows = (int(np.ceil(max_slack * max_bucket)) + 2) * oh
    meta = np.zeros((max_rows, 128), dtype=np.int32)
    v = np.zeros((max_rows, 128), dtype=np.float32)
    r = lib.spmv_plan(
        ctypes.c_int64(nnz),
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        oh, oh_true, slack, max_slack, max_rows,
        meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if r < 0:
        raise RuntimeError(f"spmv assignment failed at slack {max_slack}")
    return meta[:r], v[:r]
