"""Native (C++/OpenMP) k-means: correctness vs the numpy solver."""

import os

import numpy as np
import pytest

from squeezellm_tpu import _native
from squeezellm_tpu.quantize import kmeans as km

pytestmark = pytest.mark.skipif(
    not _native.available(), reason="native library not built (make -C csrc)"
)


def _wmse(x, w, c, l):
    q = np.take_along_axis(c, l.astype(np.int64), axis=1)
    return float((w * (x - q) ** 2).sum() / w.sum())


def test_native_kmeans_quality_and_determinism():
    rng = np.random.default_rng(0)
    C, N, k = 32, 512, 16
    x = rng.normal(size=(C, N)).astype(np.float32)
    w = (rng.random((C, N)) ** 2).astype(np.float32)

    c1, l1 = _native.weighted_kmeans_batched(x, w, k, seed=0)
    c2, l2 = _native.weighted_kmeans_batched(x, w, k, seed=0)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(l1, l2)

    assert (np.diff(c1, axis=1) >= -1e-7).all()  # sorted codebooks
    # labels are nearest-centroid
    d = np.abs(x[:, :, None] - c1[:, None, :])
    np.testing.assert_array_equal(l1, d.argmin(axis=2))

    # quality within 10% of the numpy Lloyd solver
    cb, lb = km.weighted_kmeans_batched(x, w, k, seed=0)
    assert _wmse(x, w, c1, l1) <= _wmse(x, w, cb, lb) * 1.10


def test_native_is_default_when_available():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(4, 64)).astype(np.float32)
    lut, labels = km.fit_module_luts(w, None, bits=3, method="auto")
    lut2, labels2 = km.fit_module_luts(w, None, bits=3, method="native")
    np.testing.assert_array_equal(lut, lut2)
    np.testing.assert_array_equal(labels, labels2)


def test_native_handles_constant_rows():
    # a row with a single repeated value must not crash or NaN
    x = np.zeros((2, 64), dtype=np.float32)
    x[1] = 1.5
    w = np.ones_like(x)
    c, l = _native.weighted_kmeans_batched(x, w, 4, seed=0)
    assert np.isfinite(c).all()
    q = np.take_along_axis(c, l.astype(np.int64), axis=1)
    np.testing.assert_allclose(q, x, atol=1e-6)


def test_rebuild_from_source_matches_committed_binary(tmp_path):
    """Rebuild-provenance gate for the tracked .so (round-5 VERDICT item):
    `make -C csrc` into a temp target must produce a library whose
    behavior (k-means centroids/labels, spmv plan tables) matches the
    committed binary exactly — catching a stale committed .so after a
    csrc/ change."""
    import ctypes
    import shutil
    import subprocess

    from squeezellm_tpu import _native

    if shutil.which("g++") is None:
        pytest.skip("no C++ toolchain")
    committed = _native.load()
    if committed is None:
        pytest.skip("committed native library absent")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    target = tmp_path / "librebuilt.so"
    subprocess.run(
        ["make", "-C", os.path.join(repo, "csrc"), f"TARGET={target}"],
        check=True, capture_output=True)
    rebuilt = _native.open_library(str(target))

    rng = np.random.default_rng(5)
    vals = rng.normal(size=(6, 200)).astype(np.float32)
    wts = (np.abs(rng.normal(size=(6, 200))) + 1e-3).astype(np.float32)

    def run_kmeans(lib):
        C, N, k = 6, 200, 16
        cents = np.empty((C, k), np.float32)
        labels = np.empty((C, N), np.uint8)
        lib.nuq_weighted_kmeans_batched(
            vals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            wts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            C, N, k, 50, 0, 1e-8,
            cents.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return cents, labels

    c0, l0 = run_kmeans(committed)
    c1, l1 = run_kmeans(rebuilt)
    np.testing.assert_array_equal(l0, l1)
    np.testing.assert_array_equal(c0, c1)

    rows = np.sort(rng.integers(0, 1024, 600)).astype(np.int32)
    cols = rng.integers(0, 512, 600).astype(np.int32)
    v = rng.normal(size=600).astype(np.float32)

    def run_plan(lib):
        prev = _native._lib
        try:
            _native._lib = lib
            return _native.spmv_plan(rows, cols, v, 8, 8, 1.3, 4.0)
        finally:
            _native._lib = prev

    m0, v0 = run_plan(committed)
    m1, v1 = run_plan(rebuilt)
    np.testing.assert_array_equal(m0, m1)
    np.testing.assert_array_equal(v0, v1)
