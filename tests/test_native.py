"""Native (C++/OpenMP) k-means: correctness vs the numpy solver."""

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
