"""Sensitivity-weighted 1-D k-means for non-uniform quantization (NUQ).

The reference runs sklearn KMeans per output channel across a
multiprocessing pool (reference quantization/nuq.py:50-58, 117, 179:
k=2**bits, random_state=0, max_iter=50, sample_weight = grad^2 * (w != 0)).

Here the same clustering is a *batched, vectorized* solver: all channels of
a module run as one array program (numpy on host, chunked to bound memory) —
typically 1-2 orders of magnitude faster than the per-channel pool, with a
`method="sklearn"` parity mode that defers to sklearn per channel for
bit-compatible reproduction of reference checkpoints.

Semantics matched to the reference:
  * zero sample-weight channels fall back to uniform weights (nuq.py:174-175)
  * deterministic seeded k-means++ init (random_state=0)
  * max_iter=50
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _weighted_kmeanspp_init(x, w, k, rng):
    """Vectorized weighted k-means++ init.

    x, w: (C, N). Returns (C, k) initial centroids.
    """
    C, N = x.shape
    centroids = np.empty((C, k), dtype=np.float64)
    # first: sample proportional to weight
    p = w / w.sum(axis=1, keepdims=True)
    cdf = np.cumsum(p, axis=1)
    r = rng.random((C, 1))
    first = (cdf < r).sum(axis=1).clip(0, N - 1)
    centroids[:, 0] = x[np.arange(C), first]
    d2 = (x - centroids[:, :1]) ** 2
    for j in range(1, k):
        score = d2 * w
        tot = score.sum(axis=1, keepdims=True)
        tot = np.where(tot <= 0, 1.0, tot)
        cdf = np.cumsum(score / tot, axis=1)
        r = rng.random((C, 1))
        idx = (cdf < r).sum(axis=1).clip(0, N - 1)
        centroids[:, j] = x[np.arange(C), idx]
        d2 = np.minimum(d2, (x - centroids[:, j : j + 1]) ** 2)
    return centroids


def weighted_kmeans_batched(
    values: np.ndarray,
    weights: Optional[np.ndarray],
    k: int,
    max_iter: int = 50,
    seed: int = 0,
    tol: float = 1e-6,
    chunk: int = 256,
) -> Tuple[np.ndarray, np.ndarray]:
    """Weighted 1-D Lloyd over a batch of channels.

    Args:
      values: (C, N) — one row per output channel.
      weights: (C, N) nonneg sample weights or None (uniform). Rows summing
        to zero fall back to uniform (reference nuq.py:174-175).

    Returns:
      (centroids (C, k) f32 sorted ascending, labels (C, N) uint8)
    """
    values = np.asarray(values, dtype=np.float64)
    C, N = values.shape
    if weights is None:
        weights = np.ones_like(values)
    else:
        weights = np.asarray(weights, dtype=np.float64)
        zero_rows = weights.sum(axis=1) <= 0
        if zero_rows.any():
            weights = weights.copy()
            weights[zero_rows] = 1.0

    cents = np.empty((C, k), dtype=np.float32)
    labels = np.empty((C, N), dtype=np.uint8)
    for c0 in range(0, C, chunk):
        sl = slice(c0, min(c0 + chunk, C))
        cc, ll = _kmeans_chunk(values[sl], weights[sl], k, max_iter, seed, tol)
        cents[sl] = cc
        labels[sl] = ll
    return cents, labels


def _kmeans_chunk(x, w, k, max_iter, seed, tol):
    C, N = x.shape
    rng = np.random.default_rng(seed)
    cent = _weighted_kmeanspp_init(x, w, k, rng)  # (C, k)
    prev_obj = np.full(C, np.inf)
    for _ in range(max_iter):
        d2 = (x[:, :, None] - cent[:, None, :]) ** 2  # (C, N, k)
        lab = d2.argmin(axis=2)  # (C, N)
        onehot = lab[:, :, None] == np.arange(k)[None, None]  # (C, N, k) bool
        wsum = np.einsum("cn,cnk->ck", w, onehot)
        wxsum = np.einsum("cn,cn,cnk->ck", w, x, onehot)
        new_cent = np.where(wsum > 0, wxsum / np.maximum(wsum, 1e-30), cent)
        obj = np.einsum("cn,cn->c", w, np.take_along_axis(d2, lab[:, :, None], 2)[:, :, 0])
        moved = np.abs(new_cent - cent).max(axis=1)
        cent = new_cent
        if (moved < tol).all() or np.all(prev_obj - obj <= tol * np.maximum(obj, 1)):
            break
        prev_obj = obj
    # sort centroids ascending, remap labels
    order = np.argsort(cent, axis=1)
    cent_sorted = np.take_along_axis(cent, order, axis=1)
    inv = np.empty_like(order)
    np.put_along_axis(inv, order, np.arange(k)[None].repeat(C, 0), axis=1)
    d2 = (x[:, :, None] - cent_sorted[:, None, :]) ** 2
    lab = d2.argmin(axis=2).astype(np.uint8)
    return cent_sorted.astype(np.float32), lab


def _sklearn_kmeans_row(args):
    values, weights, k = args
    from sklearn.cluster import KMeans

    km = KMeans(n_clusters=k, random_state=0, n_init="auto", max_iter=50).fit(
        values.reshape(-1, 1), sample_weight=weights
    )
    return km.cluster_centers_.reshape(-1), km.labels_.astype(np.uint8)


def fit_module_luts(
    weight: np.ndarray,
    gradient: Optional[np.ndarray],
    bits: int,
    method: str = "auto",
    seed: int = 0,
    pool=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Fit per-output-channel codebooks for one module.

    Args:
      weight: (out, in) weights with outlier slots zeroed.
      gradient: (out, in) grad^2 sensitivities or None.
      method: 'batched' (vectorized, fast) or 'sklearn' (reference parity).

    Returns:
      (lut (out, 2**bits) f32, labels (out, in) uint8)

    Sample weights follow nuq.py:169-176: grad^2 masked at zeroed slots,
    uniform fallback for all-zero rows.
    """
    weight = np.asarray(weight, dtype=np.float32)
    k = 2**bits
    mask = (weight != 0).astype(np.float64)
    if gradient is not None:
        sw = np.asarray(gradient, dtype=np.float64) * mask
    else:
        sw = mask.copy()
    zero_rows = sw.sum(axis=1) <= 0
    if zero_rows.any():
        sw[zero_rows] = 1.0

    if method == "auto":
        from squeezellm_tpu import _native

        method = "native" if _native.available() else "batched"
    if method == "native":
        from squeezellm_tpu import _native

        cents, labels = _native.weighted_kmeans_batched(
            weight, sw.astype(np.float32), k, seed=seed
        )
        return cents, labels
    if method == "batched":
        return weighted_kmeans_batched(weight, sw, k, seed=seed)
    if method == "sklearn":
        tasks = [(weight[i], sw[i], k) for i in range(weight.shape[0])]
        if pool is not None:
            results = pool.map(_sklearn_kmeans_row, tasks)
        else:
            results = [_sklearn_kmeans_row(t) for t in tasks]
        lut = np.stack([r[0] for r in results]).astype(np.float32)
        labels = np.stack([r[1] for r in results])
        # sort ascending + remap for a canonical codebook order
        order = np.argsort(lut, axis=1)
        lut_sorted = np.take_along_axis(lut, order, axis=1)
        inv = np.empty_like(order)
        np.put_along_axis(inv, order, np.arange(k)[None].repeat(lut.shape[0], 0), 1)
        labels = np.take_along_axis(inv, labels.astype(np.int64), axis=1).astype(np.uint8)
        return lut_sorted, labels
    raise ValueError(f"unknown method {method!r}")


def fit_structured_luts(
    weight: np.ndarray,
    gradient: Optional[np.ndarray],
    max_iter: int = 25,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Fit 4-bit STRUCTURED additive codebooks: per channel,
    ``lut[c] = A[c & 7] + (c >> 3) * d`` (9 DOF instead of 16).

    Why constrain: on v5e an arbitrary 16-entry table needs two 8-row
    wrap-gathers + a hi/lo select inside the dequant kernel (~6 VPU
    ops/weight — the measured w4 decode wall); the additive structure
    dequantizes with ONE gather + a bit-3 mask (~4 ops/weight,
    ops/pallas_ops._dequant_plane_struct). The constrained family still
    contains every uniform grid and every free 8-entry codebook, so the
    fidelity cost vs free 16-entry NUQ is small (gated in
    tests/test_quantize.py).

    Alternating minimization: assignment = nearest implied centroid;
    update = exact weighted least squares for (A, d) jointly (the normal
    equations decouple: A_j = (S_j - d T_j) / W_j and d solves a scalar
    equation after substitution). Init: free 8-centroid Lloyd for A, d
    from the weighted mean positive residual.

    Returns (lut (out, 16) f32 materialized in STRUCTURED order —
    NOT sorted: lut[:, :8] = A, lut[:, 8:] = A + d — and labels
    (out, in) uint8 in the same indexing).
    """
    w = np.asarray(weight, dtype=np.float64)
    C, N = w.shape
    mask = (w != 0).astype(np.float64)
    if gradient is not None:
        sw = np.asarray(gradient, dtype=np.float64) * mask
    else:
        sw = mask.copy()
    zero_rows = sw.sum(axis=1) <= 0
    if zero_rows.any():
        sw[zero_rows] = 1.0

    A8, lab8 = weighted_kmeans_batched(w, sw, 8, seed=seed)
    A = A8.astype(np.float64)  # (C, 8)
    # init d: weighted mean |residual| (keeps the pair offset meaningful
    # even when the 8-centroid fit is already tight)
    resid = w - np.take_along_axis(A, lab8.astype(np.int64), axis=1)
    d = (np.abs(resid) * sw).sum(1) / np.maximum(sw.sum(1), 1e-30)  # (C,)
    d = np.maximum(d, 1e-12)

    for _ in range(max_iter):
        # implied 16 centroids, assignment
        lut = np.concatenate([A, A + d[:, None]], axis=1)  # (C, 16)
        d2 = (w[:, :, None] - lut[:, None, :]) ** 2
        lab = d2.argmin(axis=2)  # (C, N) in 0..15
        j = lab & 7
        b = (lab >> 3).astype(np.float64)
        onehot = j[:, :, None] == np.arange(8)[None, None]
        W_j = np.einsum("cn,cnk->ck", sw, onehot)
        S_j = np.einsum("cn,cn,cnk->ck", sw, w, onehot)
        T_j = np.einsum("cn,cn,cnk->ck", sw, b, onehot)
        swb = (sw * b).sum(1)
        swbx = (sw * b * w).sum(1)
        Wsafe = np.maximum(W_j, 1e-30)
        denom = swb - (T_j * T_j / Wsafe).sum(1)
        numer = swbx - (T_j * S_j / Wsafe).sum(1)
        new_d = np.where(np.abs(denom) > 1e-20, numer / denom, d)
        new_A = np.where(W_j > 0, (S_j - new_d[:, None] * T_j) / Wsafe, A)
        moved = np.abs(new_A - A).max(1) + np.abs(new_d - d)
        A, d = new_A, new_d
        if (moved < 1e-9).all():
            break

    lut = np.concatenate([A, A + d[:, None]], axis=1)
    d2 = (w[:, :, None] - lut[:, None, :]) ** 2
    lab = d2.argmin(axis=2).astype(np.uint8)
    return lut.astype(np.float32), lab


def structured_decomposition(lut: np.ndarray, atol: float = 0.0):
    """Detect the additive structure in a materialized (out, 16) lut:
    returns (A (out, 8) f32, d (out,) f32) if ``lut[:, 8:] - lut[:, :8]``
    is constant per channel (within atol), else None. Used by
    models/fuse.attach_decode_luts to attach the fast-dequant table for
    checkpoints produced by fit_structured_luts (no format/spec change —
    the structure is a property of the table)."""
    lut = np.asarray(lut)
    if lut.ndim != 2 or lut.shape[1] != 16:
        return None
    delta = lut[:, 8:] - lut[:, :8]
    dmean = delta.mean(axis=1)
    if np.abs(delta - dmean[:, None]).max() > max(
            atol, 1e-6 * max(1.0, float(np.abs(lut).max()))):
        return None
    return lut[:, :8].astype(np.float32), dmean.astype(np.float32)
