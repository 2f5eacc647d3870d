"""Per-row int8 KV-cache quantization (the XLA-side mirror).

The paged serving engine can store KV pages as int8 with one f32 scale
per (token row, kv head): `s = max|row| / 127`, `q = round(row / s)`.
Storage drops from 2 bytes/elem (bf16) to 1.25 at hd=128 (int8 codes +
the tile-aligned scale sidecar below: one (8, L) f32 tile per L-token
group, 7/8 of it DMA-alignment padding -> 32 B/token), so the page pool
holds ~1.6x the tokens and decode attention streams ~0.6x the bytes at
long context. (Packing 8 groups' scales into one tile would cut the
sidecar to 4 B/token at the cost of page-indexed tile rows — noted in
ROADMAP, not yet needed.) The reference framework has no KV quantization
(its scope ends at weight quantization, `/root/reference/llama.py:33-132`
uses the torch fp16 cache); this extends the serving layer the same way
vLLM's fp8 KV cache does, rebuilt TPU-native.

Dequantization never materializes f32 pages in HBM: the paged kernels
convert int8 -> f32 and multiply by the row scale on the VMEM chunk they
just DMA'd (~2 VPU ops/element against the ~0.65 ms/token of HBM bytes
saved at 7B/2048 full context).

These helpers are the single definition of the quantize/dequant math.
The Pallas kernels (ops/paged_attn.py) inline the same expressions; the
tests assert kernel-vs-mirror TOKEN EXACTNESS, so any drift between the
two is a test failure, not a silent accuracy change.
"""

from __future__ import annotations

import jax.numpy as jnp

# int8 Mosaic tile height: DMA slices along the token (second-minor) axis
# must align to 32 rows (f32 is 8, bf16 16 — see ops/paged_attn.py notes).
INT8_SLAB = 32
_QMAX = 127.0
# the scale is DEFINED as max|row| * (1/127), an explicit multiply by the
# f32-rounded reciprocal: XLA strength-reduces divide-by-constant to this
# multiply anyway, so spelling it out keeps jnp and numpy mirrors
# bit-identical (a `/ 127.0` mirror is 1 ulp off)
_RQMAX = 1.0 / 127.0
# rows of all-zeros quantize with this scale (any finite value works: the
# codes are 0); keeps the dequant multiply NaN-free
_EPS = 1e-12


def quantize_rows(x):
    """Quantize along the last axis: x (..., hd) f32/bf16 ->
    (codes int8 (..., hd), scale f32 (..., 1))."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) * _RQMAX,
                    _EPS)
    q = jnp.clip(jnp.round(xf / s), -_QMAX, _QMAX).astype(jnp.int8)
    return q, s


def dequantize_rows(q, s):
    """Inverse of :func:`quantize_rows` (up to rounding): int8 (..., hd)
    times f32 (..., 1) -> f32."""
    return q.astype(jnp.float32) * s


# ---------------------------------------------------------------------------
# Scale-sidecar storage layout (the shape the Pallas q8 kernels DMA).
#
# A naive (..., S, 1) f32 sidecar puts the token axis in the SUBLANE dim
# with a 1-wide lane dim — Mosaic cannot DMA-slice that on v5e ("slice
# shape along dimension 3 must be aligned to tiling (128)", hit on real
# hardware). Scales are therefore stored LANE-major in f32-tile-aligned
# groups: tokens [j*L, (j+1)*L) occupy rows [8j, 8j+8) of a
# (..., NG*8, L) array, with row 8j holding the L scales along LANES and
# rows 8j+1..8j+7 zero padding (8 = the f32 sublane tile, so every DMA
# is a full (8, L) tile — the exact pattern the verified data-pool DMAs
# use). In-kernel the row is consumed POST-matmul: logits (g, L) scale
# by k-rows' (1, L), p (g, L) by v-rows' (1, L) — no lane<->sublane
# relayout anywhere. Paged pools use one group per page (L = page_size);
# dense caches use L = GROUP (or S for tiny interpret-mode tests).
# ---------------------------------------------------------------------------

GROUP = 128  # lane width of one scale group (v5e vreg lane count)


def group_len(S: int) -> int:
    """Lanes per scale group for an S-row cache: GROUP when S is
    group-aligned, else S itself (tiny interpret-mode tests only — the
    model/serving layers keep hardware caches GROUP-aligned)."""
    return GROUP if S % GROUP == 0 else S


def sidecar_shape(S: int):
    """Trailing (rows, lanes) of the scale sidecar for S token rows."""
    L = group_len(S)
    return (8 * (S // L), L)


def pack_scales(s):
    """(..., S, 1) f32 row scales -> (..., NG*8, L) sidecar layout."""
    *lead, S, one = s.shape
    assert one == 1, s.shape
    L = group_len(S)
    ng = S // L
    rows = s.reshape(*lead, ng, 1, L)
    pad = jnp.zeros((*lead, ng, 7, L), s.dtype)
    return jnp.concatenate([rows, pad], axis=-2).reshape(*lead, ng * 8, L)


def unpack_scales(sc):
    """(..., NG*8, L) sidecar -> (..., S, 1) row scales."""
    *lead, R, L = sc.shape
    ng = R // 8
    return sc.reshape(*lead, ng, 8, L)[..., 0, :].reshape(*lead, ng * L, 1)


def set_scales(sc, s_new, start):
    """Write scales for tokens [start, start+W) into the sidecar.

    sc:    (..., NG*8, L) sidecar
    s_new: (..., W, 1) scales from :func:`quantize_rows`
    start: scalar token position (per-slot positions: vmap over the
           leading batch axis, common.py does).
    """
    L = sc.shape[-1]
    W = s_new.shape[-2]
    tok = start + jnp.arange(W)
    rows = 8 * (tok // L)
    lanes = tok % L
    return sc.at[..., rows, lanes].set(s_new[..., 0])
