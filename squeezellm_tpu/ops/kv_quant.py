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
# hardware). Scales are therefore stored HEAD-major: kv-head rows on
# SUBLANES (padded to the 8-row f32 tile, or to the per-TP-shard padded
# row count), token positions on LANES. One DMA then moves a whole
# page's/chunk's scales for every head: (HkvP, ps) per page for the
# paged pools, (Hkv8, S) for the dense int8 cache (ops/decode_attn.py).
# In-kernel the rows are consumed POST-matmul as g-row-repeated (H, ps)
# tiles — logits scale by the k rows, p by the v rows — so no
# lane<->sublane relayout exists anywhere.
# ---------------------------------------------------------------------------


def head_rows(n_kv_heads: int, shards: int = 1) -> int:
    """Scale-sidecar row count: kv heads padded so every TP shard's slice
    is a whole number of 8-row f32 tiles."""
    per = -(-n_kv_heads // shards)
    return shards * (-(-per // 8) * 8)


def pool_pack_scales(s, rows: int = 0):
    """(..., Hkv, ps, 1) row scales (from :func:`quantize_rows` on
    (..., Hkv, ps, hd)) -> (..., HkvP, ps) head-major sidecar."""
    *lead, hkv, ps, one = s.shape
    assert one == 1, s.shape
    rows = rows or head_rows(hkv)
    pad = [(0, 0)] * len(lead) + [(0, rows - hkv), (0, 0)]
    return jnp.pad(s[..., 0], pad)


def pool_unpack_scales(sc, n_kv_heads: int):
    """(..., HkvP, ps) sidecar -> (..., Hkv, ps, 1) row scales."""
    return sc[..., :n_kv_heads, :, None]
