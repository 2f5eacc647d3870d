"""Per-row int8 KV-cache quantization (the XLA-side mirror).

The paged serving engine can store KV pages as int8 with one f32 scale
per (token row, kv head): `s = max|row| / 127`, `q = round(row / s)`.
Storage drops from 2 bytes/elem (bf16) to ~1.03 (int8 + scale/hd), so the
page pool holds ~2x the tokens and decode attention streams ~half the
bytes at long context. The reference framework has no KV quantization
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
