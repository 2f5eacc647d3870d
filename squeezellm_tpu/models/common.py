"""Shared functional building blocks: linears (dense or LUT-quantized),
norms, RoPE, attention with a preallocated KV cache.

Everything is a pure function of (static spec, params pytree, inputs) — the
TPU-idiomatic replacement for the reference's nn.Module mutation
(make_quant_lut's setattr dance, reference squeezellm/quant.py:386-435).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from squeezellm_tpu.ops.quant_linear import QuantLinearSpec, quant_linear_apply


@dataclasses.dataclass(frozen=True)
class LinearSpec:
    """Static description of one linear: dense fp or LUT-quantized."""

    in_features: int
    out_features: int
    has_bias: bool = False
    quant: Optional[QuantLinearSpec] = None  # None => dense weights

    @property
    def is_quant(self) -> bool:
        return self.quant is not None


def apply_linear(spec: LinearSpec, params, x, *, backend: str = "auto",
                 y0=None):
    """y = y0 + x @ W^T (+ b). Dense params: {'w': (out, in), 'b'?};
    quantized: the quant_linear params dict. y0 (optional) is a residual
    the quantized Pallas decode path folds into the kernel's output-block
    init (ops/pallas_ops.lut_matmul) — other paths add it as an op."""
    if spec.is_quant:
        return quant_linear_apply(spec.quant, params, x, backend=backend,
                                  y0=y0)
    # contract on w's second axis directly — `w.T` tempts XLA to materialize
    # a transposed copy of every weight (2x HBM on a dense 7B model)
    y = jnp.einsum(
        "...i,oi->...o", x, params["w"].astype(x.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if y0 is not None:
        y = y + y0.astype(x.dtype)
    if spec.has_bias:
        y = y + params["b"].astype(x.dtype)
    return y


def rms_norm(x, weight, eps: float):
    dt = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(dt) * weight.astype(dt)


def layer_norm(x, weight, bias, eps: float):
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dt)


# ---------------------------------------------------------------------------
# RoPE (HF LLaMA convention: rotate_half over contiguous halves)
# ---------------------------------------------------------------------------


def rope_cos_sin(positions, head_dim: int, theta: float, dtype=jnp.float32):
    """positions: int array (...,). Returns cos/sin of shape (..., head_dim)."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # (..., hd/2)
    emb = jnp.concatenate([angles, angles], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def apply_rope(x, cos, sin):
    """x: (B, H, S, D) head-major; cos/sin: (B, S, D) or (S, D)."""
    if cos.ndim == x.ndim - 2:
        cos = cos[None]
        sin = sin[None]
    cos = cos[:, None, :, :]
    sin = sin[:, None, :, :]
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos + rotated * sin


def apply_rope_tm(x, cos, sin):
    """x: (B, S, H, D) TOKEN-major (the projection-natural layout);
    cos/sin: (B, S, D) or (S, D). Same rotate-half math as
    :func:`apply_rope`."""
    if cos.ndim == x.ndim - 2:
        cos = cos[None]
        sin = sin[None]
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos + rotated * sin


# ---------------------------------------------------------------------------
# Attention with preallocated KV cache
# ---------------------------------------------------------------------------


def init_kv_cache(batch: int, max_seq: int, n_layers: int, n_kv_heads: int,
                  head_dim: int, dtype=jnp.float32):
    """Per-layer list of {'k','v'} of shape (B, max_seq, H_kv * D).

    TOKEN-MAJOR layout (round 4): a token's row is contiguous across
    heads, which is (a) the projection-natural layout — k_proj emits
    (B, S, H_kv*D) directly, so prefill writes need no transpose — and
    (b) what makes the fused decode attention kernel
    (ops/decode_attn.py) one-DMA-per-chunk instead of one per head
    (measured 8x on v5e). The XLA attention chain reads it back
    head-major via :func:`read_kv` (a transpose XLA fuses into the
    attention einsums).

    dtype "int8" (or jnp.int8): quantized dense cache — int8 codes plus
    HEAD-MAJOR f32 scale sidecars 'ks'/'vs' of shape (B, Hkv8, max_seq)
    (kv-head rows padded to the 8-sublane f32 tile, token axis on lanes
    — the layout the fused q8 kernel DMAs; ops/decode_attn.py).
    Attention bytes ~halve vs bf16 at the same context; writes quantize
    at insert (update_kv_cache / the fused q8 decode kernel)."""
    if dtype == "int8" or dtype == jnp.int8:
        from squeezellm_tpu.ops import decode_attn

        side = (batch,) + decode_attn.q8_sidecar_shape(n_kv_heads, max_seq)
        return [
            {
                "k": jnp.zeros((batch, max_seq, n_kv_heads * head_dim),
                               jnp.int8),
                "v": jnp.zeros((batch, max_seq, n_kv_heads * head_dim),
                               jnp.int8),
                "ks": jnp.zeros(side, jnp.float32),
                "vs": jnp.zeros(side, jnp.float32),
            }
            for _ in range(n_layers)
        ]
    return [
        {
            "k": jnp.zeros((batch, max_seq, n_kv_heads * head_dim), dtype),
            "v": jnp.zeros((batch, max_seq, n_kv_heads * head_dim), dtype),
        }
        for _ in range(n_layers)
    ]


def read_kv(cache, dtype, n_kv_heads: int):
    """Dequantized HEAD-MAJOR (k, v) views (B, H_kv, S, D) of a
    token-major dense cache — cast + transpose for f32/bf16 caches,
    codes * row-scale for int8 ones (the XLA mirror of the fused q8
    kernel's in-VMEM dequant). The transpose is consumed by attention
    einsums and fuses away under XLA."""
    B, S, KV = cache["k"].shape
    hd = KV // n_kv_heads

    def hm(a):  # (B, S, KV) -> (B, Hkv, S, hd)
        return a.reshape(B, S, n_kv_heads, hd).transpose(0, 2, 1, 3)

    if "ks" in cache:
        ks = cache["ks"][:, :n_kv_heads, :, None]  # (B, Hkv, S, 1)
        vs = cache["vs"][:, :n_kv_heads, :, None]
        return ((hm(cache["k"]).astype(jnp.float32) * ks).astype(dtype),
                (hm(cache["v"]).astype(jnp.float32) * vs).astype(dtype))
    return hm(cache["k"]).astype(dtype), hm(cache["v"]).astype(dtype)


def repeat_kv(x, n_rep: int):
    """x: (B, H, S, D) -> (B, H*n_rep, S, D)."""
    if n_rep == 1:
        return x
    b, h, s, d = x.shape
    return jnp.broadcast_to(x[:, :, None, :, :], (b, h, n_rep, s, d)).reshape(
        b, h * n_rep, s, d
    )


def attention(q, k, v, mask):
    """q: (B, H, Sq, D); k/v: (B, H, Sk, D); mask: broadcastable to
    (B, H, Sq, Sk) boolean (True = attend). Softmax in f32."""
    dt = q.dtype
    scale = 1.0 / jnp.sqrt(jnp.array(q.shape[-1], jnp.float32))
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dt)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                      preferred_element_type=jnp.float32).astype(dt)


def causal_mask(sq: int, sk: int, offset: int = 0, sliding_window: Optional[int] = None):
    """(1, 1, sq, sk) boolean causal mask; query i sits at position offset+i."""
    qpos = offset + jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 0)
    kpos = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 1)
    m = kpos <= qpos
    if sliding_window is not None:
        m = jnp.logical_and(m, kpos > qpos - sliding_window)
    return m[None, None]


def decode_mask(max_seq: int, pos, sliding_window: Optional[int] = None):
    """Mask for single-token queries at dynamic position(s) pos.

    pos scalar -> (1, 1, 1, max_seq); pos (B,) (continuous batching: each
    slot at its own position) -> (B, 1, 1, max_seq)."""
    pos = jnp.asarray(pos)
    kpos = jax.lax.broadcasted_iota(jnp.int32, (1, max_seq), 1)
    p = pos.reshape(-1, 1) if pos.ndim else pos
    m = kpos <= p
    if sliding_window is not None:
        m = jnp.logical_and(m, kpos > p - sliding_window)
    return m[:, None, None, :] if pos.ndim else m[None, None]


def window_mask(sq: int, max_seq: int, pos,
                sliding_window: Optional[int] = None):
    """Mask for an sq-token query window starting at per-slot positions.

    pos: (B,) — slot b's window rows sit at positions pos_b .. pos_b+sq-1,
    each attending cache columns <= its own position. The batched
    generalization of decode_mask (speculative verification windows).
    Returns (B, 1, sq, max_seq)."""
    pos = jnp.asarray(pos)
    kpos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, max_seq), 3)
    qpos = pos.reshape(-1, 1, 1, 1) + jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, sq, 1), 2)
    m = kpos <= qpos
    if sliding_window is not None:
        m = jnp.logical_and(m, kpos > qpos - sliding_window)
    return m


def _q8_scale_rows(s_new, hkv8: int):
    """(B, s, Hkv, 1) row scales -> (B, Hkv8, s) sidecar rows (kv-head
    rows padded to the 8-sublane tile)."""
    rows = jnp.swapaxes(s_new[..., 0], 1, 2)  # (B, Hkv, s)
    pad = hkv8 - rows.shape[1]
    if pad:
        rows = jnp.pad(rows, ((0, 0), (0, pad), (0, 0)))
    return rows


def update_kv_window(cache, k_new, v_new, pos):
    """Write an s-token window's k/v (B, s, H_kv, D), TOKEN-MAJOR, at
    per-slot positions pos (B,): slot b's rows land at [pos_b, pos_b+s).

    int8 caches ('ks' sidecar present) quantize each row at insert via
    the ops/kv_quant.py math."""
    B, s, Hkv, hd = k_new.shape

    def one(cb, nb, pb):  # cb (S, KV), nb (s, KV)
        return jax.lax.dynamic_update_slice_in_dim(
            cb, nb.astype(cb.dtype), pb, axis=0)

    if "ks" in cache:
        from squeezellm_tpu.ops import kv_quant

        kq, ks = kv_quant.quantize_rows(k_new)
        vq, vs = kv_quant.quantize_rows(v_new)
        hkv8 = cache["ks"].shape[1]

        def one_sc(sc, rows, pb):  # sc (Hkv8, S), rows (Hkv8, s)
            return jax.lax.dynamic_update_slice(sc, rows, (0, pb))

        return {
            "k": jax.vmap(one)(cache["k"], kq.reshape(B, s, -1), pos),
            "v": jax.vmap(one)(cache["v"], vq.reshape(B, s, -1), pos),
            "ks": jax.vmap(one_sc)(cache["ks"], _q8_scale_rows(ks, hkv8),
                                   pos),
            "vs": jax.vmap(one_sc)(cache["vs"], _q8_scale_rows(vs, hkv8),
                                   pos),
        }
    return {
        "k": jax.vmap(one)(cache["k"], k_new.reshape(B, s, -1), pos),
        "v": jax.vmap(one)(cache["v"], v_new.reshape(B, s, -1), pos),
    }


def update_kv_cache(cache, k_new, v_new, pos):
    """Write one new token's k/v (B, 1, H_kv, D), TOKEN-MAJOR, at
    position(s) pos.

    pos scalar: one dynamic_update_slice (decode batch shares a position).
    pos (B,): per-slot positions via a deterministic scatter (continuous
    batching). int8 caches quantize each row at insert (ops/kv_quant.py)."""
    pos = jnp.asarray(pos)
    B = k_new.shape[0]
    if "ks" in cache:
        from squeezellm_tpu.ops import kv_quant

        kq, ks = kv_quant.quantize_rows(k_new)
        vq, vs = kv_quant.quantize_rows(v_new)
        hkv8 = cache["ks"].shape[1]
        parts = {"k": kq.reshape(B, 1, -1), "v": vq.reshape(B, 1, -1)}
        scales = {"ks": _q8_scale_rows(ks, hkv8),
                  "vs": _q8_scale_rows(vs, hkv8)}  # (B, Hkv8, 1)
    else:
        parts = {"k": k_new.reshape(B, 1, -1), "v": v_new.reshape(B, 1, -1)}
        scales = {}
    out = {}
    if pos.ndim == 0:
        for name, new in parts.items():
            out[name] = jax.lax.dynamic_update_slice(
                cache[name], new.astype(cache[name].dtype), (0, pos, 0))
        for name, new in scales.items():
            out[name] = jax.lax.dynamic_update_slice(
                cache[name], new, (0, 0, pos))
    else:
        idx = jnp.arange(B)
        for name, new in parts.items():
            out[name] = cache[name].at[idx, pos, :].set(
                new[:, 0, :].astype(cache[name].dtype))
        for name, new in scales.items():
            out[name] = cache[name].at[idx, :, pos].set(new[:, :, 0])
    return out
