"""Fused dense-decode attention (ops/decode_attn.py) vs the XLA oracle:
cache write at per-slot positions, online softmax over valid prefix only,
GQA grouping, sliding window, inactive (length-0) slots."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from squeezellm_tpu.models import common
from squeezellm_tpu.ops import decode_attn


def _oracle(q, k_new, v_new, ck, cv, lengths, sliding_window=None):
    """update_kv_cache + decode_mask + attention, per-slot lengths.
    Caches are TOKEN-major (B, S, Hkv*hd); k_new/v_new (B, Hkv, hd)."""
    B, H, hd = q.shape
    Hkv = k_new.shape[1]
    S = ck.shape[1]
    pos = lengths - 1  # -1 for inactive slots
    cache = common.update_kv_cache(
        {"k": jnp.asarray(ck), "v": jnp.asarray(cv)},
        jnp.asarray(k_new)[:, None], jnp.asarray(v_new)[:, None],
        jnp.where(jnp.asarray(pos) < 0, 0, jnp.asarray(pos)))
    # undo the spurious write scatter for inactive slots (oracle-side only)
    for b in range(B):
        if lengths[b] == 0:
            cache["k"] = cache["k"].at[b].set(jnp.asarray(ck)[b])
            cache["v"] = cache["v"].at[b].set(jnp.asarray(cv)[b])
    k, v = common.read_kv(cache, jnp.float32, Hkv)  # head-major views
    k = common.repeat_kv(k, H // Hkv)
    v = common.repeat_kv(v, H // Hkv)
    mask = common.decode_mask(S, jnp.asarray(pos),
                              sliding_window=sliding_window)
    out = common.attention(jnp.asarray(q)[:, :, None, :].astype(jnp.float32),
                           k, v, mask)
    out = np.array(out)[:, :, 0, :]
    out[np.asarray(lengths) == 0] = 0.0
    return out, cache


@pytest.mark.parametrize("g,window", [(1, None), (2, None), (1, 24)])
@pytest.mark.smoke
def test_fused_dense_decode_attention_parity(g, window):
    rng = np.random.default_rng(0)
    B, Hkv, S, hd = 3, 2, 64, 32
    H = g * Hkv
    q = rng.normal(size=(B, H, hd)).astype(np.float32)
    k_new = rng.normal(size=(B, Hkv, hd)).astype(np.float32)
    v_new = rng.normal(size=(B, Hkv, hd)).astype(np.float32)
    ck = rng.normal(size=(B, S, Hkv * hd)).astype(np.float32)
    cv = rng.normal(size=(B, S, Hkv * hd)).astype(np.float32)
    # slot 0 mid-sequence, slot 1 at position 0, slot 2 inactive
    lengths = np.array([37, 1, 0], np.int32)

    out, ck2, cv2 = decode_attn.dense_decode_attention(
        jnp.asarray(q), jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(ck), jnp.asarray(cv), jnp.asarray(lengths),
        sliding_window=window, interpret=True)
    want, wcache = _oracle(q, k_new, v_new, ck, cv, lengths,
                           sliding_window=window)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ck2), np.asarray(wcache["k"]),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(cv2), np.asarray(wcache["v"]),
                               rtol=0, atol=0)


@pytest.mark.parametrize("theta,lengths", [(10000.0, [37, 1, 0]),
                                           (1e6, [64, 9, 3])])
def test_fused_dense_decode_rope_parity(theta, lengths):
    """rope operands: kernel rotates PRE-rope q/k_new by the cos/sin rows
    at lengths-1; must match apply_rope (models/common.py HF rotate-half
    convention) + attention."""
    rng = np.random.default_rng(2)
    B, Hkv, S, hd, g = 3, 2, 64, 32, 2
    H = g * Hkv
    q = rng.normal(size=(B, H, hd)).astype(np.float32)
    k_new = rng.normal(size=(B, Hkv, hd)).astype(np.float32)
    v_new = rng.normal(size=(B, Hkv, hd)).astype(np.float32)
    ck = rng.normal(size=(B, S, Hkv * hd)).astype(np.float32)
    cv = rng.normal(size=(B, S, Hkv * hd)).astype(np.float32)
    lengths = np.asarray(lengths, np.int32)

    pos = np.maximum(lengths - 1, 0)
    cos, sin = common.rope_cos_sin(jnp.asarray(pos), hd, theta)
    out, ck2, cv2 = decode_attn.dense_decode_attention(
        jnp.asarray(q), jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(ck), jnp.asarray(cv), jnp.asarray(lengths),
        rope_cos=cos, rope_sin=sin, interpret=True)

    # oracle: rope each slot's q/k at its own position, then the XLA chain
    qr = common.apply_rope(jnp.asarray(q)[:, :, None, :],
                           cos[:, None, :], sin[:, None, :])[:, :, 0, :]
    kr = common.apply_rope(jnp.asarray(k_new)[:, :, None, :],
                           cos[:, None, :], sin[:, None, :])[:, :, 0, :]
    want, wcache = _oracle(np.asarray(qr), np.asarray(kr), v_new, ck, cv,
                           lengths)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ck2), np.asarray(wcache["k"]),
                               rtol=1e-5, atol=1e-5)


def test_fused_dense_decode_full_cache():
    """Length == S (last row write, no OOB chunk reads) and bf16 cache."""
    rng = np.random.default_rng(1)
    B, Hkv, S, hd = 2, 2, 32, 32
    q = rng.normal(size=(B, Hkv, hd)).astype(np.float32)
    k_new = rng.normal(size=(B, Hkv, hd)).astype(np.float32)
    v_new = rng.normal(size=(B, Hkv, hd)).astype(np.float32)
    ck = rng.normal(size=(B, S, Hkv * hd)).astype(np.float32)
    cv = rng.normal(size=(B, S, Hkv * hd)).astype(np.float32)
    lengths = np.array([S, S - 5], np.int32)
    out, ck2, cv2 = decode_attn.dense_decode_attention(
        jnp.asarray(q), jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(ck, jnp.bfloat16), jnp.asarray(cv, jnp.bfloat16),
        jnp.asarray(lengths), interpret=True)
    want, _ = _oracle(q, k_new, v_new,
                      np.asarray(jnp.asarray(ck, jnp.bfloat16)),
                      np.asarray(jnp.asarray(cv, jnp.bfloat16)),
                      lengths)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-2, atol=2e-2)
    assert ck2.dtype == jnp.bfloat16


@pytest.mark.smoke
def test_llama_decode_step_pallas_uses_fused_attention():
    """Model-level: pallas decode (fused attention) == xla decode."""
    from squeezellm_tpu.models import llama
    from squeezellm_tpu.quantize import pipeline

    config = llama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        n_layers=2, n_heads=4, n_kv_heads=2, max_seq=32,
    )
    dense = llama.random_dense_params(config, jax.random.PRNGKey(0))
    specs, params = pipeline.quantize_model("llama", config, dense, bits=4)
    jp = jax.tree.map(jnp.asarray, params)
    tokens = jnp.asarray([[5, 7, 11]], jnp.int32)
    cache = common.init_kv_cache(1, config.max_seq, config.n_layers,
                                 config.n_kv_heads, config.head_dim)
    _, cache = llama.prefill(config, specs, jp, tokens, cache, backend="xla")
    cache2 = jax.tree.map(jnp.copy, cache)
    tok = jnp.asarray([[3]], jnp.int32)
    pos = jnp.asarray(3, jnp.int32)
    l1, c1 = llama.decode_step(config, specs, jp, tok, pos, cache,
                               backend="xla")
    l2, c2 = llama.decode_step(config, specs, jp, tok, pos, cache2,
                               backend="pallas")
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), rtol=2e-3,
                               atol=2e-4)
    for a, b in zip(c1, c2):
        np.testing.assert_allclose(np.asarray(b["k"]), np.asarray(a["k"]),
                                   rtol=1e-5, atol=1e-5)


def test_opt_decode_step_pallas_uses_fused_attention():
    from squeezellm_tpu.models import opt
    from squeezellm_tpu.quantize import pipeline

    config = opt.OPTConfig(
        vocab_size=96, hidden_size=64, ffn_dim=128, n_layers=1, n_heads=4,
        max_seq=32,
    )
    dense = opt.random_dense_params(config, jax.random.PRNGKey(0))
    specs, params = pipeline.quantize_model("opt", config, dense, bits=4)
    jp = jax.tree.map(jnp.asarray, params)
    tokens = jnp.asarray([[5, 7, 11]], jnp.int32)
    cache = common.init_kv_cache(1, config.max_seq, config.n_layers,
                                 config.n_heads, config.head_dim)
    _, cache = opt.prefill(config, specs, jp, tokens, cache, backend="xla")
    cache2 = jax.tree.map(jnp.copy, cache)
    tok = jnp.asarray([[3]], jnp.int32)
    pos = jnp.asarray(3, jnp.int32)
    l1, _ = opt.decode_step(config, specs, jp, tok, pos, cache,
                            backend="xla")
    l2, _ = opt.decode_step(config, specs, jp, tok, pos, cache2,
                            backend="pallas")
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), rtol=2e-3,
                               atol=2e-4)
