"""Flash prefill attention vs the XLA chain (interpret mode): causal,
GQA, continuation offset into a longer cache, sliding window."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from squeezellm_tpu.models import common
from squeezellm_tpu.ops import flash_attn


def _oracle(q, k, v, offset, sliding_window=None):
    B, H, Sq, hd = q.shape
    Hkv, Sk = k.shape[1], k.shape[2]
    kk = common.repeat_kv(jnp.asarray(k), H // Hkv)
    vv = common.repeat_kv(jnp.asarray(v), H // Hkv)
    mask = common.causal_mask(Sq, Sk, offset=offset,
                              sliding_window=sliding_window)
    return np.asarray(common.attention(jnp.asarray(q), kk, vv, mask))


@pytest.mark.parametrize("g,window", [(1, None), (2, None), (2, 24)])
def test_flash_matches_xla_window(g, window):
    rng = np.random.default_rng(0)
    B, Hkv, Sq, hd = 2, 2, 48, 32
    H = g * Hkv
    q = rng.normal(size=(B, H, Sq, hd)).astype(np.float32)
    k = rng.normal(size=(B, Hkv, Sq, hd)).astype(np.float32)
    v = rng.normal(size=(B, Hkv, Sq, hd)).astype(np.float32)
    out = flash_attn.flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(0, jnp.int32), sliding_window=window, interpret=True)
    want = _oracle(q, k, v, 0, sliding_window=window)
    np.testing.assert_allclose(np.asarray(out), want, rtol=3e-5, atol=3e-5)


def test_flash_continuation_offset():
    """q rows at [offset, offset+Sq) over a longer cache array whose rows
    beyond offset+Sq hold (finite) garbage — stale cache contents must
    not affect the result. (NaN poison would be too strict: a masked
    probability of exactly 0 times NaN is NaN in BOTH this kernel and
    the XLA chain; real caches only ever hold finite stale values.)"""
    rng = np.random.default_rng(1)
    B, Hkv, Sq, Sk, hd, off = 1, 2, 16, 64, 32, 24
    q = rng.normal(size=(B, Hkv, Sq, hd)).astype(np.float32)
    k = rng.normal(size=(B, Hkv, Sk, hd)).astype(np.float32)
    v = rng.normal(size=(B, Hkv, Sk, hd)).astype(np.float32)
    k[:, :, off + Sq:] = 1e30  # stale-garbage rows beyond the prefix
    v[:, :, off + Sq:] = -1e30
    out = flash_attn.flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(off, jnp.int32), interpret=True)
    kc, vc = k.copy(), v.copy()
    kc[:, :, off + Sq:] = 0.0
    vc[:, :, off + Sq:] = 0.0
    want = _oracle(q, kc, vc, off)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), want, rtol=3e-5, atol=3e-5)


def test_llama_forward_flash_matches_xla():
    """Model-level: pallas forward (flash prefill) == xla forward at an
    aligned sequence length."""
    from squeezellm_tpu.models import llama
    from squeezellm_tpu.quantize import pipeline

    config = llama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        n_layers=2, n_heads=4, n_kv_heads=2, max_seq=64,
    )
    dense = llama.random_dense_params(config, jax.random.PRNGKey(0))
    specs, params = pipeline.quantize_model("llama", config, dense, bits=4)
    jp = jax.tree.map(jnp.asarray, params)
    tokens = jnp.asarray(np.arange(32)[None] % 128, jnp.int32)
    lx = llama.forward(config, specs, jp, tokens, backend="xla")
    lp = llama.forward(config, specs, jp, tokens, backend="pallas")
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lx), rtol=2e-3,
                               atol=2e-4)


def test_llama_forward_flash_sliding_window():
    """Mistral-style sliding window through the model-level flash gate."""
    from squeezellm_tpu.models import llama
    from squeezellm_tpu.quantize import pipeline

    config = llama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        n_layers=2, n_heads=4, n_kv_heads=2, max_seq=64, sliding_window=16,
    )
    dense = llama.random_dense_params(config, jax.random.PRNGKey(1))
    specs, params = pipeline.quantize_model("llama", config, dense, bits=4)
    jp = jax.tree.map(jnp.asarray, params)
    tokens = jnp.asarray(np.arange(48)[None] % 128, jnp.int32)
    lx = llama.forward(config, specs, jp, tokens, backend="xla")
    lp = llama.forward(config, specs, jp, tokens, backend="pallas")
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lx), rtol=2e-3,
                               atol=2e-4)
