"""Continuous batching: pooled slots must reproduce independent greedy
generation exactly (quantized model, staggered joins, slot reuse)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from squeezellm_tpu import engine as engine_mod
from squeezellm_tpu import serving
from squeezellm_tpu.models import llama
from squeezellm_tpu.quantize import pipeline


def _small_model():
    config = llama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        n_layers=2, n_heads=4, n_kv_heads=2, max_seq=64,
    )
    dense = llama.random_dense_params(config, jax.random.PRNGKey(0))
    specs, params = pipeline.quantize_model("llama", config, dense, bits=4)
    return config, specs, jax.tree.map(jnp.asarray, params)


@pytest.mark.medium
def test_continuous_batching_matches_single_stream():
    config, specs, params = _small_model()
    eng = engine_mod.Engine("llama", config, specs, params, backend="xla")
    prompts = [[1, 2, 3], [7, 9], [11, 13, 17, 19], [23]]
    max_new = 6
    expected = {
        i: eng.generate(np.asarray(p, np.int32)[None], max_new)[0, len(p):]
        for i, p in enumerate(prompts)
    }

    # 2 slots for 4 requests: forces staggered joins and slot reuse
    cb = serving.ContinuousBatchEngine("llama", config, specs, params,
                                       slots=2, backend="xla")
    results = cb.run(prompts, max_new_tokens=max_new)
    assert sorted(results) == [0, 1, 2, 3]
    for rid, toks in results.items():
        np.testing.assert_array_equal(
            np.asarray(toks), np.asarray(expected[rid]),
            err_msg=f"request {rid}",
        )


def test_per_slot_positions_decode_step():
    """Vector-pos decode step == two scalar-pos steps on separate caches."""
    from squeezellm_tpu.models import common

    config, specs, params = _small_model()
    cache2 = common.init_kv_cache(2, config.max_seq, config.n_layers,
                                  config.n_kv_heads, config.head_dim)
    # prefill two different prompts into the two slots via batch-1 prefills
    p0 = jnp.asarray([[1, 2, 3]], jnp.int32)
    p1 = jnp.asarray([[7, 9]], jnp.int32)
    ref_toks = []
    ones = []
    for p in (p0, p1):
        c1 = common.init_kv_cache(1, config.max_seq, config.n_layers,
                                  config.n_kv_heads, config.head_dim)
        lg, c1 = llama.prefill(config, specs, params, p, c1, backend="xla")
        ones.append(c1)
        ref_toks.append(int(jnp.argmax(lg[0, -1])))
    for li in range(config.n_layers):
        for key in ("k", "v"):
            cache2[li][key] = jnp.concatenate(
                [ones[0][li][key], ones[1][li][key]], axis=0
            )
    tok = jnp.asarray([[ref_toks[0]], [ref_toks[1]]], jnp.int32)
    pos = jnp.asarray([3, 2], jnp.int32)
    logits, _ = llama.decode_step(config, specs, params, tok, pos, cache2,
                                  backend="xla")
    # scalar-pos singles
    for b, (p, c1) in enumerate(zip((p0, p1), ones)):
        lg1, _ = llama.decode_step(
            config, specs, params, tok[b : b + 1],
            jnp.asarray(p.shape[1], jnp.int32), c1, backend="xla",
        )
        np.testing.assert_allclose(np.asarray(logits[b]), np.asarray(lg1[0]),
                                   rtol=1e-4, atol=1e-5)


def test_windowed_run_matches_per_token_run():
    """window>1 (multi-token lax.scan per host sync) must emit exactly the
    same tokens as per-token stepping, incl. odd max_new budgets."""
    config, specs, params = _small_model()
    prompts = [[1, 2, 3], [7, 9], [11, 13, 17, 19]]
    cb1 = serving.ContinuousBatchEngine("llama", config, specs, params,
                                        slots=2, backend="xla")
    r1 = cb1.run(list(prompts), max_new_tokens=5, window=1)
    cb8 = serving.ContinuousBatchEngine("llama", config, specs, params,
                                        slots=2, backend="xla")
    r8 = cb8.run(list(prompts), max_new_tokens=5, window=8)
    assert sorted(r1) == sorted(r8)
    for rid in r1:
        np.testing.assert_array_equal(np.asarray(r1[rid]),
                                      np.asarray(r8[rid]))
        assert len(r8[rid]) == 5


def test_chained_window_matches_scan_window(monkeypatch):
    """SQUEEZELLM_DENSE_WINDOW=chained (per-step dispatches, donation
    chaining) must emit token-identical results to the scan window."""
    config, specs, params = _small_model()
    prompts = [[1, 2, 3], [7, 9], [11, 13, 17, 19], [23]]
    want = serving.ContinuousBatchEngine(
        "llama", config, specs, params, slots=2, backend="xla",
    ).run(prompts, max_new_tokens=9, window=4)
    monkeypatch.setenv("SQUEEZELLM_DENSE_WINDOW", "chained")
    got = serving.ContinuousBatchEngine(
        "llama", config, specs, params, slots=2, backend="xla",
    ).run(prompts, max_new_tokens=9, window=4)
    assert sorted(got) == sorted(want)
    for rid in want:
        np.testing.assert_array_equal(np.asarray(got[rid]),
                                      np.asarray(want[rid]))
