"""Slot-batched speculative serving: must reproduce plain greedy
continuous batching token-exactly (staggered joins, slot reuse, stops)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from squeezellm_tpu import serving
from squeezellm_tpu.models import common, llama
from squeezellm_tpu.quantize import pipeline


def _model(sliding_window=None):
    config = llama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        n_layers=2, n_heads=4, n_kv_heads=2, max_seq=96,
        sliding_window=sliding_window,
    )
    dense = llama.random_dense_params(config, jax.random.PRNGKey(0))
    specs, params = pipeline.quantize_model("llama", config, dense, bits=4)
    return config, specs, jax.tree.map(jnp.asarray, params)


def test_verify_window_matches_decode_steps():
    """verify_window == s sequential per-slot decode steps (logits at
    every window position, per-slot offsets)."""
    config, specs, params = _model()
    b, s = 2, 3
    cache = common.init_kv_cache(b, config.max_seq, config.n_layers,
                                 config.n_kv_heads, config.head_dim)
    # prefill two different-length prompts into the slots
    prompts = [[1, 2, 3, 4], [7, 9]]
    for i, p in enumerate(prompts):
        c1 = common.init_kv_cache(1, config.max_seq, config.n_layers,
                                  config.n_kv_heads, config.head_dim)
        _, c1 = llama.prefill(config, specs, params,
                              jnp.asarray([p], jnp.int32), c1, backend="xla")
        for li in range(config.n_layers):
            for kk in ("k", "v"):
                cache[li][kk] = cache[li][kk].at[i].set(c1[li][kk][0])
    pos = jnp.asarray([len(prompts[0]) - 1, len(prompts[1]) - 1], jnp.int32)
    window = jnp.asarray([[4, 11, 12], [9, 21, 22]], jnp.int32)

    wl, wcache = llama.verify_window(config, specs, params, window, pos,
                                     [dict(c) for c in cache], backend="xla")
    # reference: sequential decode steps with per-slot positions
    ref = []
    rcache = [dict(c) for c in cache]
    for t in range(s):
        lg, rcache = llama.decode_step(config, specs, params,
                                       window[:, t:t + 1], pos + t, rcache,
                                       backend="xla")
        ref.append(np.asarray(lg[:, 0]))
    ref = np.stack(ref, axis=1)  # (B, s, V)
    np.testing.assert_allclose(np.asarray(wl), ref, rtol=2e-4, atol=2e-4)
    for li in (0, 1):
        np.testing.assert_allclose(np.asarray(wcache[li]["k"]),
                                   np.asarray(rcache[li]["k"]),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("sliding_window", [None, 16])
def test_spec_serving_matches_plain(sliding_window):
    config, specs, params = _model(sliding_window)
    prompts = [[3, 4, 5, 6, 3, 4, 5, 6], [7, 9], [11, 13, 17, 19], [23]]
    plain = serving.ContinuousBatchEngine("llama", config, specs, params,
                                          slots=2, backend="xla")
    want = plain.run(prompts, max_new_tokens=7, window=4)

    spec = serving.ContinuousBatchEngine("llama", config, specs, params,
                                         slots=2, backend="xla",
                                         speculative=(4, 2))
    got = spec.run(prompts, max_new_tokens=7)
    assert sorted(got) == sorted(want)
    for rid in want:
        assert got[rid] == want[rid], f"request {rid}"


def test_spec_serving_stop_tokens():
    config, specs, params = _model()
    plain = serving.ContinuousBatchEngine("llama", config, specs, params,
                                          slots=1, backend="xla")
    full = plain.run([[1, 2, 3]], max_new_tokens=8, window=4)[0]
    stop = full[2]
    spec = serving.ContinuousBatchEngine("llama", config, specs, params,
                                         slots=1, backend="xla",
                                         speculative=(4, 2))
    got = spec.run([[1, 2, 3]], max_new_tokens=8, stop_tokens=(stop,))
    cut = full.index(stop) + 1
    assert got[0] == full[:cut]


def test_spec_serving_falls_back_for_sampling():
    """Sampled requests route through the normal window path (and match
    the non-speculative engine exactly, same seed)."""
    from squeezellm_tpu.sampling import SamplingParams

    config, specs, params = _model()
    sp = SamplingParams(temperature=0.8, top_k=16)
    a = serving.ContinuousBatchEngine("llama", config, specs, params,
                                      slots=2, backend="xla", seed=3)
    want = a.run([[1, 2], [5, 6]], max_new_tokens=6, window=4, sampling=sp)
    b = serving.ContinuousBatchEngine("llama", config, specs, params,
                                      slots=2, backend="xla", seed=3,
                                      speculative=(4, 2))
    got = b.run([[1, 2], [5, 6]], max_new_tokens=6, window=4, sampling=sp)
    assert got == want


def test_spec_serving_max_seq_guard():
    config, specs, params = _model()
    spec = serving.ContinuousBatchEngine("llama", config, specs, params,
                                         slots=1, backend="xla",
                                         speculative=(8, 2))
    with pytest.raises(ValueError):
        spec.add_request([1] * 60, 30)  # 60 + 30 + 9 > 96
