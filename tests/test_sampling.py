"""On-device sampling, stop tokens, and streaming in the serving engines."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from squeezellm_tpu import sampling, serving
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


def _call(logits, temp, top_k=0, top_p=1.0, rid=0, pos=0, seed=0):
    b = logits.shape[0]
    return np.asarray(sampling.sample_tokens(
        jnp.asarray(logits),
        jnp.full((b,), temp, jnp.float32),
        jnp.full((b,), top_k, jnp.int32),
        jnp.full((b,), top_p, jnp.float32),
        jnp.full((b,), rid, jnp.int32),
        jnp.full((b,), pos, jnp.int32),
        seed,
    ))


def test_greedy_and_degenerate_sampling_match_argmax():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, 100)).astype(np.float32)
    am = logits.argmax(axis=-1)
    np.testing.assert_array_equal(_call(logits, 0.0), am)          # greedy
    np.testing.assert_array_equal(_call(logits, 0.8, top_k=1), am)  # k=1
    np.testing.assert_array_equal(_call(logits, 0.8, top_p=1e-6), am)


def test_sampling_respects_topk_support():
    """Sampled ids always come from the k largest logits."""
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(8, 100)).astype(np.float32)
    top4 = np.argsort(-logits, axis=-1)[:, :4]
    for pos in range(20):
        toks = _call(logits, 5.0, top_k=4, pos=pos)  # hot: spread mass
        for b in range(8):
            assert toks[b] in top4[b]


def test_sampling_deterministic_in_stream_identity():
    """Draws depend on (seed, rid, pos) only — not on batch composition."""
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(1, 100)).astype(np.float32)
    a = _call(logits, 1.0, rid=7, pos=3)
    b = _call(np.repeat(logits, 4, 0), 1.0, rid=7, pos=3)
    assert (b == a[0]).all()
    # and varies across positions (not a constant stream)
    draws = {int(_call(logits, 2.0, rid=7, pos=p)[0]) for p in range(32)}
    assert len(draws) > 1


def test_sampling_params_validation():
    with pytest.raises(ValueError):
        sampling.SamplingParams(top_k=sampling.MAX_TOPK + 1)
    with pytest.raises(ValueError):
        sampling.SamplingParams(top_p=0.0)


@pytest.mark.parametrize("window", [1, 4])
def test_engine_sampled_run_window_invariant(window):
    """A sampled request's tokens depend on (seed, rid, pos) — identical
    under window=1 and windowed decoding, greedy/sampled slots mixed."""
    config, specs, params = _small_model()
    outs = []
    for w in (1, window):
        cb = serving.ContinuousBatchEngine("llama", config, specs, params,
                                           slots=2, backend="xla", seed=11)
        res = cb.run([[1, 2, 3], [7, 9]], max_new_tokens=6, window=w,
                     sampling=sampling.SamplingParams(temperature=0.9,
                                                      top_k=16, top_p=0.95))
        outs.append(res)
    assert outs[0] == outs[1]
    # all tokens in-vocab
    for toks in outs[0].values():
        assert all(0 <= t < config.vocab_size for t in toks)


def test_engine_stop_tokens_truncate():
    config, specs, params = _small_model()
    cb = serving.ContinuousBatchEngine("llama", config, specs, params,
                                       slots=1, backend="xla")
    ref = cb.run([[1, 2, 3]], max_new_tokens=8, window=4)
    full = ref[0]
    stop = full[2]  # third generated token
    cb2 = serving.ContinuousBatchEngine("llama", config, specs, params,
                                        slots=1, backend="xla")
    res = cb2.run([[1, 2, 3]], max_new_tokens=8, window=4,
                  stop_tokens=(stop,))
    # truncated at (and including) the FIRST occurrence of the stop token
    cut = full.index(stop) + 1
    assert res[0] == full[:cut]


def test_engine_streaming_callback():
    config, specs, params = _small_model()
    cb = serving.ContinuousBatchEngine("llama", config, specs, params,
                                       slots=2, backend="xla")
    streamed = {}
    res = cb.run([[1, 2, 3], [7, 9]], max_new_tokens=5, window=4,
                 on_token=lambda rid, new, done:
                 streamed.setdefault(rid, []).extend(new))
    assert streamed == res


def test_cancel_frees_slots_and_pages():
    config, specs, params = _small_model()
    cb = serving.ContinuousBatchEngine("llama", config, specs, params,
                                       slots=2, backend="xla")
    r0 = cb.add_request([1, 2, 3], 8)
    r1 = cb.add_request([4, 5], 8)
    assert cb.free_slots() == 0
    assert cb.cancel(r0)
    assert not cb.cancel(r0)  # already gone
    assert cb.free_slots() == 1
    cb.step()  # surviving request still decodes
    assert any(s.active and s.request_id == r1 for s in cb._slots)

    pe = serving.PagedContinuousBatchEngine(
        "llama", config, specs, params, slots=2, n_pages=24, page_size=8,
        backend="xla", cache_dtype=jnp.float32)
    free0 = len(pe.pool._free)
    rid = pe.add_request([1, 2, 3, 4, 5, 6, 7, 8, 9], 8)
    assert len(pe.pool._free) < free0
    assert pe.cancel(rid)
    # non-registered pages return to the free list; registered prefix
    # pages stay cached (refcount 0) for reuse
    registered = set(pe.pool._registry.values())
    assert len(pe.pool._free) == free0 - len(registered)


@pytest.mark.medium
def test_paged_engine_sampled_and_stop():
    config, specs, params = _small_model()
    kw = dict(slots=2, n_pages=24, page_size=8, backend="xla",
              cache_dtype=jnp.float32, seed=3)
    outs = []
    for w in (1, 4):
        pe = serving.PagedContinuousBatchEngine("llama", config, specs,
                                                params, **kw)
        outs.append(pe.run([[1, 2, 3], [7, 9]], max_new_tokens=6, window=w,
                           sampling=sampling.SamplingParams(temperature=0.8,
                                                            top_k=8)))
    assert outs[0] == outs[1]
    # stop token truncates in the paged engine too
    pe = serving.PagedContinuousBatchEngine("llama", config, specs, params,
                                            **kw)
    full = pe.run([[1, 2, 3]], max_new_tokens=8, window=4)
    first_rid = sorted(full)[0]
    stop = full[first_rid][1]
    pe2 = serving.PagedContinuousBatchEngine("llama", config, specs, params,
                                             **kw)
    res = pe2.run([[1, 2, 3]], max_new_tokens=8, window=4,
                  stop_tokens=(stop,))
    cut = full[first_rid].index(stop) + 1
    assert res[sorted(res)[0]] == full[first_rid][:cut]
