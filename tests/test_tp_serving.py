"""Tensor-parallel continuous batching (8-virtual-device CPU mesh):
must reproduce the single-device engine token-exactly — staggered joins,
windows, per-request sampling, stop tokens."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from squeezellm_tpu import serving
from squeezellm_tpu.models import llama
from squeezellm_tpu.quantize import pipeline
from squeezellm_tpu.sampling import SamplingParams


def _model(tp=4):
    config = llama.LlamaConfig(
        vocab_size=64 * tp, hidden_size=16 * tp, intermediate_size=32 * tp,
        n_layers=2, n_heads=tp, n_kv_heads=tp, max_seq=64,
    )
    dense = llama.random_dense_params(config, jax.random.PRNGKey(0))
    specs, params = pipeline.quantize_model("llama", config, dense, bits=4)
    return config, specs, params


def test_tp_serving_matches_single_device():
    config, specs, params = _model()
    prompts = [[1, 2, 3], [7, 9], [11, 13, 17, 19], [23]]
    jp = jax.tree.map(jnp.asarray, params)
    want = serving.ContinuousBatchEngine(
        "llama", config, specs, jp, slots=2, backend="xla",
    ).run(prompts, max_new_tokens=9, window=4)
    got = serving.TPContinuousBatchEngine(
        "llama", config, specs, params, tp=4, slots=2, backend="xla",
    ).run(prompts, max_new_tokens=9, window=4)
    assert sorted(got) == sorted(want)
    for rid in want:
        np.testing.assert_array_equal(np.asarray(got[rid]),
                                      np.asarray(want[rid]),
                                      err_msg=f"request {rid}")


def test_tp_serving_sampling_and_stop():
    config, specs, params = _model()
    jp = jax.tree.map(jnp.asarray, params)
    sp = SamplingParams(temperature=0.8, top_k=20)
    prompts = [[1, 2, 3], [5, 6]]
    want = serving.ContinuousBatchEngine(
        "llama", config, specs, jp, slots=2, backend="xla", seed=11,
    ).run(prompts, max_new_tokens=6, window=4, sampling=sp)
    got = serving.TPContinuousBatchEngine(
        "llama", config, specs, params, tp=4, slots=2, backend="xla",
        seed=11,
    ).run(prompts, max_new_tokens=6, window=4, sampling=sp)
    for rid in want:
        np.testing.assert_array_equal(np.asarray(got[rid]),
                                      np.asarray(want[rid]),
                                      err_msg=f"request {rid}")

    stop = int(want[0][0])
    res = serving.TPContinuousBatchEngine(
        "llama", config, specs, params, tp=4, slots=2, backend="xla",
        seed=11,
    ).run(prompts, max_new_tokens=6, window=4, sampling=sp,
          stop_tokens=[stop])
    assert res[0][-1] == stop


def test_tp_speculative_matches_plain():
    """TP + slot-batched speculation: token-exact vs the plain TP engine."""
    config, specs, params = _model()
    rng = np.random.default_rng(4)
    phrase = rng.integers(0, config.vocab_size, 5).tolist()
    prompts = [phrase * 5, rng.integers(0, config.vocab_size, 8).tolist()]
    want = serving.TPContinuousBatchEngine(
        "llama", config, specs, params, tp=4, slots=2, backend="xla",
    ).run(prompts, max_new_tokens=10, window=4)
    got = serving.TPContinuousBatchEngine(
        "llama", config, specs, params, tp=4, slots=2, backend="xla",
        speculative=(4, 2),
    ).run(prompts, max_new_tokens=10)
    for rid in want:
        np.testing.assert_array_equal(np.asarray(got[rid]),
                                      np.asarray(want[rid]),
                                      err_msg=f"request {rid}")


@pytest.mark.medium
def test_tp_paged_matches_single_device_paged():
    """TP paged engine (pools sharded over kv heads): token-exact vs the
    single-device paged engine — prefix sharing + staggered joins."""
    config, specs, params = _model()
    rng = np.random.default_rng(5)
    shared = rng.integers(0, config.vocab_size, 16).tolist()  # 1 full page
    prompts = [shared + [5], rng.integers(0, config.vocab_size, 9).tolist(),
               shared + [9], shared + [5]]
    jp = jax.tree.map(jnp.asarray, params)
    want = serving.PagedContinuousBatchEngine(
        "llama", config, specs, jp, slots=2, n_pages=24, page_size=16,
        backend="xla", cache_dtype=jnp.float32,
    ).run(prompts, max_new_tokens=8, window=4)
    got = serving.TPPagedContinuousBatchEngine(
        "llama", config, specs, params, tp=4, slots=2, n_pages=24,
        page_size=16, backend="xla", cache_dtype=jnp.float32,
    ).run(prompts, max_new_tokens=8, window=4)
    assert sorted(got) == sorted(want)
    for rid in want:
        np.testing.assert_array_equal(np.asarray(got[rid]),
                                      np.asarray(want[rid]),
                                      err_msg=f"request {rid}")


def test_tp_paged_speculative():
    """TP paged + speculation: token-exact vs plain TP paged."""
    config, specs, params = _model()
    rng = np.random.default_rng(6)
    phrase = rng.integers(0, config.vocab_size, 5).tolist()
    prompts = [phrase * 5, rng.integers(0, config.vocab_size, 7).tolist()]
    want = serving.TPPagedContinuousBatchEngine(
        "llama", config, specs, params, tp=4, slots=2, n_pages=24,
        page_size=16, backend="xla", cache_dtype=jnp.float32,
    ).run(prompts, max_new_tokens=10, window=4)
    got = serving.TPPagedContinuousBatchEngine(
        "llama", config, specs, params, tp=4, slots=2, n_pages=24,
        page_size=16, backend="xla", cache_dtype=jnp.float32,
        speculative=(4, 2),
    ).run(prompts, max_new_tokens=10)
    for rid in want:
        np.testing.assert_array_equal(np.asarray(got[rid]),
                                      np.asarray(want[rid]),
                                      err_msg=f"request {rid}")
