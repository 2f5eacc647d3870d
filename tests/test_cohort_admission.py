"""Cohort (batched) admission must be token-exact vs per-request
admission, with request ids assigned in input order across the
batched/single split (serving.add_requests / _admit_cohort).

The reference has no serving tier; this pins the round-5 fused cohort
admission (one batched prefill + scatter dispatch per shape group)
against the sequential path that rounds 1-4 shipped."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

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


PROMPTS = [[1, 2, 3], [7, 9], [11, 13, 17, 19], [23, 29, 31]]


def _run_sequential(eng_cls, config, specs, params, max_new, **kw):
    eng = eng_cls("llama", config, specs, params, slots=4, backend="xla",
                  **kw)
    for p in PROMPTS:
        eng.add_request(p, max_new)
    out = {}
    while any(s.active for s in eng._slots):
        for rid, r in eng.step_window(4).items():
            if r["done"]:
                out[rid] = r["tokens"]
    return out


@pytest.mark.smoke
def test_dense_cohort_matches_sequential():
    config, specs, params = _small_model()
    expected = _run_sequential(serving.ContinuousBatchEngine,
                               config, specs, params, 6)

    eng = serving.ContinuousBatchEngine("llama", config, specs, params,
                                        slots=4, backend="xla")
    rids = eng.add_requests(PROMPTS, 6)
    assert rids == [0, 1, 2, 3]  # input order
    # all four same bucket -> one fused group, every slot active already
    assert all(s.active for s in eng._slots)
    got = {}
    while any(s.active for s in eng._slots):
        for rid, r in eng.step_window(4).items():
            if r["done"]:
                got[rid] = r["tokens"]
    assert sorted(got) == sorted(expected)
    for rid in expected:
        np.testing.assert_array_equal(got[rid], expected[rid],
                                      err_msg=f"request {rid}")


@pytest.mark.smoke
def test_paged_cohort_matches_sequential():
    config, specs, params = _small_model()
    kw = dict(n_pages=12, page_size=16)
    expected = _run_sequential(serving.PagedContinuousBatchEngine,
                               config, specs, params, 6, **kw)

    eng = serving.PagedContinuousBatchEngine(
        "llama", config, specs, params, slots=4, backend="xla", **kw)
    rids = eng.add_requests(PROMPTS, 6)
    assert rids == [0, 1, 2, 3]
    got = {}
    while any(s.active for s in eng._slots):
        for rid, r in eng.step_window(4).items():
            if r["done"]:
                got[rid] = r["tokens"]
    for rid in expected:
        np.testing.assert_array_equal(got[rid], expected[rid],
                                      err_msg=f"request {rid}")


def test_paged_cohort_prefix_hit_falls_back():
    """A prompt whose full-page prefix is registered must take the
    single-admission prime path (cohort key None), and still decode
    exactly like a fresh engine admitting it alone."""
    config, specs, params = _small_model()
    kw = dict(n_pages=16, page_size=8)
    long_prompt = list(range(1, 12))  # 11 tokens: one full 8-token page

    ref = serving.PagedContinuousBatchEngine(
        "llama", config, specs, params, slots=4, backend="xla", **kw)
    expected = ref.run([long_prompt], max_new_tokens=5, window=4)

    eng = serving.PagedContinuousBatchEngine(
        "llama", config, specs, params, slots=4, backend="xla", **kw)
    eng.run([long_prompt], max_new_tokens=5, window=4)  # registers prefix
    # second admission of the same prompt now hits the registry
    assert eng._cohort_key(np.asarray(long_prompt, np.int32), 5) is None
    got = eng.run([long_prompt, [40, 41], [50, 51]], max_new_tokens=5,
                  window=4)
    np.testing.assert_array_equal(got[min(got)], expected[0])


def test_cohort_mixed_buckets_and_ids():
    """Prompts spanning two width buckets: each bucket fuses separately,
    singles fall back, and ids still come back in input order."""
    config, specs, params = _small_model()
    eng = serving.ContinuousBatchEngine("llama", config, specs, params,
                                        slots=4, backend="xla")
    # widths: 16, 32 (17 tokens), 16, 32 -> two groups of two
    prompts = [[1, 2], list(range(1, 18)), [5, 6, 7],
               list(range(20, 37))]
    rids = eng.add_requests(prompts, 4)
    assert rids == [0, 1, 2, 3]
    by_rid = {s.request_id: i for i, s in enumerate(eng._slots) if s.active}
    assert sorted(by_rid) == [0, 1, 2, 3]
    results = {}
    while any(s.active for s in eng._slots):
        for rid, r in eng.step_window(4).items():
            if r["done"]:
                results[rid] = r["tokens"]
    # oracle: sequential admission on a fresh engine
    ref = serving.ContinuousBatchEngine("llama", config, specs, params,
                                        slots=4, backend="xla")
    for p in prompts:
        ref.add_request(p, 4)
    expected = {}
    while any(s.active for s in ref._slots):
        for rid, r in ref.step_window(4).items():
            if r["done"]:
                expected[rid] = r["tokens"]
    for rid in expected:
        np.testing.assert_array_equal(results[rid], expected[rid])
