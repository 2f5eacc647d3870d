"""Paged continuous batching: must reproduce the dense-slot engine's
tokens exactly, share prefix pages, and recycle freed pages."""

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


PS = 8  # small pages so multi-page prompts fit the tiny max_seq


def _paged(config, specs, params, slots=2, n_pages=24):
    return serving.PagedContinuousBatchEngine(
        "llama", config, specs, params, slots=slots, n_pages=n_pages,
        page_size=PS, backend="xla", cache_dtype=jnp.float32,
    )


@pytest.mark.medium
def test_paged_matches_single_stream():
    config, specs, params = _small_model()
    eng = engine_mod.Engine("llama", config, specs, params, backend="xla")
    prompts = [[1, 2, 3], list(range(7, 7 + 18)), [11, 13, 17, 19], [23]]
    max_new = 6
    expected = {
        i: eng.generate(np.asarray(p, np.int32)[None], max_new)[0, len(p):]
        for i, p in enumerate(prompts)
    }
    cb = _paged(config, specs, params, slots=2)
    results = cb.run(prompts, max_new_tokens=max_new)
    assert sorted(results) == [0, 1, 2, 3]
    for rid, toks in results.items():
        np.testing.assert_array_equal(
            np.asarray(toks), np.asarray(expected[rid]),
            err_msg=f"request {rid}")


@pytest.mark.medium
def test_prefix_sharing_reuses_pages():
    config, specs, params = _small_model()
    cb = _paged(config, specs, params, slots=2, n_pages=24)
    base = list(range(1, 1 + 3 * PS + 2))  # 3 full pages + 2 tokens
    a = base + [99]
    b = base + [101, 102]

    rid_a = cb.add_request(a, 4)
    shared_a = cb._slot_shared[0]
    assert shared_a == 0  # nothing registered yet
    pages_a = list(cb._slot_pages[0])

    rid_b = cb.add_request(b, 4)
    shared_b = cb._slot_shared[1]
    assert shared_b == 3  # the 3 full-page prefixes are reused
    assert cb._slot_pages[1][:3] == pages_a[:3]
    # shared pages are refcounted by both slots
    for pid in pages_a[:3]:
        assert cb.pool._ref[pid] == 2

    # same tokens decoded with and without sharing
    eng = engine_mod.Engine("llama", config, specs, params, backend="xla")
    want_a = eng.generate(np.asarray(a, np.int32)[None], 4)[0, len(a):]
    want_b = eng.generate(np.asarray(b, np.int32)[None], 4)[0, len(b):]
    results = {}
    while any(s.active for s in cb._slots):
        for rid, r in cb.step().items():
            if r["done"]:
                results[rid] = r["tokens"]
    np.testing.assert_array_equal(np.asarray(results[rid_a]),
                                  np.asarray(want_a))
    np.testing.assert_array_equal(np.asarray(results[rid_b]),
                                  np.asarray(want_b))


def test_pages_recycled_after_release():
    config, specs, params = _small_model()
    cb = _paged(config, specs, params, slots=1, n_pages=8)
    # run several requests through one slot; private pages must recycle
    for k in range(4):
        cb.run([[5 + k, 6 + k, 7 + k]], max_new_tokens=3)
    assert len(cb.pool._free) >= 6  # pool not leaking


def test_paged_windowed_matches_per_token():
    config, specs, params = _small_model()
    prompts = [[1, 2, 3], list(range(7, 7 + 10))]
    cb1 = _paged(config, specs, params, slots=2)
    r1 = cb1.run(list(prompts), max_new_tokens=5, window=1)
    cb8 = _paged(config, specs, params, slots=2)
    r8 = cb8.run(list(prompts), max_new_tokens=5, window=8)
    assert sorted(r1) == sorted(r8)
    for rid in r1:
        np.testing.assert_array_equal(np.asarray(r1[rid]),
                                      np.asarray(r8[rid]))


def test_paged_opt_matches_single_stream():
    from squeezellm_tpu.models import opt as opt_mod

    config = opt_mod.OPTConfig(
        vocab_size=96, hidden_size=64, ffn_dim=128, n_layers=2,
        n_heads=4, max_seq=64,
    )
    dense = opt_mod.random_dense_params(config, jax.random.PRNGKey(0))
    specs, params = pipeline.quantize_model("opt", config, dense, bits=4)
    params = jax.tree.map(jnp.asarray, params)
    eng = engine_mod.Engine("opt", config, specs, params, backend="xla")
    prompts = [[1, 2, 3], list(range(5, 5 + 12))]
    expected = {
        i: eng.generate(np.asarray(p, np.int32)[None], 5)[0, len(p):]
        for i, p in enumerate(prompts)
    }
    cb = serving.PagedContinuousBatchEngine(
        "opt", config, specs, params, slots=2, n_pages=24, page_size=PS,
        backend="xla", cache_dtype=jnp.float32)
    results = cb.run(prompts, max_new_tokens=5)
    for rid, toks in results.items():
        np.testing.assert_array_equal(np.asarray(toks),
                                      np.asarray(expected[rid]))


def test_admission_pow2_padding_no_clobber():
    """A request whose non-shared page count is NOT a power of two must not
    corrupt its own pages via the padded scatter (regression for the
    clamped-slice bug)."""
    config, specs, params = _small_model()
    # 3 pages of prompt content (non-pow2 scatter count), no sharing
    prompt = list(range(1, 1 + 2 * PS + 3))
    eng = engine_mod.Engine("llama", config, specs, params, backend="xla")
    want = eng.generate(np.asarray(prompt, np.int32)[None], 4)[0, len(prompt):]
    cb = _paged(config, specs, params, slots=1, n_pages=12)
    got = cb.run([prompt], max_new_tokens=4)
    np.testing.assert_array_equal(np.asarray(list(got.values())[0]),
                                  np.asarray(want))


def test_released_slot_cannot_corrupt_reallocated_pages():
    """Regression: a released slot used to keep its stale position and page
    table, so its inactive-slot garbage decode WROTE through freed page ids
    — corrupting whichever slot they were reallocated to. Scenario: slot B
    releases early; its pages are reallocated to a new request in slot A
    while B stays empty; further steps must not disturb A's decode."""
    config, specs, params = _small_model()
    eng = engine_mod.Engine("llama", config, specs, params, backend="xla")
    long_p = list(range(2, 2 + 2 * PS))  # multi-page prompt
    short_p = [7, 9]
    late_p = list(range(40, 40 + PS + 3))
    want_long = eng.generate(np.asarray(long_p, np.int32)[None], 10)[0, len(long_p):]
    want_late = eng.generate(np.asarray(late_p, np.int32)[None], 6)[0, len(late_p):]

    cb = _paged(config, specs, params, slots=3, n_pages=16)
    rid_long = cb.add_request(long_p, 10)
    rid_short = cb.add_request(short_p, 2)  # finishes early, frees pages
    results = {}
    admitted_late = False
    rid_late = None
    while any(s.active for s in cb._slots):
        for rid, r in cb.step().items():
            if r["done"]:
                results[rid] = r["tokens"]
        if not admitted_late and rid_short in results:
            # slot freed; admit into a DIFFERENT slot (slot of rid_short is
            # first-inactive, so this reuses its freed pages while the
            # OTHER empty slot keeps any stale state)
            rid_late = cb.add_request(late_p, 6)
            admitted_late = True
    np.testing.assert_array_equal(np.asarray(results[rid_long]),
                                  np.asarray(want_long))
    np.testing.assert_array_equal(np.asarray(results[rid_late]),
                                  np.asarray(want_late))


def test_windowed_inactive_slot_does_not_write_page_zero():
    """Regression: inside a decode window, an inactive slot's position used
    to advance from -1 to 0 and write through its zeroed page table into
    page id 0 (the FIRST page the allocator hands out)."""
    config, specs, params = _small_model()
    cb = _paged(config, specs, params, slots=2, n_pages=8)
    rid = cb.add_request(list(range(3, 3 + PS + 2)), 8)  # owns page 0
    eng = engine_mod.Engine("llama", config, specs, params, backend="xla")
    want = eng.generate(np.asarray(list(range(3, 3 + PS + 2)),
                                   np.int32)[None], 8)[0, PS + 2:]
    results = {}
    # slot 1 stays inactive through multi-token windows
    while any(s.active for s in cb._slots):
        for r, res in cb.step_window(8).items():
            if res["done"]:
                results[r] = res["tokens"]
    np.testing.assert_array_equal(np.asarray(results[rid]), np.asarray(want))


def test_admission_pool_exhaustion_rolls_back():
    config, specs, params = _small_model()
    cb = _paged(config, specs, params, slots=2, n_pages=3)
    cb.add_request([1, 2, 3], 3)  # takes 1 page
    free_before = len(cb.pool._free)
    with pytest.raises(RuntimeError):
        cb.add_request(list(range(2, 2 + 2 * PS)), 3 * PS)  # needs > pool
    assert len(cb.pool._free) == free_before  # nothing leaked


def test_paged_sliding_window_matches_dense_engine():
    """Mistral-style sliding window over the paged pool: token-exact vs
    the dense-slot engine (same window semantics, kernel-side masking)."""
    config = llama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        n_layers=2, n_heads=4, n_kv_heads=2, max_seq=96,
        sliding_window=24,
    )
    dense = llama.random_dense_params(config, jax.random.PRNGKey(0))
    specs, params = pipeline.quantize_model("llama", config, dense, bits=4)
    params = jax.tree.map(jnp.asarray, params)
    rng = np.random.default_rng(7)
    # prompts + generations long enough that the window actually clips
    prompts = [rng.integers(0, 128, 40).tolist(),
               rng.integers(0, 128, 7).tolist()]
    want = serving.ContinuousBatchEngine(
        "llama", config, specs, params, slots=2, backend="xla",
    ).run(prompts, max_new_tokens=12, window=4)
    got = serving.PagedContinuousBatchEngine(
        "llama", config, specs, params, slots=2, n_pages=24, page_size=16,
        backend="xla",
    ).run(prompts, max_new_tokens=12, window=4)
    for rid in want:
        np.testing.assert_array_equal(np.asarray(got[rid]),
                                      np.asarray(want[rid]),
                                      err_msg=f"request {rid}")


def test_paged_sliding_window_speculative():
    """Sliding window + paged speculation: still token-exact."""
    config = llama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        n_layers=2, n_heads=4, n_kv_heads=2, max_seq=96,
        sliding_window=24,
    )
    dense = llama.random_dense_params(config, jax.random.PRNGKey(0))
    specs, params = pipeline.quantize_model("llama", config, dense, bits=4)
    params = jax.tree.map(jnp.asarray, params)
    rng = np.random.default_rng(8)
    phrase = rng.integers(0, 128, 5).tolist()
    prompts = [phrase * 6, rng.integers(0, 128, 9).tolist()]
    plain = serving.PagedContinuousBatchEngine(
        "llama", config, specs, params, slots=2, n_pages=24, page_size=16,
        backend="xla",
    ).run(prompts, max_new_tokens=10, window=4)
    got = serving.PagedContinuousBatchEngine(
        "llama", config, specs, params, slots=2, n_pages=24, page_size=16,
        backend="xla", speculative=(4, 2),
    ).run(prompts, max_new_tokens=10)
    for rid in plain:
        np.testing.assert_array_equal(np.asarray(got[rid]),
                                      np.asarray(plain[rid]),
                                      err_msg=f"request {rid}")


def test_paged_partial_last_page_scatter():
    """max_seq NOT a multiple of page_size: the admission scatter of a
    prompt covering the partial last page must not clamp its dense slice
    (review finding: wrong rows silently landed in the pool). Token
    parity vs the dense engine is the oracle."""
    config = llama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        n_layers=2, n_heads=4, n_kv_heads=2, max_seq=40,
    )
    dense = llama.random_dense_params(config, jax.random.PRNGKey(2))
    specs, params = pipeline.quantize_model("llama", config, dense, bits=4)
    params = jax.tree.map(jnp.asarray, params)
    rng = np.random.default_rng(9)
    prompts = [rng.integers(0, 128, 37).tolist()]  # covers 3 of 3 pages
    want = serving.ContinuousBatchEngine(
        "llama", config, specs, params, slots=1, backend="xla",
    ).run(prompts, max_new_tokens=3, window=2)
    got = serving.PagedContinuousBatchEngine(
        "llama", config, specs, params, slots=1, n_pages=8, page_size=16,
        backend="xla", cache_dtype=jnp.float32,
    ).run(prompts, max_new_tokens=3, window=2)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
