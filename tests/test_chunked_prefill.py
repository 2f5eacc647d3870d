"""Chunked prefill on the dense continuous-batching engine: long prompts
admit in O(1) and prefill chunk-by-chunk between decode windows.
Token-exactness vs whole-prompt admission is the contract — chunking
only changes WHEN prompt rows enter the cache, never what they hold."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from squeezellm_tpu import serving
from squeezellm_tpu.models import llama
from squeezellm_tpu.quantize import pipeline
from squeezellm_tpu.sampling import SamplingParams


def _model():
    config = llama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        n_layers=2, n_heads=4, n_kv_heads=2, max_seq=96,
    )
    dense = llama.random_dense_params(config, jax.random.PRNGKey(0))
    specs, params = pipeline.quantize_model("llama", config, dense, bits=4)
    return config, specs, jax.tree.map(jnp.asarray, params)


def _engine(config, specs, params, **kw):
    return serving.ContinuousBatchEngine(
        "llama", config, specs, params, slots=2, backend="xla",
        max_seq=96, **kw)


@pytest.mark.parametrize("window", [1, 4])
@pytest.mark.parametrize("chunk", [8, 16, 24])
def test_chunked_matches_whole_prompt(window, chunk):
    config, specs, params = _model()
    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(0, config.vocab_size, 37).tolist(),  # 2 chunks + tail
        rng.integers(0, config.vocab_size, 5).tolist(),   # below chunk
        rng.integers(0, config.vocab_size, 48).tolist(),  # exact multiple
        rng.integers(0, config.vocab_size, 9).tolist(),
    ]
    want = _engine(config, specs, params).run(
        prompts, max_new_tokens=6, window=window)
    got = _engine(config, specs, params, prefill_chunk=chunk).run(
        prompts, max_new_tokens=6, window=window)
    assert sorted(got) == sorted(want)
    for rid in want:
        assert got[rid] == want[rid], rid


def test_chunked_matches_with_sampling():
    config, specs, params = _model()
    rng = np.random.default_rng(1)
    prompts = [rng.integers(0, config.vocab_size, 33).tolist(),
               rng.integers(0, config.vocab_size, 21).tolist()]
    sp = SamplingParams(temperature=0.8, top_k=20, top_p=0.9)
    want = _engine(config, specs, params, seed=3).run(
        prompts, max_new_tokens=5, window=2, sampling=sp)
    got = _engine(config, specs, params, seed=3, prefill_chunk=8).run(
        prompts, max_new_tokens=5, window=2, sampling=sp)
    for rid in want:
        assert got[rid] == want[rid], rid


def test_chunked_matches_speculative():
    config, specs, params = _model()
    phrase = list(range(3, 11))
    prompts = [phrase * 4, [7, 5, 3]]
    want = _engine(config, specs, params, speculative=(4, 2)).run(
        prompts, max_new_tokens=8)
    got = _engine(config, specs, params, speculative=(4, 2),
                  prefill_chunk=8).run(prompts, max_new_tokens=8)
    for rid in want:
        assert got[rid] == want[rid], rid


def test_short_request_decodes_during_long_admission():
    """The point of interleaving: a short request admitted alongside a
    long prompt starts emitting while the long prompt is still
    prefilling (whole-prompt admission would emit them together)."""
    config, specs, params = _model()
    rng = np.random.default_rng(2)
    eng = _engine(config, specs, params, prefill_chunk=8)
    long_rid = eng.add_request(
        rng.integers(0, config.vocab_size, 64).tolist(), 4)
    short_rid = eng.add_request([5, 9], 4)
    first_emitter = None
    long_first_step = short_first_step = None
    for step_i in range(64):
        out = eng.step()
        for rid in out:
            if first_emitter is None:
                first_emitter = rid
            if rid == long_rid and long_first_step is None:
                long_first_step = step_i
            if rid == short_rid and short_first_step is None:
                short_first_step = step_i
        if not any(s.active for s in eng._slots):
            break
    assert first_emitter == short_rid
    # 64-token prompt at chunk 8 needs 8 chunk steps before decoding
    assert short_first_step < long_first_step


def test_cancel_mid_prefill_frees_slot_and_staging():
    config, specs, params = _model()
    rng = np.random.default_rng(3)
    eng = _engine(config, specs, params, prefill_chunk=8)
    rid = eng.add_request(rng.integers(0, config.vocab_size, 40).tolist(), 4)
    eng.step()  # one chunk in
    assert eng._staging
    assert eng.cancel(rid)
    assert not eng._staging
    assert eng.free_slots() == 2
    # pool still serves new work
    out = eng.run([[1, 2, 3]], max_new_tokens=3)
    assert len(next(iter(out.values()))) == 3


def _paged(config, specs, params, **kw):
    return serving.PagedContinuousBatchEngine(
        "llama", config, specs, params, slots=2, n_pages=32, page_size=8,
        backend="xla", cache_dtype=jnp.float32, max_seq=96, **kw)


@pytest.mark.parametrize("window", [1, 4])
def test_paged_chunked_matches_whole_prompt(window):
    config, specs, params = _model()
    rng = np.random.default_rng(4)
    prompts = [
        rng.integers(0, config.vocab_size, 37).tolist(),
        rng.integers(0, config.vocab_size, 5).tolist(),
        rng.integers(0, config.vocab_size, 48).tolist(),
    ]
    want = _paged(config, specs, params).run(
        prompts, max_new_tokens=6, window=window)
    got = _paged(config, specs, params, prefill_chunk=16).run(
        prompts, max_new_tokens=6, window=window)
    assert sorted(got) == sorted(want)
    for rid in want:
        assert got[rid] == want[rid], rid


@pytest.mark.medium
def test_paged_chunked_matches_speculative():
    config, specs, params = _model()
    phrase = list(range(3, 11))
    prompts = [phrase * 4, [7, 5, 3]]
    want = _paged(config, specs, params, speculative=(4, 2)).run(
        prompts, max_new_tokens=8)
    got = _paged(config, specs, params, speculative=(4, 2),
                 prefill_chunk=16).run(prompts, max_new_tokens=8)
    for rid in want:
        assert got[rid] == want[rid], rid


def test_paged_chunked_defers_prefix_registration():
    """Pages register for prefix sharing only when their content exists:
    a same-prefix request admitted DURING the first one's chunked
    prefill must NOT share (the pages hold nothing yet), while one
    admitted after completion shares as usual — and every page is
    released at the end either way."""
    config, specs, params = _model()
    base = list(range(2, 2 + 32))  # four full shareable 8-token pages
    eng = _paged(config, specs, params, prefill_chunk=8)
    r1 = eng.add_request(base + [3], 2)
    i1 = next(i for i, s in enumerate(eng._slots)
              if s.active and s.request_id == r1)
    assert eng._slots[i1].prefilling
    # concurrent same-prefix admission mid-prefill: no sharing possible
    r2 = eng.add_request(base + [5], 2)
    i2 = next(i for i, s in enumerate(eng._slots)
              if s.active and s.request_id == r2)
    assert eng._slot_shared[i2] == 0
    # NB: step() returns {} while only mid-prefill slots exist (progress
    # without emissions) — drain on slot activity like run() does
    while any(s.active for s in eng._slots):
        eng.step()
    free_mid = len(eng.pool._free)
    # after completion + release the prefix is registered: a new request
    # with the same prefix shares its full pages
    r3 = eng.add_request(base + [7], 2)
    i3 = next(i for i, s in enumerate(eng._slots)
              if s.active and s.request_id == r3)
    assert eng._slot_shared[i3] == 4
    while any(s.active for s in eng._slots):
        eng.step()
    assert r1 != r2 != r3
    # request pages released (registered prefix pages persist)
    assert len(eng.pool._free) >= free_mid - 1


def test_paged_cancel_mid_prefill_releases_pages():
    config, specs, params = _model()
    rng = np.random.default_rng(5)
    eng = _paged(config, specs, params, prefill_chunk=8)
    free0 = len(eng.pool._free)
    rid = eng.add_request(rng.integers(0, config.vocab_size, 40).tolist(), 4)
    eng.step()  # one chunk in
    assert eng._staging
    assert eng.cancel(rid)
    assert not eng._staging
    # nothing was registered, so every allocated page returns to the pool
    assert len(eng.pool._free) == free0
    out = eng.run([[1, 2, 3]], max_new_tokens=3)
    assert len(next(iter(out.values()))) == 3


def test_tp_chunked_matches_single_device():
    """TP dense + TP paged engines under chunked admission: token-
    identical to their unchunked single-device twins."""
    config, specs, params = _model()
    rng = np.random.default_rng(6)
    prompts = [rng.integers(0, config.vocab_size, 37).tolist(),
               rng.integers(0, config.vocab_size, 6).tolist(),
               rng.integers(0, config.vocab_size, 24).tolist()]
    np_params = jax.tree.map(np.asarray, params)
    want = _engine(config, specs, params).run(
        prompts, max_new_tokens=5, window=2)
    got_tp = serving.TPContinuousBatchEngine(
        "llama", config, specs, np_params, tp=2, slots=2, backend="xla",
        max_seq=96, prefill_chunk=16,
    ).run(prompts, max_new_tokens=5, window=2)
    for rid in want:
        assert got_tp[rid] == want[rid], ("tp", rid)
    want_p = _paged(config, specs, params).run(
        prompts, max_new_tokens=5, window=2)
    got_tpp = serving.TPPagedContinuousBatchEngine(
        "llama", config, specs, np_params, tp=2, slots=2, n_pages=32,
        page_size=8, backend="xla", cache_dtype=jnp.float32, max_seq=96,
        prefill_chunk=16,
    ).run(prompts, max_new_tokens=5, window=2)
    for rid in want_p:
        assert got_tpp[rid] == want_p[rid], ("tp-paged", rid)


def test_chunked_admission_is_constant_time():
    """Admission does no prefill work: a max-length prompt admits without
    a single prefill dispatch (all chunks run inside step())."""
    config, specs, params = _model()
    eng = _engine(config, specs, params, prefill_chunk=8)
    calls = []
    orig = eng._prefill_cont
    eng._prefill_cont = lambda *a: (calls.append(1), orig(*a))[1]
    eng.add_request(list(range(2, 80)), 4)
    assert calls == []
    eng.step()
    assert len(calls) == 1
