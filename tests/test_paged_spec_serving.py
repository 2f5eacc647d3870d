"""Paged-pool speculative serving: the paged engine with
speculative=(K, ngram) must reproduce plain paged greedy generation
token-exactly — staggered joins, page reuse, prefix sharing, and the
W-token verify kernel writing through page tables."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from squeezellm_tpu import serving
from squeezellm_tpu.models import llama
from squeezellm_tpu.quantize import pipeline


def _model():
    config = llama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        n_layers=2, n_heads=4, n_kv_heads=2, max_seq=96,
    )
    dense = llama.random_dense_params(config, jax.random.PRNGKey(0))
    specs, params = pipeline.quantize_model("llama", config, dense, bits=4)
    return config, specs, jax.tree.map(jnp.asarray, params)


def _engine(config, specs, params, **kw):
    return serving.PagedContinuousBatchEngine(
        "llama", config, specs, params, slots=2, n_pages=24, page_size=16,
        backend="xla", **kw)


@pytest.mark.medium
def test_paged_speculative_matches_plain_paged():
    config, specs, params = _model()
    rng = np.random.default_rng(0)
    # repetitive prompts (drafts accept) + random ones (drafts miss)
    phrase = rng.integers(0, config.vocab_size, 5).tolist()
    prompts = [phrase * 4, rng.integers(0, 128, 7).tolist(),
               phrase * 3, rng.integers(0, 128, 21).tolist()]
    want = _engine(config, specs, params).run(prompts, max_new_tokens=12,
                                              window=4)
    got = _engine(config, specs, params, speculative=(4, 2)).run(
        prompts, max_new_tokens=12)
    assert sorted(got) == sorted(want)
    for rid in want:
        np.testing.assert_array_equal(np.asarray(got[rid]),
                                      np.asarray(want[rid]),
                                      err_msg=f"request {rid}")


def test_paged_speculative_with_prefix_sharing():
    """Shared full-page prefixes + speculative windows: verify writes must
    stay inside slot-owned pages (shared pages bit-identical after)."""
    config, specs, params = _model()
    rng = np.random.default_rng(1)
    shared = rng.integers(0, config.vocab_size, 32).tolist()  # 2 full pages
    prompts = [shared + [5], shared + [9], shared + [5]]
    plain = _engine(config, specs, params).run(prompts, max_new_tokens=10,
                                               window=4)
    eng = _engine(config, specs, params, speculative=(4, 2))
    got = eng.run(prompts, max_new_tokens=10)
    for rid in plain:
        np.testing.assert_array_equal(np.asarray(got[rid]),
                                      np.asarray(plain[rid]),
                                      err_msg=f"request {rid}")


def test_paged_speculative_stop_tokens_and_page_release():
    config, specs, params = _model()
    prompts = [[3, 5, 7], [11, 13]]
    eng = _engine(config, specs, params, speculative=(4, 2))
    first = eng.run(prompts, max_new_tokens=8)
    stop = int(first[0][0])
    eng2 = _engine(config, specs, params, speculative=(4, 2))
    res = eng2.run(prompts, max_new_tokens=8, stop_tokens=[stop])
    assert res[0][-1] == stop and len(res[0]) <= 8
    # every slot released -> all refcounts dropped to registered-only
    assert all(not s.active for s in eng2._slots)
    assert eng2.free_slots() == 2


def test_opt_paged_speculative_matches_plain_paged():
    """OPT (no rope, learned positions): paged speculation token-exact."""
    from squeezellm_tpu.models import opt

    config = opt.OPTConfig(vocab_size=96, hidden_size=64, ffn_dim=128,
                           n_layers=2, n_heads=4, max_seq=96)
    dense = opt.random_dense_params(config, jax.random.PRNGKey(0))
    specs, params = pipeline.quantize_model("opt", config, dense, bits=4)
    params = jax.tree.map(jnp.asarray, params)
    rng = np.random.default_rng(2)
    phrase = rng.integers(0, config.vocab_size, 4).tolist()
    prompts = [phrase * 4, rng.integers(0, 96, 9).tolist()]

    def engine(**kw):
        return serving.PagedContinuousBatchEngine(
            "opt", config, specs, params, slots=2, n_pages=24, page_size=16,
            backend="xla", **kw)

    want = engine().run(prompts, max_new_tokens=10, window=4)
    got = engine(speculative=(4, 2)).run(prompts, max_new_tokens=10)
    for rid in want:
        np.testing.assert_array_equal(np.asarray(got[rid]),
                                      np.asarray(want[rid]),
                                      err_msg=f"request {rid}")


def test_speculative_reserve_boundary_exact():
    """prompt + max_new + draft_len+1 == max_seq EXACTLY: the verify
    window's overhang rows must stay inside the slot's pages (an
    off-by-one in the reserve math would write through the page table's
    edge). Repetitive prompt maximizes acceptance so the window really
    reaches the edge; parity vs plain paged decode is the oracle."""
    config, specs, params = _model()  # max_seq = 96
    K = 4
    phrase = [7, 11, 13]
    prompt = (phrase * 20)[:59]             # 59 + 32 + (4+1) = 96
    max_new = 32
    plain = serving.PagedContinuousBatchEngine(
        "llama", config, specs, params, slots=1, n_pages=16, page_size=16,
        backend="xla").run([prompt], max_new_tokens=max_new, window=4)
    eng = serving.PagedContinuousBatchEngine(
        "llama", config, specs, params, slots=1, n_pages=16, page_size=16,
        backend="xla", speculative=(K, 2))
    got = eng.run([prompt], max_new_tokens=max_new)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(plain[0]))
    # one more token must be rejected (reserve would be violated)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        eng.add_request(prompt, max_new + 1)


def test_dense_speculative_reserve_boundary_exact():
    config, specs, params = _model()
    K = 4
    prompt = ([3, 5] * 40)[:59]
    max_new = 32                            # 59 + 32 + 5 = 96 == max_seq
    plain = serving.ContinuousBatchEngine(
        "llama", config, specs, params, slots=1, backend="xla",
    ).run([prompt], max_new_tokens=max_new, window=4)
    got = serving.ContinuousBatchEngine(
        "llama", config, specs, params, slots=1, backend="xla",
        speculative=(K, 2)).run([prompt], max_new_tokens=max_new)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(plain[0]))
