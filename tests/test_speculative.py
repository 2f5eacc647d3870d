"""Prompt-lookup speculative decoding: bit-exact greedy equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from squeezellm_tpu import engine as engine_mod
from squeezellm_tpu.engine import _lookup_draft
from squeezellm_tpu.models import llama
from squeezellm_tpu.quantize import pipeline


def _engine(seed=0):
    config = llama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        n_layers=2, n_heads=4, n_kv_heads=2, max_seq=96,
    )
    dense = llama.random_dense_params(config, jax.random.PRNGKey(seed))
    specs, params = pipeline.quantize_model("llama", config, dense, bits=4)
    return engine_mod.Engine("llama", config, specs,
                             jax.tree.map(jnp.asarray, params), backend="xla")


def test_lookup_draft():
    ctx = [5, 1, 2, 3, 9, 1, 2]
    assert _lookup_draft(ctx, 2, 3) == [3, 9, 1]   # match at [1,2] idx 1
    assert _lookup_draft(ctx, 3, 2) == []          # no prior [9,1,2]
    assert _lookup_draft([1, 2], 2, 3) == []       # key is whole context
    assert _lookup_draft(ctx, 2, 0) == []
    # most RECENT prior occurrence wins
    ctx2 = [1, 2, 7, 1, 2, 8, 1, 2]
    assert _lookup_draft(ctx2, 2, 1) == [8]


@pytest.mark.parametrize("prompt", [
    # repetitive prompt: drafts frequently accepted
    [3, 4, 5, 6, 3, 4, 5, 6, 3, 4],
    # no structure: drafts mostly rejected (degenerates to 1 tok/window)
    [17, 91, 2],
    [8],
])
@pytest.mark.parametrize("draft_len,ngram", [(8, 2), (4, 3), (1, 1)])
@pytest.mark.parametrize("host_loop", [False, True])
def test_speculative_matches_greedy(prompt, draft_len, ngram, host_loop):
    eng = _engine()
    p = np.asarray(prompt, np.int32)[None]
    want = eng.generate(p, 12)
    got = eng.generate_speculative(p, 12, draft_len=draft_len, ngram=ngram,
                                   host_loop=host_loop)
    np.testing.assert_array_equal(got, want)
    st = eng.spec_stats
    assert st["windows"] >= 1
    assert 0 <= st["accepted"] <= st["drafted"]


def test_speculative_accepts_on_repetitive_text():
    """The whole point: on repeating sequences drafts get accepted, so
    the token count per verification window exceeds 1."""
    eng = _engine()
    p = np.asarray([3, 4, 5, 6] * 4, np.int32)[None]
    out = eng.generate_speculative(p, 20, draft_len=8, ngram=2)
    st = eng.spec_stats
    assert out.shape[1] == p.shape[1] + 20
    assert st["accepted"] > 0
    assert st["windows"] < 20  # fewer weight passes than tokens


def test_speculative_opt_family():
    """The verify-prefill path (all_logits) works across model families."""
    from squeezellm_tpu.models import opt

    config = opt.OPTConfig(
        vocab_size=128, hidden_size=64, ffn_dim=128, n_layers=2, n_heads=4,
        max_seq=96,
    )
    dense = opt.random_dense_params(config, jax.random.PRNGKey(1))
    specs, params = pipeline.quantize_model("opt", config, dense, bits=4)
    eng = engine_mod.Engine("opt", config, specs,
                            jax.tree.map(jnp.asarray, params), backend="xla")
    p = np.asarray([5, 6, 7, 5, 6, 7, 5, 6], np.int32)[None]
    want = eng.generate(p, 10)
    np.testing.assert_array_equal(
        eng.generate_speculative(p, 10, draft_len=4, ngram=2), want)
    np.testing.assert_array_equal(
        eng.generate_speculative(p, 10, draft_len=4, ngram=2,
                                 host_loop=True), want)


def test_speculative_max_seq_guard():
    eng = _engine()
    p = np.asarray([[1, 2, 3]], np.int32)
    with pytest.raises(AssertionError):
        eng.generate_speculative(p, 96, draft_len=8)
