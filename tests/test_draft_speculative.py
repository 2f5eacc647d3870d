"""Draft-MODEL speculative decoding (two-model): bit-exact greedy
equivalence regardless of draft quality, full acceptance when the draft
IS the target, cross-family targets."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from squeezellm_tpu import engine as engine_mod
from squeezellm_tpu.models import llama
from squeezellm_tpu.quantize import pipeline


def _llama_engine(seed=0, n_layers=2, bits=4):
    config = llama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        n_layers=n_layers, n_heads=4, n_kv_heads=2, max_seq=96,
    )
    dense = llama.random_dense_params(config, jax.random.PRNGKey(seed))
    specs, params = pipeline.quantize_model("llama", config, dense,
                                            bits=bits)
    return engine_mod.Engine("llama", config, specs,
                             jax.tree.map(jnp.asarray, params), backend="xla")


@pytest.mark.medium
@pytest.mark.parametrize("prompt", [[3, 4, 5, 6, 3, 4], [17, 91, 2], [8]])
@pytest.mark.parametrize("draft_len", [8, 3, 1])
@pytest.mark.parametrize("host_loop", [False, True])
def test_draft_spec_matches_greedy(prompt, draft_len, host_loop):
    """A DIFFERENT random draft model (uncorrelated proposals): output
    must still be bit-identical to plain greedy — acceptance only ever
    keeps draft tokens that equal the target's greedy choice."""
    target = _llama_engine(seed=0)
    draft = _llama_engine(seed=7, n_layers=1, bits=3)
    p = np.asarray(prompt, np.int32)[None]
    want = target.generate(p, 12)
    got = target.generate_draft_speculative(p, 12, draft,
                                            draft_len=draft_len,
                                            host_loop=host_loop)
    np.testing.assert_array_equal(got, want)
    st = target.spec_stats
    assert st["windows"] >= 1
    assert 0 <= st["accepted"] <= st["drafted"]


def test_draft_spec_self_draft_accepts():
    """Draft == target: in exact arithmetic every greedy draft token
    matches the target's greedy token. In practice the draft chain runs
    through decode_step (GEMV) while verification runs through the block
    prefill (GEMM) — different XLA reduction orders flip near-tied
    argmaxes on a random tiny model — so assert a strong acceptance rate
    and fewer weight passes than tokens, not perfection."""
    target = _llama_engine(seed=0)
    p = np.asarray([[5, 9, 1]], np.int32)
    K, max_new = 4, 21
    want = target.generate(p, max_new)
    got = target.generate_draft_speculative(p, max_new, target, draft_len=K)
    np.testing.assert_array_equal(got, want)
    st = target.spec_stats
    assert st["accepted"] > 0
    assert st["windows"] < max_new  # >1 token per verify window on average


def test_draft_spec_device_host_agree_on_stats():
    target = _llama_engine(seed=0)
    draft = _llama_engine(seed=3, n_layers=1)
    p = np.asarray([[2, 4, 6, 8, 2, 4, 6]], np.int32)
    a = target.generate_draft_speculative(p, 16, draft, draft_len=5)
    st_dev = dict(target.spec_stats)
    b = target.generate_draft_speculative(p, 16, draft, draft_len=5,
                                          host_loop=True)
    np.testing.assert_array_equal(a, b)
    assert st_dev == target.spec_stats


def test_draft_spec_vocab_guard_and_max_seq_guard():
    target = _llama_engine(seed=0)
    config = llama.LlamaConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        n_layers=1, n_heads=4, n_kv_heads=2, max_seq=96,
    )
    dense = llama.random_dense_params(config, jax.random.PRNGKey(1))
    specs, params = pipeline.quantize_model("llama", config, dense, bits=4)
    other_vocab = engine_mod.Engine("llama", config, specs,
                                    jax.tree.map(jnp.asarray, params),
                                    backend="xla")
    p = np.asarray([[1, 2, 3]], np.int32)
    with pytest.raises(AssertionError):
        target.generate_draft_speculative(p, 8, other_vocab)
    draft = _llama_engine(seed=2, n_layers=1)
    with pytest.raises(AssertionError):
        target.generate_draft_speculative(p, 96, draft, draft_len=8)


def test_draft_spec_opt_family():
    from squeezellm_tpu.models import opt

    def opt_engine(seed, n_layers):
        config = opt.OPTConfig(
            vocab_size=128, hidden_size=64, ffn_dim=128,
            n_layers=n_layers, n_heads=4, max_seq=96,
        )
        dense = opt.random_dense_params(config, jax.random.PRNGKey(seed))
        specs, params = pipeline.quantize_model("opt", config, dense, bits=4)
        return engine_mod.Engine("opt", config, specs,
                                 jax.tree.map(jnp.asarray, params),
                                 backend="xla")

    target = opt_engine(1, 2)
    draft = opt_engine(9, 1)
    p = np.asarray([5, 6, 7, 5, 6, 7], np.int32)[None]
    want = target.generate(p, 10)
    np.testing.assert_array_equal(
        target.generate_draft_speculative(p, 10, draft, draft_len=4), want)
