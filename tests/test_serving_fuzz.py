"""Differential fuzz across ALL serving engines: random prompt lengths,
budgets, staggered joins, slot/page reuse, mixed prefix sharing — every
engine must emit token-identical results per request id. This is the
test class that catches pooled-state bugs (stale positions, freed-page
write-through, clamped scatters): see the paged-serving regressions
pinned in tests/test_paged_serving.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from squeezellm_tpu import serving
from squeezellm_tpu.models import llama
from squeezellm_tpu.quantize import pipeline


@pytest.fixture(scope="module")
def model():
    config = llama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        n_layers=2, n_heads=4, n_kv_heads=2, max_seq=72,
    )
    dense = llama.random_dense_params(config, jax.random.PRNGKey(0))
    specs, params = pipeline.quantize_model("llama", config, dense, bits=4)
    return config, specs, params


@pytest.mark.parametrize("seed", [0, 1])
def test_all_engines_agree_on_random_workload(model, seed):
    config, specs, params = model
    rng = np.random.default_rng(seed)
    shared = rng.integers(0, config.vocab_size, 16).tolist()  # one page
    prompts = []
    for _ in range(7):
        if rng.random() < 0.4:  # prefix-shared cohort
            prompts.append(shared + rng.integers(
                0, config.vocab_size, int(rng.integers(1, 9))).tolist())
        else:
            prompts.append(rng.integers(
                0, config.vocab_size, int(rng.integers(2, 30))).tolist())
    max_new = int(rng.integers(3, 12))
    jp = jax.tree.map(jnp.asarray, params)

    engines = {
        "dense": serving.ContinuousBatchEngine(
            "llama", config, specs, jp, slots=2, backend="xla"),
        "dense-spec": serving.ContinuousBatchEngine(
            "llama", config, specs, jp, slots=2, backend="xla",
            speculative=(3, 2)),
        "paged": serving.PagedContinuousBatchEngine(
            "llama", config, specs, jp, slots=2, n_pages=16, page_size=16,
            backend="xla", cache_dtype=jnp.float32),
        "paged-spec": serving.PagedContinuousBatchEngine(
            "llama", config, specs, jp, slots=2, n_pages=16, page_size=16,
            backend="xla", cache_dtype=jnp.float32, speculative=(3, 2)),
        "tp": serving.TPContinuousBatchEngine(
            "llama", config, specs, params, tp=2, slots=2, backend="xla"),
        "tp-paged": serving.TPPagedContinuousBatchEngine(
            "llama", config, specs, params, tp=2, slots=2, n_pages=16,
            page_size=16, backend="xla", cache_dtype=jnp.float32),
    }
    results = {name: eng.run(list(prompts), max_new_tokens=max_new,
                             window=int(rng.integers(1, 5)))
               for name, eng in engines.items()}
    want = results.pop("dense")
    assert sorted(want) == list(range(len(prompts)))
    for name, got in results.items():
        assert sorted(got) == sorted(want), name
        for rid in want:
            np.testing.assert_array_equal(
                np.asarray(got[rid]), np.asarray(want[rid]),
                err_msg=f"{name} request {rid} (seed {seed})")
