"""Tensor/data-parallel sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from squeezellm_tpu import engine as engine_mod
from squeezellm_tpu.models import common, llama
from squeezellm_tpu.parallel import gspmd
from squeezellm_tpu.quantize import pipeline

TINY = llama.LlamaConfig(
    vocab_size=128, hidden_size=64, intermediate_size=128, n_layers=2,
    n_heads=8, n_kv_heads=8, max_seq=32,
)


@pytest.fixture(scope="module")
def quantized_model():
    params = llama.random_dense_params(TINY, jax.random.PRNGKey(0))
    qspecs, qparams = pipeline.quantize_model(
        "llama", TINY, params, 4, sensitivity=0.0, nnz_pad_multiple=64
    )
    return qspecs, qparams


def test_mesh_and_pspec_tree(quantized_model):
    qspecs, qparams = quantized_model
    mesh = gspmd.make_mesh(tp=4, dp=2)
    assert mesh.shape == {"dp": 2, "tp": 4}
    pspecs = gspmd.param_partition_specs("llama", TINY, qspecs, qparams)
    # structure matches params
    jax.tree.map(lambda a, b: None, qparams, pspecs)
    assert pspecs["layers"][0]["q"]["qweight"] == P(None, "tp")
    assert pspecs["layers"][0]["o"]["qweight"] == P("tp", None)
    assert pspecs["layers"][0]["q"]["lut"] == P("tp", None)
    assert pspecs["lm_head"]["w"] == P("tp", None)


def test_validate_shardable():
    assert gspmd.validate_shardable("llama", TINY, 4) is None
    bad = llama.LlamaConfig(n_heads=6, n_kv_heads=6)
    assert gspmd.validate_shardable("llama", bad, 4) is not None


@pytest.mark.parametrize("tp,dp", [(4, 1), (8, 1), (4, 2)])
def test_sharded_forward_matches_single_device(quantized_model, tp, dp):
    qspecs, qparams = quantized_model
    mesh = gspmd.make_mesh(tp=tp, dp=dp)
    pspecs = gspmd.param_partition_specs("llama", TINY, qspecs, qparams)
    sharded = gspmd.shard_params(jax.tree.map(jnp.asarray, qparams), pspecs, mesh)

    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, 128, size=(2 * dp, 8)), jnp.int32)
    tok_sharded = jax.device_put(tokens, NamedSharding(mesh, P("dp", None)))

    @jax.jit
    def fwd(p, t):
        return llama.forward(TINY, qspecs, p, t, backend="xla")

    y_sharded = np.asarray(fwd(sharded, tok_sharded))
    y_ref = np.asarray(
        llama.forward(TINY, qspecs, jax.tree.map(jnp.asarray, qparams), tokens,
                      backend="xla")
    )
    np.testing.assert_allclose(y_sharded, y_ref, rtol=2e-4, atol=2e-4)


@pytest.mark.medium
def test_sharded_decode_with_cache(quantized_model):
    """Full decode step over a tp=4, dp=2 mesh with sharded KV cache."""
    qspecs, qparams = quantized_model
    mesh = gspmd.make_mesh(tp=4, dp=2)
    pspecs = gspmd.param_partition_specs("llama", TINY, qspecs, qparams)
    sharded = gspmd.shard_params(jax.tree.map(jnp.asarray, qparams), pspecs, mesh)

    batch = 2
    cache = common.init_kv_cache(batch, TINY.max_seq, TINY.n_layers,
                                 TINY.n_kv_heads, TINY.head_dim)
    cspecs = gspmd.cache_partition_specs(cache)
    cache_sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), cache, cspecs
    )

    rng = np.random.default_rng(2)
    tokens = rng.integers(0, 128, size=(batch, 6)).astype(np.int32)

    @jax.jit
    def prefill(p, t, c):
        return llama.prefill(TINY, qspecs, p, t, c, backend="xla")

    @jax.jit
    def decode(p, t, pos, c):
        return llama.decode_step(TINY, qspecs, p, t, pos, c, backend="xla")

    logits, cache_sharded = prefill(sharded, jnp.asarray(tokens[:, :4]), cache_sharded)
    l1, cache_sharded = decode(
        sharded, jnp.asarray(tokens[:, 4:5]), jnp.asarray(4, jnp.int32), cache_sharded
    )

    # reference: unsharded engine path
    ref_cache = common.init_kv_cache(batch, TINY.max_seq, TINY.n_layers,
                                     TINY.n_kv_heads, TINY.head_dim)
    qp = jax.tree.map(jnp.asarray, qparams)
    ref_logits, ref_cache = llama.prefill(TINY, qspecs, qp,
                                          jnp.asarray(tokens[:, :4]), ref_cache,
                                          backend="xla")
    rl1, _ = llama.decode_step(TINY, qspecs, qp, jnp.asarray(tokens[:, 4:5]),
                               jnp.asarray(4, jnp.int32), ref_cache, backend="xla")
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(rl1),
                               rtol=2e-4, atol=2e-4)
