"""Explicit shard_map TP vs single-device numerics.

Runs on the 8-virtual-CPU-device mesh (conftest.py). Covers the full
sharding matrix: column/row-parallel quantized linears (3- and 4-bit),
sparse COO sidecars, hybrid topX channels, OPT biases under row-parallel
psum, and KV-cache head sharding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from squeezellm_tpu.models import llama, opt
from squeezellm_tpu.parallel import tp_shard_map as tpm
from squeezellm_tpu.quantize import pipeline


def _quantize_small(mod, config, *, sparsity, seed=0):
    dense = mod.random_dense_params(config, jax.random.PRNGKey(seed))
    # make sparse outliers: hand the pipeline a sensitivity + fake grads
    if sparsity:
        module_names = mod.MODULE_NAMES
        grads = []
        rng = np.random.default_rng(seed)
        for lp in dense["layers"]:
            grads.append({
                n: rng.random(np.asarray(lp[n]["w"]).shape).astype(np.float32)
                for n in module_names
            })
        return pipeline.quantize_model(
            "llama" if mod is llama else "opt", config, dense, bits=4,
            gradients_per_layer=grads, sensitivity=sparsity,
            nnz_pad_multiple=16,
        ), dense
    return pipeline.quantize_model(
        "llama" if mod is llama else "opt", config, dense, bits=4
    ), dense


def _llama_cfg(tp):
    return llama.LlamaConfig(
        vocab_size=64 * tp, hidden_size=16 * tp, intermediate_size=32 * tp,
        n_layers=2, n_heads=tp, n_kv_heads=tp, max_seq=32,
    )


@pytest.mark.parametrize("sparsity,bf", [(0.0, False), (0.02, False),
                                         (0.02, True)])
def test_llama_tp_matches_single_device(sparsity, bf):
    tp = 4
    config = _llama_cfg(tp)
    (specs, params), _ = _quantize_small(llama, config, sparsity=sparsity)

    # single-device reference
    jp = jax.tree.map(jnp.asarray, params)
    tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    cache0 = tpm.common.init_kv_cache(
        1, config.max_seq, config.n_layers, config.n_kv_heads, config.head_dim
    )
    ref_logits, ref_cache = jax.jit(
        lambda p, t, c: llama.prefill(config, specs, p, t, c, backend="xla")
    )(jp, tokens, cache0)
    ref_logits2, _ = jax.jit(
        lambda p, t, pos, c: llama.decode_step(config, specs, p, t, pos, c,
                                               backend="xla")
    )(jp, jnp.asarray([[5]], jnp.int32), jnp.asarray(4, jnp.int32), ref_cache)

    # shard_map TP (bf=True: per-shard spmv plans + pallas-interpret
    # sparse path on each shard)
    mesh = tpm.make_tp_mesh(tp)
    lspecs, sparams, pspecs = tpm.shard_model_params(
        "llama", config, specs, params, tp, build_spmv=bf
    )
    if bf:
        q = lspecs["layers"][0]["q"].quant
        assert q.sg_rows > 0
    dparams = tpm.put_params(sparams, pspecs, mesh)
    cache = tpm.init_tp_cache(config, mesh)
    prefill, decode = tpm.make_tp_step_fns(
        "llama", config, lspecs, pspecs, mesh,
        backend="pallas" if bf else "xla",
    )
    tp_logits, tp_cache = prefill(dparams, tokens, cache)
    np.testing.assert_allclose(np.asarray(tp_logits), np.asarray(ref_logits),
                               rtol=1e-4, atol=1e-4)
    tp_logits2, _ = decode(dparams, jnp.asarray([[5]], jnp.int32),
                           jnp.asarray(4, jnp.int32), tp_cache)
    np.testing.assert_allclose(np.asarray(tp_logits2), np.asarray(ref_logits2),
                               rtol=1e-4, atol=1e-4)


def test_opt_tp_biases_row_parallel():
    tp = 4
    config = opt.OPTConfig(
        vocab_size=64 * tp, hidden_size=16 * tp, ffn_dim=32 * tp,
        n_layers=2, n_heads=tp, max_seq=32,
    )
    dense = opt.random_dense_params(config, jax.random.PRNGKey(1))
    # nonzero biases so the 1/tp prescale is actually exercised
    rng = np.random.default_rng(0)
    for lp in dense["layers"]:
        for n in opt.MODULE_NAMES:
            lp[n]["b"] = jnp.asarray(
                rng.standard_normal(lp[n]["b"].shape).astype(np.float32) * 0.1
            )
    specs, params = pipeline.quantize_model("opt", config, dense, bits=4)

    jp = jax.tree.map(jnp.asarray, params)
    tokens = jnp.asarray([[1, 2, 3]], jnp.int32)
    cache0 = tpm.common.init_kv_cache(
        1, config.max_seq, config.n_layers, config.n_kv_heads, config.head_dim
    )
    ref_logits, _ = jax.jit(
        lambda p, t, c: opt.prefill(config, specs, p, t, c, backend="xla")
    )(jp, tokens, cache0)

    mesh = tpm.make_tp_mesh(tp)
    lspecs, sparams, pspecs = tpm.shard_model_params(
        "opt", config, specs, params, tp
    )
    dparams = tpm.put_params(sparams, pspecs, mesh)
    cache = tpm.init_tp_cache(config, mesh)
    prefill, _ = tpm.make_tp_step_fns("opt", config, lspecs, pspecs, mesh,
                                      backend="xla")
    tp_logits, _ = prefill(dparams, tokens, cache)
    np.testing.assert_allclose(np.asarray(tp_logits), np.asarray(ref_logits),
                               rtol=1e-4, atol=1e-4)


def test_topx_hybrid_sharding():
    """Hybrid topX channels survive column/row resharding."""
    from squeezellm_tpu.models.common import LinearSpec, apply_linear
    from squeezellm_tpu.ops.quant_linear import pack_linear

    tp = 4
    o, i, topx = 32, 64, 5
    rng = np.random.default_rng(3)
    w = rng.standard_normal((o, i)).astype(np.float32) * 0.1
    lut = np.sort(rng.standard_normal((o, 16)).astype(np.float32) * 0.1, axis=1)
    tw = rng.standard_normal((i, topx)).astype(np.float32) * 0.1
    ti = np.asarray([0, 7, 9, 17, 31], np.int32)
    qspec, qparams = pack_linear(w, lut, bits=4, topx_weights=tw, topx_indices=ti)
    lspec = LinearSpec(in_features=i, out_features=o, quant=qspec)

    x = rng.standard_normal((1, 1, i)).astype(np.float32)
    ref = apply_linear(lspec, jax.tree.map(jnp.asarray, qparams),
                       jnp.asarray(x), backend="xla")

    for name in ("q", "o"):  # column- and row-parallel
        local, sp, ps = tpm.shard_linear(name, lspec, qparams, tp)
        mesh = tpm.make_tp_mesh(tp)
        dp = tpm.put_params(sp, ps, mesh)
        col = name == "q"

        from functools import partial

        from jax.sharding import PartitionSpec as P

        xin = P(None, None, tpm.AXIS) if not col else P(None, None, None)

        @partial(jax.shard_map, mesh=mesh, in_specs=(ps, xin),
                 out_specs=P(None, None, None), check_vma=False)
        def f(p, xl, local=local, col=col):
            pl = tpm._unstack(p, ps)
            y = apply_linear(local, pl, xl, backend="xla")
            if col:
                y = jax.lax.all_gather(y, tpm.AXIS, axis=-1, tiled=True)
            else:
                y = jax.lax.psum(y, tpm.AXIS)
            return y

        got = f(dp, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_row_parallel_3bit_repack():
    """3-bit row split doesn't align to 10-codes/word boundaries — the
    repack path must preserve exact dequant numerics."""
    from squeezellm_tpu.models.common import LinearSpec, apply_linear
    from squeezellm_tpu.ops.quant_linear import pack_linear

    tp = 4
    o, i = 16, 80  # 80/4 = 20 inputs/shard; 20 % 10 == 0 but words differ
    rng = np.random.default_rng(4)
    w = rng.standard_normal((o, i)).astype(np.float32) * 0.1
    lut = np.sort(rng.standard_normal((o, 8)).astype(np.float32) * 0.1, axis=1)
    qspec, qparams = pack_linear(w, lut, bits=3)
    lspec = LinearSpec(in_features=i, out_features=o, quant=qspec)

    local, sp, ps = tpm.shard_linear("down", lspec, qparams, tp)
    assert local.quant.in_features == i // tp

    # each shard dequants to the right row block
    from squeezellm_tpu import formats

    full = formats.unpack_codes(np.asarray(qparams["qweight"]), 3, i)
    for s in range(tp):
        shard_codes = formats.unpack_codes(sp["qweight"][s], 3, i // tp)
        np.testing.assert_array_equal(
            shard_codes, full[s * (i // tp) : (s + 1) * (i // tp)]
        )
