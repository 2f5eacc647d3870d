"""Decode-time q|k|v / gate|up fusion equals the unfused model."""

import numpy as np

import jax
import jax.numpy as jnp

from squeezellm_tpu.models import common, fuse, llama, opt
from squeezellm_tpu.quantize import pipeline


def _sparse_quantized(mod, config, model_type, seed=0):
    dense = mod.random_dense_params(config, jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed)
    grads = [
        {n: rng.random(np.asarray(lp[n]["w"]).shape).astype(np.float32)
         for n in mod.MODULE_NAMES}
        for lp in dense["layers"]
    ]
    return pipeline.quantize_model(
        model_type, config, dense, bits=4, gradients_per_layer=grads,
        sensitivity=0.02, nnz_pad_multiple=16,
    )


def test_llama_fused_matches_unfused():
    config = llama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        n_layers=2, n_heads=4, n_kv_heads=2, max_seq=32,
    )
    specs, params = _sparse_quantized(llama, config, "llama")
    fspecs, fparams = fuse.fuse_for_decode("llama", specs, params)
    assert "qkv" in fspecs["layers"][0] and "gateup" in fspecs["layers"][0]
    assert fspecs["layers"][0]["qkv"].quant.sg_rows > 0

    jp = jax.tree.map(jnp.asarray, params)
    fp = jax.tree.map(jnp.asarray, fparams)
    tokens = jnp.asarray([[5, 7, 11]], jnp.int32)
    y1 = llama.forward(config, specs, jp, tokens, backend="xla")
    y2 = llama.forward(config, fspecs, fp, tokens, backend="xla")
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), rtol=1e-4,
                               atol=1e-5)
    # decode path with cache + pallas(interpret) gather-spmv sparse
    cache = common.init_kv_cache(1, config.max_seq, config.n_layers,
                                 config.n_kv_heads, config.head_dim)
    l1, _ = llama.decode_step(config, specs, jp, jnp.asarray([[3]], jnp.int32),
                              jnp.asarray(0, jnp.int32), cache, backend="xla")
    l2, _ = llama.decode_step(config, fspecs, fp, jnp.asarray([[3]], jnp.int32),
                              jnp.asarray(0, jnp.int32), cache,
                              backend="pallas")
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), rtol=2e-3,
                               atol=2e-4)


def test_transposed_decode_path_matches():
    """attach_decode_luts(transposed=True) routes 4-bit decode through
    lut_matmul_t (qweight_t/lut_w) and must be numerically identical."""
    config = llama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        n_layers=2, n_heads=4, n_kv_heads=2, max_seq=32,
    )
    specs, params = _sparse_quantized(llama, config, "llama")
    tspecs, tparams = fuse.attach_decode_luts(specs, params, transposed=True)
    assert "qweight_t" in tparams["layers"][0]["q"]
    jp = jax.tree.map(jnp.asarray, params)
    tp = jax.tree.map(jnp.asarray, tparams)
    cache = common.init_kv_cache(1, config.max_seq, config.n_layers,
                                 config.n_kv_heads, config.head_dim)
    l1, _ = llama.decode_step(config, specs, jp, jnp.asarray([[3]], jnp.int32),
                              jnp.asarray(0, jnp.int32), cache, backend="xla")
    l2, _ = llama.decode_step(config, tspecs, tp, jnp.asarray([[3]], jnp.int32),
                              jnp.asarray(0, jnp.int32), cache,
                              backend="pallas")
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), rtol=2e-3,
                               atol=2e-4)


def test_opt_fused_matches_unfused():
    config = opt.OPTConfig(
        vocab_size=96, hidden_size=64, ffn_dim=128, n_layers=1, n_heads=4,
        max_seq=32,
    )
    specs, params = _sparse_quantized(opt, config, "opt")
    fspecs, fparams = fuse.fuse_for_decode("opt", specs, params)
    assert "qkv" in fspecs["layers"][0]
    jp = jax.tree.map(jnp.asarray, params)
    fp = jax.tree.map(jnp.asarray, fparams)
    tokens = jnp.asarray([[5, 7, 11]], jnp.int32)
    y1 = opt.forward(config, specs, jp, tokens, backend="xla")
    y2 = opt.forward(config, fspecs, fp, tokens, backend="xla")
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), rtol=1e-4,
                               atol=1e-5)


def test_fuse_preserves_hybrid_topx():
    """Fused q|k|v / gate|up linears carry the members' hybrid top-X
    channels (indices moved to the fused output space): fused and
    unfused decode logits must agree. Round-4 change — the earlier
    _fusable excluded topX linears, so every published sparse sq-*
    checkpoint (topX=10, reference llama.py:301-306) lost fusion."""
    import dataclasses

    import numpy as np

    import jax
    import jax.numpy as jnp

    from squeezellm_tpu.models import common, fuse, llama
    from squeezellm_tpu.quantize import pipeline

    config = llama.LlamaConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128, n_layers=2,
        n_heads=4, n_kv_heads=2, max_seq=32)
    dense = llama.random_dense_params(config, jax.random.PRNGKey(0))
    specs, params = pipeline.quantize_model("llama", config, dense, bits=4)
    rng = np.random.default_rng(5)
    # attach topX=3 hybrid channels to every layer linear
    sl = []
    for sd, pd in zip(specs["layers"], params["layers"]):
        sd = dict(sd)
        for name, ls in list(sd.items()):
            q = getattr(ls, "quant", None)
            if q is None:
                continue
            pd[name]["topx_weights"] = rng.standard_normal(
                (q.in_features, 3)).astype(np.float32) * 0.1
            pd[name]["topx_indices"] = rng.choice(
                q.out_features, 3, replace=False).astype(np.int32)
            sd[name] = dataclasses.replace(
                ls, quant=dataclasses.replace(q, topx=3))
        sl.append(sd)
    specs = dict(specs, layers=tuple(sl))

    fspecs, fparams = fuse.fuse_for_decode("llama", specs, params)
    assert any("qkv" in d for d in fspecs["layers"]), "fusion must engage"
    assert fspecs["layers"][0]["qkv"].quant.topx == 9  # 3 members x 3

    tok = jnp.asarray([[7]], jnp.int32)
    pos = jnp.asarray(2, jnp.int32)

    def mk():
        return common.init_kv_cache(1, config.max_seq, config.n_layers,
                                    config.n_kv_heads, config.head_dim)

    l1, _ = llama.decode_step(config, specs, params, tok, pos, mk(),
                              backend="xla")
    l2, _ = llama.decode_step(config, fspecs, fparams, tok, pos, mk(),
                              backend="xla")
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), rtol=2e-5,
                               atol=2e-5)
