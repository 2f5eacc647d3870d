"""Fisher grad^2 computation (JAX-native replacement for the reference's
external SqueezeLLM-gradients step, quantization/README.md:17-20)."""

import numpy as np

import jax

from squeezellm_tpu.models import llama, opt
from squeezellm_tpu.quantize import gradients, pipeline


def test_fisher_shapes_and_use_in_pipeline():
    config = llama.LlamaConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        n_layers=2, n_heads=4, n_kv_heads=4, max_seq=16,
    )
    dense = llama.random_dense_params(config, jax.random.PRNGKey(0))
    calib = np.random.default_rng(0).integers(0, 96, (4, 16)).astype(np.int32)
    g = gradients.compute_fisher("llama", config, dense, calib, batch_size=2)
    assert len(g) == config.n_layers
    for name in llama.MODULE_NAMES:
        assert g[0][name].shape == np.asarray(dense["layers"][0][name]["w"]).shape
        assert (g[0][name] >= 0).all()
    assert sum(float(g[li][n].sum()) for li in range(2)
               for n in llama.MODULE_NAMES) > 0
    # feeds straight into sensitivity-weighted quantization
    specs, params = pipeline.quantize_model(
        "llama", config, dense, bits=4, gradients_per_layer=g,
        sensitivity=0.01, nnz_pad_multiple=16, build_spmv=False,
    )
    assert specs["layers"][0]["q"].quant.nnz_pad > 0


def test_fisher_remat_matches_no_remat():
    config = llama.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        n_layers=1, n_heads=4, n_kv_heads=4, max_seq=16,
    )
    dense = llama.random_dense_params(config, jax.random.PRNGKey(1))
    calib = np.random.default_rng(1).integers(0, 64, (2, 16)).astype(np.int32)
    g1 = gradients.compute_fisher("llama", config, dense, calib, remat=True)
    g2 = gradients.compute_fisher("llama", config, dense, calib, remat=False)
    for name in llama.MODULE_NAMES:
        np.testing.assert_allclose(g1[0][name], g2[0][name], rtol=1e-5,
                                   atol=1e-8)


def test_fisher_opt():
    config = opt.OPTConfig(
        vocab_size=80, hidden_size=32, ffn_dim=64, n_layers=1, n_heads=4,
        max_seq=16,
    )
    dense = opt.random_dense_params(config, jax.random.PRNGKey(2))
    calib = np.random.default_rng(2).integers(0, 80, (2, 16)).astype(np.int32)
    g = gradients.compute_fisher("opt", config, dense, calib)
    assert set(g[0]) == set(opt.MODULE_NAMES)


def test_gradient_chunks_roundtrip(tmp_path):
    config = llama.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        n_layers=2, n_heads=4, n_kv_heads=4, max_seq=16,
    )
    dense = llama.random_dense_params(config, jax.random.PRNGKey(3))
    calib = np.random.default_rng(3).integers(0, 64, (2, 16)).astype(np.int32)
    g = gradients.compute_fisher("llama", config, dense, calib)
    gradients.save_gradient_chunks(g, str(tmp_path / "grads"), "llama")
    loaded = dict(np.load(tmp_path / "grads" / "layer_0.npz"))
    np.testing.assert_array_equal(loaded["q"], g[0]["q"])
