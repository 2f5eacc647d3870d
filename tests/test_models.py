import numpy as np
import pytest

import jax
import jax.numpy as jnp

from squeezellm_tpu.models import common, llama, opt, registry
from squeezellm_tpu.ops import quant_linear


TINY_LLAMA = llama.LlamaConfig(
    vocab_size=128, hidden_size=64, intermediate_size=128, n_layers=2,
    n_heads=4, n_kv_heads=2, max_seq=64, rms_eps=1e-6,
)
TINY_OPT = opt.OPTConfig(
    vocab_size=128, hidden_size=64, ffn_dim=128, n_layers=2, n_heads=4,
    max_seq=64,
)


def _hf_llama_logits(tokens):
    import torch
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    torch.manual_seed(0)
    hf_cfg = HFLlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-6, attn_implementation="eager",
    )
    m = LlamaForCausalLM(hf_cfg).eval().float()
    with torch.no_grad():
        out = m(torch.from_numpy(tokens).long()).logits.numpy()
    return m.state_dict(), out


def _hf_opt_logits(tokens):
    import torch
    from transformers import OPTConfig as HFOPTConfig
    from transformers import OPTForCausalLM

    torch.manual_seed(0)
    hf_cfg = HFOPTConfig(
        vocab_size=128, hidden_size=64, ffn_dim=128, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=64,
        word_embed_proj_dim=64, do_layer_norm_before=True,
        attn_implementation="eager",
    )
    m = OPTForCausalLM(hf_cfg).eval().float()
    with torch.no_grad():
        out = m(torch.from_numpy(tokens).long()).logits.numpy()
    return m.state_dict(), out


def test_llama_matches_hf_transformers():
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 128, size=(2, 12)).astype(np.int32)
    sd, hf_logits = _hf_llama_logits(tokens)
    params = llama.from_torch_state_dict(TINY_LLAMA, sd)
    specs = llama.dense_specs(TINY_LLAMA)
    ours = np.asarray(
        llama.forward(TINY_LLAMA, specs, params, jnp.asarray(tokens), backend="xla")
    )
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-4, atol=2e-4)


def test_opt_matches_hf_transformers():
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 128, size=(2, 12)).astype(np.int32)
    sd, hf_logits = _hf_opt_logits(tokens)
    params = opt.from_torch_state_dict(TINY_OPT, sd)
    specs = opt.dense_specs(TINY_OPT)
    ours = np.asarray(
        opt.forward(TINY_OPT, specs, params, jnp.asarray(tokens), backend="xla")
    )
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("mod,config", [(llama, TINY_LLAMA), (opt, TINY_OPT)])
def test_prefill_decode_matches_forward(mod, config):
    """prefill + decode_step logits must equal the full causal forward."""
    key = jax.random.PRNGKey(2)
    params = mod.random_dense_params(config, key)
    specs = mod.dense_specs(config)
    rng = np.random.default_rng(3)
    S = 10
    tokens = jnp.asarray(rng.integers(0, config.vocab_size, size=(1, S)), jnp.int32)

    full = mod.forward(config, specs, params, tokens, backend="xla")

    cache = common.init_kv_cache(1, config.max_seq, config.n_layers,
                                 config.n_kv_heads, config.head_dim)
    prompt_len = 6
    logits_p, cache = mod.prefill(config, specs, params, tokens[:, :prompt_len],
                                  cache, backend="xla")
    np.testing.assert_allclose(
        np.asarray(logits_p[:, 0]), np.asarray(full[:, prompt_len - 1]),
        rtol=1e-4, atol=1e-4,
    )
    for i in range(prompt_len, S):
        logits_d, cache = mod.decode_step(
            config, specs, params, tokens[:, i : i + 1], i, cache, backend="xla"
        )
        np.testing.assert_allclose(
            np.asarray(logits_d[:, 0]), np.asarray(full[:, i]),
            rtol=1e-4, atol=1e-4,
        )


def test_quantized_llama_forward_consistency():
    """A llama with 4-bit quantized linears must match the dense forward on
    the dequantized weights exactly (same math, different storage)."""
    key = jax.random.PRNGKey(4)
    params = llama.random_dense_params(TINY_LLAMA, key)
    specs = llama.dense_specs(TINY_LLAMA)

    bits = 4
    qspecs_layers = []
    qparams_layers = []
    deq_params = jax.tree.map(lambda x: x, params)  # shallow copy
    for li, (spec_d, p_d) in enumerate(zip(specs["layers"], params["layers"])):
        qs, qp = dict(spec_d), dict(p_d)
        for name in llama.MODULE_NAMES:
            w = np.asarray(p_d[name]["w"])
            lut = np.quantile(w, np.linspace(0, 1, 2**bits), axis=1).T.astype(
                np.float32
            )
            qspec, qparams = quant_linear.pack_linear(w, lut, bits=bits)
            qs[name] = common.LinearSpec(
                in_features=qspec.in_features, out_features=qspec.out_features,
                quant=qspec,
            )
            qp[name] = jax.tree.map(jnp.asarray, qparams)
            # dense model with the dequantized weight for ground truth
            from squeezellm_tpu import formats
            codes = formats.assign_codes(w, lut)
            deq = np.take_along_axis(lut, codes.astype(np.int64), axis=1)
            deq_params["layers"][li] = dict(deq_params["layers"][li])
            deq_params["layers"][li][name] = {"w": jnp.asarray(deq)}
        qspecs_layers.append(qs)
        qparams_layers.append(qp)

    qspecs = {"layers": tuple(qspecs_layers), "lm_head": specs["lm_head"]}
    qparams = dict(params)
    qparams["layers"] = qparams_layers

    rng = np.random.default_rng(5)
    tokens = jnp.asarray(rng.integers(0, 128, size=(1, 8)), jnp.int32)
    y_q = llama.forward(TINY_LLAMA, qspecs, qparams, tokens, backend="xla")
    y_d = llama.forward(TINY_LLAMA, specs, deq_params, tokens, backend="xla")
    np.testing.assert_allclose(np.asarray(y_q), np.asarray(y_d), rtol=1e-4, atol=1e-4)


def test_registry():
    assert registry.parse_model_type("models/opt-1.3b") == "opt"
    assert registry.parse_model_type("llama-2-7b") == "llama"
    assert registry.parse_model_type("foo", {"model_type": "mistral"}) == "mistral"
    assert registry.get_module_names("opt") == opt.MODULE_NAMES
    assert registry.get_module_names("llama") == llama.MODULE_NAMES
    assert registry.get_model_module("vicuna") is llama
    with pytest.raises(ValueError):
        registry.get_model_module("gpt2")


def test_mistral_sliding_window_mask():
    m = common.causal_mask(6, 6, sliding_window=3)[0, 0]
    m = np.asarray(m)
    assert m[5, 5] and m[5, 3] and not m[5, 2]  # window of 3
    assert not m[0, 1]  # causal
