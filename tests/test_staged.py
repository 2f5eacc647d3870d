"""Staged (chunk -> outlier-config -> nuq -> pack) pipeline: disk round-trip
equals the in-memory one-shot pipeline."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from squeezellm_tpu import checkpoint  # noqa: E402
from squeezellm_tpu.models import llama  # noqa: E402
from squeezellm_tpu.quantize import pipeline, staged  # noqa: E402

CFG = dict(
    vocab_size=96, hidden_size=64, intermediate_size=128,
    n_layers=2, n_heads=4, n_kv_heads=4, max_seq=32,
)


def _write_hf_dir(tmp_path, config, params):
    hf_cfg = {
        "model_type": "llama",
        "vocab_size": config.vocab_size,
        "hidden_size": config.hidden_size,
        "intermediate_size": config.intermediate_size,
        "num_hidden_layers": config.n_layers,
        "num_attention_heads": config.n_heads,
        "num_key_value_heads": config.n_kv_heads,
        "max_position_embeddings": config.max_seq,
        "rms_norm_eps": 1e-5,
    }
    d = tmp_path / "hf_model"
    d.mkdir()
    with open(d / "config.json", "w") as f:
        json.dump(hf_cfg, f)
    names = {
        "q": "self_attn.q_proj", "k": "self_attn.k_proj",
        "v": "self_attn.v_proj", "o": "self_attn.o_proj",
        "gate": "mlp.gate_proj", "up": "mlp.up_proj", "down": "mlp.down_proj",
    }
    sd = {"model.embed_tokens.weight": torch.tensor(np.asarray(params["embed"])),
          "model.norm.weight": torch.tensor(np.asarray(params["final_norm"])),
          "lm_head.weight": torch.tensor(np.asarray(params["lm_head"]["w"]))}
    for i, lp in enumerate(params["layers"]):
        p = f"model.layers.{i}."
        for n, hf in names.items():
            sd[p + hf + ".weight"] = torch.tensor(np.asarray(lp[n]["w"]))
        sd[p + "input_layernorm.weight"] = torch.tensor(np.asarray(lp["input_norm"]))
        sd[p + "post_attention_layernorm.weight"] = torch.tensor(
            np.asarray(lp["post_norm"]))
    torch.save(sd, d / "pytorch_model.bin")
    return str(d)


def test_staged_equals_oneshot(tmp_path):
    config = llama.LlamaConfig(**CFG)
    dense = llama.random_dense_params(config, jax.random.PRNGKey(0))
    hf_dir = _write_hf_dir(tmp_path, config, dense)

    chunks = str(tmp_path / "chunks")
    nuq_dir = str(tmp_path / "nuq")
    ckpt_dir = str(tmp_path / "ckpt")
    oc_json = str(tmp_path / "oc.json")

    n = staged.chunk_model(hf_dir, chunks)
    assert n == config.n_layers
    cfg = staged.make_outlier_config(chunks, 1.8, oc_json)
    assert cfg["outlier_threshold"] >= 0
    staged.nuq(chunks, nuq_dir, bits=4, outlier_config_json=oc_json)
    # resume: second call skips all layers without error
    staged.nuq(chunks, nuq_dir, bits=4, outlier_config_json=oc_json)
    staged.pack(hf_dir, nuq_dir, 4, ckpt_dir, build_spmv=False)

    model_type, config2, specs2, params2 = checkpoint.load_quantized(ckpt_dir)
    assert model_type == "llama"

    with open(oc_json) as f:
        thresholds = json.load(f)["outlier_config"]
    specs1, params1 = pipeline.quantize_model(
        "llama", config, dense, bits=4, outlier_config=thresholds,
        build_spmv=False,
    )
    # identical packed tensors module-by-module
    for li in range(config.n_layers):
        for name in llama.MODULE_NAMES:
            for key in params1["layers"][li][name]:
                np.testing.assert_array_equal(
                    np.asarray(params1["layers"][li][name][key]),
                    np.asarray(params2["layers"][li][name][key]),
                    err_msg=f"layer {li} {name} {key}",
                )
    # and the loaded model evaluates
    tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    logits = llama.forward(config2, specs2, params2, tokens, backend="xla")
    assert np.isfinite(np.asarray(logits)).all()
