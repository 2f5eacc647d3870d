"""Loading dense HF checkpoints (for quantization input and fp16 baselines).

Only used offline: the engine itself has no transformers dependency.
"""

from __future__ import annotations

import glob
import os
from typing import Tuple

from squeezellm_tpu.models import registry


def load_dense_state_dict(model_dir: str) -> dict:
    """Load a torch/safetensors state dict from an HF model directory."""
    safes = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    if safes:
        from safetensors import safe_open

        sd = {}
        for path in safes:
            with safe_open(path, framework="np") as f:
                for k in f.keys():
                    sd[k] = f.get_tensor(k)
        return sd
    bins = sorted(
        glob.glob(os.path.join(model_dir, "pytorch_model*.bin"))
    ) or sorted(glob.glob(os.path.join(model_dir, "*.pt")))
    if bins:
        import torch

        sd = {}
        for path in bins:
            sd.update(torch.load(path, map_location="cpu", weights_only=True))
        return sd
    raise FileNotFoundError(f"no weights (*.safetensors / pytorch_model*.bin) in {model_dir}")


def load_dense_model(model_dir: str, dtype=None) -> Tuple[str, object, dict, dict]:
    """HF model dir -> (model_type, config, specs, params) dense trees."""
    import jax.numpy as jnp

    model_type, config = registry.load_config(model_dir)
    mod = registry.get_model_module(model_type)
    sd = load_dense_state_dict(model_dir)
    params = mod.from_torch_state_dict(config, sd, dtype or jnp.float32)
    return model_type, config, mod.dense_specs(config), params


def load_tokenizer(model_dir: str):
    # XGen: prefer the in-tree tiktoken-compatible implementation over
    # AutoTokenizer's trust_remote_code path (utils/xgen_tokenizer.py —
    # replaces the reference's vendored tokenization_xgen.py)
    if any(os.path.exists(os.path.join(model_dir, f))
           for f in ("gpt2.tiktoken", "encoder.json")):
        from squeezellm_tpu.utils.xgen_tokenizer import XgenTokenizer

        return XgenTokenizer.from_assets(model_dir)
    if not has_tokenizer(model_dir):
        raise FileNotFoundError(
            f"no tokenizer assets in {model_dir!r}. The models/ zoo ships "
            "config.json only (tokenizer files are download-blocked and "
            "license-encumbered — see models/README.md): drop in "
            "tokenizer.model (llama/vicuna/mistral), vocab.json + "
            "merges.txt (opt), or gpt2.tiktoken/encoder.json (xgen) from "
            "the family's HF repo. Token-ID workflows (quantize, "
            "benchmark, serve-bench, prompt_tokens) need no tokenizer.")
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(model_dir, use_fast=False,
                                         trust_remote_code=True)


def has_tokenizer(model_dir: str) -> bool:
    return any(
        os.path.exists(os.path.join(model_dir, f))
        for f in ("tokenizer.model", "tokenizer.json", "vocab.json",
                  "gpt2.tiktoken", "encoder.json")
    )
