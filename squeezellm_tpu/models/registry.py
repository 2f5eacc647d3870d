"""Architecture adapter: model-type -> functional implementation.

The TPU-native analogue of the reference's model_parse.py (parse_model /
get_module_names / get_modules, reference squeezellm/model_parse.py:19-129),
as a registry over pure-functional model modules instead of HF module-tree
accessors.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from squeezellm_tpu.models import llama as llama_mod
from squeezellm_tpu.models import opt as opt_mod

# mistral/vicuna/xgen are llama-architecture variants (different configs).
_REGISTRY = {
    "llama": llama_mod,
    "mistral": llama_mod,
    "vicuna": llama_mod,
    "xgen": llama_mod,
    "opt": opt_mod,
}


def get_model_module(model_type: str):
    if model_type not in _REGISTRY:
        raise ValueError(
            f"unknown model type {model_type!r}; known: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[model_type]


def parse_model_type(name_or_path: str, hf_config: Optional[dict] = None) -> str:
    """Infer model type from an HF config dict (preferred) or the path name
    (reference behavior, model_parse.py:19-29 + llama.py:137-143)."""
    if hf_config is not None and "model_type" in hf_config:
        mt = hf_config["model_type"]
        if mt in _REGISTRY:
            return mt
        if mt in ("llama", "llama2"):
            return "llama"
    low = str(name_or_path).lower()
    for t in ("opt", "mistral", "xgen", "vicuna"):
        if t in low:
            return t
    return "llama"


def get_module_names(model_type: str):
    """Quantizable module short-names (matches reference get_module_names)."""
    return get_model_module(model_type).MODULE_NAMES


def load_config(model_dir: str):
    """Load (model_type, config) from an HF-style model dir with config.json
    (works with the reference's models/ zoo layout)."""
    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    model_type = parse_model_type(model_dir, hf)
    mod = get_model_module(model_type)
    if mod is opt_mod:
        return model_type, opt_mod.OPTConfig.from_hf_config(hf)
    return model_type, llama_mod.LlamaConfig.from_hf_config(hf)
