"""Quantized checkpoint format: an explicit manifest + per-layer npz shards.

Replaces the reference's single torch state-dict with magic
``sparse_threshold.*`` sentinel keys and filename-substring model detection
(reference quantization/pack.py:173-190, llama.py:137-169) with a
self-describing directory:

  ckpt_dir/
    manifest.json   format version, model_type, wbits, config, per-module
                    sparse sizes / topx / bias flags
    globals.npz     embeddings, final norm, lm_head
    layer_XXX.npz   per-module packed tensors + layer norms

Per-layer shards keep the offline pipeline resumable (the reference resumes
per-layer too, nuq.py:131-133) and let multi-host loaders read only their
shard.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Tuple

import numpy as np

from squeezellm_tpu.models import registry
from squeezellm_tpu.models.common import LinearSpec
from squeezellm_tpu.ops.quant_linear import QuantLinearSpec

FORMAT_NAME = "squeezellm-tpu"
FORMAT_VERSION = 1

def _flatten(d: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in d.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "."))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k, v in flat.items():
        parts = k.split(".")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return out


def save_quantized(path: str, model_type: str, config, specs, params) -> None:
    os.makedirs(path, exist_ok=True)
    n_layers = len(params["layers"])
    module_meta = {}
    for li, (spec_d, _) in enumerate(zip(specs["layers"], params["layers"])):
        for name, spec in spec_d.items():
            if not isinstance(spec, LinearSpec):
                continue
            meta = {"has_bias": spec.has_bias}
            if spec.is_quant:
                q = spec.quant
                meta.update(
                    quant=True, bits=q.bits, nnz_pad=q.nnz_pad, topx=q.topx,
                    sg_rows=q.sg_rows, sg_oh=q.sg_oh, sg_ih=q.sg_ih,
                )
            else:
                meta["quant"] = False
            module_meta[f"{li}.{name}"] = meta

    head_spec = specs.get("lm_head")
    if head_spec is not None and getattr(head_spec, "is_quant", False):
        q = head_spec.quant
        module_meta["lm_head"] = {
            "has_bias": head_spec.has_bias, "quant": True, "bits": q.bits,
            "nnz_pad": q.nnz_pad, "topx": q.topx, "sg_rows": q.sg_rows,
            "sg_oh": q.sg_oh, "sg_ih": q.sg_ih,
        }

    wbits = None
    for m in module_meta.values():
        if m.get("quant"):
            wbits = m["bits"]
            break

    manifest = {
        "format": FORMAT_NAME,
        "version": FORMAT_VERSION,
        "model_type": model_type,
        "wbits": wbits,
        "n_layers": n_layers,
        "config": dataclasses.asdict(config),
        "modules": module_meta,
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)

    g = {k: v for k, v in params.items() if k != "layers"}
    np.savez(os.path.join(path, "globals.npz"), **_flatten(g))
    for li, layer in enumerate(params["layers"]):
        np.savez(os.path.join(path, f"layer_{li:03d}.npz"), **_flatten(layer))


def load_quantized(path: str, to_device: bool = True) -> Tuple[str, Any, Any, Any]:
    """Returns (model_type, config, specs, params)."""
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    if manifest.get("format") != FORMAT_NAME:
        raise ValueError(f"{path}: not a {FORMAT_NAME} checkpoint")

    model_type = manifest["model_type"]
    mod = registry.get_model_module(model_type)
    config_cls = mod.LlamaConfig if hasattr(mod, "LlamaConfig") else mod.OPTConfig
    config = config_cls(**manifest["config"])

    gflat = dict(np.load(os.path.join(path, "globals.npz")))
    params: Dict[str, Any] = _unflatten(gflat)
    params["layers"] = []
    spec_layers = []
    shapes = config.linear_shapes()
    for li in range(manifest["n_layers"]):
        flat = dict(np.load(os.path.join(path, f"layer_{li:03d}.npz")))
        layer = _unflatten(flat)
        params["layers"].append(layer)
        spec_d = {}
        for name in registry.get_module_names(model_type):
            meta = manifest["modules"][f"{li}.{name}"]
            o, i = shapes[name]
            if meta["quant"]:
                qspec = QuantLinearSpec(
                    bits=meta["bits"], in_features=i, out_features=o,
                    has_bias=meta["has_bias"], nnz_pad=meta["nnz_pad"],
                    topx=meta["topx"], sg_rows=meta.get("sg_rows", 0),
                    sg_oh=meta.get("sg_oh", 0), sg_ih=meta.get("sg_ih", 0),
                )
                spec_d[name] = LinearSpec(
                    in_features=i, out_features=o, has_bias=meta["has_bias"],
                    quant=qspec,
                )
            else:
                spec_d[name] = LinearSpec(
                    in_features=i, out_features=o, has_bias=meta["has_bias"]
                )
        spec_layers.append(spec_d)
    head_meta = manifest["modules"].get("lm_head")
    if head_meta and head_meta.get("quant"):
        hq = QuantLinearSpec(
            bits=head_meta["bits"], in_features=config.hidden_size,
            out_features=config.vocab_size, has_bias=head_meta["has_bias"],
            nnz_pad=head_meta["nnz_pad"], topx=head_meta["topx"],
            sg_rows=head_meta.get("sg_rows", 0),
            sg_oh=head_meta.get("sg_oh", 0), sg_ih=head_meta.get("sg_ih", 0),
        )
        lm_head_spec = LinearSpec(
            in_features=config.hidden_size, out_features=config.vocab_size,
            has_bias=head_meta["has_bias"], quant=hq,
        )
    else:
        lm_head_spec = LinearSpec(
            in_features=config.hidden_size, out_features=config.vocab_size
        )
    specs = {
        "layers": tuple(spec_layers),
        "lm_head": lm_head_spec,
    }
    if to_device:
        import jax
        import jax.numpy as jnp

        params = jax.tree.map(jnp.asarray, params)
    return model_type, config, specs, params
