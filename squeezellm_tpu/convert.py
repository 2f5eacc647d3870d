"""Converter: reference SqueezeLLM packed checkpoints (.pt) -> our format.

Ingests the on-disk contract of the reference's QuantLinearLUT buffers
(reference squeezellm/quant.py:48-95, saved by quantization/pack.py:173-190):

  <prefix>.qweight        int32 (in//32*bits, out)  reference packing layout
  <prefix>.lookup_table   f32   (out, 2**bits)
  <prefix>.rows/cols/vals CSR sparse sidecar (already zero-corrected)
  <prefix>.full_rows/full_row_indices   hybrid top-X dense channels
  sparse_threshold.<name> per-module nnz sentinel keys

and re-packs into the TPU-native layout (formats.pack_codes) + manifest
checkpoint (checkpoint.save_quantized). The 3-bit cross-word bit-spill is
unpacked exactly (formats.unpack_codes_ref).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from squeezellm_tpu import checkpoint, formats
from squeezellm_tpu.models import registry
from squeezellm_tpu.models.common import LinearSpec
from squeezellm_tpu.ops.quant_linear import QuantLinearSpec

_LLAMA_MODULES = {
    "q": "self_attn.q_proj",
    "k": "self_attn.k_proj",
    "v": "self_attn.v_proj",
    "o": "self_attn.o_proj",
    "gate": "mlp.gate_proj",
    "up": "mlp.up_proj",
    "down": "mlp.down_proj",
}
_OPT_MODULES = {
    "q": "self_attn.q_proj",
    "k": "self_attn.k_proj",
    "v": "self_attn.v_proj",
    "o": "self_attn.out_proj",
    "up": "fc1",
    "down": "fc2",
}


def _to_np(t):
    if hasattr(t, "detach"):
        return t.detach().to("cpu").numpy()
    return np.asarray(t)


def convert_state_dict(
    sd: Dict[str, np.ndarray],
    model_type: str,
    config,
    wbits: int,
    nnz_pad_multiple: int = 512,
):
    """Reference state dict -> (specs, params) trees. sd values may be torch
    tensors or numpy arrays."""
    sd = {k: _to_np(v) for k, v in sd.items()}
    sd.pop("model.rotary_emb.inv_freq", None)

    is_opt = model_type == "opt"
    module_map = _OPT_MODULES if is_opt else _LLAMA_MODULES
    layer_prefix = "model.decoder.layers" if is_opt else "model.layers"
    shapes = config.linear_shapes()

    spec_layers = []
    param_layers = []
    for li in range(config.n_layers):
        spec_d = {}
        param_d = {}
        for name, hf in module_map.items():
            p = f"{layer_prefix}.{li}.{hf}."
            out_f, in_f = shapes[name]
            qweight_ref = sd[p + "qweight"]
            codes = formats.unpack_codes_ref(qweight_ref, wbits, in_f)
            params = {
                "qweight": formats.pack_codes(codes, wbits),
                "lut": sd[p + "lookup_table"].astype(np.float32),
            }
            has_bias = (p + "bias") in sd
            if has_bias:
                params["bias"] = sd[p + "bias"].astype(np.float32)
            nnz_pad = 0
            if (p + "rows") in sd:
                coo = formats.SparseCOO.from_csr(
                    sd[p + "rows"], sd[p + "cols"], sd[p + "vals"], in_f,
                    pad_multiple=nnz_pad_multiple,
                )
                params["sp_rows"] = coo.rows
                params["sp_cols"] = coo.cols
                params["sp_vals"] = coo.vals
                nnz_pad = len(coo.vals)
            topx = 0
            if (p + "full_rows") in sd and sd[p + "full_rows"].size:
                params["topx_weights"] = sd[p + "full_rows"].astype(np.float32)
                params["topx_indices"] = sd[p + "full_row_indices"].astype(np.int32)
                topx = params["topx_indices"].shape[0]
            qspec = QuantLinearSpec(
                bits=wbits, in_features=in_f, out_features=out_f,
                has_bias=has_bias, nnz_pad=nnz_pad, topx=topx,
            )
            spec_d[name] = LinearSpec(
                in_features=in_f, out_features=out_f, has_bias=has_bias,
                quant=qspec,
            )
            param_d[name] = params

        lp = f"{layer_prefix}.{li}."
        if is_opt:
            param_d["attn_norm"] = {
                "w": sd[lp + "self_attn_layer_norm.weight"].astype(np.float32),
                "b": sd[lp + "self_attn_layer_norm.bias"].astype(np.float32),
            }
            param_d["ffn_norm"] = {
                "w": sd[lp + "final_layer_norm.weight"].astype(np.float32),
                "b": sd[lp + "final_layer_norm.bias"].astype(np.float32),
            }
        else:
            param_d["input_norm"] = sd[lp + "input_layernorm.weight"].astype(np.float32)
            param_d["post_norm"] = sd[lp + "post_attention_layernorm.weight"].astype(
                np.float32
            )
        spec_layers.append(spec_d)
        param_layers.append(param_d)

    if is_opt:
        embed = sd["model.decoder.embed_tokens.weight"].astype(np.float32)
        params_top = {
            "embed": embed,
            "embed_pos": sd["model.decoder.embed_positions.weight"].astype(np.float32),
            "final_norm": {
                "w": sd["model.decoder.final_layer_norm.weight"].astype(np.float32),
                "b": sd["model.decoder.final_layer_norm.bias"].astype(np.float32),
            },
            "lm_head": {"w": sd.get("lm_head.weight", embed).astype(np.float32)},
        }
    else:
        embed = sd["model.embed_tokens.weight"].astype(np.float32)
        params_top = {
            "embed": embed,
            "final_norm": sd["model.norm.weight"].astype(np.float32),
            "lm_head": {"w": sd.get("lm_head.weight", embed).astype(np.float32)},
        }
    params_top["layers"] = param_layers

    mod = registry.get_model_module(model_type)
    dense = mod.dense_specs(config)
    specs = {"layers": tuple(spec_layers), "lm_head": dense["lm_head"]}
    return specs, params_top


def convert_reference_checkpoint(
    ckpt_path: str,
    model_dir: str,
    wbits: int,
    out_path: str,
    model_type: Optional[str] = None,
    nnz_pad_multiple: int = 512,
    build_spmv: bool = True,
) -> None:
    """Load a reference .pt checkpoint + HF model dir (config.json) and write
    a squeezellm-tpu checkpoint. Replaces load_quant's filename-substring
    detection (reference llama.py:136-186) with explicit config."""
    import torch

    detected_type, config = registry.load_config(model_dir)
    model_type = model_type or detected_type
    sd = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    # sparse_threshold.* sentinels are metadata only — sizes are recomputed.
    sd = {k: v for k, v in sd.items() if not k.startswith("sparse_threshold.")}
    specs, params = convert_state_dict(
        sd, model_type, config, wbits, nnz_pad_multiple=nnz_pad_multiple
    )
    if build_spmv:
        from squeezellm_tpu.ops import spmv

        specs, params = spmv.prepare_model(
            specs, params, registry.get_module_names(model_type), processes=1
        )
    checkpoint.save_quantized(out_path, model_type, config, specs, params)
