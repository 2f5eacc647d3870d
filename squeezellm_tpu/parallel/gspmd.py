"""GSPMD tensor/data-parallel sharding for quantized models.

The reference is strictly single-GPU (SURVEY §2.4); this module is new
capability: packed weights, LUTs and KV caches are sharded over a
('dp', 'tp') device mesh with NamedSharding annotations and jit — XLA
inserts the all-reduce/all-gather collectives over ICI.

Sharding plan (Megatron-style column/row parallel):
  q,k,v,gate,up (column-parallel): qweight (nw, out) -> P(None, 'tp');
      lut (out, K) -> P('tp', None); bias -> P('tp')
  o,down (row-parallel): qweight (nw, out) -> P('tp', None) — packing is
      along the input dim, so sharding words == sharding inputs; lut/bias
      replicated (XLA reduces the partial products)
  sparse COO sidecars: replicated (0.05-0.45%% nnz — negligible bytes);
      the scatter-add stays correct under GSPMD
  embed / norms: replicated; lm_head: column-parallel over vocab
  KV cache: P("dp", None, "tp") — batch over dp, head-flat KV over tp

Works with the XLA backend end-to-end. (The fused Pallas kernel does not
auto-partition under GSPMD; the explicit shard_map path in
parallel/tp_shard_map.py covers that.)
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from squeezellm_tpu.models import registry
from squeezellm_tpu.models.common import LinearSpec

# column-parallel (shard output channels) vs row-parallel (shard inputs)
_COLUMN = {"q", "k", "v", "gate", "up"}
_ROW = {"o", "down"}


def make_mesh(tp: int, dp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if len(devices) < tp * dp:
        raise ValueError(f"need {tp * dp} devices, have {len(devices)}")
    arr = np.asarray(devices[: tp * dp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def _linear_spec_pspec(name: str, spec: LinearSpec) -> dict:
    """PartitionSpec tree for one linear's params."""
    col = name in _COLUMN or name == "lm_head"
    if not spec.is_quant:
        # dense w: (out, in)
        if col:
            out = {"w": P("tp", None)}
        else:
            out = {"w": P(None, "tp")}
        if spec.has_bias:
            out["b"] = P("tp") if col else P()
        return out
    out = {}
    if col:
        out["qweight"] = P(None, "tp")
        out["lut"] = P("tp", None)
        if spec.has_bias:
            out["bias"] = P("tp")
    else:
        out["qweight"] = P("tp", None)
        out["lut"] = P()
        if spec.has_bias:
            out["bias"] = P()
    q = spec.quant
    if q.nnz_pad:
        out["sp_rows"] = P()
        out["sp_cols"] = P()
        out["sp_vals"] = P()
    if q.topx:
        out["topx_weights"] = P("tp", None) if not col else P(None, None)
        out["topx_indices"] = P()
    return out


def param_partition_specs(model_type: str, config, specs, params) -> dict:
    """PartitionSpec pytree matching the params structure."""
    module_names = set(registry.get_module_names(model_type))

    def replicate_tree(t):
        return jax.tree.map(lambda _: P(), t)

    out = {}
    for k, v in params.items():
        if k == "layers":
            continue
        if k == "lm_head":
            out[k] = {"w": P("tp", None)}
        else:
            out[k] = replicate_tree(v)
    layers = []
    for spec_d, param_d in zip(specs["layers"], params["layers"]):
        ld = {}
        for name, v in param_d.items():
            if name in module_names:
                ld[name] = _linear_spec_pspec(name, spec_d[name])
            else:
                ld[name] = replicate_tree(v)
        layers.append(ld)
    out["layers"] = layers
    return out


def cache_partition_specs(cache) -> list:
    # token-major cache (B, S, H_kv*D): batch over dp, the head-flat last
    # axis over tp (a contiguous KV/t block per device = its head group)
    return [{"k": P("dp", None, "tp"), "v": P("dp", None, "tp")}
            for _ in cache]


def shard_params(params, pspecs, mesh: Mesh):
    """device_put the params pytree with the given PartitionSpecs."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, pspecs
    )


def validate_shardable(model_type: str, config, tp: int) -> Optional[str]:
    """Check divisibility constraints; returns an error string or None."""
    if config.n_heads % tp:
        return f"n_heads {config.n_heads} % tp {tp} != 0"
    if config.n_kv_heads % tp:
        return f"n_kv_heads {config.n_kv_heads} % tp {tp} != 0"
    inter = getattr(config, "intermediate_size", getattr(config, "ffn_dim", 0))
    if inter % tp:
        return f"intermediate {inter} % tp {tp} != 0"
    if config.vocab_size % tp:
        return f"vocab {config.vocab_size} % tp {tp} != 0"
    return None
