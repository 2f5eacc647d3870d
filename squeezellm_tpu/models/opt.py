"""Functional OPT decoder (OPT 1.3B - 30B).

Covers the reference's opt family (reference squeezellm/model_parse.py:40-49:
modules q,k,v,o(out_proj),up(fc1),down(fc2)). Pre-LN architecture with
learned positional embeddings (HF offset +2) and ReLU MLP.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from squeezellm_tpu.models import common
from squeezellm_tpu.models.common import LinearSpec

MODULE_NAMES = ("q", "k", "v", "o", "up", "down")
_POS_OFFSET = 2  # HF OPTLearnedPositionalEmbedding offset


@dataclasses.dataclass(frozen=True)
class OPTConfig:
    vocab_size: int = 50272
    hidden_size: int = 2048
    ffn_dim: int = 8192
    n_layers: int = 24
    n_heads: int = 32
    max_seq: int = 2048
    ln_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.n_heads

    @property
    def n_kv_heads(self) -> int:
        return self.n_heads

    def linear_shapes(self) -> Dict[str, Tuple[int, int]]:
        h = self.hidden_size
        return {
            "q": (h, h),
            "k": (h, h),
            "v": (h, h),
            "o": (h, h),
            "up": (self.ffn_dim, h),
            "down": (h, self.ffn_dim),
        }

    @staticmethod
    def from_hf_config(d: dict) -> "OPTConfig":
        assert d.get("word_embed_proj_dim", d["hidden_size"]) == d["hidden_size"], (
            "OPT variants with embedding projection are not supported"
        )
        assert d.get("do_layer_norm_before", True), "post-LN OPT not supported"
        return OPTConfig(
            vocab_size=d["vocab_size"],
            hidden_size=d["hidden_size"],
            ffn_dim=d["ffn_dim"],
            n_layers=d["num_hidden_layers"],
            n_heads=d["num_attention_heads"],
            max_seq=d.get("max_position_embeddings", 2048),
            ln_eps=1e-5,
        )


def dense_specs(config: OPTConfig) -> dict:
    shapes = config.linear_shapes()
    layer = {
        name: LinearSpec(in_features=i, out_features=o, has_bias=True)
        for name, (o, i) in shapes.items()
    }
    return {
        "layers": tuple(dict(layer) for _ in range(config.n_layers)),
        "lm_head": LinearSpec(
            in_features=config.hidden_size, out_features=config.vocab_size
        ),
    }


def random_dense_params(config: OPTConfig, key, dtype=jnp.float32) -> dict:
    shapes = config.linear_shapes()
    keys = jax.random.split(key, config.n_layers + 3)

    def lin(k, o, i):
        # float(): a np scalar multiplier would promote bf16 weights to f32
        return {
            "w": jax.random.normal(k, (o, i), dtype) * float(0.5 / np.sqrt(i)),
            "b": jnp.zeros((o,), dtype),
        }

    layers = []
    h = config.hidden_size
    for li in range(config.n_layers):
        ks = jax.random.split(keys[li], len(shapes))
        d = {n: lin(k, o, i) for k, (n, (o, i)) in zip(ks, shapes.items())}
        d["attn_norm"] = {"w": jnp.ones((h,), dtype), "b": jnp.zeros((h,), dtype)}
        d["ffn_norm"] = {"w": jnp.ones((h,), dtype), "b": jnp.zeros((h,), dtype)}
        layers.append(d)
    return {
        "embed": jax.random.normal(keys[-3], (config.vocab_size, h), dtype) * 0.02,
        "embed_pos": jax.random.normal(
            keys[-2], (config.max_seq + _POS_OFFSET, h), dtype
        ) * 0.02,
        "layers": layers,
        "final_norm": {"w": jnp.ones((h,), dtype), "b": jnp.zeros((h,), dtype)},
        "lm_head": {"w": jax.random.normal(keys[-1], (config.vocab_size, h), dtype) * 0.02},
    }


def from_torch_state_dict(config: OPTConfig, sd, dtype=jnp.float32) -> dict:
    def g(name):
        t = sd[name]
        if hasattr(t, "detach"):
            t = t.detach().to("cpu").float().numpy()
        return jnp.asarray(np.asarray(t), dtype)

    hf_names = {
        "q": "self_attn.q_proj",
        "k": "self_attn.k_proj",
        "v": "self_attn.v_proj",
        "o": "self_attn.out_proj",
        "up": "fc1",
        "down": "fc2",
    }
    layers = []
    for i in range(config.n_layers):
        p = f"model.decoder.layers.{i}."
        d = {
            n: {"w": g(p + hf + ".weight"), "b": g(p + hf + ".bias")}
            for n, hf in hf_names.items()
        }
        d["attn_norm"] = {
            "w": g(p + "self_attn_layer_norm.weight"),
            "b": g(p + "self_attn_layer_norm.bias"),
        }
        d["ffn_norm"] = {
            "w": g(p + "final_layer_norm.weight"),
            "b": g(p + "final_layer_norm.bias"),
        }
        layers.append(d)
    embed = g("model.decoder.embed_tokens.weight")
    lm_head = g("lm_head.weight") if "lm_head.weight" in sd else embed
    return {
        "embed": embed,
        "embed_pos": g("model.decoder.embed_positions.weight"),
        "layers": layers,
        "final_norm": {
            "w": g("model.decoder.final_layer_norm.weight"),
            "b": g("model.decoder.final_layer_norm.bias"),
        },
        "lm_head": {"w": lm_head},
    }


# ---------------------------------------------------------------------------
# Forward passes
# ---------------------------------------------------------------------------


def _attn_block(config, specs, params, x, mask, cache=None, pos=None,
                backend="auto", axis_name=None):
    b, s, h = x.shape
    # local head count from the (possibly TP-sharded) q spec
    hd = config.head_dim
    if "qkv" in specs:  # decode-time fused projection (models/fuse.py)
        nh = specs["qkv"].out_features // (3 * hd)
        qkv = common.apply_linear(specs["qkv"], params["qkv"], x,
                                  backend=backend)
        q = qkv[..., : nh * hd]
        k = qkv[..., nh * hd : 2 * nh * hd]
        v = qkv[..., 2 * nh * hd :]
    else:
        nh = specs["q"].out_features // hd
        q = common.apply_linear(specs["q"], params["q"], x, backend=backend)
        k = common.apply_linear(specs["k"], params["k"], x, backend=backend)
        v = common.apply_linear(specs["v"], params["v"], x, backend=backend)
    # TOKEN-major (B, S, H, D) — the projection-natural layout and the
    # dense cache's row order (see models/llama.py / common.init_kv_cache)
    q = q.reshape(b, s, nh, hd)
    k = k.reshape(b, s, nh, hd)
    v = v.reshape(b, s, nh, hd)

    if cache is not None and "pk" in cache:
        # paged KV (serving): see models/llama.py — same fused kernels
        # (s == 1 decode, s > 1 speculative verify window); OPT has no
        # rope (rope_theta=None) and no GQA (g = 1 group per head)
        from squeezellm_tpu.ops import paged_attn

        interp = jax.default_backend() not in ("tpu",)
        if s == 1:
            lengths = jnp.broadcast_to(
                jnp.asarray(pos).reshape(-1), (b,)).astype(jnp.int32) + 1
            if "sk" in cache:  # int8 pool (ops/kv_quant.py)
                out3, pk2, pv2, sk2, sv2 = \
                    paged_attn.paged_decode_attention_q8(
                        q[:, 0], k[:, 0], v[:, 0],
                        cache["pk"], cache["pv"], cache["sk"], cache["sv"],
                        cache["pt"], lengths,
                        page_size=cache["pk"].shape[1], interpret=interp)
            else:
                out3, pk2, pv2 = paged_attn.paged_decode_attention(
                    q[:, 0], k[:, 0], v[:, 0],
                    cache["pk"], cache["pv"], cache["pt"], lengths,
                    page_size=cache["pk"].shape[1], interpret=interp,
                )
            out3 = out3[:, :, None, :]
        else:
            # the paged verify kernels take head-major (B, H, s, hd)
            qh = q.transpose(0, 2, 1, 3)
            kh = k.transpose(0, 2, 1, 3)
            vh = v.transpose(0, 2, 1, 3)
            starts = jnp.broadcast_to(
                jnp.asarray(pos).reshape(-1), (b,)).astype(jnp.int32)
            if "sk" in cache:
                out3, pk2, pv2, sk2, sv2 = \
                    paged_attn.paged_verify_attention_q8(
                        qh, kh, vh, cache["pk"], cache["pv"], cache["sk"],
                        cache["sv"], cache["pt"], starts,
                        page_size=cache["pk"].shape[1], interpret=interp)
            else:
                out3, pk2, pv2 = paged_attn.paged_verify_attention(
                    qh, kh, vh, cache["pk"], cache["pv"], cache["pt"], starts,
                    page_size=cache["pk"].shape[1], interpret=interp,
                )
        cache = (dict(cache, pk=pk2, pv=pv2, sk=sk2, sv=sv2)
                 if "sk" in cache else dict(cache, pk=pk2, pv=pv2))
        out = out3.astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, nh * hd)
        out = common.apply_linear(specs["o"], params["o"], out, backend=backend)
        if axis_name is not None:
            out = jax.lax.psum(out, axis_name)
        return out, cache

    dense_q8 = cache is not None and "pk" not in cache and "ks" in cache
    if (cache is not None and s == 1 and backend.startswith("pallas")
            # tile-aligned chunking: 16-row slabs (32 for int8 caches)
            and cache["k"].shape[1] % (32 if dense_q8 else 16) == 0
            # hardware lane slicing wants whole-vreg head blocks (the
            # interpret-mode CPU path has no such restriction)
            and (hd % 128 == 0 or jax.default_backend() != "tpu")
            and os.environ.get("SQUEEZELLM_FUSED_ATTN", "1") == "1"):
        # dense-cache decode: fused cache-write + chunked attention
        # (ops/decode_attn.py; see models/llama.py — OPT has no GQA)
        from squeezellm_tpu.ops import decode_attn

        lengths = jnp.broadcast_to(
            jnp.asarray(pos).reshape(-1), (b,)).astype(jnp.int32) + 1
        if dense_q8:  # int8 cache + f32 scale sidecar (ops/kv_quant.py)
            out3, ck2, cv2, sk2, sv2 = decode_attn.dense_decode_attention_q8(
                q[:, 0], k[:, 0], v[:, 0],
                cache["k"], cache["v"], cache["ks"], cache["vs"], lengths,
                interpret=jax.default_backend() not in ("tpu",))
            cache = {"k": ck2, "v": cv2, "ks": sk2, "vs": sv2}
        else:
            out3, ck2, cv2 = decode_attn.dense_decode_attention(
                q[:, 0], k[:, 0], v[:, 0],
                cache["k"], cache["v"], lengths,
                interpret=jax.default_backend() not in ("tpu",))
            cache = {"k": ck2, "v": cv2}
        out = out3[:, None, :, :].astype(x.dtype).reshape(b, s, nh * hd)
        out = common.apply_linear(specs["o"], params["o"], out, backend=backend)
        if axis_name is not None:
            out = jax.lax.psum(out, axis_name)
        return out, cache

    if cache is not None:
        if s == 1:
            cache = common.update_kv_cache(cache, k, v, pos)
        elif pos is not None and jnp.asarray(pos).ndim:
            # speculative verify window: per-slot start positions
            cache = common.update_kv_window(cache, k, v, jnp.asarray(pos))
        else:
            start = 0 if pos is None else pos
            cache = dict(cache)
            if "ks" in cache:  # int8: quantize rows at insert
                from squeezellm_tpu.models.common import _q8_scale_rows
                from squeezellm_tpu.ops import kv_quant

                kq, ks = kv_quant.quantize_rows(k)
                vq, vs = kv_quant.quantize_rows(v)
                parts = {"k": kq.reshape(b, s, -1),
                         "v": vq.reshape(b, s, -1)}
                hkv8 = cache["ks"].shape[1]
                cache["ks"] = jax.lax.dynamic_update_slice(
                    cache["ks"], _q8_scale_rows(ks, hkv8), (0, 0, start))
                cache["vs"] = jax.lax.dynamic_update_slice(
                    cache["vs"], _q8_scale_rows(vs, hkv8), (0, 0, start))
            else:
                parts = {"k": k.reshape(b, s, -1), "v": v.reshape(b, s, -1)}
            for name, new in parts.items():
                cache[name] = jax.lax.dynamic_update_slice(
                    cache[name], new.astype(cache[name].dtype),
                    (0, start, 0))
        # int8 caches dequantize here (XLA mirror of the fused q8
        # dequant). read_kv returns HEAD-major.
        k, v = common.read_kv(cache, x.dtype, nh)
    else:
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
    q = q.transpose(0, 2, 1, 3)  # head-major for the attention einsums

    if (s > 1 and backend.startswith("pallas")
            and (pos is None or jnp.asarray(pos).ndim == 0)
            and s % 16 == 0 and k.shape[2] % 16 == 0
            and os.environ.get("SQUEEZELLM_FLASH_PREFILL", "1") == "1"):
        # prefill/eval flash attention — see models/llama.py (OPT: no
        # rope, no GQA, no sliding window)
        from squeezellm_tpu.ops import flash_attn

        offset = jnp.asarray(0 if pos is None else pos, jnp.int32)
        out = flash_attn.flash_attention(
            q, k, v, offset,
            interpret=jax.default_backend() not in ("tpu",)).astype(x.dtype)
    else:
        out = common.attention(q, k, v, mask)
    out = out.transpose(0, 2, 1, 3).reshape(b, s, nh * hd)
    out = common.apply_linear(specs["o"], params["o"], out, backend=backend)
    if axis_name is not None:
        out = jax.lax.psum(out, axis_name)  # row-parallel o-proj
    return out, cache


def _layer(config, specs, params, x, mask, cache=None, pos=None, backend="auto",
           axis_name=None):
    h = common.layer_norm(x, params["attn_norm"]["w"], params["attn_norm"]["b"],
                          config.ln_eps)
    attn_out, cache = _attn_block(config, specs, params, h, mask, cache, pos,
                                  backend, axis_name)
    x = x + attn_out
    h = common.layer_norm(x, params["ffn_norm"]["w"], params["ffn_norm"]["b"],
                          config.ln_eps)
    h = common.apply_linear(specs["up"], params["up"], h, backend=backend)
    h = jax.nn.relu(h)
    h = common.apply_linear(specs["down"], params["down"], h, backend=backend)
    if axis_name is not None:
        h = jax.lax.psum(h, axis_name)  # row-parallel down-proj
    return x + h, cache


def _lm_head(specs, params, x, backend, axis_name):
    logits = common.apply_linear(specs["lm_head"], params["lm_head"], x,
                                 backend=backend)
    if axis_name is not None:
        logits = jax.lax.all_gather(logits, axis_name, axis=-1, tiled=True)
    return logits.astype(jnp.float32)


def _embed(config, params, tokens, pos_start, dtype):
    x = params["embed"][tokens].astype(dtype)
    s = tokens.shape[1]
    positions = pos_start + jnp.arange(s) + _POS_OFFSET
    return x + params["embed_pos"][positions][None].astype(dtype)


def forward(config: OPTConfig, specs, params, tokens, *, backend="auto",
            dtype=jnp.float32, axis_name=None):
    b, s = tokens.shape
    x = _embed(config, params, tokens, 0, dtype)
    mask = common.causal_mask(s, s)
    for spec_d, param_d in zip(specs["layers"], params["layers"]):
        x, _ = _layer(config, spec_d, param_d, x, mask, backend=backend,
                      axis_name=axis_name)
    x = common.layer_norm(x, params["final_norm"]["w"], params["final_norm"]["b"],
                          config.ln_eps)
    return _lm_head(specs, params, x, backend, axis_name)


def prefill(config: OPTConfig, specs, params, tokens, cache, *, backend="auto",
            dtype=jnp.float32, axis_name=None, start=0, all_logits=False):
    """start: position of tokens[:, 0] (continuation prefill — the cache
    already holds rows [0, start); see models/llama.py). all_logits:
    logits for every position (speculative verification)."""
    b, s = tokens.shape
    x = _embed(config, params, tokens, start, dtype)
    max_seq = cache[0]["k"].shape[1]
    mask = common.causal_mask(s, max_seq, offset=start)
    new_cache = []
    for spec_d, param_d, layer_cache in zip(specs["layers"], params["layers"], cache):
        x, lc = _layer(config, spec_d, param_d, x, mask, cache=layer_cache,
                       pos=start, backend=backend, axis_name=axis_name)
        new_cache.append(lc)
    x = common.layer_norm(x if all_logits else x[:, -1:],
                          params["final_norm"]["w"],
                          params["final_norm"]["b"], config.ln_eps)
    return _lm_head(specs, params, x, backend, axis_name), new_cache


def verify_window(config: OPTConfig, specs, params, tokens, pos, cache, *,
                  backend="auto", dtype=jnp.float32, axis_name=None):
    """Per-slot speculative verification window (see models/llama.py)."""
    b, s = tokens.shape
    pos = jnp.asarray(pos)
    x = params["embed"][tokens].astype(dtype)
    positions = pos[:, None] + jnp.arange(s) + _POS_OFFSET  # (B, s)
    x = x + params["embed_pos"][positions].astype(dtype)
    if "pk" in cache[0]:  # paged pool: masking happens inside the kernel
        mask = None
    else:
        max_seq = cache[0]["k"].shape[1]
        mask = common.window_mask(s, max_seq, pos)
    new_cache = []
    for spec_d, param_d, layer_cache in zip(specs["layers"], params["layers"],
                                            cache):
        x, lc = _layer(config, spec_d, param_d, x, mask, cache=layer_cache,
                       pos=pos, backend=backend, axis_name=axis_name)
        new_cache.append(lc)
    x = common.layer_norm(x, params["final_norm"]["w"],
                          params["final_norm"]["b"], config.ln_eps)
    return _lm_head(specs, params, x, backend, axis_name), new_cache


def decode_step(config: OPTConfig, specs, params, token, pos, cache, *,
                backend="auto", dtype=jnp.float32, axis_name=None):
    x = params["embed"][token].astype(dtype)
    pos = jnp.asarray(pos)
    if pos.ndim:  # per-slot positions (continuous batching)
        x = x + params["embed_pos"][pos + _POS_OFFSET][:, None].astype(dtype)
    else:
        x = x + params["embed_pos"][pos + _POS_OFFSET][None, None].astype(dtype)
    if "pk" in cache[0]:  # paged pool: masking happens inside the kernel
        mask = None
    else:
        max_seq = cache[0]["k"].shape[1]
        mask = common.decode_mask(max_seq, pos)
    new_cache = []
    for spec_d, param_d, layer_cache in zip(specs["layers"], params["layers"], cache):
        x, lc = _layer(config, spec_d, param_d, x, mask, cache=layer_cache,
                       pos=pos, backend=backend, axis_name=axis_name)
        new_cache.append(lc)
    x = common.layer_norm(x, params["final_norm"]["w"], params["final_norm"]["b"],
                          config.ln_eps)
    return _lm_head(specs, params, x, backend, axis_name), new_cache
