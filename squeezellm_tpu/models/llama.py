"""Functional LLaMA-family decoder (LLaMA 1/2, Vicuna, Mistral, XGen).

Covers the reference's llama/mistral/vicuna/xgen model families
(reference squeezellm/model_parse.py:32-63: modules q,k,v,o,gate,up,down)
as one pure-jnp implementation with GQA and optional sliding-window
attention (Mistral). No HF-transformers runtime dependency — HF checkpoints
are imported into a plain params pytree.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from squeezellm_tpu.models import common
from squeezellm_tpu.models.common import LinearSpec

MODULE_NAMES = ("q", "k", "v", "o", "gate", "up", "down")


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 32
    rope_theta: float = 10000.0
    rms_eps: float = 1e-5
    max_seq: int = 2048
    sliding_window: Optional[int] = None  # Mistral: 4096
    tie_embeddings: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.n_heads

    def linear_shapes(self) -> Dict[str, Tuple[int, int]]:
        """(out, in) of each quantizable module, torch W orientation."""
        h = self.hidden_size
        kv = self.n_kv_heads * self.head_dim
        return {
            "q": (h, h),
            "k": (kv, h),
            "v": (kv, h),
            "o": (h, h),
            "gate": (self.intermediate_size, h),
            "up": (self.intermediate_size, h),
            "down": (h, self.intermediate_size),
        }

    @staticmethod
    def from_hf_config(d: dict) -> "LlamaConfig":
        """From an HF config.json dict (llama / mistral / vicuna / xgen)."""
        return LlamaConfig(
            vocab_size=d["vocab_size"],
            hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            n_layers=d["num_hidden_layers"],
            n_heads=d["num_attention_heads"],
            n_kv_heads=d.get("num_key_value_heads") or d["num_attention_heads"],
            rope_theta=d.get("rope_theta", 10000.0),
            rms_eps=d.get("rms_norm_eps", 1e-5),
            max_seq=min(d.get("max_position_embeddings", 2048), 8192),
            sliding_window=d.get("sliding_window"),
            tie_embeddings=d.get("tie_word_embeddings", False),
        )


def dense_specs(config: LlamaConfig) -> dict:
    """All-dense (w16) spec tree: per-layer module specs + lm_head."""
    shapes = config.linear_shapes()
    layer = {
        name: LinearSpec(in_features=i, out_features=o)
        for name, (o, i) in shapes.items()
    }
    return {
        "layers": tuple(dict(layer) for _ in range(config.n_layers)),
        "lm_head": LinearSpec(
            in_features=config.hidden_size, out_features=config.vocab_size
        ),
    }


def random_dense_params(config: LlamaConfig, key, dtype=jnp.float32) -> dict:
    """Random dense params (for tests/benchmarks)."""
    shapes = config.linear_shapes()
    keys = jax.random.split(key, config.n_layers + 2)

    def lin(k, o, i):
        # float(): a np scalar multiplier would promote bf16 weights to f32
        return {"w": (jax.random.normal(k, (o, i), dtype) * float(0.5 / np.sqrt(i)))}

    layers = []
    for li in range(config.n_layers):
        ks = jax.random.split(keys[li], len(shapes))
        d = {n: lin(k, o, i) for k, (n, (o, i)) in zip(ks, shapes.items())}
        d["input_norm"] = jnp.ones((config.hidden_size,), dtype)
        d["post_norm"] = jnp.ones((config.hidden_size,), dtype)
        layers.append(d)
    return {
        "embed": jax.random.normal(
            keys[-2], (config.vocab_size, config.hidden_size), dtype
        ) * 0.02,
        "layers": layers,
        "final_norm": jnp.ones((config.hidden_size,), dtype),
        "lm_head": {
            "w": jax.random.normal(
                keys[-1], (config.vocab_size, config.hidden_size), dtype
            ) * 0.02
        },
    }


def from_torch_state_dict(config: LlamaConfig, sd, dtype=jnp.float32) -> dict:
    """Import a HF LlamaForCausalLM/MistralForCausalLM state dict
    (torch tensors or numpy arrays) into the dense params pytree."""

    def g(name):
        t = sd[name]
        if hasattr(t, "detach"):
            t = t.detach().to("cpu").float().numpy()
        return jnp.asarray(np.asarray(t), dtype)

    hf_names = {
        "q": "self_attn.q_proj",
        "k": "self_attn.k_proj",
        "v": "self_attn.v_proj",
        "o": "self_attn.o_proj",
        "gate": "mlp.gate_proj",
        "up": "mlp.up_proj",
        "down": "mlp.down_proj",
    }
    layers = []
    for i in range(config.n_layers):
        p = f"model.layers.{i}."
        d = {n: {"w": g(p + hf + ".weight")} for n, hf in hf_names.items()}
        d["input_norm"] = g(p + "input_layernorm.weight")
        d["post_norm"] = g(p + "post_attention_layernorm.weight")
        layers.append(d)
    lm_head = (
        g("model.embed_tokens.weight")
        if config.tie_embeddings or "lm_head.weight" not in sd
        else g("lm_head.weight")
    )
    return {
        "embed": g("model.embed_tokens.weight"),
        "layers": layers,
        "final_norm": g("model.norm.weight"),
        "lm_head": {"w": lm_head},
    }


# ---------------------------------------------------------------------------
# Forward passes
# ---------------------------------------------------------------------------


def _o_proj(specs, params, out, residual, backend, axis_name):
    """o-projection with the residual add FOLDED into the quantized
    kernel's output-block init when unsharded (ops/pallas_ops.lut_matmul
    y0 operand — one fewer XLA add op per layer per decode step). Under
    TP the o-proj is row-parallel: partials must psum BEFORE the residual
    joins (folding y0 pre-psum would add it tp times)."""
    if axis_name is None:
        return common.apply_linear(specs["o"], params["o"], out,
                                   backend=backend, y0=residual)
    y = common.apply_linear(specs["o"], params["o"], out, backend=backend)
    y = jax.lax.psum(y, axis_name)
    return y if residual is None else residual + y


def _attn_block(config, specs, params, x, cos, sin, mask, cache=None, pos=None,
                backend="auto", axis_name=None, residual=None):
    b, s, h = x.shape
    # head counts derive from the (possibly TP-sharded) linear specs, not the
    # config: under shard_map each device owns n_heads/tp local heads.
    hd = config.head_dim
    if "qkv" in specs:  # decode-time fused projection (models/fuse.py)
        # derive BOTH head counts from the (possibly TP-sharded) spec: the
        # fused width is (nh_l + 2*nkv_l)*hd and TP splits q and kv heads
        # by the same factor, so scale the global ratio to the local width
        # (round-1 advisor finding: global nkv + local nh mis-sliced k/v)
        units = specs["qkv"].out_features // hd
        g_units = config.n_heads + 2 * config.n_kv_heads
        assert (config.n_kv_heads * units) % g_units == 0, (units, g_units)
        nkv = config.n_kv_heads * units // g_units
        nh = units - 2 * nkv
        qkv = common.apply_linear(specs["qkv"], params["qkv"], x,
                                  backend=backend)
        q = qkv[..., : nh * hd]
        k = qkv[..., nh * hd : (nh + nkv) * hd]
        v = qkv[..., (nh + nkv) * hd :]
    else:
        nh = specs["q"].out_features // hd
        nkv = specs["k"].out_features // hd
        q = common.apply_linear(specs["q"], params["q"], x, backend=backend)
        k = common.apply_linear(specs["k"], params["k"], x, backend=backend)
        v = common.apply_linear(specs["v"], params["v"], x, backend=backend)
    # TOKEN-major (B, S, H, D) — the projection-natural layout and the
    # dense KV cache's row order (models/common.init_kv_cache); only the
    # XLA attention chain transposes to head-major, right before its
    # einsums.
    q = q.reshape(b, s, nh, hd)
    k = k.reshape(b, s, nkv, hd)
    v = v.reshape(b, s, nkv, hd)

    dense_q8 = cache is not None and "pk" not in cache and "ks" in cache
    if (cache is not None and "pk" not in cache and s == 1
            and backend.startswith("pallas")
            # tile-aligned chunking: 16-row slabs (32 for int8 caches)
            and cache["k"].shape[1] % (32 if dense_q8 else 16) == 0
            # hardware lane slicing wants whole-vreg head blocks; the
            # interpret-mode path (CPU tests) has no such restriction
            and (hd % 128 == 0 or jax.default_backend() != "tpu")
            and os.environ.get("SQUEEZELLM_FUSED_ATTN", "1") == "1"):
        # dense-cache decode: fused rope + cache-write + chunked attention
        # in one Pallas launch (ops/decode_attn.py) — replaces the rope/
        # update/mask/repeat_kv/softmax chain AND reads only the valid
        # cache prefix. q/k go in PRE-rope with the step's precomputed
        # cos/sin rows passed as kernel operands (exact
        # common.rope_cos_sin values — an in-kernel rope-from-theta
        # diverged from the XLA chain on hardware, see
        # ops/decode_attn._rope_apply). SQUEEZELLM_FUSED_ATTN=0 restores
        # the XLA chain (A/B: pallas in-place aliasing through lax.scan
        # carries can force cache copies — see ops/pallas_ops.py notes).
        # NOTE: the env var is read at TRACE time — set it before the
        # first jit of a decode step (A/B probes run fresh processes);
        # it is not part of the jit cache key.
        from squeezellm_tpu.ops import decode_attn

        rc = cos if cos.ndim == 3 else jnp.broadcast_to(
            cos[None], (b,) + cos.shape)
        rs = sin if sin.ndim == 3 else jnp.broadcast_to(
            sin[None], (b,) + sin.shape)
        lengths = jnp.broadcast_to(
            jnp.asarray(pos).reshape(-1), (b,)).astype(jnp.int32) + 1
        if dense_q8:  # int8 cache + f32 scale sidecar (ops/decode_attn.py)
            out3, ck2, cv2, sk2, sv2 = decode_attn.dense_decode_attention_q8(
                q[:, 0], k[:, 0], v[:, 0],
                cache["k"], cache["v"], cache["ks"], cache["vs"], lengths,
                sliding_window=config.sliding_window,
                rope_cos=rc[:, 0], rope_sin=rs[:, 0],
                interpret=jax.default_backend() not in ("tpu",))
            cache = {"k": ck2, "v": cv2, "ks": sk2, "vs": sv2}
        else:
            out3, ck2, cv2 = decode_attn.dense_decode_attention(
                q[:, 0], k[:, 0], v[:, 0],
                cache["k"], cache["v"], lengths,
                sliding_window=config.sliding_window,
                rope_cos=rc[:, 0], rope_sin=rs[:, 0],
                interpret=jax.default_backend() not in ("tpu",))
            cache = {"k": ck2, "v": cv2}
        out = out3[:, None, :, :].astype(x.dtype).reshape(b, s, nh * hd)
        return _o_proj(specs, params, out, residual, backend,
                       axis_name), cache

    if cache is not None and "pk" in cache:
        # paged KV (serving): fused rope + cache-write + page-table
        # attention in one Pallas launch (ops/paged_attn.py). pos is the
        # (B,) 0-based position of the FIRST token here; s == 1 is the
        # decode step, s > 1 the speculative verify window. q/k go in
        # PRE-rope — the kernel rotates each row by the step's
        # precomputed cos/sin operand rows (each row's own position).
        # Sliding-window models (Mistral) mask in-kernel and skip pages
        # wholly below the window.
        from squeezellm_tpu.ops import paged_attn

        interp = jax.default_backend() not in ("tpu",)
        q8 = "sk" in cache  # int8 pool + f32 scale sidecar (ops/kv_quant.py)
        rc = cos if cos.ndim == 3 else jnp.broadcast_to(
            cos[None], (b,) + cos.shape)
        rs = sin if sin.ndim == 3 else jnp.broadcast_to(
            sin[None], (b,) + sin.shape)
        if s == 1:
            lengths = jnp.broadcast_to(
                jnp.asarray(pos).reshape(-1), (b,)).astype(jnp.int32) + 1
            if q8:
                out3, pk2, pv2, sk2, sv2 = paged_attn.paged_decode_attention_q8(
                    q[:, 0], k[:, 0], v[:, 0],
                    cache["pk"], cache["pv"], cache["sk"], cache["sv"],
                    cache["pt"], lengths, page_size=cache["pk"].shape[1],
                    rope_cos=rc[:, 0], rope_sin=rs[:, 0],
                    sliding_window=config.sliding_window, interpret=interp,
                )
            else:
                out3, pk2, pv2 = paged_attn.paged_decode_attention(
                    q[:, 0], k[:, 0], v[:, 0],
                    cache["pk"], cache["pv"], cache["pt"], lengths,
                    page_size=cache["pk"].shape[1],
                    rope_cos=rc[:, 0], rope_sin=rs[:, 0],
                    sliding_window=config.sliding_window, interpret=interp,
                )
            out3 = out3[:, :, None, :]
        else:
            # the paged verify kernels take head-major (B, H, s, hd)
            qh = q.transpose(0, 2, 1, 3)
            kh = k.transpose(0, 2, 1, 3)
            vh = v.transpose(0, 2, 1, 3)
            starts = jnp.broadcast_to(
                jnp.asarray(pos).reshape(-1), (b,)).astype(jnp.int32)
            if q8:
                out3, pk2, pv2, sk2, sv2 = paged_attn.paged_verify_attention_q8(
                    qh, kh, vh, cache["pk"], cache["pv"], cache["sk"],
                    cache["sv"], cache["pt"], starts,
                    page_size=cache["pk"].shape[1],
                    rope_cos=rc, rope_sin=rs,
                    sliding_window=config.sliding_window, interpret=interp,
                )
            else:
                out3, pk2, pv2 = paged_attn.paged_verify_attention(
                    qh, kh, vh, cache["pk"], cache["pv"], cache["pt"], starts,
                    page_size=cache["pk"].shape[1],
                    rope_cos=rc, rope_sin=rs,
                    sliding_window=config.sliding_window, interpret=interp,
                )
        cache = (dict(cache, pk=pk2, pv=pv2, sk=sk2, sv=sv2) if q8
                 else dict(cache, pk=pk2, pv=pv2))
        out = out3.astype(x.dtype)  # (B, H, s, hd)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, nh * hd)
        return _o_proj(specs, params, out, residual, backend,
                       axis_name), cache

    q = common.apply_rope_tm(q, cos, sin)
    k = common.apply_rope_tm(k, cos, sin)

    if cache is not None:
        if s == 1:
            # decode: pos scalar or per-slot (B,) vector
            cache = common.update_kv_cache(cache, k, v, pos)
        elif pos is not None and jnp.asarray(pos).ndim:
            # speculative verify window: per-slot start positions
            cache = common.update_kv_window(cache, k, v, jnp.asarray(pos))
        else:
            # prefill: write [start, start+s) — token-major, so the
            # projection output lands in the cache without a transpose
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
        # int8 caches dequantize here (the XLA mirror of the fused q8
        # kernel's in-VMEM dequant) — prefill attention reads the same
        # quantized history decode will. read_kv returns HEAD-major.
        k, v = common.read_kv(cache, x.dtype, nkv)
    else:
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
    q = q.transpose(0, 2, 1, 3)  # head-major for the attention einsums

    if (s > 1 and backend.startswith("pallas")
            and (pos is None or jnp.asarray(pos).ndim == 0)
            and s % 16 == 0 and k.shape[2] % 16 == 0
            and os.environ.get("SQUEEZELLM_FLASH_PREFILL", "1") == "1"):
        # prefill/eval: flash attention (ops/flash_attn.py) — streams
        # k/v (the window, or the cache's valid prefix) in chunks with
        # online softmax instead of materializing (B, H, Sq, Sk) logits
        # and a repeat_kv'd cache. Per-slot verify windows (pos vector)
        # and unaligned shapes keep the XLA chain. Env gate read at
        # trace time, like SQUEEZELLM_FUSED_ATTN.
        from squeezellm_tpu.ops import flash_attn

        offset = jnp.asarray(0 if pos is None else pos, jnp.int32)
        out = flash_attn.flash_attention(
            q, k, v, offset, sliding_window=config.sliding_window,
            interpret=jax.default_backend() not in ("tpu",))
        out = out.astype(x.dtype)
    else:
        n_rep = nh // nkv
        k = common.repeat_kv(k, n_rep)
        v = common.repeat_kv(v, n_rep)
        out = common.attention(q, k, v, mask)
    out = out.transpose(0, 2, 1, 3).reshape(b, s, nh * hd)
    # o-proj is row-parallel under TP: partial products reduce over the axis
    return _o_proj(specs, params, out, residual, backend, axis_name), cache


def _mlp_block(specs, params, x, backend="auto", axis_name=None,
               residual=None):
    if "gateup" in specs:  # decode-time fused projection (models/fuse.py)
        gu = common.apply_linear(specs["gateup"], params["gateup"], x,
                                 backend=backend)
        inter = specs["gateup"].out_features // 2
        gate, up = gu[..., :inter], gu[..., inter:]
    else:
        gate = common.apply_linear(specs["gate"], params["gate"], x,
                                   backend=backend)
        up = common.apply_linear(specs["up"], params["up"], x, backend=backend)
    if axis_name is None:
        # residual folds into the down-proj kernel init (see _o_proj)
        return common.apply_linear(
            specs["down"], params["down"], jax.nn.silu(gate) * up,
            backend=backend, y0=residual)
    y = common.apply_linear(
        specs["down"], params["down"], jax.nn.silu(gate) * up, backend=backend
    )
    y = jax.lax.psum(y, axis_name)  # down-proj is row-parallel
    return y if residual is None else residual + y


def _layer(config, specs, params, x, cos, sin, mask, cache=None, pos=None,
           backend="auto", axis_name=None):
    h = common.rms_norm(x, params["input_norm"], config.rms_eps)
    x, cache = _attn_block(
        config, specs, params, h, cos, sin, mask, cache, pos, backend,
        axis_name, residual=x
    )
    h = common.rms_norm(x, params["post_norm"], config.rms_eps)
    x = _mlp_block(specs, params, h, backend, axis_name, residual=x)
    return x, cache


def _lm_head(specs, params, x, backend, axis_name):
    logits = common.apply_linear(specs["lm_head"], params["lm_head"], x,
                                 backend=backend)
    if axis_name is not None:
        # vocab-sharded (column-parallel) head: gather the full logit row
        logits = jax.lax.all_gather(logits, axis_name, axis=-1, tiled=True)
    return logits.astype(jnp.float32)


def forward(config: LlamaConfig, specs, params, tokens, *, backend="auto",
            dtype=jnp.float32, axis_name=None):
    """Full-sequence causal forward -> logits (B, S, V). The eval path.

    axis_name: mesh axis for explicit Megatron-style TP under shard_map
    (specs/params must be the per-device locals from parallel.tp_shard_map).
    """
    b, s = tokens.shape
    x = params["embed"][tokens].astype(dtype)
    positions = jnp.arange(s)
    cos, sin = common.rope_cos_sin(positions, config.head_dim, config.rope_theta, dtype)
    mask = common.causal_mask(s, s, sliding_window=config.sliding_window)
    for spec_d, param_d in zip(specs["layers"], params["layers"]):
        x, _ = _layer(config, spec_d, param_d, x, cos, sin, mask,
                      backend=backend, axis_name=axis_name)
    x = common.rms_norm(x, params["final_norm"], config.rms_eps)
    return _lm_head(specs, params, x, backend, axis_name)


def prefill(config: LlamaConfig, specs, params, tokens, cache, *,
            backend="auto", dtype=jnp.float32, axis_name=None, start=0,
            all_logits=False):
    """Process the prompt, fill the KV cache; returns (last-token logits, cache).

    start: position of tokens[:, 0] — a continuation prefill (prefix
    sharing: the cache already holds rows [0, start)) attends to the
    cached prefix through the offset causal mask.
    all_logits: return logits for EVERY window position (speculative-
    decode verification needs the greedy token after each draft token)."""
    b, s = tokens.shape
    x = params["embed"][tokens].astype(dtype)
    positions = start + jnp.arange(s)
    cos, sin = common.rope_cos_sin(positions, config.head_dim, config.rope_theta, dtype)
    max_seq = cache[0]["k"].shape[1]
    mask = common.causal_mask(s, max_seq, offset=start,
                              sliding_window=config.sliding_window)
    new_cache = []
    for spec_d, param_d, layer_cache in zip(specs["layers"], params["layers"], cache):
        x, lc = _layer(config, spec_d, param_d, x, cos, sin, mask,
                       cache=layer_cache, pos=start, backend=backend,
                       axis_name=axis_name)
        new_cache.append(lc)
    x = common.rms_norm(x if all_logits else x[:, -1:],
                        params["final_norm"], config.rms_eps)
    return _lm_head(specs, params, x, backend, axis_name), new_cache


def verify_window(config: LlamaConfig, specs, params, tokens, pos, cache, *,
                  backend="auto", dtype=jnp.float32, axis_name=None):
    """Speculative-verification window for continuous batching: an
    s-token window per slot, slot b's window starting at its own position
    pos_b (B,). Returns (logits (B, s, V), cache) — logits for EVERY
    window position, the per-slot generalization of
    ``prefill(all_logits=True, start=...)``."""
    b, s = tokens.shape
    pos = jnp.asarray(pos)
    x = params["embed"][tokens].astype(dtype)
    positions = pos[:, None] + jnp.arange(s)  # (B, s)
    cos, sin = common.rope_cos_sin(positions, config.head_dim,
                                   config.rope_theta, dtype)
    if "pk" in cache[0]:  # paged pool: masking happens inside the kernel
        mask = None
    else:
        max_seq = cache[0]["k"].shape[1]
        mask = common.window_mask(s, max_seq, pos,
                                  sliding_window=config.sliding_window)
    new_cache = []
    for spec_d, param_d, layer_cache in zip(specs["layers"], params["layers"],
                                            cache):
        x, lc = _layer(config, spec_d, param_d, x, cos, sin, mask,
                       cache=layer_cache, pos=pos, backend=backend,
                       axis_name=axis_name)
        new_cache.append(lc)
    x = common.rms_norm(x, params["final_norm"], config.rms_eps)
    return _lm_head(specs, params, x, backend, axis_name), new_cache


def decode_step(config: LlamaConfig, specs, params, token, pos, cache, *,
                backend="auto", dtype=jnp.float32, axis_name=None):
    """One decode step. token: (B, 1) int32; pos: scalar int32 (0-based
    position of this token) or (B,) per-slot positions (continuous
    batching). Returns (logits (B, 1, V), cache)."""
    x = params["embed"][token].astype(dtype)
    pos = jnp.asarray(pos)
    positions = (pos.reshape(-1, 1) if pos.ndim
                 else jnp.full((token.shape[0], 1), pos, jnp.int32))
    cos, sin = common.rope_cos_sin(positions, config.head_dim, config.rope_theta, dtype)
    if "pk" in cache[0]:  # paged pool: masking happens inside the kernel
        max_seq = cache[0]["pt"].shape[1] * cache[0]["pk"].shape[1]
        mask = None
    else:
        max_seq = cache[0]["k"].shape[1]
        mask = common.decode_mask(max_seq, pos,
                                  sliding_window=config.sliding_window)
    new_cache = []
    for spec_d, param_d, layer_cache in zip(specs["layers"], params["layers"], cache):
        x, lc = _layer(config, spec_d, param_d, x, cos, sin, mask,
                       cache=layer_cache, pos=pos, backend=backend,
                       axis_name=axis_name)
        new_cache.append(lc)
    x = common.rms_norm(x, params["final_norm"], config.rms_eps)
    return _lm_head(specs, params, x, backend, axis_name), new_cache
