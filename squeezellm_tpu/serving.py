"""Continuous-batching serving loop.

The reference is strictly batch-1, generate-and-exit (SURVEY §2.4); this is
new, TPU-first capability: a fixed pool of B decode slots stepped by ONE
jitted batched decode per token, with requests joining (single-slot prefill
scattered into the pooled KV cache) and leaving independently. All shapes
are static, so the step never retraces:

  * pooled KV cache (B, H, S, D); per-slot positions as a (B,) vector
    (models.common.update_kv_cache scatters each slot at its own position)
  * joining: prefill the prompt at batch 1, insert its cache rows + first
    token into the slot; stale cache beyond a slot's position is masked by
    the per-slot causal mask, so slots can be reused without clearing
  * inactive slots decode garbage that is never emitted (standard
    fixed-slot continuous batching)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from squeezellm_tpu.models import common, registry


@dataclasses.dataclass
class _Slot:
    active: bool = False
    request_id: int = -1
    pos: int = 0  # position of the NEXT token to be written
    max_new: int = 0
    generated: int = 0
    tokens: Optional[List[int]] = None


class ContinuousBatchEngine:
    """Fixed-slot continuous batching over a quantized model."""

    def __init__(self, model_type: str, config, specs, params, *,
                 slots: int = 8, backend: str = "auto", dtype=jnp.float32,
                 cache_dtype=jnp.float32, max_seq: Optional[int] = None):
        from squeezellm_tpu.models import fuse as fuse_mod

        specs, params = fuse_mod.attach_decode_luts(specs, params)
        self.model_type = model_type
        self.config = config
        self.specs = specs
        self.params = params
        self.n_slots = slots
        self.max_seq = max_seq or config.max_seq
        mod = registry.get_model_module(model_type)

        def _prefill(params, tokens, cache):
            return mod.prefill(config, specs, params, tokens, cache,
                               backend=backend, dtype=dtype)

        def _decode(params, token, pos, cache):
            return mod.decode_step(config, specs, params, token, pos, cache,
                                   backend=backend, dtype=dtype)

        def _decode_k(params, token, pos, cache, k):
            # k greedy steps in ONE dispatch (lax.scan): the host syncs once
            # per k tokens instead of per token — on a remote transport the
            # per-step round-trip (~29 ms) otherwise dominates throughput
            def body(carry, _):
                cur, p, c = carry
                logits, c = mod.decode_step(config, specs, params, cur, p, c,
                                            backend=backend, dtype=dtype)
                nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
                return (nxt[:, None], p + 1, c), nxt

            (cur, p, cache), toks = jax.lax.scan(
                body, (token, pos, cache), None, length=k)
            return toks, cur, cache

        self._prefill = jax.jit(_prefill)
        self._decode = jax.jit(_decode, donate_argnums=(3,))
        self._decode_k = jax.jit(_decode_k, static_argnums=(4,),
                                 donate_argnums=(3,))

        @jax.jit
        def _insert(cache, one_cache, slot):
            return jax.tree.map(
                lambda c, o: jax.lax.dynamic_update_slice(
                    c, o.astype(c.dtype), (slot, 0, 0, 0)),
                cache, one_cache,
            )

        self._insert = _insert
        self.cache = common.init_kv_cache(
            slots, self.max_seq, config.n_layers, config.n_kv_heads,
            config.head_dim, cache_dtype,
        )
        self._slots = [_Slot() for _ in range(slots)]
        self._next_id = 0
        self._cur = jnp.zeros((slots, 1), jnp.int32)
        self._pos = np.zeros(slots, np.int64)

    # -- request management --------------------------------------------------

    def free_slots(self) -> int:
        return sum(not s.active for s in self._slots)

    # prompts are right-padded to a bucket so prefill compiles once per
    # bucket, not once per distinct prompt length (each fresh compile costs
    # minutes over a remote TPU transport)
    PROMPT_BUCKET = 16

    def add_request(self, prompt_tokens, max_new_tokens: int) -> int:
        """Prefill + occupy a slot. Returns the request id.

        The first generated token comes from the next step(): the slot is
        seeded at pos = plen-1 with the LAST prompt token, whose re-decode
        rewrites identical k/v and yields the first-token logits — so
        prefill logits (which sit at the PAD position) are never used and
        padding is harmless (pad cache rows beyond pos stay masked)."""
        if max_new_tokens < 1:
            # a 0-token request would still occupy a slot and emit one
            # token before the done check (round-1 advisor finding)
            raise ValueError("max_new_tokens must be >= 1")
        idx = next((i for i, s in enumerate(self._slots) if not s.active), None)
        if idx is None:
            raise RuntimeError("no free slot")
        prompt = np.asarray(prompt_tokens, np.int32).reshape(-1)
        plen = len(prompt)
        if plen + max_new_tokens > self.max_seq:
            raise ValueError("prompt + max_new_tokens exceeds max_seq")
        b = self.PROMPT_BUCKET
        padded = np.zeros((1, min(-(-plen // b) * b, self.max_seq)), np.int32)
        padded[0, :plen] = prompt
        one = common.init_kv_cache(1, self.max_seq, self.config.n_layers,
                                   self.config.n_kv_heads,
                                   self.config.head_dim,
                                   self.cache[0]["k"].dtype)
        _, one = self._prefill(self.params, jnp.asarray(padded), one)
        self.cache = self._insert(self.cache, one, jnp.asarray(idx, jnp.int32))
        self._cur = self._cur.at[idx, 0].set(int(prompt[-1]))
        self._pos[idx] = plen - 1
        rid = self._next_id
        self._next_id += 1
        self._slots[idx] = _Slot(active=True, request_id=rid, pos=plen - 1,
                                 max_new=max_new_tokens, generated=0,
                                 tokens=[])
        return rid

    def step(self) -> Dict[int, Any]:
        """One batched greedy decode step for every active slot.

        Returns {request_id: {'token', 'done', 'tokens'?}} and releases
        finished slots."""
        if not any(s.active for s in self._slots):
            return {}
        pos = jnp.asarray(self._pos, jnp.int32)
        logits, self.cache = self._decode(self.params, self._cur, pos,
                                          self.cache)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        nxt_host = np.asarray(nxt)
        self._cur = nxt[:, None]
        out: Dict[int, Any] = {}
        for i, s in enumerate(self._slots):
            if not s.active:
                continue
            tok = int(nxt_host[i])
            s.tokens.append(tok)
            s.generated += 1
            s.pos += 1
            self._pos[i] = s.pos
            done = s.generated >= s.max_new
            out[s.request_id] = {"token": tok, "done": done}
            if done:
                out[s.request_id]["tokens"] = s.tokens
                self._slots[i] = _Slot()
        return out

    def step_window(self, max_window: int = 8) -> Dict[int, Any]:
        """Up to max_window batched decode steps in ONE device dispatch.

        The window is the largest power of two <= max_window that does not
        overshoot any active slot's remaining budget (power-of-two bucketing
        bounds the number of compiled scan lengths). Emits the same
        per-request dicts as :meth:`step`, with every token of the window
        applied in order."""
        active = [s for s in self._slots if s.active]
        if not active:
            return {}
        remaining = min(s.max_new - s.generated for s in active)
        k = 1
        while k * 2 <= min(max_window, remaining):
            k *= 2
        if k == 1:
            return self.step()
        pos = jnp.asarray(self._pos, jnp.int32)
        toks, self._cur, self.cache = self._decode_k(
            self.params, self._cur, pos, self.cache, k)
        toks_host = np.asarray(toks)  # (k, n_slots)
        out: Dict[int, Any] = {}
        for i, s in enumerate(self._slots):
            if not s.active:
                continue
            for t in range(k):
                tok = int(toks_host[t, i])
                s.tokens.append(tok)
                s.generated += 1
                s.pos += 1
                if s.generated >= s.max_new:
                    break
            self._pos[i] = s.pos
            done = s.generated >= s.max_new
            out[s.request_id] = {"token": s.tokens[-1], "done": done}
            if done:
                out[s.request_id]["tokens"] = s.tokens
                self._slots[i] = _Slot()
        return out

    def run(self, requests, max_new_tokens: int = 16,
            window: int = 8) -> Dict[int, List[int]]:
        """Drain a list of prompts through the slot pool; returns
        {request_id: generated tokens}. window > 1 decodes multi-token
        windows per host sync (step_window)."""
        pending = list(requests)
        results: Dict[int, List[int]] = {}
        while pending or any(s.active for s in self._slots):
            while pending and self.free_slots():
                self.add_request(pending.pop(0), max_new_tokens)
            res = (self.step_window(window) if window > 1 else self.step())
            for rid, r in res.items():
                if r["done"]:
                    results[rid] = r["tokens"]
        return results
