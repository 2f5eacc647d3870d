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
import functools
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from squeezellm_tpu import sampling as sampling_mod
from squeezellm_tpu.models import common, registry
from squeezellm_tpu.ops import kv_quant
from squeezellm_tpu.sampling import SamplingParams


@dataclasses.dataclass
class _Slot:
    active: bool = False
    request_id: int = -1
    pos: int = 0  # position of the NEXT token to be written
    max_new: int = 0
    generated: int = 0
    tokens: Optional[List[int]] = None
    stop: Tuple[int, ...] = ()  # stop-token ids (host-side truncation)
    # chunked prefill in flight: the slot occupies the pool but is not
    # decoding yet; step() advances its staging prefill one chunk at a
    # time between decode windows (see ContinuousBatchEngine.prefill_chunk)
    prefilling: bool = False


def _init_sampler_state(eng, slots: int, seed: int) -> None:
    """Per-slot sampling parameter arrays shared by both engines; greedy
    defaults so inactive slots never force the sampling trace."""
    eng.seed = seed
    eng._temp = np.zeros(slots, np.float32)
    eng._topk = np.zeros(slots, np.int32)
    eng._topp = np.ones(slots, np.float32)
    eng._rids = np.zeros(slots, np.int32)


def _set_slot_sampling(eng, idx: int, rid: int,
                       sampling: Optional[SamplingParams]) -> None:
    sp = sampling or sampling_mod.GREEDY
    eng._temp[idx] = sp.temperature
    eng._topk[idx] = sp.top_k
    eng._topp[idx] = sp.top_p
    eng._rids[idx] = rid


def _clear_slot_sampling(eng, idx: int) -> None:
    eng._temp[idx] = 0.0
    eng._topk[idx] = 0
    eng._topp[idx] = 1.0
    eng._rids[idx] = 0


def _sampler_args(eng):
    return (jnp.asarray(eng._temp), jnp.asarray(eng._topk),
            jnp.asarray(eng._topp), jnp.asarray(eng._rids))


def _prompt_lookup_draft(ctx, pos, K: int, ngram: int):
    """Per-slot prompt-lookup drafts: find the latest earlier occurrence
    of each slot's trailing `ngram` in its device context buffer and
    propose the K tokens that followed it. Garbage drafts are safe —
    acceptance is greedy-exact (see _accept_drafts)."""
    max_ctx = ctx.shape[1]
    iota = jnp.arange(max_ctx)

    def draft_one(ctx_b, pos_b):
        key = jax.lax.dynamic_slice(
            ctx_b, (jnp.maximum(pos_b - ngram + 1, 0),), (ngram,))
        stacked = jnp.stack(
            [jnp.roll(ctx_b, -j) for j in range(ngram)], axis=1)
        hits = (stacked == key[None, :]).all(axis=1) & (
            iota <= pos_b - ngram)
        istar = jnp.max(jnp.where(hits, iota, -1))
        dstart = jnp.clip(istar + ngram, 0, max_ctx - K)
        return jax.lax.dynamic_slice(ctx_b, (dstart,), (K,))

    return jax.vmap(draft_one)(ctx, pos)  # (B, K)


def _accept_drafts(logits, draft, ctx, pos):
    """Greedy acceptance over a verify window's logits (B, K+1, V):
    keep draft tokens while they EQUAL the greedy token, append the
    greedy bonus token, write the emitted run into the context buffer.
    Returns (emit (B, K+1), n_acc (B,), cur2 (B, 1), ctx)."""
    K = draft.shape[1]
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    match = (draft == greedy[:, :K]).astype(jnp.int32)
    n_acc = jnp.sum(jnp.cumprod(match, axis=1), axis=1)  # (B,)
    cand = jnp.concatenate(
        [draft, jnp.zeros((draft.shape[0], 1), jnp.int32)], axis=1)
    bonus = jnp.take_along_axis(greedy, n_acc[:, None], axis=1)
    emit = jnp.where(jnp.arange(K + 1)[None, :] < n_acc[:, None],
                     cand, bonus)                        # (B, K+1)
    ctx = jax.vmap(
        lambda cb, eb, pb: jax.lax.dynamic_update_slice(
            cb, eb, (pb + 1,)))(ctx, emit, pos)
    cur2 = jnp.take_along_axis(emit, n_acc[:, None], axis=1)
    return emit, n_acc, cur2, ctx


def _emit_tokens(s: _Slot, toks) -> Tuple[List[int], bool]:
    """Append a window's candidate tokens to an active slot, stopping at
    a stop token or the max_new budget (the shared bookkeeping core of
    every step/step_window/step_spec_window). Returns (emitted, done)."""
    new: List[int] = []
    done = False
    for tok in toks:
        tok = int(tok)
        s.tokens.append(tok)
        new.append(tok)
        s.generated += 1
        s.pos += 1
        done = _slot_finished(s, tok)
        if done:
            break
    return new, done


def _slot_finished(s: _Slot, tok: int) -> bool:
    return s.generated >= s.max_new or tok in s.stop


def _pow2_pad(n: int) -> int:
    m = 1
    while m < n:
        m *= 2
    return m


def _admit_cohort(eng, requests, max_new_tokens, sampling, stop_tokens):
    """Shared add_requests core (dense + paged engines): partition a
    cohort of prompts into fused same-shape admission groups and
    single-request fallbacks, preserving request-id assignment in input
    order across the split (cross-engine differential tests key results
    by rid).

    eng._cohort_key(prompt, max_new) returns a hashable group key, or
    None to route the prompt through eng.add_request (chunked
    admissions, TP engines, prefix-sharing hits, validation failures —
    add_request raises the canonical error). Groups of >= 2 admit via
    eng._admit_group in ONE fused dispatch."""
    prompts = [np.asarray(p, np.int32).reshape(-1) for p in requests]
    if len(prompts) > eng.free_slots():
        raise RuntimeError("cohort exceeds free slots")
    groups: Dict[Any, List[int]] = {}
    single: List[int] = []
    for j, prompt in enumerate(prompts):
        key = eng._cohort_key(prompt, max_new_tokens)
        if key is None:
            single.append(j)
        else:
            groups.setdefault(key, []).append(j)
    for key in [k for k, js in groups.items() if len(js) < 2]:
        single.extend(groups.pop(key))  # reuse the warmed single graph
    base = eng._next_id
    eng._next_id += len(prompts)
    rids = [base + j for j in range(len(prompts))]
    for j in sorted(single):
        eng.add_request(prompts[j], max_new_tokens, sampling=sampling,
                        stop_tokens=stop_tokens, _rid=rids[j])
    for key, js in groups.items():
        eng._admit_group(key, [prompts[j] for j in js],
                         [rids[j] for j in js], max_new_tokens,
                         sampling, stop_tokens)
    return rids


class ContinuousBatchEngine:
    """Fixed-slot continuous batching over a quantized model."""

    # class-level default so subclasses that build their own __init__
    # inherit chunked-prefill-off unless they opt in
    prefill_chunk: Optional[int] = None

    def __init__(self, model_type: str, config, specs, params, *,
                 slots: int = 8, backend: str = "auto", dtype=jnp.float32,
                 cache_dtype=jnp.float32, max_seq: Optional[int] = None,
                 seed: int = 0,
                 speculative: Optional[Tuple[int, int]] = None,
                 prefill_chunk: Optional[int] = None):
        from squeezellm_tpu.models import fuse as fuse_mod

        specs, params = fuse_mod.attach_decode_luts(specs, params)
        self.model_type = model_type
        self.config = config
        self.specs = specs
        self.params = params
        self.n_slots = slots
        self.max_seq = max_seq or config.max_seq
        # (draft_len, ngram): slot-batched prompt-lookup speculation —
        # step_spec_window() verifies per-slot drafts in ONE windowed
        # forward, so each weight pass can yield several tokens per slot
        self.speculative = speculative
        # chunked prefill: prompts longer than this admit instantly and
        # prefill prefill_chunk tokens per engine step INTERLEAVED with
        # decode windows — a long admission no longer stalls every other
        # slot's decoding, and prefill compiles are bounded by the chunk
        # bucket ladder instead of one shape per prompt-length bucket
        self.prefill_chunk = prefill_chunk
        self._staging: Dict[int, list] = {}
        _init_sampler_state(self, slots, seed)
        mod = registry.get_model_module(model_type)

        def _prefill(params, tokens, cache):
            return mod.prefill(config, specs, params, tokens, cache,
                               backend=backend, dtype=dtype)

        def _prefill_cont(params, tokens, cache, start):
            # continuation prefill into a staging cache holding rows
            # [0, start) — the chunked-admission workhorse (start is
            # traced: one compile per chunk SHAPE, not per offset)
            return mod.prefill(config, specs, params, tokens, cache,
                               backend=backend, dtype=dtype, start=start)

        def _decode(params, token, pos, cache):
            return mod.decode_step(config, specs, params, token, pos, cache,
                                   backend=backend, dtype=dtype)

        def _decode_k(params, token, pos, cache, temp, topk, topp, rids,
                      k, sampled):
            # k decode steps in ONE dispatch (lax.scan): the host syncs once
            # per k tokens instead of per token — on a remote transport the
            # per-step round-trip (~29 ms) otherwise dominates throughput.
            # `sampled` is static: the all-greedy trace carries no top-k /
            # categorical work at all.
            def body(carry, _):
                cur, p, c = carry
                logits, c = mod.decode_step(config, specs, params, cur, p, c,
                                            backend=backend, dtype=dtype)
                if sampled:
                    nxt = sampling_mod.sample_tokens(
                        logits[:, -1].astype(jnp.float32), temp, topk, topp,
                        rids, p, seed)
                else:
                    nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
                return (nxt[:, None], p + 1, c), nxt

            (cur, p, cache), toks = jax.lax.scan(
                body, (token, pos, cache), None, length=k)
            return toks, cur, cache

        def _decode_adv(params, token, pos, cache, temp, topk, topp, rids,
                        sampled):
            """One decode step with on-device token/pos advance, for the
            chained window mode (SQUEEZELLM_DENSE_WINDOW=chained): the
            window enqueues k of these back-to-back with cache donation
            chaining call-to-call instead of a lax.scan carry — XLA can
            refuse to alias a Pallas in-place cache update through a scan
            carry and copy the cache every step (see
            PagedContinuousBatchEngine.step_window, which this mirrors)."""
            logits, nc = mod.decode_step(config, specs, params, token, pos,
                                         cache, backend=backend, dtype=dtype)
            if sampled:
                nxt = sampling_mod.sample_tokens(
                    logits[:, -1].astype(jnp.float32), temp, topk, topp,
                    rids, pos, seed)
            else:
                nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return nxt, pos + 1, nc

        def _spec_window(params, ctx, cur, pos, cache, draft_len, ngram):
            """One slot-batched speculative window: per-slot n-gram drafts
            from the device context buffer, ONE verify forward over
            (draft_len+1) positions for every slot, greedy acceptance.
            Exactness-safe with stale/garbage drafts: a draft token is
            only kept when it EQUALS the greedy token."""
            draft = _prompt_lookup_draft(ctx, pos, draft_len, ngram)
            window = jnp.concatenate([cur, draft], axis=1)  # (B, K+1)
            logits, cache = mod.verify_window(
                config, specs, params, window, pos, cache, backend=backend,
                dtype=dtype)
            emit, n_acc, cur2, ctx = _accept_drafts(logits, draft, ctx, pos)
            return emit, n_acc, cur2, ctx, cache

        self._prefill = jax.jit(_prefill)
        self._prefill_cont = jax.jit(_prefill_cont, donate_argnums=(2,))
        self._decode = jax.jit(_decode, donate_argnums=(3,))
        self._decode_k = jax.jit(_decode_k, static_argnums=(8, 9),
                                 donate_argnums=(3,))
        self._decode_adv = jax.jit(_decode_adv, static_argnums=(8,),
                                   donate_argnums=(3,))
        self._window_impl = os.environ.get("SQUEEZELLM_DENSE_WINDOW", "scan")
        self._spec_window_fn = jax.jit(_spec_window, static_argnums=(5, 6),
                                       donate_argnums=(4,))
        self._sample1 = jax.jit(
            lambda lg, temp, topk, topp, rids, pos: sampling_mod.sample_tokens(
                lg.astype(jnp.float32), temp, topk, topp, rids, pos, seed))

        @jax.jit
        def _insert(cache, one_cache, slot):
            return jax.tree.map(
                lambda c, o: jax.lax.dynamic_update_slice(
                    c, o.astype(c.dtype), (slot,) + (0,) * (c.ndim - 1)),
                cache, one_cache,
            )

        self._insert = _insert
        # token axis rounded to 16 (128 for int8 codes): keeps the fused
        # decode attention kernel's tile-aligned chunking engaged for any
        # max_seq (extra rows sit beyond every position, never attended).
        # int8 rounds to 128 so the head-major scale sidecar's token-lane
        # groups stay whole (ops/decode_attn.py q8 layout).
        calign = 128 if cache_dtype in ("int8", jnp.int8) else 16
        s_aligned = -(-self.max_seq // calign) * calign
        self.cache = common.init_kv_cache(
            slots, s_aligned, config.n_layers,
            config.n_kv_heads, config.head_dim, cache_dtype,
        )

        def _admit(params, tokens, slot, cache):
            # whole admission as ONE dispatch: fresh zeroed slot cache,
            # prompt prefill into it, scatter into the pool at `slot` —
            # the eager version (64 zeros dispatches + prefill + insert)
            # measured ~130 ms per admission over the tunnel at 7B
            one = common.init_kv_cache(
                1, s_aligned, config.n_layers, config.n_kv_heads,
                config.head_dim, cache_dtype)
            _, one = mod.prefill(config, specs, params, tokens, one,
                                 backend=backend, dtype=dtype)
            return jax.tree.map(
                lambda c, o: jax.lax.dynamic_update_slice(
                    c, o.astype(c.dtype), (slot,) + (0,) * (c.ndim - 1)),
                cache, one)

        self._admit = jax.jit(_admit, donate_argnums=(3,))

        def _admit_many(params, tokens, slot_ids, cache):
            # cohort admission as ONE dispatch: a (k, bucket) batched
            # prefill streams/dequantizes every weight ONCE for the whole
            # cohort (k separate admissions pay the full weight pass k
            # times — at 7B w4 each 16-token prefill is ~8 ms of
            # VPU-bound dequant, so a 32-slot cohort burns ~0.25 s of
            # device time plus 32 host round-trips). Row-scatter into the
            # slot pool; duplicate slot ids (pow2 k-padding, repeat-last)
            # rewrite identical content and are harmless.
            k = tokens.shape[0]
            many = common.init_kv_cache(
                k, s_aligned, config.n_layers, config.n_kv_heads,
                config.head_dim, cache_dtype)
            _, many = mod.prefill(config, specs, params, tokens, many,
                                  backend=backend, dtype=dtype)
            return jax.tree.map(
                lambda c, o: c.at[slot_ids].set(o.astype(c.dtype)),
                cache, many)

        self._admit_many = jax.jit(_admit_many, donate_argnums=(3,))
        self._slots = [_Slot() for _ in range(slots)]
        self._next_id = 0
        self._cur = jnp.zeros((slots, 1), jnp.int32)
        self._pos = np.zeros(slots, np.int64)
        # device-resident per-slot token history for speculative drafting.
        # Stale rows (slots stepped by the non-speculative path) only
        # lower the accept rate — acceptance is greedy-exact regardless.
        self._ctx = (jnp.zeros((slots, self.max_seq), jnp.int32)
                     if speculative else None)

    # -- request management --------------------------------------------------

    def free_slots(self) -> int:
        return sum(not s.active for s in self._slots)

    # prompts are right-padded to a bucket so prefill compiles once per
    # bucket, not once per distinct prompt length (each fresh compile costs
    # minutes over a remote TPU transport)
    PROMPT_BUCKET = 16

    def add_request(self, prompt_tokens, max_new_tokens: int,
                    sampling: Optional[SamplingParams] = None,
                    stop_tokens: Sequence[int] = (),
                    _rid: Optional[int] = None) -> int:
        """Prefill + occupy a slot. Returns the request id.

        sampling: per-request temperature/top-k/top-p (None = greedy),
        drawn on device inside the decode step. stop_tokens: generation
        ends when one is emitted (the stop token is kept in the output).

        The first generated token comes from the next step(): the slot is
        seeded at pos = plen-1 with the LAST prompt token, whose re-decode
        rewrites identical k/v and yields the first-token logits — so
        prefill logits (which sit at the PAD position) are never used and
        padding is harmless (pad cache rows beyond pos stay masked).

        _rid: internal — a pre-reserved request id (add_requests assigns
        ids in cohort input order across the single/batched split)."""
        if max_new_tokens < 1:
            # a 0-token request would still occupy a slot and emit one
            # token before the done check (round-1 advisor finding)
            raise ValueError("max_new_tokens must be >= 1")
        idx = next((i for i, s in enumerate(self._slots) if not s.active), None)
        if idx is None:
            raise RuntimeError("no free slot")
        prompt = np.asarray(prompt_tokens, np.int32).reshape(-1)
        plen = len(prompt)
        reserve = (self.speculative[0] + 1) if self.speculative else 0
        if plen + max_new_tokens + reserve > self.max_seq:
            # speculative windows may write draft_len+1 rows past the last
            # real token; that overhang must stay inside the cache
            raise ValueError("prompt + max_new_tokens exceeds max_seq"
                             + (" (incl. speculative window reserve)"
                                if reserve else ""))
        if _rid is None:
            rid = self._next_id
            self._next_id += 1
        else:
            rid = _rid
        if self.prefill_chunk and plen > self.prefill_chunk:
            # chunked admission: O(1) here — step() advances the staging
            # prefill one chunk at a time, interleaved with decode windows
            staging = common.init_kv_cache(
                1, self.max_seq, self.config.n_layers,
                self.config.n_kv_heads, self.config.head_dim,
                self.cache[0]["k"].dtype)
            self._staging[idx] = [staging, prompt, 0]
            _set_slot_sampling(self, idx, rid, sampling)
            self._slots[idx] = _Slot(active=True, request_id=rid,
                                     pos=plen - 1, max_new=max_new_tokens,
                                     generated=0, tokens=[],
                                     stop=tuple(stop_tokens),
                                     prefilling=True)
            return rid
        b = self.PROMPT_BUCKET
        padded = np.zeros((1, min(-(-plen // b) * b, self.max_seq)), np.int32)
        padded[0, :plen] = prompt
        if hasattr(self, "_admit"):
            self.cache = self._admit(self.params, jnp.asarray(padded),
                                     jnp.asarray(idx, jnp.int32), self.cache)
        else:
            # TP engine: sharded prefill + shard_map insert (two dispatches)
            one = common.init_kv_cache(1, self.max_seq,
                                       self.config.n_layers,
                                       self.config.n_kv_heads,
                                       self.config.head_dim,
                                       self.cache[0]["k"].dtype)
            _, one = self._prefill(self.params, jnp.asarray(padded), one)
            self.cache = self._insert(self.cache, one,
                                      jnp.asarray(idx, jnp.int32))
        self._cur = self._cur.at[idx, 0].set(int(prompt[-1]))
        if self._ctx is not None:
            row = np.zeros(self.max_seq, np.int32)
            row[:plen] = prompt
            self._ctx = self._ctx.at[idx].set(jnp.asarray(row))
        self._pos[idx] = plen - 1
        _set_slot_sampling(self, idx, rid, sampling)
        self._slots[idx] = _Slot(active=True, request_id=rid, pos=plen - 1,
                                 max_new=max_new_tokens, generated=0,
                                 tokens=[], stop=tuple(stop_tokens))
        return rid

    def add_requests(self, requests, max_new_tokens: int,
                     sampling: Optional[SamplingParams] = None,
                     stop_tokens: Sequence[int] = ()) -> List[int]:
        """Admit a cohort of prompts; returns request ids in input order.

        Same-bucket whole-prompt admissions fuse into ONE batched
        prefill + row-scatter dispatch (_admit_many): the cohort streams
        and dequantizes every weight once instead of once per request,
        and pays one host round-trip instead of k. Chunked admissions
        (prefill_chunk), TP engines (no fused _admit_many) and singleton
        buckets fall back to add_request per prompt."""
        return _admit_cohort(self, requests, max_new_tokens, sampling,
                             stop_tokens)

    def _cohort_key(self, prompt, max_new: int):
        plen = len(prompt)
        reserve = (self.speculative[0] + 1) if self.speculative else 0
        if (not hasattr(self, "_admit_many") or plen == 0 or max_new < 1
                or plen + max_new + reserve > self.max_seq
                or (self.prefill_chunk and plen > self.prefill_chunk)):
            return None
        b = self.PROMPT_BUCKET
        return min(-(-plen // b) * b, self.max_seq)

    def _admit_group(self, width: int, prompts, rids, max_new_tokens: int,
                     sampling, stop_tokens) -> None:
        """Fused cohort admission: ONE (k_pow2, width) prefill + scatter
        dispatch plus ONE _cur update for the whole group (pow2 padding
        repeats the last request — the duplicate scatter rewrites
        identical rows)."""
        k = len(prompts)
        idxs = [i for i, s in enumerate(self._slots) if not s.active][:k]
        kp = _pow2_pad(k)
        toks = np.zeros((kp, width), np.int32)
        sids = np.empty(kp, np.int32)
        for r, p in enumerate(prompts):
            toks[r, : len(p)] = p
            sids[r] = idxs[r]
        toks[k:] = toks[k - 1]
        sids[k:] = sids[k - 1]
        self.cache = self._admit_many(self.params, jnp.asarray(toks),
                                      jnp.asarray(sids), self.cache)
        ii = jnp.asarray(np.asarray(idxs, np.int32))
        lasts = np.array([int(p[-1]) for p in prompts], np.int32)
        self._cur = self._cur.at[ii, 0].set(jnp.asarray(lasts))
        if self._ctx is not None:
            rows = np.zeros((k, self.max_seq), np.int32)
            for r, p in enumerate(prompts):
                rows[r, : len(p)] = p
            self._ctx = self._ctx.at[ii].set(jnp.asarray(rows))
        for r, p in enumerate(prompts):
            idx, plen = idxs[r], len(p)
            self._pos[idx] = plen - 1
            _set_slot_sampling(self, idx, rids[r], sampling)
            self._slots[idx] = _Slot(active=True, request_id=rids[r],
                                     pos=plen - 1, max_new=max_new_tokens,
                                     generated=0, tokens=[],
                                     stop=tuple(stop_tokens))

    def _advance_prefill(self) -> None:
        """Advance every mid-prefill slot by ONE chunk (called at the top
        of each step/window). The chunk prefills into the slot's private
        staging cache via a continuation prefill (start = tokens already
        processed); on the last chunk the staging cache is inserted into
        the batch cache and the slot seeds at pos = plen-1 with the last
        prompt token — identical to whole-prompt admission from there on.
        Non-final chunks are full prefill_chunk shapes and the final
        partial chunk uses the PROMPT_BUCKET ladder, so compile shapes
        are bounded by the chunk ladder, not by prompt length."""
        # getattr: the TP engines build their own __init__ (no _staging)
        # but inherit step_window, which calls this unconditionally
        if not getattr(self, "_staging", None):
            return
        for i, s in enumerate(self._slots):
            if not (s.active and s.prefilling):
                continue
            staging, prompt, off = self._staging[i]
            plen = len(prompt)
            r = min(self.prefill_chunk, plen - off)
            b = self.PROMPT_BUCKET
            padded = np.zeros((1, min(-(-r // b) * b, self.prefill_chunk)),
                              np.int32)
            padded[0, :r] = prompt[off:off + r]
            _, staging = self._prefill_cont(
                self.params, jnp.asarray(padded), staging,
                jnp.asarray(off, jnp.int32))
            off += r
            if off < plen:
                self._staging[i] = [staging, prompt, off]
                continue
            self.cache = self._insert(self.cache, staging,
                                      jnp.asarray(i, jnp.int32))
            self._cur = self._cur.at[i, 0].set(int(prompt[-1]))
            if self._ctx is not None:
                row = np.zeros(self.max_seq, np.int32)
                row[:plen] = prompt
                self._ctx = self._ctx.at[i].set(jnp.asarray(row))
            self._pos[i] = plen - 1
            s.prefilling = False
            del self._staging[i]

    def cancel(self, request_id: int) -> bool:
        """Abort an in-flight request and free its slot (e.g. the HTTP
        client disconnected). Returns False if the id is not active."""
        for i, s in enumerate(self._slots):
            if s.active and s.request_id == request_id:
                _clear_slot_sampling(self, i)
                getattr(self, "_staging", {}).pop(i, None)
                self._slots[i] = _Slot()
                return True
        return False

    def step(self) -> Dict[int, Any]:
        """One batched decode step for every active slot (greedy or
        per-slot sampled).

        Returns {request_id: {'token', 'new_tokens', 'done', 'tokens'?}}
        and releases finished slots."""
        self._advance_prefill()
        return self._step_after_advance()

    def _step_after_advance(self) -> Dict[int, Any]:
        if not any(s.active and not s.prefilling for s in self._slots):
            return {}
        pos = jnp.asarray(self._pos, jnp.int32)
        logits, self.cache = self._decode(self.params, self._cur, pos,
                                          self.cache)
        if bool((self._temp > 0).any()):
            nxt = self._sample1(logits[:, -1], *_sampler_args(self), pos)
        else:
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        nxt_host = np.asarray(nxt)
        self._cur = nxt[:, None]
        out: Dict[int, Any] = {}
        for i, s in enumerate(self._slots):
            if not s.active or s.prefilling:
                continue
            new, done = _emit_tokens(s, [nxt_host[i]])
            self._pos[i] = s.pos
            out[s.request_id] = {"token": new[-1], "new_tokens": new,
                                 "done": done}
            if done:
                out[s.request_id]["tokens"] = s.tokens
                _clear_slot_sampling(self, i)
                self._slots[i] = _Slot()
        return out

    def step_window(self, max_window: int = 8) -> Dict[int, Any]:
        """Up to max_window batched decode steps in ONE device dispatch.

        The window is the largest power of two <= max_window that does not
        overshoot any active slot's remaining budget (power-of-two bucketing
        bounds the number of compiled scan lengths). Emits the same
        per-request dicts as :meth:`step`, with every token of the window
        applied in order. Slots that hit a stop token mid-window discard
        the window's tail (their decode continues harmlessly on device)."""
        self._advance_prefill()
        active = [s for s in self._slots if s.active and not s.prefilling]
        if not active:
            return {}
        remaining = min(s.max_new - s.generated for s in active)
        k = 1
        while k * 2 <= min(max_window, remaining):
            k *= 2
        if k == 1:
            return self._step_after_advance()
        pos = jnp.asarray(self._pos, jnp.int32)
        sampled = bool((self._temp > 0).any())
        if self._window_impl == "chained":
            cur, cache = self._cur, self.cache
            sargs = _sampler_args(self)  # hoisted: one upload per window
            toks = []
            for _ in range(k):
                nxt, pos, cache = self._decode_adv(
                    self.params, cur, pos, cache, *sargs, sampled)
                cur = nxt[:, None]
                toks.append(nxt)
            self._cur, self.cache = cur, cache
            toks_host = np.asarray(jnp.stack(toks))  # (k, n_slots)
        else:
            toks, self._cur, self.cache = self._decode_k(
                self.params, self._cur, pos, self.cache,
                *_sampler_args(self), k, sampled)
            toks_host = np.asarray(toks)  # (k, n_slots)
        out: Dict[int, Any] = {}
        for i, s in enumerate(self._slots):
            if not s.active or s.prefilling:
                continue
            new, done = _emit_tokens(s, toks_host[:k, i])
            self._pos[i] = s.pos
            out[s.request_id] = {"token": new[-1], "new_tokens": new,
                                 "done": done}
            if done:
                out[s.request_id]["tokens"] = s.tokens
                _clear_slot_sampling(self, i)
                self._slots[i] = _Slot()
        return out

    def step_spec_window(self) -> Dict[int, Any]:
        """One slot-batched speculative window (engine constructed with
        ``speculative=(draft_len, ngram)``): every slot drafts from its
        device context history and verifies in ONE shared forward — a
        single weight pass yields up to draft_len+1 tokens PER SLOT.
        Greedy-only: if any active slot samples, callers should use
        step_window() until it leaves (run() does this automatically)."""
        assert self.speculative, "engine not constructed with speculative="
        self._advance_prefill()
        active = [s for s in self._slots if s.active and not s.prefilling]
        if not active:
            return {}
        draft_len, ngram = self.speculative
        pos = jnp.asarray(self._pos, jnp.int32)
        emit, n_acc, self._cur, self._ctx, self.cache = self._spec_window_fn(
            self.params, self._ctx, self._cur, pos, self.cache,
            draft_len, ngram)
        emit_h = np.asarray(emit)
        nacc_h = np.asarray(n_acc)
        out: Dict[int, Any] = {}
        for i, s in enumerate(self._slots):
            if not s.active or s.prefilling:
                continue
            m = int(nacc_h[i]) + 1
            new, done = _emit_tokens(s, emit_h[i, :m])
            self._pos[i] = s.pos
            out[s.request_id] = {"token": new[-1], "new_tokens": new,
                                 "done": done}
            if done:
                out[s.request_id]["tokens"] = s.tokens
                _clear_slot_sampling(self, i)
                self._slots[i] = _Slot()
        return out

    def run(self, requests, max_new_tokens: int = 16, window: int = 8,
            sampling: Optional[SamplingParams] = None,
            stop_tokens: Sequence[int] = (),
            on_token=None) -> Dict[int, List[int]]:
        """Drain a list of prompts through the slot pool; returns
        {request_id: generated tokens}. window > 1 decodes multi-token
        windows per host sync (step_window). Engines constructed with
        ``speculative=`` use slot-batched speculative windows whenever no
        active slot is sampling. on_token(rid, new_tokens, done) streams
        each window's tokens as they are fetched."""
        pending = list(requests)
        results: Dict[int, List[int]] = {}
        while pending or any(s.active for s in self._slots):
            n = min(len(pending), self.free_slots())
            if n:  # cohort admission: one fused dispatch per shape group
                self.add_requests(pending[:n], max_new_tokens,
                                  sampling=sampling, stop_tokens=stop_tokens)
                del pending[:n]
            if self.speculative and not bool((self._temp > 0).any()):
                res = self.step_spec_window()
            else:
                res = (self.step_window(window) if window > 1
                       else self.step())
            for rid, r in res.items():
                if on_token is not None:
                    on_token(rid, r["new_tokens"], r["done"])
                if r["done"]:
                    results[rid] = r["tokens"]
        return results


class TPContinuousBatchEngine(ContinuousBatchEngine):
    """Tensor-parallel continuous batching: the dense-slot engine with
    every weight pass sharded over a `tp`-device mesh (Megatron-style
    column/row-parallel quantized linears, KV heads sharded, 2 psums per
    layer — parallel/tp_shard_map.py). Bookkeeping, windows, sampling,
    stop tokens, and cancellation are inherited; only the jitted step
    functions differ (shard_map with per-shard Pallas kernels on TPU).

    Decode windows always use the chained-dispatch form (the scan body
    would trace the shard_map per step anyway, and donation chains keep
    the sharded cache in place).
    """

    def __init__(self, model_type: str, config, specs, params, *,
                 tp: int, slots: int = 8, backend: str = "auto",
                 dtype=jnp.float32, cache_dtype=jnp.float32,
                 max_seq: Optional[int] = None, seed: int = 0,
                 devices=None, build_spmv: bool = True,
                 speculative: Optional[Tuple[int, int]] = None,
                 prefill_chunk: Optional[int] = None):
        from squeezellm_tpu.parallel import tp_shard_map as tpm

        self.model_type = model_type
        self.config = config
        self.n_slots = slots
        self.max_seq = max_seq or config.max_seq
        self.speculative = speculative
        self.prefill_chunk = prefill_chunk
        self._staging: Dict[int, list] = {}
        _init_sampler_state(self, slots, seed)

        self.mesh = tpm.make_tp_mesh(tp, devices)
        lspecs, sparams, pspecs = tpm.shard_model_params(
            model_type, config, specs, params, tp, build_spmv=build_spmv)
        self.specs = lspecs
        self.params = tpm.put_params(sparams, pspecs, self.mesh)
        self._prefill, self._adv_fns, self._prefill_cont = \
            tpm.make_tp_serving_fns(
                model_type, config, lspecs, pspecs, self.mesh,
                backend=backend, dtype=dtype, seed=seed)
        if speculative:
            self._tp_spec_fn = tpm.make_tp_spec_window_fn(
                model_type, config, lspecs, pspecs, self.mesh,
                speculative[0], speculative[1], backend=backend, dtype=dtype)

        cspec = tpm.cache_pspecs(config.n_layers)

        @functools.partial(
            jax.shard_map, mesh=self.mesh,
            in_specs=(cspec, cspec, tpm.P()), out_specs=cspec,
            check_vma=False)
        def _insert(cache, one_cache, slot):
            return jax.tree.map(
                lambda c, o: jax.lax.dynamic_update_slice(
                    c, o.astype(c.dtype), (slot,) + (0,) * (c.ndim - 1)),
                cache, one_cache)

        self._insert = jax.jit(_insert, donate_argnums=(0,))
        self.cache = tpm.init_tp_cache(config, self.mesh, batch=slots,
                                       max_seq=self.max_seq,
                                       dtype=cache_dtype)
        self._slots = [_Slot() for _ in range(slots)]
        self._next_id = 0
        self._cur = jnp.zeros((slots, 1), jnp.int32)
        self._pos = np.zeros(slots, np.int64)
        self._ctx = (jnp.zeros((slots, self.max_seq), jnp.int32)
                     if speculative else None)
        self._window_impl = "chained"

    def _decode_adv(self, params, token, pos, cache, temp, topk, topp,
                    rids, sampled):
        return self._adv_fns[bool(sampled)](params, token, pos, cache,
                                            temp, topk, topp, rids)

    def _spec_window_fn(self, params, ctx, cur, pos, cache, draft_len,
                        ngram):
        # draft_len/ngram were fixed at construction (shard_map closures
        # cannot take statics); the base step_spec_window passes them too
        return self._tp_spec_fn(params, ctx, cur, pos, cache)

    def _step_after_advance(self) -> Dict[int, Any]:
        """One batched TP decode step (greedy or per-slot sampled) —
        step()/step_window() dispatch here after _advance_prefill
        (chunked prefill under TP rides the shard_map continuation
        prefill, tp_shard_map.make_tp_serving_fns)."""
        if not any(s.active and not s.prefilling for s in self._slots):
            return {}
        pos = jnp.asarray(self._pos, jnp.int32)
        sampled = bool((self._temp > 0).any())
        nxt, _, self.cache = self._decode_adv(
            self.params, self._cur, pos, self.cache,
            *_sampler_args(self), sampled)
        nxt_host = np.asarray(nxt)
        self._cur = nxt[:, None]
        out: Dict[int, Any] = {}
        for i, s in enumerate(self._slots):
            if not s.active or s.prefilling:
                continue
            new, done = _emit_tokens(s, [nxt_host[i]])
            self._pos[i] = s.pos
            out[s.request_id] = {"token": new[-1], "new_tokens": new,
                                 "done": done}
            if done:
                out[s.request_id]["tokens"] = s.tokens
                _clear_slot_sampling(self, i)
                self._slots[i] = _Slot()
        return out


# ---------------------------------------------------------------------------
# Paged serving: shared KV page pool + prefix sharing
# ---------------------------------------------------------------------------


def _prime_dense_impl(pools, dense, pids, *, ps: int, max_seq: int,
                      n_kv_heads: int):
    """Prime a fresh dense temp cache with the shared pages for EVERY
    layer in one dispatch (the per-layer eager version cost ~0.15 s of
    pure dispatch overhead per admission at 7B). The full m*ps rows are
    written (pow2 padding repeats the last page); rows beyond the true
    shared prefix are overwritten by the continuation prefill or stay
    causally masked until decode writes them — exactly like the zero
    rows they replace. Shared by the single-device and shard_map-TP
    paged engines (head-axis ops only — per-shard local under TP)."""
    rows = min(pids.shape[0] * ps, max_seq)

    def one_layer(pool_kv, d):
        q8 = "sk" in pool_kv  # int8 pool: dequantize into the dense cache

        def one(pid):
            out = {
                "k": jax.lax.dynamic_slice_in_dim(pool_kv["pk"], pid, 1)[0],
                "v": jax.lax.dynamic_slice_in_dim(pool_kv["pv"], pid, 1)[0],
            }
            if q8:
                out["sk"] = jax.lax.dynamic_slice_in_dim(
                    pool_kv["sk"], pid, 1)[0]
                out["sv"] = jax.lax.dynamic_slice_in_dim(
                    pool_kv["sv"], pid, 1)[0]
            return out
        kv = jax.lax.map(one, pids)
        if q8:
            # codes (m, ps, Hkv*hd) x head-major scales (m, HkvP, ps):
            # dequantize per (token, head) row
            m, _, KV = kv["k"].shape
            hd = KV // n_kv_heads

            def dq(codes, sc):
                rs = jnp.swapaxes(sc[:, :n_kv_heads], 1, 2)  # (m, ps, Hkv)
                return (codes.reshape(m, ps, n_kv_heads, hd).astype(
                    jnp.float32) * rs[..., None]).reshape(m, ps, KV)

            kv = {"k": dq(kv["k"], kv["sk"]), "v": dq(kv["v"], kv["sv"])}

        def to_dense(a):
            # (m, ps, Hkv*hd) token-major pages -> (1, rows, Hkv*hd)
            m = a.shape[0]
            return a.reshape(1, m * ps, a.shape[2])[:, :rows]

        k = jax.lax.dynamic_update_slice(
            d["k"], to_dense(kv["k"]).astype(d["k"].dtype), (0, 0, 0))
        v = jax.lax.dynamic_update_slice(
            d["v"], to_dense(kv["v"]).astype(d["v"].dtype), (0, 0, 0))
        return {"k": k, "v": v}

    return [one_layer(p, d) for p, d in zip(pools, dense)]


def _scatter_all_impl(pools, dense, pids, first_page, cnt, *, ps: int,
                      n_kv_heads: int):
    """Write the new (non-shared) prompt pages of EVERY layer back into
    the pool in one dispatch. pids may be pow2-padded (repeat-last):
    iterations beyond cnt must be no-ops — a clamped dense slice would
    otherwise overwrite the real last page with wrong rows."""
    new = []
    for pool_kv, d in zip(pools, dense):
        q8 = "sk" in pool_kv  # int8 pool: quantize the dense rows on write

        def body(i, pools_kv, dk=d["k"], dv=d["v"], q8=q8):
            def write(pools_kv):
                # dense (ps, Hkv*hd) rows ARE the token-major page
                src_k = jax.lax.dynamic_slice_in_dim(
                    dk[0], (first_page + i) * ps, ps, axis=0)
                src_v = jax.lax.dynamic_slice_in_dim(
                    dv[0], (first_page + i) * ps, ps, axis=0)
                if q8:
                    pk, pv, sk, sv = pools_kv
                    rows = sk.shape[1]
                    hkv = n_kv_heads
                    hd = pk.shape[2] // hkv
                    qk, ssk = kv_quant.quantize_rows(
                        src_k.reshape(ps, hkv, hd))
                    qv, ssv = kv_quant.quantize_rows(
                        src_v.reshape(ps, hkv, hd))
                    # (ps, Hkv, 1) -> head-major (HkvP, ps)
                    ssk = kv_quant.pool_pack_scales(
                        jnp.swapaxes(ssk, 0, 1), rows)
                    ssv = kv_quant.pool_pack_scales(
                        jnp.swapaxes(ssv, 0, 1), rows)
                    pk = jax.lax.dynamic_update_slice_in_dim(
                        pk, qk.reshape(1, ps, hkv * hd), pids[i], axis=0)
                    pv = jax.lax.dynamic_update_slice_in_dim(
                        pv, qv.reshape(1, ps, hkv * hd), pids[i], axis=0)
                    sk = jax.lax.dynamic_update_slice_in_dim(
                        sk, ssk[None], pids[i], axis=0)
                    sv = jax.lax.dynamic_update_slice_in_dim(
                        sv, ssv[None], pids[i], axis=0)
                    return pk, pv, sk, sv
                pk, pv = pools_kv
                pk = jax.lax.dynamic_update_slice_in_dim(
                    pk, src_k[None].astype(pk.dtype), pids[i], axis=0)
                pv = jax.lax.dynamic_update_slice_in_dim(
                    pv, src_v[None].astype(pv.dtype), pids[i], axis=0)
                return pk, pv
            return jax.lax.cond(i < cnt, write, lambda p: p, pools_kv)
        init = ((pool_kv["pk"], pool_kv["pv"], pool_kv["sk"], pool_kv["sv"])
                if q8 else (pool_kv["pk"], pool_kv["pv"]))
        out = jax.lax.fori_loop(0, pids.shape[0], body, init)
        new.append({"pk": out[0], "pv": out[1], "sk": out[2], "sv": out[3]}
                   if q8 else {"pk": out[0], "pv": out[1]})
    return new


class PagedKVPool:
    """Host-side page allocator + device page pools (one pid spans all
    layers: layer L's page data lives at pools[L]['pk'][pid]).

    Prefix sharing: full prompt pages are registered by their token-chunk
    chain; a later prompt with the same chain reuses the pages (refcount)
    and only prefill-computes its suffix. Zero-refcount shared pages stay
    cached until allocation pressure evicts them (LRU)."""

    def __init__(self, n_layers: int, n_pages: int, n_kv_heads: int,
                 page_size: int, head_dim: int, dtype=jnp.bfloat16,
                 head_shards: int = 1):
        self.ps = page_size
        self.n_pages = n_pages
        self.n_kv_heads = n_kv_heads
        kv = n_kv_heads * head_dim
        # dtype "int8" (or jnp.int8): pages store int8 codes plus one f32
        # scale per (token row, kv head) — head-major (P, HkvP, ps)
        # sidecars, ops/kv_quant.py. ~2x the tokens per byte of HBM vs
        # bf16; the paged kernels quantize at the in-kernel cache write
        # and dequantize on chunk load. head_shards: pad the sidecar's
        # head rows so every TP shard's slice is whole f32 tiles.
        self.quantized = dtype in ("int8", jnp.int8)
        if self.quantized:
            rows = kv_quant.head_rows(n_kv_heads, head_shards)
            self.scale_rows = rows
            self.pools = [
                {"pk": jnp.zeros((n_pages, page_size, kv), jnp.int8),
                 "pv": jnp.zeros((n_pages, page_size, kv), jnp.int8),
                 "sk": jnp.zeros((n_pages, rows, page_size), jnp.float32),
                 "sv": jnp.zeros((n_pages, rows, page_size), jnp.float32)}
                for _ in range(n_layers)
            ]
        else:
            self.pools = [
                {"pk": jnp.zeros((n_pages, page_size, kv), dtype),
                 "pv": jnp.zeros((n_pages, page_size, kv), dtype)}
                for _ in range(n_layers)
            ]
        self._free = list(range(n_pages - 1, -1, -1))
        self._ref: Dict[int, int] = {}
        # chain key (parent_key, chunk tokens) -> page id; LRU order
        self._registry: Dict[tuple, int] = {}
        self._lru: List[tuple] = []

    def alloc(self) -> int:
        if not self._free:
            self._evict_one()
        pid = self._free.pop()
        self._ref[pid] = 1
        return pid

    def _evict_one(self) -> None:
        for key in list(self._lru):
            pid = self._registry[key]
            if self._ref.get(pid, 0) == 0:
                del self._registry[key]
                self._lru.remove(key)
                self._free.append(pid)
                return
        raise RuntimeError("page pool exhausted (all pages referenced)")

    def retain(self, pid: int) -> None:
        self._ref[pid] = self._ref.get(pid, 0) + 1

    def release(self, pid: int, registered: bool) -> None:
        self._ref[pid] -= 1
        if self._ref[pid] == 0 and not registered:
            del self._ref[pid]
            self._free.append(pid)
        # registered pages linger for reuse (evicted under pressure)

    def lookup_chain(self, prompt) -> Tuple[List[int], tuple]:
        """Longest registered full-page prefix (never the final page —
        decode rewrites the last prompt position in place, which must not
        touch shared storage). Returns (page ids, last chain key)."""
        shared: List[int] = []
        key: tuple = ()
        max_full = max(0, (len(prompt) - 1) // self.ps)
        for p in range(max_full):
            chunk = tuple(prompt[p * self.ps:(p + 1) * self.ps])
            nkey = (key, chunk)
            pid = self._registry.get(nkey)
            if pid is None:
                break
            shared.append(pid)
            self._lru.remove(nkey)
            self._lru.append(nkey)
            key = nkey
        return shared, key

    def register_chain(self, key: tuple, prompt, start_page: int,
                       end_page: int, pids: List[int]) -> None:
        for p in range(start_page, end_page):
            chunk = tuple(prompt[p * self.ps:(p + 1) * self.ps])
            key = (key, chunk)
            if key not in self._registry:
                self._registry[key] = pids[p]
                self._lru.append(key)
            else:
                self._lru.remove(key)
                self._lru.append(key)


class PagedContinuousBatchEngine:
    """Continuous batching over a shared KV page pool (TPU-native vLLM
    design: ops/paged_attn.py kernel; no per-slot dense cache). Prompts
    sharing full-page prefixes reuse pages AND skip recomputing them —
    admission runs a continuation prefill on the suffix only."""

    PROMPT_BUCKET = 16
    # see ContinuousBatchEngine.prefill_chunk; the TP paged subclass
    # builds its own __init__ and inherits this off-default
    prefill_chunk: Optional[int] = None

    def __init__(self, model_type: str, config, specs, params, *,
                 slots: int = 8, n_pages: int = 256, page_size: int = 128,
                 backend: str = "auto", dtype=jnp.float32,
                 cache_dtype=jnp.bfloat16, max_seq: Optional[int] = None,
                 seed: int = 0,
                 speculative: Optional[Tuple[int, int]] = None,
                 prefill_chunk: Optional[int] = None):
        from squeezellm_tpu.models import fuse as fuse_mod

        specs, params = fuse_mod.attach_decode_luts(specs, params)
        self.config = config
        self.specs = specs
        self.params = params
        self.n_slots = slots
        self.max_seq = max_seq or config.max_seq
        # chunked admission: the non-shared suffix prefills prefill_chunk
        # tokens per engine step interleaved with decode windows (the
        # staging dense cache scatters into the pool only when complete)
        self.prefill_chunk = prefill_chunk
        self._staging: Dict[int, list] = {}
        # (draft_len, ngram): prompt-lookup speculation over the paged
        # pool — the verify window runs through the W-token paged kernel
        # (ops/paged_attn.paged_verify_attention)
        self.speculative = speculative
        _init_sampler_state(self, slots, seed)
        self.ps = page_size
        self.maxp = -(-self.max_seq // page_size)
        mod = registry.get_model_module(model_type)
        self.pool = PagedKVPool(config.n_layers, n_pages, config.n_kv_heads,
                                page_size, config.head_dim, cache_dtype)

        def _prefill(params, tokens, cache, start):
            return mod.prefill(config, specs, params, tokens, cache,
                               backend=backend, dtype=dtype, start=start)

        def _decode(params, token, pos, caches, pt):
            # pt enters once and is fanned into each layer's cache dict
            # inside the jit — donating it 32x as part of `caches` would
            # be a duplicate buffer donation
            c2 = [dict(c, pt=pt) for c in caches]
            logits, nc = mod.decode_step(config, specs, params, token, pos,
                                         c2, backend=backend, dtype=dtype)
            nc = [{k: v for k, v in c.items() if k != "pt"} for c in nc]
            return logits, nc

        def _decode_adv(params, token, pos, caches, pt, temp, topk, topp,
                        rids, sampled):
            """One decode step that also advances token/pos ON DEVICE, so a
            window of steps can be enqueued back-to-back with no host sync.
            Donation chains across calls (each call consumes the previous
            call's pool outputs) — unlike a lax.scan carry, which XLA
            refuses to alias through the Pallas in-place cache write and
            copies the multi-GB pools every step (measured 54.8 vs 77.7
            tok/s; see ROADMAP round-2 note this replaces)."""
            logits, nc = _decode(params, token, pos, caches, pt)
            if sampled:
                nxt = sampling_mod.sample_tokens(
                    logits[:, -1].astype(jnp.float32), temp, topk, topp,
                    rids, jnp.maximum(pos, 0), seed)
            else:
                nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            # inactive slots (pos < 0) must NOT advance: at pos 0 they
            # would write through their zeroed page table into page 0,
            # which likely belongs to an active slot
            p2 = jnp.where(pos < 0, pos, pos + 1)
            return nxt, p2, nc

        def _spec_window(params, ctx, cur, pos, caches, pt, draft_len,
                         ngram):
            """Slot-batched speculative window over the paged pool: the
            W=draft_len+1 verify forward runs through the paged verify
            kernel (page-table cache writes + causal window attention in
            one launch per layer). Inactive slots (pos < 0) write nothing
            in-kernel; their emitted rows are skipped host-side."""
            draft = _prompt_lookup_draft(ctx, pos, draft_len, ngram)
            window = jnp.concatenate([cur, draft], axis=1)  # (B, K+1)
            c2 = [dict(c, pt=pt) for c in caches]
            logits, nc = mod.verify_window(config, specs, params, window,
                                           pos, c2, backend=backend,
                                           dtype=dtype)
            nc = [{k: v for k, v in c.items() if k != "pt"} for c in nc]
            emit, n_acc, cur2, ctx = _accept_drafts(logits, draft, ctx, pos)
            return emit, n_acc, cur2, ctx, nc

        self._spec_window_fn = jax.jit(_spec_window, static_argnums=(6, 7),
                                       donate_argnums=(4,))
        self._prefill = jax.jit(_prefill)
        self._decode = jax.jit(_decode, donate_argnums=(3,))
        self._decode_adv = jax.jit(_decode_adv, static_argnums=(9,),
                                   donate_argnums=(3,))
        self._sample1 = jax.jit(
            lambda lg, temp, topk, topp, rids, pos: sampling_mod.sample_tokens(
                lg.astype(jnp.float32), temp, topk, topp, rids,
                jnp.maximum(pos, 0), seed))

        self._prime_dense = jax.jit(
            functools.partial(_prime_dense_impl, ps=self.ps,
                              max_seq=self.maxp * self.ps,
                              n_kv_heads=config.n_kv_heads),
            donate_argnums=(1,))
        self._scatter_all = jax.jit(
            functools.partial(_scatter_all_impl, ps=self.ps,
                              n_kv_heads=config.n_kv_heads),
            donate_argnums=(0,))
        # zeroed admission temp cache built IN-GRAPH: the eager
        # init_kv_cache issues 2*n_layers small zeros dispatches, which
        # cost ~0.3 s per admission over the tunnel at 7B
        dense_dtype = (jnp.bfloat16 if self.pool.quantized
                       else self.pool.pools[0]["pk"].dtype)
        self._fresh_dense = jax.jit(functools.partial(
            common.init_kv_cache, 1, self.maxp * self.ps, config.n_layers,
            config.n_kv_heads, config.head_dim, dense_dtype))

        def _admit_impl(params, tokens, start, pools, spids, npids, first,
                        cnt, prime):
            # whole (non-chunked) admission as ONE dispatch: zeroed temp
            # cache in-graph, optional shared-page prime, suffix prefill,
            # scatter of the new pages back into the pool (eagerly these
            # were 3 dispatches + ~60 zeros; ~50 ms each over the tunnel)
            dense = common.init_kv_cache(
                1, self.maxp * self.ps, config.n_layers, config.n_kv_heads,
                config.head_dim, dense_dtype)
            if prime:
                dense = _prime_dense_impl(
                    pools, dense, spids, ps=self.ps,
                    max_seq=self.maxp * self.ps,
                    n_kv_heads=config.n_kv_heads)
            _, dense = mod.prefill(config, specs, params, tokens, dense,
                                   backend=backend, dtype=dtype,
                                   start=start)
            return _scatter_all_impl(pools, dense, npids, first, cnt,
                                     ps=self.ps,
                                     n_kv_heads=config.n_kv_heads)

        self._admit_paged = jax.jit(_admit_impl, static_argnums=(8,),
                                    donate_argnums=(3,))

        def _admit_many_impl(params, tokens, pools, npids, cnt):
            # cohort admission (no shared-prefix members): ONE (k, bucket)
            # batched prefill into a (k, pages) temp cache — the whole
            # cohort streams/dequantizes the weights once — then each
            # request's covered pages scatter into the pool. Pow2 padding
            # repeats the last request; its duplicate scatter rewrites
            # identical page content.
            k = tokens.shape[0]
            dense = common.init_kv_cache(
                k, self.maxp * self.ps, config.n_layers, config.n_kv_heads,
                config.head_dim, dense_dtype)
            _, dense = mod.prefill(config, specs, params, tokens, dense,
                                   backend=backend, dtype=dtype)
            zero = jnp.asarray(0, jnp.int32)
            for i in range(k):
                di = jax.tree.map(
                    lambda c: jax.lax.dynamic_slice_in_dim(c, i, 1, 0),
                    dense)
                pools = _scatter_all_impl(pools, di, npids[i], zero, cnt[i],
                                          ps=self.ps,
                                          n_kv_heads=config.n_kv_heads)
            return pools

        self._admit_paged_many = jax.jit(_admit_many_impl,
                                         donate_argnums=(2,))

        self._slots = [_Slot() for _ in range(slots)]
        self._slot_pages: List[List[int]] = [[] for _ in range(slots)]
        self._slot_shared: List[int] = [0] * slots
        self._next_id = 0
        self._cur = jnp.zeros((slots, 1), jnp.int32)
        # inactive slots carry pos = -1 -> kernel length 0: no page reads
        # AND no cache write. A stale pos would write through the freed
        # page table into pages that may already belong to another slot.
        self._pos = np.full(slots, -1, np.int64)
        self._pt = np.zeros((slots, self.maxp), np.int32)
        # device token history for speculative drafting (see the dense
        # engine: stale rows only lower the accept rate)
        self._ctx = (jnp.zeros((slots, self.max_seq), jnp.int32)
                     if speculative else None)

    def free_slots(self) -> int:
        return sum(not s.active for s in self._slots)

    def _layer_caches(self):
        return [dict(self.pool.pools[li])
                for li in range(self.config.n_layers)]

    def add_request(self, prompt_tokens, max_new_tokens: int,
                    sampling: Optional[SamplingParams] = None,
                    stop_tokens: Sequence[int] = (),
                    _rid: Optional[int] = None) -> int:
        if max_new_tokens < 1:
            raise ValueError("max_new_tokens must be >= 1")
        idx = next((i for i, s in enumerate(self._slots) if not s.active), None)
        if idx is None:
            raise RuntimeError("no free slot")
        prompt = [int(t) for t in np.asarray(prompt_tokens).reshape(-1)]
        plen = len(prompt)
        # speculative verify windows write draft_len+1 rows past the last
        # real token: those rows must stay inside the slot's own pages
        reserve = (self.speculative[0] + 1) if self.speculative else 0
        if plen + max_new_tokens + reserve > self.max_seq:
            raise ValueError("prompt + max_new_tokens exceeds max_seq"
                             + (" (incl. speculative window reserve)"
                                if reserve else ""))

        def _bucket_pow2(pids):
            # pad by REPEATING the last pid: the duplicate scatter rewrites
            # identical content, the duplicate gather rows are sliced off —
            # compile count stays O(log pages) instead of O(pages)
            n = len(pids)
            m = 1
            while m < n:
                m *= 2
            return pids + [pids[-1]] * (m - n)

        shared_pids, chain_key = self.pool.lookup_chain(prompt)
        n_shared = len(shared_pids)
        start = n_shared * self.ps
        for pid in shared_pids:
            self.pool.retain(pid)

        # pages covering [start, plen + max_new_tokens + reserve); roll
        # back every refcount if the pool runs out mid-allocation
        total_pages = -(-(plen + max_new_tokens + reserve) // self.ps)
        new_pids: List[int] = []
        try:
            for _ in range(total_pages - n_shared):
                new_pids.append(self.pool.alloc())
        except RuntimeError:
            registered = set(self.pool._registry.values())
            for pid in new_pids:
                self.pool.release(pid, registered=pid in registered)
            for pid in shared_pids:
                self.pool.release(pid, registered=True)
            raise
        pids = shared_pids + new_pids
        self._slot_pages[idx] = pids
        self._slot_shared[idx] = n_shared

        # continuation prefill of the suffix on a dense temp cache primed
        # with the shared pages
        suffix = prompt[start:]
        # the temp cache spans FULL pages (maxp*ps >= max_seq): a partial
        # last page would make _scatter_all_impl's dense slice clamp its
        # start and scatter wrong rows into the pool when max_seq is not
        # a page multiple (review finding); full pages also keep the
        # token axis ps-aligned for the flash/fused kernels
        # int8 pools: the prefill temp cache stays full-precision; rows
        # are quantized at the pool scatter (ops/kv_quant.py). The temp
        # cache only materializes for the chunked-staging and TP paths —
        # the single-device whole-suffix admission runs zeros + prime +
        # prefill + scatter as ONE fused dispatch (_admit_paged below).
        chunked = bool(self.prefill_chunk
                       and len(suffix) > self.prefill_chunk)
        dense = None
        if chunked or not hasattr(self, "_admit_paged"):
            if hasattr(self, "_fresh_dense"):
                dense = self._fresh_dense()  # one dispatch, zeros in-graph
            else:  # TP subclass: sharded eager init
                dense = common.init_kv_cache(
                    1, self.maxp * self.ps, self.config.n_layers,
                    self.config.n_kv_heads, self.config.head_dim,
                    jnp.bfloat16 if self.pool.quantized
                    else self.pool.pools[0]["pk"].dtype)
            if n_shared:
                spids = jnp.asarray(_bucket_pow2(shared_pids), jnp.int32)
                dense = self._prime_dense(self.pool.pools, dense, spids)
        if _rid is None:
            rid = self._next_id
            self._next_id += 1
        else:
            rid = _rid
        _set_slot_sampling(self, idx, rid, sampling)
        if chunked:
            # chunked admission: the page table stays zeroed and pos -1
            # (inactive to every kernel) until the staging cache is
            # complete and scattered; page REGISTRATION also waits —
            # registering now would let another request share pages that
            # hold no content yet
            self._staging[idx] = [dense, prompt, start, pids, n_shared,
                                  chain_key]
            self._pt[idx] = 0
            self._pos[idx] = -1
            self._slots[idx] = _Slot(active=True, request_id=rid,
                                     pos=plen - 1, max_new=max_new_tokens,
                                     generated=0, tokens=[],
                                     stop=tuple(stop_tokens),
                                     prefilling=True)
            return rid
        b = self.PROMPT_BUCKET
        padded = np.zeros((1, min(-(-len(suffix) // b) * b, self.max_seq)),
                          np.int32)
        padded[0, : len(suffix)] = suffix
        if hasattr(self, "_admit_paged"):
            covered = -(-plen // self.ps)

            def _pow2(pl):
                m = 1
                while m < len(pl):
                    m *= 2
                return pl + [pl[-1]] * (m - len(pl))

            spids = jnp.asarray(_pow2(shared_pids or [0]), jnp.int32)
            npids = jnp.asarray(
                _pow2(pids[n_shared:covered] or [0]), jnp.int32)
            self.pool.pools = self._admit_paged(
                self.params, jnp.asarray(padded),
                jnp.asarray(start, jnp.int32), self.pool.pools, spids,
                npids, jnp.asarray(n_shared, jnp.int32),
                jnp.asarray(max(0, covered - n_shared), jnp.int32),
                bool(n_shared))
            self._register_and_seed(idx, prompt, pids, n_shared, chain_key)
        else:  # TP subclass: sharded prime/prefill/scatter dispatches
            _, dense = self._prefill(self.params, jnp.asarray(padded), dense,
                                     jnp.asarray(start, jnp.int32))
            self._finish_admission(idx, prompt, dense, pids, n_shared,
                                   chain_key)
        self._slots[idx] = _Slot(active=True, request_id=rid, pos=plen - 1,
                                 max_new=max_new_tokens, generated=0,
                                 tokens=[], stop=tuple(stop_tokens))
        return rid

    def add_requests(self, requests, max_new_tokens: int,
                     sampling: Optional[SamplingParams] = None,
                     stop_tokens: Sequence[int] = ()) -> List[int]:
        """Admit a cohort; returns request ids in input order. Same-shape
        admissions with no shared-prefix hit fuse into ONE batched
        prefill + page-scatter dispatch (_admit_paged_many); chunked
        admissions, prefix-sharing hits, TP engines and singleton groups
        fall back to add_request."""
        return _admit_cohort(self, requests, max_new_tokens, sampling,
                             stop_tokens)

    def _cohort_key(self, prompt, max_new: int):
        plen = len(prompt)
        reserve = (self.speculative[0] + 1) if self.speculative else 0
        if (not hasattr(self, "_admit_paged_many") or plen == 0
                or max_new < 1 or plen + max_new + reserve > self.max_seq
                or (self.prefill_chunk and plen > self.prefill_chunk)):
            return None
        shared, _ = self.pool.lookup_chain([int(t) for t in prompt])
        if shared:  # prefix hit: the single path primes + suffix-prefills
            return None
        b = self.PROMPT_BUCKET
        width = min(-(-plen // b) * b, self.max_seq)
        return (width, _pow2_pad(-(-plen // self.ps)))

    def _admit_group(self, key, prompts, rids, max_new_tokens: int,
                     sampling, stop_tokens) -> None:
        width, pw = key
        k = len(prompts)
        idxs = [i for i, s in enumerate(self._slots) if not s.active][:k]
        reserve = (self.speculative[0] + 1) if self.speculative else 0
        allocs: List[List[int]] = []
        try:
            for p in prompts:
                total = -(-(len(p) + max_new_tokens + reserve) // self.ps)
                allocs.append([self.pool.alloc() for _ in range(total)])
        except RuntimeError:
            registered = set(self.pool._registry.values())
            for pids in allocs:
                for pid in pids:
                    self.pool.release(pid, registered=pid in registered)
            raise
        kp = _pow2_pad(k)
        toks = np.zeros((kp, width), np.int32)
        npids = np.zeros((kp, pw), np.int32)
        cnt = np.zeros(kp, np.int32)
        for r, p in enumerate(prompts):
            toks[r, : len(p)] = p
            covered = -(-len(p) // self.ps)
            row = allocs[r][:covered]
            npids[r, :covered] = row
            npids[r, covered:] = row[-1]
            cnt[r] = covered
        toks[k:] = toks[k - 1]  # duplicate scatters rewrite identical pages
        npids[k:] = npids[k - 1]
        cnt[k:] = cnt[k - 1]
        self.pool.pools = self._admit_paged_many(
            self.params, jnp.asarray(toks), self.pool.pools,
            jnp.asarray(npids), jnp.asarray(cnt))
        for r, p in enumerate(prompts):
            idx = idxs[r]
            self._slot_pages[idx] = allocs[r]
            self._slot_shared[idx] = 0
            _set_slot_sampling(self, idx, rids[r], sampling)
            self._register_and_seed(idx, [int(t) for t in p], allocs[r],
                                    0, ())
            self._slots[idx] = _Slot(active=True, request_id=rids[r],
                                     pos=len(p) - 1,
                                     max_new=max_new_tokens, generated=0,
                                     tokens=[], stop=tuple(stop_tokens))

    def _finish_admission(self, idx, prompt, dense, pids, n_shared,
                          chain_key) -> None:
        """Scatter the prefilled dense temp cache into the pool, register
        the prompt's shareable pages, and seed the slot for decode —
        the admission tail shared by whole-suffix and chunked prefill."""
        plen = len(prompt)

        def _bucket_pow2(p):
            n = len(p)
            m = 1
            while m < n:
                m *= 2
            return p + [p[-1]] * (m - n)

        covered = -(-plen // self.ps)  # pages with any prompt content
        npids = jnp.asarray(
            _bucket_pow2(pids[n_shared:covered] or [0]), jnp.int32)
        if covered > n_shared:
            self.pool.pools = self._scatter_all(
                self.pool.pools, dense, npids,
                jnp.asarray(n_shared, jnp.int32),
                jnp.asarray(covered - n_shared, jnp.int32))
        self._register_and_seed(idx, prompt, pids, n_shared, chain_key)

    def _register_and_seed(self, idx, prompt, pids, n_shared,
                           chain_key) -> None:
        """Post-scatter admission bookkeeping: prefix registration, page
        table, decode seeds."""
        plen = len(prompt)
        # register the prompt's full pages (excl. the final page) for reuse
        self.pool.register_chain(chain_key, prompt, n_shared,
                                 max(n_shared, (plen - 1) // self.ps), pids)
        self._pt[idx] = 0
        self._pt[idx, : len(pids)] = pids
        self._cur = self._cur.at[idx, 0].set(int(prompt[-1]))
        if self._ctx is not None:
            row = np.zeros(self.max_seq, np.int32)
            row[:plen] = prompt
            self._ctx = self._ctx.at[idx].set(jnp.asarray(row))
        self._pos[idx] = plen - 1

    def _advance_prefill(self) -> None:
        """Paged twin of ContinuousBatchEngine._advance_prefill: one
        suffix chunk per mid-prefill slot into its staging dense cache;
        the final chunk triggers the pool scatter + page registration +
        slot seeding (_finish_admission)."""
        if not getattr(self, "_staging", None):
            return
        for i, s in enumerate(self._slots):
            if not (s.active and s.prefilling):
                continue
            dense, prompt, off, pids, n_shared, chain_key = self._staging[i]
            plen = len(prompt)
            r = min(self.prefill_chunk, plen - off)
            b = self.PROMPT_BUCKET
            padded = np.zeros((1, min(-(-r // b) * b, self.prefill_chunk)),
                              np.int32)
            padded[0, :r] = prompt[off:off + r]
            _, dense = self._prefill(self.params, jnp.asarray(padded),
                                     dense, jnp.asarray(off, jnp.int32))
            off += r
            if off < plen:
                self._staging[i][0] = dense
                self._staging[i][2] = off
                continue
            self._finish_admission(i, prompt, dense, pids, n_shared,
                                   chain_key)
            s.prefilling = False
            del self._staging[i]

    def step(self) -> Dict[int, Any]:
        self._advance_prefill()
        return self._step_after_advance()

    def _step_after_advance(self) -> Dict[int, Any]:
        if not any(s.active and not s.prefilling for s in self._slots):
            return {}
        pos = jnp.asarray(self._pos, jnp.int32)
        logits, caches = self._decode(self.params, self._cur, pos,
                                      self._layer_caches(),
                                      jnp.asarray(self._pt))
        for li, c in enumerate(caches):
            self.pool.pools[li] = {k: c[k] for k in
                                   ("pk", "pv", "sk", "sv") if k in c}
        if bool((self._temp > 0).any()):
            nxt = self._sample1(logits[:, -1], *_sampler_args(self), pos)
        else:
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        nxt_host = np.asarray(nxt)
        self._cur = nxt[:, None]
        out: Dict[int, Any] = {}
        for i, s in enumerate(self._slots):
            if not s.active or s.prefilling:
                continue
            new, done = _emit_tokens(s, [nxt_host[i]])
            self._pos[i] = s.pos
            out[s.request_id] = {"token": new[-1], "new_tokens": new,
                                 "done": done}
            if done:
                out[s.request_id]["tokens"] = s.tokens
                self._release(i)
        return out

    def step_window(self, max_window: int = 8) -> Dict[int, Any]:
        """Up to max_window decode steps with ONE host sync (see
        ContinuousBatchEngine.step_window; same bookkeeping).

        Unlike the dense engine this does NOT lax.scan the steps: XLA
        copies the multi-GB page pools through a scan carry instead of
        honoring the Pallas kernel's in-place aliasing (measured 54.8 vs
        77.7 tok/s at 8 slots). Instead the window enqueues `k`
        _decode_adv dispatches back-to-back — token and positions advance
        on device, pool donation chains call-to-call (honored at jit
        boundaries), and only the stacked window tokens are fetched.
        Page tables are static for the whole window: admission allocates
        pages through max_new_tokens up front."""
        self._advance_prefill()
        active = [s for s in self._slots if s.active and not s.prefilling]
        if not active:
            return {}
        remaining = min(s.max_new - s.generated for s in active)
        k = min(max_window, remaining)
        if k == 1:
            return self._step_after_advance()
        pos = jnp.asarray(self._pos, jnp.int32)
        pt = jnp.asarray(self._pt)
        cur = self._cur[:, 0]
        caches = self._layer_caches()
        sampled = bool((self._temp > 0).any())
        sargs = _sampler_args(self)
        toks = []
        for _ in range(k):
            cur, pos, caches = self._decode_adv(
                self.params, cur[:, None], pos, caches, pt, *sargs, sampled)
            toks.append(cur)
        self._cur = cur[:, None]
        for li, c in enumerate(caches):
            self.pool.pools[li] = {k: c[k] for k in
                                   ("pk", "pv", "sk", "sv") if k in c}
        toks_host = np.asarray(jnp.stack(toks))
        out: Dict[int, Any] = {}
        for i, s in enumerate(self._slots):
            if not s.active or s.prefilling:
                continue
            new, done = _emit_tokens(s, toks_host[:k, i])
            self._pos[i] = s.pos
            out[s.request_id] = {"token": new[-1], "new_tokens": new,
                                 "done": done}
            if done:
                out[s.request_id]["tokens"] = s.tokens
                self._release(i)
        return out

    def step_spec_window(self) -> Dict[int, Any]:
        """One slot-batched speculative window over the paged pool
        (engine constructed with ``speculative=(draft_len, ngram)``).
        Greedy-only — run() falls back to step_window() while any active
        slot samples. See ContinuousBatchEngine.step_spec_window; the
        bookkeeping is identical, plus the page-pool write-back."""
        assert self.speculative, "engine not constructed with speculative="
        self._advance_prefill()
        active = [s for s in self._slots if s.active and not s.prefilling]
        if not active:
            return {}
        draft_len, ngram = self.speculative
        pos = jnp.asarray(self._pos, jnp.int32)
        pt = jnp.asarray(self._pt)
        emit, n_acc, self._cur, self._ctx, caches = self._spec_window_fn(
            self.params, self._ctx, self._cur, pos, self._layer_caches(),
            pt, draft_len, ngram)
        for li, c in enumerate(caches):
            self.pool.pools[li] = {k: c[k] for k in
                                   ("pk", "pv", "sk", "sv") if k in c}
        emit_h = np.asarray(emit)
        nacc_h = np.asarray(n_acc)
        out: Dict[int, Any] = {}
        for i, s in enumerate(self._slots):
            if not s.active or s.prefilling:
                continue
            m = int(nacc_h[i]) + 1
            new, done = _emit_tokens(s, emit_h[i, :m])
            self._pos[i] = s.pos
            out[s.request_id] = {"token": new[-1], "new_tokens": new,
                                 "done": done}
            if done:
                out[s.request_id]["tokens"] = s.tokens
                self._release(i)
        return out

    def cancel(self, request_id: int) -> bool:
        """Abort an in-flight request: frees its slot AND its pages
        (refcounts released; registered prefix pages stay cached)."""
        for i, s in enumerate(self._slots):
            if s.active and s.request_id == request_id:
                self._release(i)
                return True
        return False

    def _release(self, idx: int) -> None:
        getattr(self, "_staging", {}).pop(idx, None)
        pids = self._slot_pages[idx]
        registered_pids = set(self.pool._registry.values())
        for pid in pids:
            self.pool.release(pid, registered=pid in registered_pids)
        self._slot_pages[idx] = []
        self._slots[idx] = _Slot()
        _clear_slot_sampling(self, idx)
        self._pos[idx] = -1  # length 0: the freed page ids must never be
        self._pt[idx] = 0    # written again through this slot

    def run(self, requests, max_new_tokens: int = 16, window: int = 1,
            sampling: Optional[SamplingParams] = None,
            stop_tokens: Sequence[int] = (),
            on_token=None) -> Dict[int, List[int]]:
        pending = list(requests)
        results: Dict[int, List[int]] = {}
        while pending or any(s.active for s in self._slots):
            n = min(len(pending), self.free_slots())
            if n:  # cohort admission: one fused dispatch per shape group
                self.add_requests(pending[:n], max_new_tokens,
                                  sampling=sampling, stop_tokens=stop_tokens)
                del pending[:n]
            if self.speculative and not bool((self._temp > 0).any()):
                res = self.step_spec_window()
            else:
                res = (self.step_window(window) if window > 1
                       else self.step())
            for rid, r in res.items():
                if on_token is not None:
                    on_token(rid, r["new_tokens"], r["done"])
                if r["done"]:
                    results[rid] = r["tokens"]
        return results


class TPPagedContinuousBatchEngine(PagedContinuousBatchEngine):
    """Tensor-parallel paged serving: the paged engine's full request
    lifecycle (page pool + prefix sharing + continuation prefill +
    chained windows + speculation) with every weight pass sharded over a
    tp-device mesh. Page pools and the dense admission cache are sharded
    over KV HEADS, so every paged operation (page prime/scatter, the
    page-table attention kernels) stays shard-local; the only
    collectives are the model's two psums per layer and the lm_head
    reduce. Host-side pool bookkeeping (page ids, refcounts, the prefix
    registry) is inherited unchanged — page identity is head-agnostic.
    """

    def __init__(self, model_type: str, config, specs, params, *,
                 tp: int, slots: int = 8, n_pages: int = 256,
                 page_size: int = 128, backend: str = "auto",
                 dtype=jnp.float32, cache_dtype=jnp.bfloat16,
                 max_seq: Optional[int] = None, seed: int = 0,
                 devices=None, build_spmv: bool = True,
                 speculative: Optional[Tuple[int, int]] = None,
                 prefill_chunk: Optional[int] = None):
        from jax.sharding import NamedSharding

        from squeezellm_tpu.parallel import tp_shard_map as tpm

        self.config = config
        self.n_slots = slots
        self.max_seq = max_seq or config.max_seq
        self.speculative = speculative
        # inherited chunked admission (PagedContinuousBatchEngine): the TP
        # paged prefill already takes `start`, so the same staging path
        # runs shard_map-side unchanged
        self.prefill_chunk = prefill_chunk
        self._staging: Dict[int, list] = {}
        _init_sampler_state(self, slots, seed)
        self.ps = page_size
        self.maxp = -(-self.max_seq // page_size)

        self.mesh = tpm.make_tp_mesh(tp, devices)
        lspecs, sparams, pspecs = tpm.shard_model_params(
            model_type, config, specs, params, tp, build_spmv=build_spmv)
        self.specs = lspecs
        self.params = tpm.put_params(sparams, pspecs, self.mesh)

        self.pool = PagedKVPool(config.n_layers, n_pages, config.n_kv_heads,
                                page_size, config.head_dim, cache_dtype,
                                head_shards=tp)
        self.pool.pools = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s)),
            self.pool.pools,
            tpm.pool_pspecs(config.n_layers, self.pool.quantized))
        fns = tpm.make_tp_paged_fns(
            model_type, config, lspecs, pspecs, self.mesh, ps=page_size,
            max_seq=self.maxp * self.ps, backend=backend, dtype=dtype,
            seed=seed, quantized=self.pool.quantized)
        self._prefill = fns["prefill"]
        self._adv_fns = fns["adv"]
        self._prime_dense = fns["prime"]
        self._scatter_all = fns["scatter"]
        if speculative:
            self._tp_spec_fn = fns["make_spec"](*speculative)

        self._slots = [_Slot() for _ in range(slots)]
        self._slot_pages = [[] for _ in range(slots)]
        self._slot_shared = [0] * slots
        self._next_id = 0
        self._cur = jnp.zeros((slots, 1), jnp.int32)
        self._pos = np.full(slots, -1, np.int64)
        self._pt = np.zeros((slots, self.maxp), np.int32)
        self._ctx = (jnp.zeros((slots, self.max_seq), jnp.int32)
                     if speculative else None)

    def _decode_adv(self, params, token, pos, caches, pt, temp, topk, topp,
                    rids, sampled):
        return self._adv_fns[bool(sampled)](params, token, pos, caches, pt,
                                            temp, topk, topp, rids)

    def _spec_window_fn(self, params, ctx, cur, pos, caches, pt, draft_len,
                        ngram):
        # draft_len/ngram fixed at construction (shard_map has no statics)
        return self._tp_spec_fn(params, ctx, cur, pos, caches, pt)

    def _step_after_advance(self) -> Dict[int, Any]:
        # step()/step_window() dispatch here after _advance_prefill
        # (inherited chunked admission — the TP paged prefill takes
        # `start`, so staging runs shard_map-side unchanged)
        if not any(s.active and not s.prefilling for s in self._slots):
            return {}
        pos = jnp.asarray(self._pos, jnp.int32)
        sampled = bool((self._temp > 0).any())
        nxt, _, caches = self._decode_adv(
            self.params, self._cur, pos, self._layer_caches(),
            jnp.asarray(self._pt), *_sampler_args(self), sampled)
        for li, c in enumerate(caches):
            self.pool.pools[li] = {k: c[k] for k in
                                   ("pk", "pv", "sk", "sv") if k in c}
        nxt_host = np.asarray(nxt)
        self._cur = nxt[:, None]
        out: Dict[int, Any] = {}
        for i, s in enumerate(self._slots):
            if not s.active or s.prefilling:
                continue
            new, done = _emit_tokens(s, [nxt_host[i]])
            self._pos[i] = s.pos
            out[s.request_id] = {"token": new[-1], "new_tokens": new,
                                 "done": done}
            if done:
                out[s.request_id]["tokens"] = s.tokens
                self._release(i)
        return out
