"""Inference engine: prefill + decode loop with a preallocated KV cache,
plus the latency benchmark harness.

Replaces the reference's HF-generate-based benchmark (reference
llama.py:189-249): per-token wall clock with device sync
(block_until_ready == torch.cuda.synchronize), median latency, optional
next-token perplexity check (--check), and device memory stats.

The jitted decode step donates the KV cache so decoding is allocation-free
after warmup.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from squeezellm_tpu.models import common, registry


@dataclasses.dataclass
class Engine:
    model_type: str
    config: Any
    specs: Any
    params: Any
    backend: str = "auto"
    dtype: Any = jnp.float32
    cache_dtype: Any = jnp.float32
    fuse: bool = False  # fuse q|k|v and gate|up projections (models/fuse.py)

    def __post_init__(self):
        from squeezellm_tpu.models import fuse as fuse_mod

        if self.fuse:
            self.specs, self.params = fuse_mod.fuse_for_decode(
                self.model_type, self.specs, self.params
            )
        else:
            self.specs, self.params = fuse_mod.attach_decode_luts(
                self.specs, self.params
            )
        self._mod = registry.get_model_module(self.model_type)
        mod, config, specs = self._mod, self.config, self.specs
        backend, dtype = self.backend, self.dtype

        def _prefill(params, tokens, cache):
            return mod.prefill(config, specs, params, tokens, cache,
                               backend=backend, dtype=dtype)

        def _decode(params, token, pos, cache):
            return mod.decode_step(config, specs, params, token, pos, cache,
                                   backend=backend, dtype=dtype)

        def _verify(params, tokens, start, cache):
            # speculative verification: a short continuation prefill that
            # returns logits for EVERY window position — weights stream
            # from HBM once per window instead of once per token
            return mod.prefill(config, specs, params, tokens, cache,
                               backend=backend, dtype=dtype, start=start,
                               all_logits=True)

        def _spec_loop(params, prompt, cache, max_new, draft_len, ngram):
            """Whole speculative generation as ONE device program: draft
            matching, verification forward, acceptance, and context
            bookkeeping run inside a lax.while_loop — zero host round
            trips between windows (the host-loop variant pays transport
            RTT per window). Greedy-exact: acceptance only keeps draft
            tokens equal to the greedy token, so accidental matches in
            clamped/garbage drafts are still correct."""
            K = draft_len
            max_ctx = cache[0]["k"].shape[1]
            s = prompt.shape[1]
            logits, cache = mod.prefill(config, specs, params, prompt,
                                        cache, backend=backend, dtype=dtype)
            first = jnp.argmax(logits[0, -1]).astype(jnp.int32)
            ctx = jnp.zeros((max_ctx,), jnp.int32)
            ctx = jax.lax.dynamic_update_slice(ctx, prompt[0], (0,))
            ctx = ctx.at[s].set(first)
            out = jnp.zeros((max_new + K + 1,), jnp.int32)
            out = out.at[0].set(first)
            iota = jnp.arange(max_ctx)

            def cond(c):
                return c[3] < max_new

            def body(c):
                ctx, pos, out, out_n, cache, wins, acc = c
                # n-gram draft: continuation of the most recent PRIOR
                # occurrence of ctx[pos-ngram+1 : pos+1]
                key = jax.lax.dynamic_slice(
                    ctx, (jnp.maximum(pos - ngram + 1, 0),), (ngram,))
                stacked = jnp.stack(
                    [jnp.roll(ctx, -j) for j in range(ngram)], axis=1)
                hits = (stacked == key[None, :]).all(axis=1) & (
                    iota <= pos - ngram)
                istar = jnp.max(jnp.where(hits, iota, -1))
                dstart = jnp.clip(istar + ngram, 0, max_ctx - K)
                draft = jax.lax.dynamic_slice(ctx, (dstart,), (K,))
                window = jnp.concatenate(
                    [jax.lax.dynamic_slice(ctx, (pos,), (1,)), draft]
                )[None, :]
                logits_all, cache = mod.prefill(
                    config, specs, params, window, cache, backend=backend,
                    dtype=dtype, start=pos, all_logits=True)
                greedy = jnp.argmax(logits_all[0], axis=-1).astype(jnp.int32)
                match = (draft == greedy[:K]).astype(jnp.int32)
                n_acc = jnp.sum(jnp.cumprod(match))
                m = jnp.minimum(n_acc + 1, max_new - out_n)
                cand = jnp.concatenate([draft, jnp.zeros((1,), jnp.int32)])
                emit = jnp.where(jnp.arange(K + 1) < n_acc, cand,
                                 greedy[n_acc])
                out = jax.lax.dynamic_update_slice(out, emit, (out_n,))
                ctx = jax.lax.dynamic_update_slice(ctx, emit, (pos + 1,))
                return (ctx, pos + m, out, out_n + m, cache,
                        wins + 1, acc + n_acc)

            ctx, pos, out, out_n, cache, wins, acc = jax.lax.while_loop(
                cond, body,
                (ctx, jnp.asarray(s, jnp.int32), out,
                 jnp.asarray(1, jnp.int32), cache,
                 jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32)))
            return out[:max_new], wins, acc

        def _gen_step(params, tok, pos, cache, temp, topk, topp, seed,
                      sampled):
            """One generation step with ON-DEVICE token select and
            position advance — generate() enqueues these back-to-back
            with zero per-step host work beyond the dispatch itself (a
            decode + argmax + pos+1 as three separate dispatches cost
            ~6 ms/token of host/transport overhead at 7B on the tunnel
            transport)."""
            logits, cache = mod.decode_step(config, specs, params, tok, pos,
                                            cache, backend=backend,
                                            dtype=dtype)
            if sampled:
                from squeezellm_tpu import sampling

                lg = logits[:, -1].astype(jnp.float32)
                bsz = lg.shape[0]
                nxt = sampling.sample_tokens(
                    lg, jnp.full((bsz,), temp, jnp.float32),
                    jnp.full((bsz,), topk, jnp.int32),
                    jnp.full((bsz,), topp, jnp.float32),
                    jnp.arange(bsz, dtype=jnp.int32),
                    jnp.full((bsz,), pos, jnp.int32), seed)
            else:
                nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return nxt[:, None], pos + 1, cache

        # donate the cache: decode updates it in place on device
        self._prefill = jax.jit(_prefill, donate_argnums=(2,))
        self._decode = jax.jit(_decode, donate_argnums=(3,))
        self._gen_step = jax.jit(_gen_step, static_argnums=(7, 8),
                                 donate_argnums=(3,))
        self._verify = jax.jit(_verify, donate_argnums=(3,))
        self._spec_loop = jax.jit(_spec_loop, static_argnums=(3, 4, 5),
                                  donate_argnums=(2,))
        # draft-MODEL speculative loops, one compiled closure per draft
        # engine (keyed by id; jax.jit caches per function object, so the
        # closure must be built once, not per call)
        self._draft_loops: Dict[int, Any] = {}

    def new_cache(self, batch: int = 1, max_seq: Optional[int] = None):
        c = self.config
        # round the cache's token axis up to 16 (32 for int8 codes) so the
        # fused decode attention kernel's tile-aligned chunking always
        # engages (extra rows sit beyond every position, never attended)
        align = 128 if self.cache_dtype in ("int8", jnp.int8) else 16
        s = -(-(max_seq or c.max_seq) // align) * align
        return common.init_kv_cache(
            batch, s, c.n_layers, c.n_kv_heads, c.head_dim,
            self.cache_dtype,
        )

    def generate(
        self,
        prompt_tokens: np.ndarray,
        max_new_tokens: int,
        temperature: float = 0.0,
        seed: int = 0,
        max_seq: Optional[int] = None,
        top_k: int = 0,
        top_p: float = 1.0,
    ) -> np.ndarray:
        """Greedy (temperature=0) or sampled (temperature/top-k/top-p)
        generation via the shared on-device sampler (squeezellm_tpu.sampling;
        streams keyed by (seed, row, position)).

        prompt_tokens: (B, S) int32. Returns (B, S + max_new_tokens).
        """
        prompt = jnp.asarray(prompt_tokens, jnp.int32)
        b, s = prompt.shape
        cache = self.new_cache(b, max_seq)
        logits, cache = self._prefill(self.params, prompt, cache)
        out = [prompt]
        # pos must be a device scalar: a python int would bake into the jitted
        # graph and retrace the decode step at every position.
        pos = jnp.asarray(s, jnp.int32)
        tok = self._select(logits, temperature, top_k, top_p, pos, seed)
        sampled = temperature > 0.0
        for i in range(max_new_tokens):
            out.append(tok)
            if i == max_new_tokens - 1:
                break
            # one dispatch per token (decode + select + advance on device)
            tok, pos, cache = self._gen_step(
                self.params, tok, pos, cache,
                jnp.float32(temperature), jnp.int32(top_k),
                jnp.float32(top_p), seed, sampled)
        return np.asarray(jnp.concatenate(out, axis=1))

    def generate_speculative(
        self,
        prompt_tokens: np.ndarray,
        max_new_tokens: int,
        draft_len: int = 8,
        ngram: int = 2,
        max_seq: Optional[int] = None,
        host_loop: bool = False,
    ) -> np.ndarray:
        """Greedy generation accelerated by prompt-lookup speculation.

        Each round drafts up to `draft_len` tokens by matching the last
        `ngram` generated/context tokens against an earlier occurrence in
        the sequence (Saxena's prompt-lookup decoding — no draft model),
        then verifies the whole draft in ONE forward over (draft_len + 1)
        positions. On a weight-streaming-bound quantized model that
        forward costs barely more than a single decode step, so every
        accepted draft token is nearly free. Output is BIT-IDENTICAL to
        greedy :meth:`generate` — speculation only changes how many
        tokens each weight pass yields. Rejected draft suffixes leave
        stale KV rows beyond the accepted position; they are masked by
        the causal mask and overwritten by the next window.

        By default the WHOLE loop (drafting, verification, acceptance)
        runs as one device program — no host round trip per window.
        host_loop=True uses the python reference loop instead (same
        outputs; also the readable spec of the algorithm).

        Stats from the last call are in ``self.spec_stats``
        (windows, drafted, accepted).

        prompt_tokens: (1, S) int32. Returns (1, S + max_new_tokens).
        """
        prompt = jnp.asarray(prompt_tokens, jnp.int32)
        b, s = prompt.shape
        assert b == 1, "speculative path is single-stream"
        cache_len = max_seq or self.config.max_seq
        # verification windows must never write past the cache end
        assert s + max_new_tokens + draft_len + 1 <= cache_len, (
            "prompt + max_new + draft_len + 1 must fit in max_seq")
        cache = self.new_cache(1, cache_len)
        if not host_loop:
            out, wins, acc = self._spec_loop(
                self.params, prompt, cache, max_new_tokens, draft_len,
                ngram)
            self.spec_stats = {"windows": int(wins),
                               "drafted": int(wins) * draft_len,
                               "accepted": int(acc)}
            return np.concatenate(
                [np.asarray(prompt_tokens).reshape(1, -1),
                 np.asarray(out)[None]], axis=1)
        logits, cache = self._prefill(self.params, prompt, cache)
        ctx = [int(t) for t in np.asarray(prompt[0])]
        tok = int(np.asarray(jnp.argmax(logits[0, -1])))
        out = [tok]
        ctx.append(tok)
        pos = s  # position of the next token to be fed/written
        self.spec_stats = {"windows": 0, "drafted": 0, "accepted": 0}
        while len(out) < max_new_tokens:
            draft = _lookup_draft(ctx, ngram, draft_len)
            window = np.zeros((1, draft_len + 1), np.int32)
            window[0, 0] = tok
            window[0, 1 : 1 + len(draft)] = draft
            logits_all, cache = self._verify(
                self.params, jnp.asarray(window),
                jnp.asarray(pos, jnp.int32), cache)
            greedy = np.asarray(jnp.argmax(logits_all[0], axis=-1))
            n_acc = 0
            while n_acc < len(draft) and draft[n_acc] == int(greedy[n_acc]):
                n_acc += 1
            emitted = [int(g) for g in draft[:n_acc]] + [int(greedy[n_acc])]
            emitted = emitted[: max_new_tokens - len(out)]
            out.extend(emitted)
            ctx.extend(emitted)
            pos += len(emitted)
            tok = emitted[-1]
            self.spec_stats["windows"] += 1
            self.spec_stats["drafted"] += len(draft)
            self.spec_stats["accepted"] += n_acc
        return np.asarray(
            np.concatenate([np.asarray(prompt_tokens).reshape(1, -1),
                            np.asarray(out, np.int32)[None]], axis=1))

    def _build_draft_loop(self, draft: "Engine"):
        """Jitted two-model speculative loop (this engine verifies, the
        `draft` engine proposes). Same acceptance scheme as the
        prompt-lookup `_spec_loop` — greedy-exact, whole loop one device
        program — but each window's draft comes from K autoregressive
        decode steps of the draft model instead of an n-gram match.

        Cache discipline per round at context position `pos` (ctx[pos] is
        the last emitted token): the draft model decodes ctx[pos] at row
        pos, then its own proposals at rows pos+1..pos+K-1; the target
        verifies the (1+K)-token window at start=pos. With m = n_acc + 1
        tokens emitted, accepted rows hold correct KV in BOTH caches, and
        every stale row beyond pos+m is re-written before it is ever
        attended (both models write row p when feeding position p)."""
        t_mod, t_config, t_specs = self._mod, self.config, self.specs
        d_mod, d_config, d_specs = draft._mod, draft.config, draft.specs
        backend, dtype = self.backend, self.dtype
        d_backend, d_dtype = draft.backend, draft.dtype

        def loop(tp, dp, prompt, tcache, dcache, max_new, K):
            max_ctx = tcache[0]["k"].shape[1]
            s = prompt.shape[1]
            logits, tcache = t_mod.prefill(t_config, t_specs, tp, prompt,
                                           tcache, backend=backend,
                                           dtype=dtype)
            _, dcache = d_mod.prefill(d_config, d_specs, dp, prompt,
                                      dcache, backend=d_backend,
                                      dtype=d_dtype)
            first = jnp.argmax(logits[0, -1]).astype(jnp.int32)
            ctx = jnp.zeros((max_ctx,), jnp.int32)
            ctx = jax.lax.dynamic_update_slice(ctx, prompt[0], (0,))
            ctx = ctx.at[s].set(first)
            out = jnp.zeros((max_new + K + 1,), jnp.int32)
            out = out.at[0].set(first)

            def cond(c):
                return c[3] < max_new

            def body(c):
                ctx, pos, out, out_n, tcache, dcache, wins, acc = c

                def dstep(carry, _):
                    tok, p, dc = carry
                    lg, dc = d_mod.decode_step(
                        d_config, d_specs, dp, tok.reshape(1, 1), p, dc,
                        backend=d_backend, dtype=d_dtype)
                    nxt = jnp.argmax(lg[0, -1]).astype(jnp.int32)
                    return (nxt, p + 1, dc), nxt

                cur = jax.lax.dynamic_slice(ctx, (pos,), (1,))[0]
                (_, _, dcache), draft_toks = jax.lax.scan(
                    dstep, (cur, pos, dcache), None, length=K)
                window = jnp.concatenate([cur[None], draft_toks])[None, :]
                logits_all, tcache = t_mod.prefill(
                    t_config, t_specs, tp, window, tcache, backend=backend,
                    dtype=dtype, start=pos, all_logits=True)
                greedy = jnp.argmax(logits_all[0], axis=-1).astype(jnp.int32)
                match = (draft_toks == greedy[:K]).astype(jnp.int32)
                n_acc = jnp.sum(jnp.cumprod(match))
                m = jnp.minimum(n_acc + 1, max_new - out_n)
                cand = jnp.concatenate([draft_toks, jnp.zeros((1,), jnp.int32)])
                emit = jnp.where(jnp.arange(K + 1) < n_acc, cand,
                                 greedy[n_acc])
                out = jax.lax.dynamic_update_slice(out, emit, (out_n,))
                ctx = jax.lax.dynamic_update_slice(ctx, emit, (pos + 1,))
                return (ctx, pos + m, out, out_n + m, tcache, dcache,
                        wins + 1, acc + n_acc)

            ctx, pos, out, out_n, tcache, dcache, wins, acc = \
                jax.lax.while_loop(
                    cond, body,
                    (ctx, jnp.asarray(s, jnp.int32), out,
                     jnp.asarray(1, jnp.int32), tcache, dcache,
                     jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32)))
            return out[:max_new], wins, acc

        return jax.jit(loop, static_argnums=(5, 6), donate_argnums=(3, 4))

    def generate_draft_speculative(
        self,
        prompt_tokens: np.ndarray,
        max_new_tokens: int,
        draft: "Engine",
        draft_len: int = 8,
        max_seq: Optional[int] = None,
        host_loop: bool = False,
    ) -> np.ndarray:
        """Greedy generation accelerated by a DRAFT MODEL (two-model
        speculative decoding, Leviathan et al. greedy case): a small model
        proposes `draft_len` tokens autoregressively, this engine verifies
        the whole window in one forward. Output is BIT-IDENTICAL to greedy
        :meth:`generate` — when the draft disagrees, the target's token
        wins. Complements :meth:`generate_speculative` (prompt-lookup,
        no second model): a draft model accepts on free-form text where
        n-gram lookup finds nothing, at the cost of K small-model decode
        steps per window.

        The draft engine must share the vocabulary (same tokenizer); its
        weights are typically a smaller/lower-bit checkpoint of the same
        family. Stats in ``self.spec_stats`` (windows, drafted, accepted).

        prompt_tokens: (1, S) int32. Returns (1, S + max_new_tokens).
        """
        prompt = jnp.asarray(prompt_tokens, jnp.int32)
        b, s = prompt.shape
        assert b == 1, "speculative path is single-stream"
        assert self.config.vocab_size == draft.config.vocab_size, (
            "target and draft must share a vocabulary")
        cache_len = max_seq or self.config.max_seq
        assert s + max_new_tokens + draft_len + 1 <= cache_len, (
            "prompt + max_new + draft_len + 1 must fit in max_seq")
        if not host_loop:
            key = id(draft)
            if key not in self._draft_loops:
                self._draft_loops[key] = self._build_draft_loop(draft)
            tcache = self.new_cache(1, cache_len)
            dcache = draft.new_cache(1, cache_len)
            out, wins, acc = self._draft_loops[key](
                self.params, draft.params, prompt, tcache, dcache,
                max_new_tokens, draft_len)
            self.spec_stats = {"windows": int(wins),
                               "drafted": int(wins) * draft_len,
                               "accepted": int(acc)}
            return np.concatenate(
                [np.asarray(prompt_tokens).reshape(1, -1),
                 np.asarray(out)[None]], axis=1)
        # host-loop reference (same outputs; the readable spec)
        tcache = self.new_cache(1, cache_len)
        dcache = draft.new_cache(1, cache_len)
        logits, tcache = self._prefill(self.params, prompt, tcache)
        _, dcache = draft._prefill(draft.params, prompt, dcache)
        tok = int(np.asarray(jnp.argmax(logits[0, -1])))
        out = [tok]
        pos = s
        self.spec_stats = {"windows": 0, "drafted": 0, "accepted": 0}
        while len(out) < max_new_tokens:
            cur = tok
            draft_toks = []
            p = pos
            dtok = jnp.asarray([[cur]], jnp.int32)
            for _ in range(draft_len):
                lg, dcache = draft._decode(draft.params, dtok,
                                           jnp.asarray(p, jnp.int32), dcache)
                nxt = int(np.asarray(jnp.argmax(lg[0, -1])))
                draft_toks.append(nxt)
                dtok = jnp.asarray([[nxt]], jnp.int32)
                p += 1
            window = np.asarray([[cur] + draft_toks], np.int32)
            logits_all, tcache = self._verify(
                self.params, jnp.asarray(window),
                jnp.asarray(pos, jnp.int32), tcache)
            greedy = np.asarray(jnp.argmax(logits_all[0], axis=-1))
            n_acc = 0
            while (n_acc < draft_len
                   and draft_toks[n_acc] == int(greedy[n_acc])):
                n_acc += 1
            emitted = draft_toks[:n_acc] + [int(greedy[n_acc])]
            emitted = emitted[: max_new_tokens - len(out)]
            out.extend(emitted)
            pos += len(emitted)
            tok = emitted[-1]
            self.spec_stats["windows"] += 1
            self.spec_stats["drafted"] += draft_len
            self.spec_stats["accepted"] += n_acc
        return np.asarray(
            np.concatenate([np.asarray(prompt_tokens).reshape(1, -1),
                            np.asarray(out, np.int32)[None]], axis=1))

    @staticmethod
    def _select(logits, temperature, top_k, top_p, pos, seed):
        if temperature <= 0.0:
            return jnp.argmax(logits[:, -1], axis=-1)[:, None].astype(jnp.int32)
        from squeezellm_tpu import sampling

        lg = logits[:, -1].astype(jnp.float32)
        bsz = lg.shape[0]
        toks = sampling.sample_tokens(
            lg,
            jnp.full((bsz,), temperature, jnp.float32),
            jnp.full((bsz,), top_k, jnp.int32),
            jnp.full((bsz,), top_p, jnp.float32),
            jnp.arange(bsz, dtype=jnp.int32),
            jnp.full((bsz,), pos, jnp.int32),
            seed,
        )
        return toks[:, None]

    def benchmark(
        self,
        input_ids: np.ndarray,
        check: bool = False,
        warmup: int = 3,
        max_seq: Optional[int] = None,
        window: Optional[int] = None,
    ) -> Dict[str, Any]:
        """Reference-protocol decode benchmark (llama.py:223-249): feed
        tokens one at a time with the KV cache; optional next-token ppl check.

        Timing protocol: all T decode steps are dispatched individually and
        chain through the KV cache on device; the wall clock is fenced by
        fetching one logit scalar to host (block_until_ready returns at
        enqueue on some transports, e.g. the axon tunnel, so a host
        transfer is the only reliable fence). By default ONE fence ends the
        whole run: the reference's per-token `torch.cuda.synchronize`
        costs ~microseconds over local PCIe, but a fence on a tunneled
        transport costs a full RTT (~29 ms here) — per-window fencing
        (window=N) would bill ~RTT/N ms/token of pure measurement overhead
        to the decode step (measured: ~0.9 ms/token at window=32, ~9% of a
        7B w4 step). With one fence the RTT amortizes to RTT/T.

        input_ids: (1, T). Token 0 seeds the loop; tokens 1..T-1 are the
        'generated' sequence whose prediction quality --check measures.
        """
        ids = np.asarray(input_ids).reshape(1, -1).astype(np.int32)
        T = ids.shape[1]
        if window is None:
            window = T
        cache = self.new_cache(1, max_seq)
        mod, config, specs = self._mod, self.config, self.specs
        backend, dtype = self.backend, self.dtype

        # One dispatch per token, ZERO per-step host->device transfers:
        # the token ids live on device once, the position and the nll
        # accumulator chain through the step as device values. (The
        # earlier loop uploaded a fresh token + position scalar every
        # step; on a tunneled transport each tiny H2D serializes against
        # the compute stream — measured ~1-2 ms/step of decode-rate loss
        # at 7B.)
        def _bench_step(params, ids_all, pos, nll, cache):
            tok = jax.lax.dynamic_slice(ids_all, (0, pos), (1, 1))
            logits, cache = mod.decode_step(config, specs, params, tok, pos,
                                            cache, backend=backend,
                                            dtype=dtype)
            if check:
                nxt = jax.lax.dynamic_slice(
                    ids_all, (0, jnp.minimum(pos + 1, T - 1)), (1, 1))[0, 0]
                logp = jax.nn.log_softmax(logits[0, -1].astype(jnp.float32))
                nll = nll - jnp.where(pos < T - 1, logp[nxt], 0.0)
            return logits, pos + 1, nll, cache

        step = jax.jit(_bench_step, donate_argnums=(4,))

        ids_dev = jnp.asarray(ids)
        # warmup / compile (pos as device scalar: one trace for all positions)
        pos = jnp.asarray(0, jnp.int32)
        nll = jnp.float32(0.0)
        logits, _, _, cache = step(self.params, ids_dev, pos, nll, cache)
        float(logits[0, -1, 0])  # fence
        for _ in range(warmup):
            logits, _, _, cache = step(self.params, ids_dev, pos, nll, cache)
        float(logits[0, -1, 0])
        # reset cache state
        cache = self.new_cache(1, max_seq)
        jax.block_until_ready(cache)

        window_times = []
        done = 0
        tick = time.perf_counter()
        for i in range(T):
            logits, pos, nll, cache = step(self.params, ids_dev, pos, nll,
                                           cache)
            if (i + 1) % window == 0 or i == T - 1:
                float(logits[0, -1, 0])  # host fence ends the window
                now = time.perf_counter()
                window_times.append((now - tick) / (i + 1 - done))
                done = i + 1
                tick = now

        med = float(np.median(window_times))
        stats: Dict[str, Any] = {
            "tokens": T,
            "median_latency_s": med,
            "mean_latency_s": float(np.mean(window_times)),
            "max_window_latency_s": float(np.max(window_times)),
            "tokens_per_s": 1.0 / med,
        }
        if check:
            stats["check_ppl"] = float(np.exp(float(nll) / (T - 1)))
        mem = _device_memory_stats()
        if mem is not None:
            stats["peak_memory_mib"] = mem
        # memory-bandwidth roofline: decode is weight-streaming bound, so
        # bytes(params)/token / latency vs the chip's HBM BW is the
        # utilization metric BASELINE.md targets (>=90% of roofline)
        pbytes = self.param_bytes()
        stats["param_bytes"] = pbytes
        stats["achieved_gb_s"] = pbytes / med / 1e9
        hbm = _device_hbm_gb_s()
        if hbm:
            stats["hbm_roofline_util"] = round(pbytes / med / 1e9 / hbm, 4)
        return stats

    def param_bytes(self) -> int:
        leaves = jax.tree.leaves(self.params)
        return int(sum(x.size * x.dtype.itemsize for x in leaves))


def truncate_for_draft(config, specs, params, n_layers: int):
    """Early-exit draft construction: the first ``n_layers`` decoder layers
    of the target plus its embedding, final norm, and lm_head, with every
    array SHARED with the target tree (zero extra weight HBM — the draft
    engine only adds its own KV cache).

    Gives two-model speculative decoding (:meth:`Engine.
    generate_draft_speculative`) a draft without a second checkpoint: a
    k-layer prefix is the standard "early exit" draft, and on a trained
    model its argmax agrees with the full model often enough to pay for
    the K cheap steps per verify window.
    """
    import dataclasses

    if not 0 < n_layers <= config.n_layers:
        raise ValueError(
            f"draft layer count must be in [1, {config.n_layers}] "
            f"(model has {config.n_layers} layers), got {n_layers}"
        )
    cfg = dataclasses.replace(config, n_layers=n_layers)
    sp = dict(specs)
    pr = dict(params)
    sp["layers"] = tuple(specs["layers"][:n_layers])
    pr["layers"] = tuple(params["layers"][:n_layers])
    return cfg, sp, pr


def _lookup_draft(ctx, ngram: int, k: int):
    """Prompt-lookup draft: continuation of the most recent PRIOR
    occurrence of the last `ngram` tokens (vectorized window match)."""
    n = len(ctx)
    if k < 1 or n < ngram + 1:
        return []
    a = np.asarray(ctx, np.int64)
    key = a[n - ngram:]
    # windows a[i:i+ngram] for i in [0, n-ngram-1) — exclude the key itself
    m = n - ngram
    if m < 1:
        return []
    win = np.lib.stride_tricks.sliding_window_view(a[: n - 1], ngram)
    hits = np.nonzero((win == key).all(axis=1))[0]
    if len(hits) == 0:
        return []
    i = int(hits[-1])  # most recent prior occurrence
    cont = a[i + ngram : i + ngram + k]
    return [int(t) for t in cont]


_HBM_GB_S = {
    # peak HBM bandwidth per chip, GB/s (public TPU specs)
    "TPU v4": 1228.0,
    "TPU v5 lite": 819.0,
    "TPU v5e": 819.0,
    "TPU v5p": 2765.0,
    "TPU v6 lite": 1640.0,
    "TPU v6e": 1640.0,
}


def _device_hbm_gb_s() -> Optional[float]:
    try:
        kind = jax.local_devices()[0].device_kind
    except Exception:
        return None
    for k, v in _HBM_GB_S.items():
        if kind.startswith(k):
            return v
    return None


def _device_memory_stats() -> Optional[float]:
    try:
        s = jax.local_devices()[0].memory_stats()
        if s and "peak_bytes_in_use" in s:
            return s["peak_bytes_in_use"] / (1024 * 1024)
    except Exception:
        pass
    return None
