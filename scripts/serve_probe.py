"""Continuous-batching throughput at 7B scale on the real chip.

Measures total generated tokens/s with B pooled slots (weights stream once
per step for all slots — the TPU-serving number the batch-1 latency
benchmark can't show).

Run: PYTHONPATH=.:/root/.axon_site python -u scripts/serve_probe.py [slots...]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from bench import _build_quantized_llama, put_dedup
from squeezellm_tpu import serving
from squeezellm_tpu.models import fuse, llama


def prefix_probe(config, specs, params, backend, on_tpu):
    """Prefix sharing: identical 128-token prefixes should cut admission
    prefill cost (shared pages are reused AND not recomputed)."""
    rng = np.random.default_rng(0)
    shared = rng.integers(0, config.vocab_size, 128).tolist()
    for mode in ("distinct", "shared"):
        eng = serving.PagedContinuousBatchEngine(
            "llama", config, specs, params, slots=8, n_pages=40,
            page_size=128, backend=backend,
            dtype=jnp.bfloat16 if on_tpu else jnp.float32,
            cache_dtype=jnp.bfloat16, max_seq=256,
        )
        if mode == "shared":
            prompts = [shared + rng.integers(0, config.vocab_size, 8).tolist()
                       for _ in range(17)]
        else:
            prompts = [rng.integers(0, config.vocab_size, 136).tolist()
                       for _ in range(17)]
        # warm/compile BOTH admission shapes: the first request prefills
        # the whole prompt (no registered prefix yet); the second, in
        # shared mode, takes the continuation-prefill path (16-token
        # suffix bucket + page prime) — without this the measured run
        # pays a ~25 s one-time compile and the comparison is garbage
        eng.run(prompts[:2], max_new_tokens=2, window=8)
        # instrumented run. NOTE: admissions are NOT fenced — a
        # block_until_ready per admission costs a full transport RTT
        # (~29 ms) and the dispatch pipelining the engine relies on;
        # t_admit is the HOST enqueue share, the device cost lands in
        # the following step_window wall.
        t_admit = t_step = 0.0
        n_admit = n_step = 0
        pending = list(prompts[2:])
        results = {}
        t0 = time.perf_counter()
        while pending or any(s.active for s in eng._slots):
            while pending and eng.free_slots() > 0:
                ta = time.perf_counter()
                rid = eng.add_request(pending.pop(0), 16)
                t_admit += time.perf_counter() - ta
                n_admit += 1
                results[rid] = []
            ts = time.perf_counter()
            out = eng.step_window(8)
            t_step += time.perf_counter() - ts
            n_step += 1
            for rid, r in out.items():
                results.setdefault(rid, []).extend(r["new_tokens"])
        dt = time.perf_counter() - t0
        total = sum(len(t) for t in results.values())
        print(f"prefix={mode:9s}: {total} tokens in {dt:.2f}s "
              f"-> {total/dt:7.1f} tok/s | admit {n_admit}x "
              f"{1000*t_admit/max(n_admit,1):.1f}ms step {n_step}x "
              f"{1000*t_step/max(n_step,1):.1f}ms", flush=True)


def chunked_probe(config, specs, params, backend, on_tpu):
    """Chunked-admission interleaving at 7B: 200-token prompts over 8
    slots, whole-prompt vs prefill_chunk=64 admission. The whole-prompt
    mode stalls every decoding slot for a full 200-token prefill at each
    join; chunked admission bounds the stall at one 64-token chunk.
    Reports total tok/s and the p95 gap between consecutive step
    returns (the stall decoding slots actually see)."""
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, config.vocab_size, 200).tolist()
               for _ in range(17)]
    for mode in ("whole", "chunk64"):
        kw = dict(prefill_chunk=64) if mode == "chunk64" else {}
        eng = serving.PagedContinuousBatchEngine(
            "llama", config, specs, params, slots=8, n_pages=40,
            page_size=128, backend=backend,
            dtype=jnp.bfloat16 if on_tpu else jnp.float32,
            cache_dtype=jnp.bfloat16, max_seq=256, **kw)
        # warm both admission shapes and the decode window
        eng.run(prompts[:2], max_new_tokens=2, window=8)
        pending = list(prompts[2:])
        results = {}
        gaps = []
        t0 = time.perf_counter()
        last = t0
        while pending or any(s.active for s in eng._slots):
            while pending and eng.free_slots() > 0:
                eng.add_request(pending.pop(0), 16)
            out = eng.step_window(8)
            now = time.perf_counter()
            if out:  # gap between consecutive emitting windows
                gaps.append(now - last)
                last = now
            for rid, r in out.items():
                results.setdefault(rid, []).extend(r["new_tokens"])
        dt = time.perf_counter() - t0
        total = sum(len(t) for t in results.values())
        gaps.sort()
        p95 = gaps[int(0.95 * (len(gaps) - 1))] if gaps else float("nan")
        print(f"admission={mode:8s}: {total} tokens in {dt:.2f}s -> "
              f"{total/dt:7.1f} tok/s | emit-gap p95 {1000*p95:.0f} ms "
              f"({len(gaps)} windows)", flush=True)


def spec_probe(config, specs, params, backend, on_tpu, slots=8, paged=False):
    """Slot-batched speculative serving vs plain windowed serving.

    Accept rate (and the win/loss) is text-dependent, exactly as in
    scripts/spec_probe.py: repetitive continuations accept most drafts;
    random prompts accept ~none and the spec engine degenerates to one
    host sync per token (a LOSS vs the plain 16-token windows). Both
    workloads are reported."""
    rng = np.random.default_rng(0)
    phrase = rng.integers(0, config.vocab_size, 12).tolist()
    workloads = {
        "repetitive": [phrase * 5 for _ in range(slots * 2)],
        "random": [rng.integers(0, config.vocab_size,
                                int(rng.integers(4, 17))).tolist()
                   for _ in range(slots * 2)],
    }
    for mode in ("plain-w16", "spec-8-2"):
        kw = dict(slots=slots, backend=backend,
                  dtype=jnp.bfloat16 if on_tpu else jnp.float32,
                  cache_dtype=jnp.bfloat16, max_seq=256)
        if mode.startswith("spec"):
            kw["speculative"] = (8, 2)
        if paged:
            eng = serving.PagedContinuousBatchEngine(
                "llama", config, specs, params, n_pages=slots * 2 + 4,
                page_size=128, **kw)
        else:
            eng = serving.ContinuousBatchEngine(
                "llama", config, specs, params, **kw)
        # warm BOTH workloads: prompt-length buckets differ, so each must
        # compile its prefill; max_new 16 compiles the k=16 scan for the
        # plain engine (and the fixed-shape spec window for the spec one)
        for prompts in workloads.values():
            eng.run(prompts[:1], max_new_tokens=16, window=16)
        for wname, prompts in workloads.items():
            t0 = time.perf_counter()
            results = eng.run(prompts, max_new_tokens=48, window=16)
            dt = time.perf_counter() - t0
            total = sum(len(t) for t in results.values())
            print(f"{mode:9s} {wname:10s} slots={slots}: {total} tokens "
                  f"in {dt:.2f}s -> {total/dt:7.1f} tok/s", flush=True)


def main():
    args = [a for a in sys.argv[1:]
            if a not in ("--paged", "--prefix", "--spec", "--chunked")]
    paged = "--paged" in sys.argv[1:]
    prefix = "--prefix" in sys.argv[1:]
    spec = "--spec" in sys.argv[1:]
    chunked = "--chunked" in sys.argv[1:]
    slots_list = [int(s) for s in args] or [1, 8]
    print("backend:", jax.default_backend(), flush=True)
    config = llama.LlamaConfig(max_seq=256, n_layers=32)
    specs, params = _build_quantized_llama(config, bits=4, sparsity=0.0045)
    specs, params = fuse.fuse_for_decode("llama", specs, params)
    params = put_dedup(params)
    on_tpu = jax.default_backend() == "tpu"
    backend = "pallas-bf16" if on_tpu else "xla"

    if prefix:
        prefix_probe(config, specs, params, backend, on_tpu)
        return
    if chunked:
        chunked_probe(config, specs, params, backend, on_tpu)
        return
    if spec:
        spec_probe(config, specs, params, backend, on_tpu,
                   slots=slots_list[0] if args else 8, paged=paged)
        return

    rng = np.random.default_rng(0)
    for slots in slots_list:
        if paged:
            eng = serving.PagedContinuousBatchEngine(
                "llama", config, specs, params, slots=slots,
                n_pages=slots * 2 + 4, page_size=128, backend=backend,
                dtype=jnp.bfloat16 if on_tpu else jnp.float32,
                cache_dtype=jnp.bfloat16, max_seq=256,
            )
        else:
            eng = serving.ContinuousBatchEngine(
                "llama", config, specs, params, slots=slots, backend=backend,
                dtype=jnp.bfloat16 if on_tpu else jnp.float32,
                cache_dtype=jnp.bfloat16, max_seq=256,
            )
        n_req = slots * 2
        prompts = [rng.integers(0, config.vocab_size,
                                int(rng.integers(4, 17))).tolist()
                   for _ in range(n_req)]
        for window in (1, 8, 16):
            eng.run(prompts[:1], max_new_tokens=window, window=window)  # warm
            if slots > 1:
                # warm the cohort-admission graph too (batched prefill +
                # scatter at k=slots; run() admits pending in cohorts).
                # max_new=window keeps the decode shapes on the already-
                # warmed k=window path (max_new=1 would compile a stray
                # single-step graph)
                eng.run(prompts[:slots], max_new_tokens=window,
                        window=window)
            t0 = time.perf_counter()
            results = eng.run(prompts, max_new_tokens=48, window=window)
            dt = time.perf_counter() - t0
            total = sum(len(t) for t in results.values())
            print(f"slots={slots:3d} requests={n_req:3d} window={window:2d}: "
                  f"{total} tokens in {dt:.2f}s -> {total/dt:7.1f} tok/s",
                  flush=True)


if __name__ == "__main__":
    main()
