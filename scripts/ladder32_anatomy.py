"""Where does the paged-at-32 ladder wall go? (round-5 follow-up)

The published ladder (serve_probe, 64 short requests x 48 new tokens,
window=16) measures paged 504 vs dense 889 tok/s at 32 slots, while
steady-state decode windows are at parity (serve32_profile). 64 x the
~7 ms admission delta only explains ~0.45 s of the ~2.6 s gap — this
probe times every add_request and step_window call inside the actual
run() workload on both engines to find the rest.

Run: PYTHONPATH=.:/root/.axon_site python -u scripts/ladder32_anatomy.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from bench import _build_quantized_llama, put_dedup
from squeezellm_tpu import serving
from squeezellm_tpu.models import fuse, llama

SLOTS = 32


def timed(eng, label):
    rng = np.random.default_rng(0)
    n_req = SLOTS * 2
    prompts = [rng.integers(0, 32000, int(rng.integers(4, 17))).tolist()
               for _ in range(n_req)]
    # warm exactly as serve_probe does (incl. the cohort-admission graph)
    eng.run(prompts[:1], max_new_tokens=16, window=16)
    eng.run(prompts[:SLOTS], max_new_tokens=16, window=16)

    admits, windows = [], []
    orig_add, orig_win = eng.add_requests, eng.step_window

    def add_requests(*a, **k):
        t0 = time.perf_counter()
        r = orig_add(*a, **k)
        admits.append(time.perf_counter() - t0)
        return r

    def step_window(*a, **k):
        t0 = time.perf_counter()
        r = orig_win(*a, **k)
        windows.append(time.perf_counter() - t0)
        return r

    eng.add_requests, eng.step_window = add_requests, step_window
    t0 = time.perf_counter()
    results = eng.run(prompts, max_new_tokens=48, window=16)
    wall = time.perf_counter() - t0
    eng.add_requests, eng.step_window = orig_add, orig_win

    total = sum(len(t) for t in results.values())
    a, w = sum(admits), sum(windows)
    print(f"== {label}: {total} tok in {wall:.2f}s -> {total/wall:.1f} tok/s")
    print(f"   admits : {len(admits):3d} calls {a:6.2f}s "
          f"(mean {a/len(admits)*1e3:6.1f} ms, "
          f"max {max(admits)*1e3:6.1f} ms)")
    print(f"   windows: {len(windows):3d} calls {w:6.2f}s "
          f"(mean {w/len(windows)*1e3:6.1f} ms)")
    print(f"   other  : {wall - a - w:6.2f}s", flush=True)
    # window-size histogram: short windows (slots draining) decode fewer
    # tokens per host sync at the same per-window cost
    ws = sorted(windows, reverse=True)[:6]
    print("   slowest windows (ms):",
          " ".join(f"{x*1e3:.0f}" for x in ws), flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    config = llama.LlamaConfig(max_seq=256, n_layers=32)
    specs, params = _build_quantized_llama(config, bits=4, sparsity=0.0045)
    specs, params = fuse.fuse_for_decode("llama", specs, params)
    params = put_dedup(params)
    backend = "pallas-bf16" if jax.default_backend() == "tpu" else "xla"
    kw = dict(backend=backend, dtype=jnp.bfloat16, cache_dtype=jnp.bfloat16,
              max_seq=256)
    dense = serving.ContinuousBatchEngine(
        "llama", config, specs, params, slots=SLOTS, **kw)
    timed(dense, "dense32")
    del dense
    paged = serving.PagedContinuousBatchEngine(
        "llama", config, specs, params, slots=SLOTS, n_pages=SLOTS * 2 + 4,
        page_size=128, **kw)
    timed(paged, "paged32")


if __name__ == "__main__":
    main()
