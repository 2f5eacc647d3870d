"""Explain the paged-vs-dense gap at 32 slots (round-5 VERDICT item 7):
per-op device profile of steady-state 32-slot decode windows on both
engines, admissions excluded (the ladder probe's 48-token requests mix
admission cost into the tok/s).

Run: PYTHONPATH=.:/root/.axon_site python -u scripts/serve32_profile.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from bench import _build_quantized_llama, put_dedup
from squeezellm_tpu import serving
from squeezellm_tpu.models import fuse, llama
from squeezellm_tpu.utils import profiling

SLOTS = 32
WINDOW = 16


def steady_state_windows(eng, label, n_win=4):
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, 32000, int(rng.integers(4, 17))).tolist()
               for _ in range(SLOTS)]
    for p in prompts:
        rid = eng.add_request(p, max_new_tokens=200)  # keep slots busy
        assert rid is not None
    # warm/compile the window
    eng.step_window(WINDOW)
    eng.step_window(WINDOW)  # step_window fetches tokens (host fence)

    t0 = time.perf_counter()
    for _ in range(n_win):
        eng.step_window(WINDOW)  # each window ends in a host fetch
    wall = time.perf_counter() - t0

    trace_dir = f"/tmp/serve32_trace_{label}"
    with jax.profiler.trace(trace_dir):
        for _ in range(2):
            eng.step_window(WINDOW)
    rows = profiling.summarize_trace(trace_dir, top=14)
    tokens = n_win * WINDOW * SLOTS
    print(f"== {label}: {tokens / wall:.0f} tok/s steady "
          f"({wall / n_win * 1e3:.1f} ms/window of {WINDOW})", flush=True)
    per_win = 2
    for name, ms, cnt in rows:
        print(f"  {ms / per_win:8.2f} ms/win x{cnt // 2:<5d} {name[:70]}",
              flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    config = llama.LlamaConfig(max_seq=256, n_layers=32)
    specs, params = _build_quantized_llama(config, bits=4, sparsity=0.0045)
    specs, params = fuse.fuse_for_decode("llama", specs, params)
    params = put_dedup(params)
    backend = "pallas-bf16"
    dense = serving.ContinuousBatchEngine(
        "llama", config, specs, params, slots=SLOTS, backend=backend,
        dtype=jnp.bfloat16, cache_dtype=jnp.bfloat16, max_seq=256)
    steady_state_windows(dense, "dense32")
    del dense
    paged = serving.PagedContinuousBatchEngine(
        "llama", config, specs, params, slots=SLOTS, n_pages=SLOTS * 2 + 4,
        page_size=128, backend=backend, dtype=jnp.bfloat16,
        cache_dtype=jnp.bfloat16, max_seq=256)
    steady_state_windows(paged, "paged32")


if __name__ == "__main__":
    main()
