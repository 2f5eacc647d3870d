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


def main():
    args = [a for a in sys.argv[1:] if a != "--paged"]
    paged = "--paged" in sys.argv[1:]
    slots_list = [int(s) for s in args] or [1, 8]
    print("backend:", jax.default_backend(), flush=True)
    config = llama.LlamaConfig(max_seq=256, n_layers=32)
    specs, params = _build_quantized_llama(config, bits=4, sparsity=0.0045)
    specs, params = fuse.fuse_for_decode("llama", specs, params)
    params = put_dedup(params)
    on_tpu = jax.default_backend() == "tpu"
    backend = "pallas-bf16" if on_tpu else "xla"

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
            t0 = time.perf_counter()
            results = eng.run(prompts, max_new_tokens=48, window=window)
            dt = time.perf_counter() - t0
            total = sum(len(t) for t in results.values())
            print(f"slots={slots:3d} requests={n_req:3d} window={window:2d}: "
                  f"{total} tokens in {dt:.2f}s -> {total/dt:7.1f} tok/s",
                  flush=True)


if __name__ == "__main__":
    main()
