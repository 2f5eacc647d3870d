"""Localize the prefix-shared paged-admission slowdown (ROADMAP item 8:
shared admission measured 15x slower than distinct on hardware, CPU
parity — so it is TPU/transport-specific).

Times each admission component SEPARATELY at 7B scale, shared vs
distinct, with host-fetch fences:

  alloc   host-side page bookkeeping (lookup_chain/retain/alloc)
  cache   dense temp-cache creation (device zeros)
  prime   _prime_dense (gather shared pages -> dense rows)
  prefill continuation prefill of the suffix (16-token bucket) vs the
          full-prompt prefill (distinct)
  scatter _scatter_all (dense rows -> new pool pages)

Run: PYTHONPATH=.:/root/.axon_site python -u scripts/admission_probe.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from bench import _build_quantized_llama, put_dedup
from squeezellm_tpu import serving
from squeezellm_tpu.models import common, fuse, llama


def fence(x):
    jax.block_until_ready(x)
    # the axon tunnel can ack at enqueue: force a real host fetch
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def main():
    import sys

    print("backend:", jax.default_backend(), flush=True)
    if "--small" in sys.argv[1:]:  # CPU smoke: tiny model, same code path
        config = llama.LlamaConfig(
            vocab_size=512, hidden_size=256, intermediate_size=688,
            n_layers=2, n_heads=4, n_kv_heads=4, max_seq=256)
    else:
        config = llama.LlamaConfig(max_seq=256, n_layers=32)
    specs, params = _build_quantized_llama(config, bits=4, sparsity=0.0045)
    specs, params = fuse.fuse_for_decode("llama", specs, params)
    params = put_dedup(params)
    on_tpu = jax.default_backend() == "tpu"
    backend = "pallas-bf16" if on_tpu else "xla"
    rng = np.random.default_rng(0)
    shared = rng.integers(0, config.vocab_size, 128).tolist()

    eng = serving.PagedContinuousBatchEngine(
        "llama", config, specs, params, slots=8, n_pages=40, page_size=128,
        backend=backend, dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        cache_dtype=jnp.bfloat16, max_seq=256)

    # warm/compile both admission shapes + a decode step
    eng.run([shared + rng.integers(0, config.vocab_size, 8).tolist()
             for _ in range(2)], max_new_tokens=2, window=2)

    for mode in ("distinct", "shared"):
        for it in range(3):
            if mode == "shared":
                prompt = shared + rng.integers(0, config.vocab_size,
                                               8).tolist()
            else:
                prompt = rng.integers(0, config.vocab_size, 136).tolist()
            prompt = [int(t) for t in prompt]
            t = {}
            t0 = time.perf_counter()
            shared_pids, chain_key = eng.pool.lookup_chain(prompt)
            n_shared = len(shared_pids)
            for pid in shared_pids:
                eng.pool.retain(pid)
            total_pages = -(-(len(prompt) + 16) // eng.ps)
            new_pids = [eng.pool.alloc()
                        for _ in range(total_pages - n_shared)]
            pids = shared_pids + new_pids
            t["alloc"] = time.perf_counter() - t0

            t0 = time.perf_counter()
            dense = common.init_kv_cache(
                1, eng.maxp * eng.ps, config.n_layers, config.n_kv_heads,
                config.head_dim, eng.pool.pools[0]["pk"].dtype)
            fence(dense[0]["k"])
            t["cache"] = time.perf_counter() - t0

            t0 = time.perf_counter()
            if n_shared:
                spids = jnp.asarray(shared_pids, jnp.int32)
                dense = eng._prime_dense(eng.pool.pools, dense, spids)
                fence(dense[0]["k"])
            t["prime"] = time.perf_counter() - t0

            start = n_shared * eng.ps
            suffix = prompt[start:]
            b = eng.PROMPT_BUCKET
            padded = np.zeros((1, -(-len(suffix) // b) * b), np.int32)
            padded[0, :len(suffix)] = suffix
            t0 = time.perf_counter()
            _, dense = eng._prefill(eng.params, jnp.asarray(padded), dense,
                                    jnp.asarray(start, jnp.int32))
            fence(dense[0]["k"])
            t["prefill"] = time.perf_counter() - t0

            covered = -(-len(prompt) // eng.ps)
            t0 = time.perf_counter()
            if covered > n_shared:
                npids = jnp.asarray(pids[n_shared:covered], jnp.int32)
                eng.pool.pools = eng._scatter_all(
                    eng.pool.pools, dense, npids,
                    jnp.asarray(n_shared, jnp.int32),
                    jnp.asarray(covered - n_shared, jnp.int32))
                fence(eng.pool.pools[0]["pk"])
            t["scatter"] = time.perf_counter() - t0

            # release everything so iterations don't exhaust the pool
            registered = set(eng.pool._registry.values())
            for pid in pids:
                eng.pool.release(pid, registered=pid in registered)

            parts = " ".join(f"{k}={1000*v:7.1f}ms" for k, v in t.items())
            print(f"{mode:9s} it{it}: {parts} | total "
                  f"{1000*sum(t.values()):7.1f}ms", flush=True)


if __name__ == "__main__":
    main()
