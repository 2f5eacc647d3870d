"""Speculative decoding at 7B on the real chip: tokens/s on repetitive
vs unstructured prompts, vs plain greedy decode.

The accept rate (and thus the speedup) is text-dependent: repetitive
continuations (code, extraction, summaries quoting the source) accept
most drafts; random tokens accept none and degenerate to ~1 token per
verification window. Both ends are reported.

Run: PYTHONPATH=.:/root/.axon_site python -u scripts/spec_probe.py [bits]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from bench import _build_quantized_llama, put_dedup
from squeezellm_tpu import engine as engine_mod
from squeezellm_tpu.models import fuse, llama


def main():
    bits = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    print("backend:", jax.default_backend(), flush=True)
    config = llama.LlamaConfig(max_seq=512, n_layers=32)
    specs, params = _build_quantized_llama(config, bits=bits, sparsity=0.0045)
    specs, params = fuse.fuse_for_decode("llama", specs, params)
    params = put_dedup(params)
    eng = engine_mod.Engine("llama", config, specs, params,
                            backend="pallas-bf16", dtype=jnp.bfloat16,
                            cache_dtype=jnp.bfloat16)
    eng.specs, eng.params = specs, params

    rng = np.random.default_rng(0)
    phrase = rng.integers(0, config.vocab_size, 16).tolist()
    prompts = {
        "repetitive": np.asarray(phrase * 6, np.int32)[None],
        "random": rng.integers(0, config.vocab_size, 96,
                               dtype=np.int64).astype(np.int32)[None],
    }
    n = 128
    for name, p in prompts.items():
        # warm both paths with the SAME max_new — max_new is a static arg
        # of the device spec loop, so a different warm length would leave
        # the measured call paying its compile
        eng.generate(p, n)
        eng.generate_speculative(p, n, draft_len=8, ngram=2)
        t0 = time.perf_counter()
        eng.generate(p, n)
        t_plain = time.perf_counter() - t0
        t0 = time.perf_counter()
        eng.generate_speculative(p, n, draft_len=8, ngram=2)
        t_spec = time.perf_counter() - t0
        st = eng.spec_stats
        acc = st["accepted"] / max(1, st["drafted"])
        print(f"{name:11s}: plain {n/t_plain:6.1f} tok/s | spec "
              f"{n/t_spec:6.1f} tok/s ({t_plain/t_spec:4.2f}x) | "
              f"windows {st['windows']} accept {acc:.0%}", flush=True)


if __name__ == "__main__":
    main()
