"""Profile a 7B decode step: per-op device self-time vs end-to-end step
time — quantifies inter-op scheduling gaps (the residual the block-level
kernel tuning can't see).

Run: PYTHONPATH=.:/root/.axon_site python -u scripts/profile_decode.py \
         [bits] [--plain]

Default builds the FLAGSHIP configuration (quantized lm_head + topX=10
hybrid channels — what bench.py measures); --plain drops both.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import _build_quantized_llama, put_dedup
from squeezellm_tpu import engine as engine_mod
from squeezellm_tpu.models import fuse, llama
from squeezellm_tpu.utils import profiling


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    bits = int(args[0]) if args else 3
    flagship = "--plain" not in sys.argv
    print("backend:", jax.default_backend(), "bits:", bits,
          "flagship:", flagship, flush=True)
    config = llama.LlamaConfig(max_seq=128, n_layers=32)
    specs, params = _build_quantized_llama(
        config, bits=bits, sparsity=0.0045,
        quant_head=flagship, topx=10 if flagship else 0)
    specs, params = fuse.fuse_for_decode("llama", specs, params)
    params = put_dedup(params)
    eng = engine_mod.Engine("llama", config, specs, params,
                            backend="pallas-bf16", dtype=jnp.bfloat16,
                            cache_dtype=jnp.bfloat16, fuse=False)
    eng.specs, eng.params = specs, params  # already fused above

    cache = eng.new_cache(1, 128)
    tok = jnp.asarray([[7]], jnp.int32)
    # compile + warm
    logits, cache = eng._decode(eng.params, tok, jnp.asarray(0, jnp.int32),
                                cache)
    float(logits[0, -1, 0])
    for w in range(3):
        logits, cache = eng._decode(eng.params, tok,
                                    jnp.asarray(w + 1, jnp.int32), cache)
    float(logits[0, -1, 0])

    n = 8
    trace_dir = "/tmp/decode_trace"
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        for i in range(n):
            logits, cache = eng._decode(eng.params, tok,
                                        jnp.asarray(8 + i, jnp.int32), cache)
        float(logits[0, -1, 0])
    wall = (time.perf_counter() - t0) / n
    print(f"wall per step: {wall*1e3:.2f} ms", flush=True)

    rows = profiling.summarize_trace(trace_dir, top=30)
    if not rows:
        print("NO TRACE EVENTS (profiler unsupported on this transport?)")
        return
    total = sum(ms for _, ms, _ in rows)
    print(f"device op time total: {total/n:.2f} ms/step "
          f"(gap {(wall*1e3 - total/n):.2f} ms/step)")
    for name, ms, cnt in rows[:30]:
        print(f"  {ms/n:8.3f} ms/step  x{cnt//n:<4d} {name[:80]}")


if __name__ == "__main__":
    main()
