"""Measure the 17..1023-row sparse band (round-5 VERDICT item 5): a
136-token admission-style prefill at 7B w4, with

  dense     sparsity 0 (floor)
  two-hop   current path: fused kernel + per-linear gather_spmv launches
            (VPU work ~linear in batch rows)
  scratch   SQUEEZELLM_SPARSE_FOLD_MIN=17: dequant-to-scratch + one
            sidecar scatter + dense MXU matmul (2x weight-bytes HBM,
            batch-independent sparse cost)

Timing: fenced wall around the jitted prefill, median of trials.

Run: PYTHONPATH=.:/root/.axon_site python -u scripts/band_probe.py [ntok]
"""

import os
import sys
import time

import numpy as np


def run(variant, ntok):
    import jax
    import jax.numpy as jnp

    from bench import _build_quantized_llama, put_dedup
    from squeezellm_tpu import engine as engine_mod
    from squeezellm_tpu.models import fuse, llama

    os.environ.pop("SQUEEZELLM_SPARSE_FOLD_MIN", None)
    if variant == "scratch":
        os.environ["SQUEEZELLM_SPARSE_FOLD_MIN"] = "17"
    config = llama.LlamaConfig(max_seq=512, n_layers=32)
    specs, params = _build_quantized_llama(
        config, bits=4, sparsity=0.0 if variant == "dense" else 0.0045,
        quant_head=True, topx=10)
    specs, params = fuse.fuse_for_decode("llama", specs, params)
    params = put_dedup(params)
    eng = engine_mod.Engine("llama", config, specs, params,
                            backend="pallas-bf16", dtype=jnp.bfloat16,
                            cache_dtype=jnp.bfloat16, fuse=False)
    eng.specs, eng.params = specs, params

    ids = (np.arange(ntok, dtype=np.int32)[None] * 127) % config.vocab_size
    ids = jnp.asarray(ids)
    cache = eng.new_cache(1, 512)
    logits, cache = eng._prefill(eng.params, ids, cache)
    float(logits[0, -1, 0])  # compile+warm fence
    times = []
    for _ in range(6):
        cache = eng.new_cache(1, 512)
        jax.block_until_ready(cache)
        t0 = time.perf_counter()
        logits, cache = eng._prefill(eng.params, ids, cache)
        float(logits[0, -1, 0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    ntok = int(sys.argv[1]) if len(sys.argv) > 1 else 136
    base = None
    for variant in ("dense", "two-hop", "scratch"):
        t = run(variant, ntok)
        extra = "" if base is None else f"  sparse overhead {1e3*(t-base):7.1f} ms"
        if base is None:
            base = t
        print(f"{variant:8s} {1e3*t:8.1f} ms / {ntok}-token prefill{extra}",
              flush=True)


if __name__ == "__main__":
    main()
