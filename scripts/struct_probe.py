"""A/B: structured additive codebook vs free 16-entry table at w4 flagship.

The structured family (lut[c] = A[c&7] + (c>>3)*d, fit by
quantize.kmeans.fit_structured_luts) dequantizes with ONE wrap-gather + a
bit-3 mask (~4 VPU ops/weight) instead of two gathers + select (~6) — the
round-5 attack on the w4 VPU wall (VERDICT item 2). Fidelity is gated
separately in tests/test_quantize.py; this probe measures the speed side.

Run: PYTHONPATH=.:/root/.axon_site python -u scripts/struct_probe.py
"""

import os
import sys

import numpy as np


def run(structured, use_struct_kernel=True):
    import jax.numpy as jnp

    from bench import _build_quantized_llama, put_dedup
    from squeezellm_tpu import engine as engine_mod
    from squeezellm_tpu.models import fuse, llama

    os.environ["SQUEEZELLM_STRUCT"] = "1" if use_struct_kernel else "0"
    config = llama.LlamaConfig(max_seq=128, n_layers=32)
    specs, params = _build_quantized_llama(
        config, bits=4, sparsity=0.0045, quant_head=True, topx=10,
        structured=structured)
    specs, params = fuse.fuse_for_decode("llama", specs, params)
    params = put_dedup(params)
    eng = engine_mod.Engine("llama", config, specs, params,
                            backend="pallas-bf16", dtype=jnp.bfloat16,
                            cache_dtype=jnp.bfloat16, fuse=False)
    eng.specs, eng.params = specs, params
    ids = (np.arange(96, dtype=np.int32)[None] * 7919) % config.vocab_size
    stats = eng.benchmark(ids, check=False, warmup=3, max_seq=128)
    return stats


def main():
    cases = [("free-lut", False, True),
             ("struct-lut+kernel", True, True),
             ("struct-lut, std kernel", True, False)]
    if len(sys.argv) > 1:
        want = sys.argv[1].split(",")
        cases = [c for c in cases if c[0] in want]
    for name, s, k in cases:
        st = run(s, k)
        print(f"{name:24s} {1e3*st['median_latency_s']:7.3f} ms/tok  "
              f"{st['tokens_per_s']:7.1f} tok/s", flush=True)


if __name__ == "__main__":
    main()
