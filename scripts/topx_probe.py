"""A/B the hybrid topX placement variants on a w3 flagship decode step.

Round-5 profile finding: the default in-graph one-hot compare makes XLA
copy each tiny s32 index array into scalar memory EVERY dispatch
(~9 us/copy, ~0.33 ms/step at 7B w3 — copy-done s32[10|30]{S(1)} in the
trace). This probe measures end-to-end decode tok/s for each
SQUEEZELLM_TOPX_MODE so the default can be picked from data.

Run: PYTHONPATH=.:/root/.axon_site python -u scripts/topx_probe.py [bits]
"""

import os
import sys

import numpy as np

MODES = ["auto", "none"]


def run_mode(mode, bits):
    import jax.numpy as jnp

    from bench import _build_quantized_llama, put_dedup
    from squeezellm_tpu import engine as engine_mod
    from squeezellm_tpu.models import fuse, llama

    os.environ["SQUEEZELLM_TOPX_MODE"] = mode if mode != "none" else "onehot"
    config = llama.LlamaConfig(max_seq=128, n_layers=32)
    specs, params = _build_quantized_llama(
        config, bits=bits, sparsity=0.0045, quant_head=True,
        topx=0 if mode == "none" else 10)
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
    bits = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    modes = sys.argv[2].split(",") if len(sys.argv) > 2 else MODES
    for mode in modes:
        stats = run_mode(mode, bits)
        print(f"mode={mode:10s} {1e3*stats['median_latency_s']:7.3f} ms/tok  "
              f"{stats['tokens_per_s']:7.1f} tok/s", flush=True)


if __name__ == "__main__":
    main()
