"""Eval-path (2048-token stride forward) throughput at 7B scale.

The perplexity evaluator runs full-sequence forwards (eval.py); this probes
one stride's wall time for the quantized pallas path vs bf16 dense.

Run: PYTHONPATH=.:/root/.axon_site python -u scripts/eval_probe.py
"""

import sys
import time

import jax
import jax.numpy as jnp

from bench import _build_quantized_llama, put_dedup
from squeezellm_tpu.models import llama


def probe(variant, seqlen=2048):
    # variant suffix -gN: N strides per forward (eval.perplexity group=N)
    g = 1
    if "-g" in variant:
        variant, gs = variant.rsplit("-g", 1)
        g = int(gs)
    config = llama.LlamaConfig(max_seq=seqlen)
    if variant == "bf16":
        params = llama.random_dense_params(config, jax.random.PRNGKey(0),
                                           dtype=jnp.bfloat16)
        specs = llama.dense_specs(config)
        backend, dtype = "xla", jnp.bfloat16
    else:
        specs, params = _build_quantized_llama(config, bits=4, sparsity=0.0045)
        params = put_dedup(params)
        on_tpu = jax.default_backend() == "tpu"
        if variant == "quant-bf16":
            backend = "pallas-bf16" if on_tpu else "xla"
            dtype = jnp.bfloat16
        else:
            backend = "pallas" if on_tpu else "xla"
            dtype = jnp.float32

    @jax.jit
    def fwd(params, tokens):
        logits = llama.forward(config, specs, params, tokens, backend=backend,
                               dtype=dtype)
        return jnp.sum(logits[0, -1]).astype(jnp.float32)

    tokens = jnp.ones((g, seqlen), jnp.int32)
    t0 = time.perf_counter()
    float(fwd(params, tokens))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(fwd(params, tokens))
        best = min(best, time.perf_counter() - t0)
    best /= g
    print(f"{variant:10s} g={g} compile {compile_s:6.1f}s | "
          f"stride {best*1e3:8.1f} ms ({seqlen/best:7.0f} tok/s prefill)",
          flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    for v in (sys.argv[1:] or ["quant", "bf16"]):
        probe(v)
