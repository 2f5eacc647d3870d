"""Driver benchmark: LLaMA-2-7B w4-s0.45% decode throughput on one chip.

Prints ONE JSON line:
  {"metric": "llama2_7b_w4s45_decode_tok_s", "value": <tok/s>,
   "unit": "tokens/s", "vs_baseline": <ratio vs measured bf16 dense decode>}

Baseline = bf16 (fp16-equivalent) dense decode of the same model on the same
chip — the reference's own comparison axis (README.md:11 "same latency,
smaller footprint"). If the bf16 model does not fit in HBM the baseline
falls back to an fp16 memory-roofline estimate from a measured bf16 GEMV
stream rate.

Runs on whatever jax.default_backend() is (the real TPU under axon); falls
back to a scaled-down model on CPU so the bench always emits a line.
"""

import functools
import json
import os
import sys
import time

import numpy as np


def _build_quantized_llama(config, bits, sparsity, key):
    import jax
    import jax.numpy as jnp

    from squeezellm_tpu.models import common as mcommon
    from squeezellm_tpu.models import llama
    from squeezellm_tpu.models.common import LinearSpec
    from squeezellm_tpu.ops.quant_linear import QuantLinearSpec, make_random_params

    shapes = config.linear_shapes()
    spec_layers = []
    param_layers = []
    for li in range(config.n_layers):
        key, sub = jax.random.split(key)
        spec_d = {}
        param_d = {
            "input_norm": jnp.ones((config.hidden_size,), jnp.float32),
            "post_norm": jnp.ones((config.hidden_size,), jnp.float32),
        }
        for name, (o, i) in shapes.items():
            nnz = int(o * i * sparsity)
            nnz_pad = 0 if nnz == 0 else max(512, -(-nnz // 512) * 512)
            qspec = QuantLinearSpec(bits=bits, in_features=i, out_features=o,
                                    nnz_pad=nnz_pad)
            key, sub = jax.random.split(key)
            param_d[name] = make_random_params(sub, qspec)
            spec_d[name] = LinearSpec(in_features=i, out_features=o, quant=qspec)
        spec_layers.append(spec_d)
        param_layers.append(param_d)

    key, k1, k2 = jax.random.split(key, 3)
    params = {
        "embed": (jax.random.normal(k1, (config.vocab_size, config.hidden_size),
                                    jnp.bfloat16) * 0.02).astype(jnp.float32),
        "layers": param_layers,
        "final_norm": jnp.ones((config.hidden_size,), jnp.float32),
        "lm_head": {"w": (jax.random.normal(
            k2, (config.vocab_size, config.hidden_size), jnp.bfloat16
        ) * 0.02).astype(jnp.float32)},
    }
    specs = {
        "layers": tuple(spec_layers),
        "lm_head": LinearSpec(in_features=config.hidden_size,
                              out_features=config.vocab_size),
    }
    return specs, params


def _decode_tok_s(engine, n_tokens, vocab):
    ids = (np.arange(n_tokens, dtype=np.int32)[None] * 7919) % vocab
    stats = engine.benchmark(ids, check=False, warmup=3)
    return stats["tokens_per_s"], stats


def main():
    import jax
    import jax.numpy as jnp

    from squeezellm_tpu import engine as engine_mod
    from squeezellm_tpu.models import llama

    backend = jax.default_backend()
    on_tpu = backend == "tpu"

    if on_tpu:
        config = llama.LlamaConfig(max_seq=2048)  # llama-2-7b shapes
        n_tokens = int(os.environ.get("BENCH_TOKENS", "64"))
    else:
        # CPU smoke fallback: scaled-down model, same code path
        config = llama.LlamaConfig(
            vocab_size=1024, hidden_size=512, intermediate_size=1376,
            n_layers=4, n_heads=8, n_kv_heads=8, max_seq=256,
        )
        n_tokens = 8

    key = jax.random.PRNGKey(0)

    # ---- fp16-equivalent baseline FIRST (bf16 7B ~13.5 GB; it and the
    # quantized model don't fit HBM together) ----
    baseline_tok_s = None
    try:
        dense_params = llama.random_dense_params(config, key, dtype=jnp.bfloat16)
        dspecs = llama.dense_specs(config)
        deng = engine_mod.Engine("llama", config, dspecs, dense_params,
                                 backend="xla", dtype=jnp.bfloat16,
                                 cache_dtype=jnp.bfloat16)
        baseline_tok_s, _ = _decode_tok_s(deng, max(16, n_tokens // 4),
                                          config.vocab_size)
        del dense_params, deng
        import gc

        gc.collect()
    except Exception as e:  # OOM etc.
        print(f"bf16 baseline failed ({type(e).__name__}); using roofline estimate",
              file=sys.stderr)
        # measured bf16 stream rate on one big GEMV
        k = jax.random.PRNGKey(1)
        w = jax.random.normal(k, (config.hidden_size, config.intermediate_size),
                              jnp.bfloat16)
        x = jax.random.normal(k, (1, config.hidden_size), jnp.bfloat16)
        f = jax.jit(lambda a, b: a @ b)
        f(x, w).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(50):
            r = f(x, w)
        r.block_until_ready()
        bw = w.size * 2 * 50 / (time.perf_counter() - t0)
        shapes = config.linear_shapes()
        layer_bytes = sum(o * i * 2 for o, i in shapes.values())
        total = layer_bytes * config.n_layers + (
            config.vocab_size * config.hidden_size * 2
        )
        baseline_tok_s = bw / total

    specs, params = _build_quantized_llama(config, bits=4, sparsity=0.0045, key=key)
    eng = engine_mod.Engine("llama", config, specs, params,
                            backend="pallas" if on_tpu else "xla",
                            cache_dtype=jnp.bfloat16)
    tok_s, stats = _decode_tok_s(eng, n_tokens, config.vocab_size)

    result = {
        "metric": "llama2_7b_w4s45_decode_tok_s" if on_tpu
        else "llama_small_w4s45_decode_tok_s_cpu",
        "value": round(tok_s, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tok_s / baseline_tok_s, 3) if baseline_tok_s else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
