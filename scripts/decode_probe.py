"""True on-device decode-step cost at 7B scale, tunnel-proof.

Wraps N decode steps in one lax.scan (single dispatch, one fetch), so the
axon tunnel's ~29ms RTT and ~0.27ms/enqueue host costs don't pollute the
measurement. Reports ms/token for each variant:

  PYTHONPATH=.:/root/.axon_site python -u scripts/decode_probe.py \
      [--variants pallas-s45 pallas-s0 xla-s0 bf16] [--steps 32]
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp


def build(variant, n_layers=32):
    from bench import _build_quantized_llama
    from squeezellm_tpu.models import llama

    if "13b" in variant:  # Vicuna/LLaMA-13B shapes (config ladder)
        config = llama.LlamaConfig(
            hidden_size=5120, intermediate_size=13824, n_layers=40,
            n_heads=40, n_kv_heads=40, max_seq=2048)
    elif "mistral" in variant:  # Mistral-7B: GQA 8 kv heads, sliding window
        config = llama.LlamaConfig(
            hidden_size=4096, intermediate_size=14336, n_layers=32,
            n_heads=32, n_kv_heads=8, max_seq=2048, sliding_window=4096,
            rope_theta=1e6, vocab_size=32000)
    else:
        config = llama.LlamaConfig(max_seq=2048, n_layers=n_layers)
    if variant.replace("-win", "") == "bf16":
        params = llama.random_dense_params(config, jax.random.PRNGKey(0),
                                           dtype=jnp.bfloat16)
        specs = llama.dense_specs(config)
        backend, dtype = "xla", jnp.bfloat16
    else:
        # variants: {pallas,pallasbf16,xla}-s{0,45}[-w3][-bf16act][-fused][-win]
        base = variant.split("-")[0]
        backend = {"pallas": "pallas", "pallasbf16": "pallas-bf16",
                   "xla": "xla"}[base]
        sparsity = 0.0045 if "s45" in variant else 0.0
        specs, params = _build_quantized_llama(
            config, bits=3 if "w3" in variant else 4, sparsity=sparsity,
            key=jax.random.PRNGKey(0)
        )
        if "qhead" in variant:  # opt-in quantized lm_head
            import jax as _jax

            from squeezellm_tpu.models.common import LinearSpec
            from squeezellm_tpu.ops import quant_linear as ql

            hq = ql.QuantLinearSpec(
                bits=3 if "w3" in variant else 4,
                in_features=config.hidden_size,
                out_features=config.vocab_size)
            specs = dict(specs)
            specs["lm_head"] = LinearSpec(
                in_features=config.hidden_size,
                out_features=config.vocab_size, quant=hq)
            params = dict(params)
            params["lm_head"] = {
                k: (v if hasattr(v, "shape") else v)
                for k, v in ql.make_random_params(
                    _jax.random.PRNGKey(7), hq).items()}
        if "fused" in variant:
            from squeezellm_tpu.models import fuse

            specs, params = fuse.fuse_for_decode("llama", specs, params)
        dtype = jnp.bfloat16 if "bf16act" in variant else jnp.float32
    return config, specs, params, backend, dtype


def probe(variant, steps, n_layers=32, batch=1):
    from bench import put_dedup
    from squeezellm_tpu.models import common, llama

    if "-eng" in variant:
        # engine.benchmark protocol: chained per-step dispatches with a
        # host-fetch fence per 32-token window (what bench.py records) —
        # use to A/B kernels whose in-place cache aliasing a lax.scan
        # carry may not honor (ops/decode_attn.py)
        from squeezellm_tpu import engine as engine_mod

        config, specs, params, backend, dtype = build(
            variant.replace("-eng", ""), n_layers)
        params = put_dedup(params)
        eng = engine_mod.Engine(
            "llama", config, specs, params, backend=backend, dtype=dtype,
            cache_dtype=jnp.bfloat16, fuse=False)
        ids = (np.arange(steps, dtype=np.int32)[None] * 7919) % config.vocab_size
        t0 = time.perf_counter()
        stats = eng.benchmark(ids, check=False, warmup=3,
                              max_seq=max(128, -(-steps // 128) * 128))
        wall = time.perf_counter() - t0
        print(f"{variant:16s} b=1   wall {wall:6.1f}s | "
              f"{1e3 * stats['median_latency_s']:8.2f} ms/step "
              f"({stats['tokens_per_s']:7.1f} tok/s engine-protocol)",
              flush=True)
        return

    config, specs, params, backend, dtype = build(variant, n_layers)
    if "win" in variant:  # window cache to the decoded length (bench protocol)
        import dataclasses

        config = dataclasses.replace(config, max_seq=max(128, steps))
    params = put_dedup(params)
    cache = common.init_kv_cache(batch, config.max_seq, config.n_layers,
                                 config.n_kv_heads, config.head_dim,
                                 jnp.bfloat16)

    @jax.jit
    def run(params, tokens, cache):
        def step(carry, tok):
            cache, pos = carry
            logits, cache = llama.decode_step(
                config, specs, params, tok, pos, cache,
                backend=backend, dtype=dtype,
            )
            nxt = jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32)
            return (cache, pos + 1), nxt[0, 0]


        (cache, _), toks = jax.lax.scan(
            step, (cache, jnp.asarray(0, jnp.int32)), tokens
        )
        return toks[-1]

    tokens = jnp.ones((steps, batch, 1), jnp.int32)
    t0 = time.perf_counter()
    int(run(params, tokens, cache))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        int(run(params, tokens, cache))
        best = min(best, (time.perf_counter() - t0))
    ms_tok = best / steps * 1e3
    agg = batch * 1e3 / ms_tok
    print(f"{variant:12s} b={batch:<3d} compile {compile_s:6.1f}s | "
          f"{ms_tok:8.2f} ms/step ({agg:7.1f} tok/s aggregate)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", nargs="*",
                    default=["pallas-s0", "pallas-s45", "xla-s0"])
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)
    for v in args.variants:
        probe(v, args.steps, args.layers, args.batch)


if __name__ == "__main__":
    main()
