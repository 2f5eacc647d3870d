"""Driver benchmark: LLaMA-2-7B w4-s0.45% decode throughput on one chip.

Prints ONE JSON line:
  {"metric": "llama2_7b_w4s45_decode_tok_s", "value": <tok/s>,
   "unit": "tokens/s", "vs_baseline": <ratio vs bf16 dense decode>}

Baseline = bf16 (fp16-equivalent) dense decode of the same model on the same
chip — the reference's own comparison axis (README.md:11 "same latency,
smaller footprint"). On a 16 GB v5e the bf16 7B model (~13.5 GB) and the
quantized model cannot coexist in HBM, and a single OOM poisons the process
allocator — so each phase runs in its OWN subprocess:

  phase=quant     quantized decode tok/s + a measured bf16-GEMV stream rate
                  (for a memory-roofline baseline estimate)
  phase=baseline  real end-to-end bf16 dense decode tok/s (may OOM; optional)

The parent combines them; if the bf16 phase fails, vs_baseline falls back to
the roofline estimate from the quant phase.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np


def _build_quantized_llama(config, bits, sparsity, key=None,
                           quant_head: bool = False, topx: int = 0,
                           structured: bool = False):
    """Random quantized LLaMA (specs, params) built HOST-SIDE in numpy.

    Host-side generation matters doubly on the axon tunnel: device-side RNG
    would mean hundreds of tiny dispatches, and any later transform (fusion,
    resharding) would have to pull GB of packed weights back through the
    tunnel. One upload happens lazily at the first jit call."""
    import dataclasses

    from squeezellm_tpu import formats
    from squeezellm_tpu.models.common import LinearSpec
    from squeezellm_tpu.ops import spmv
    from squeezellm_tpu.ops.quant_linear import QuantLinearSpec

    shapes = config.linear_shapes()
    rng = np.random.default_rng(0)

    # one random weight set + spmv plan per distinct (out, in) shape,
    # shared by all layers: a synthetic benchmark doesn't need 224 distinct
    # greedy assignments on this single-core host, and sharing numpy arrays
    # keeps build time and upload volume at one-layer cost per shape.
    cache = {}

    def module_arrays(o, i, nnz_pad, with_topx=0):
        if (o, i) not in cache:
            nw = formats.n_words(i, bits)
            if structured and bits == 4:
                # additive structured codebook lut[c] = A[c&7] + (c>>3)*d
                # (quantize.kmeans.fit_structured_luts shape) — fuse
                # detects it and attaches the fast-dequant table
                A = np.sort(
                    rng.standard_normal((o, 8)).astype(np.float32) * 0.02,
                    axis=1)
                dvec = (np.abs(rng.standard_normal((o, 1))) * 0.01
                        + 0.005).astype(np.float32)
                lut = np.concatenate([A, A + dvec], axis=1)
            else:
                lut = np.sort(
                    rng.standard_normal((o, 2**bits)).astype(np.float32)
                    * 0.02, axis=1)
            d = {
                "qweight": rng.integers(
                    -(2**31), 2**31, (nw, o), dtype=np.int64
                ).astype(np.int32),
                "lut": lut,
            }
            plan = None
            if nnz_pad:
                rows = np.sort(rng.integers(0, o, nnz_pad)).astype(np.int32)
                cols = rng.integers(0, i, nnz_pad).astype(np.int32)
                vals = (rng.standard_normal(nnz_pad) * 0.08).astype(np.float32)
                plan = spmv.build_plan(rows, cols, vals, o, i)
                d.update(sp_rows=rows, sp_cols=cols, sp_vals=vals,
                         sg_meta=plan.meta, sg_vals=plan.vals)
            if with_topx:
                # hybrid top-X dense channels (every published sparse
                # sq-* checkpoint carries topX=10,
                # /root/reference/llama.py:301-306)
                d["topx_weights"] = (rng.standard_normal(
                    (i, with_topx)) * 0.05).astype(np.float32)
                d["topx_indices"] = rng.choice(
                    o, with_topx, replace=False).astype(np.int32)
            cache[(o, i)] = (d, plan)
        return cache[(o, i)]

    spec_layers = []
    param_layers = []
    for li in range(config.n_layers):
        spec_d = {}
        param_d = {
            "input_norm": np.ones((config.hidden_size,), np.float32),
            "post_norm": np.ones((config.hidden_size,), np.float32),
        }
        for name, (o, i) in shapes.items():
            nnz = int(o * i * sparsity)
            nnz_pad = 0 if nnz == 0 else max(512, -(-nnz // 512) * 512)
            qspec = QuantLinearSpec(bits=bits, in_features=i, out_features=o,
                                    nnz_pad=nnz_pad, topx=topx)
            arrays, plan = module_arrays(o, i, nnz_pad, with_topx=topx)
            param_d[name] = dict(arrays)
            if plan is not None:
                qspec = dataclasses.replace(
                    qspec, sg_rows=plan.n_rows, sg_oh=plan.oh, sg_ih=plan.ih
                )
            spec_d[name] = LinearSpec(in_features=i, out_features=o, quant=qspec)
        spec_layers.append(spec_d)
        param_layers.append(param_d)

    # embed in bf16: the bf16 baseline holds it in bf16 too, and the f32
    # read would cost ~0.6 ms/token at 7B vocab. lm_head: quantized at the
    # model's bit-width when quant_head (the flagship default — streaming
    # the 262 MB bf16 head costs ~0.35 ms/token, ~4% of a w4 step; the
    # offline pipeline quantizes it with the same NUQ machinery), bf16
    # otherwise (the reference always keeps lm_head dense,
    # /root/reference/llama.py:172-174).
    import ml_dtypes

    params = {
        "embed": (rng.standard_normal(
            (config.vocab_size, config.hidden_size)
        ).astype(np.float32) * 0.02).astype(ml_dtypes.bfloat16),
        "layers": param_layers,
        "final_norm": np.ones((config.hidden_size,), np.float32),
    }
    if quant_head:
        head_arrays, _ = module_arrays(config.vocab_size,
                                       config.hidden_size, 0)
        params["lm_head"] = dict(head_arrays)
        head_spec = LinearSpec(
            in_features=config.hidden_size, out_features=config.vocab_size,
            quant=QuantLinearSpec(bits=bits,
                                  in_features=config.hidden_size,
                                  out_features=config.vocab_size))
    else:
        params["lm_head"] = {"w": (rng.standard_normal(
            (config.vocab_size, config.hidden_size)
        ).astype(np.float32) * 0.02).astype(ml_dtypes.bfloat16)}
        head_spec = LinearSpec(in_features=config.hidden_size,
                               out_features=config.vocab_size)
    specs = {
        "layers": tuple(spec_layers),
        "lm_head": head_spec,
    }
    return specs, params


def put_dedup(params):
    """Upload a (possibly array-sharing) host param tree to device, sending
    each distinct numpy array exactly once — layers built from a shared
    template then alias one HBM buffer instead of re-crossing the tunnel."""
    import jax
    import jax.numpy as jnp

    seen = {}

    def put(x):
        key = id(x)
        if key not in seen:
            seen[key] = jnp.asarray(x)
        return seen[key]

    return jax.tree.map(put, params)


def _flagship_config(on_tpu):
    from squeezellm_tpu.models import llama

    if on_tpu:
        return llama.LlamaConfig(max_seq=2048), int(os.environ.get("BENCH_TOKENS", "128"))
    # CPU smoke fallback: scaled-down model, same code path
    return llama.LlamaConfig(
        vocab_size=1024, hidden_size=512, intermediate_size=1376,
        n_layers=4, n_heads=8, n_kv_heads=8, max_seq=256,
    ), 8


def _decode_tok_s(engine, n_tokens, vocab):
    ids = (np.arange(n_tokens, dtype=np.int32)[None] * 7919) % vocab
    # KV-cache window sized to the decoded length: the reference protocol
    # (llama.py:223-249) grows its HF cache from 0 to n_tokens, so a fixed
    # full-context window would over-read the cache ~max_seq/n_tokens x
    stats = engine.benchmark(ids, check=False, warmup=3,
                             max_seq=max(128, -(-n_tokens // 128) * 128))
    return stats["tokens_per_s"], stats


def _roofline_baseline_tok_s(config):
    """bf16 memory-roofline decode estimate: measured bf16 GEMV stream rate
    over the model's total weight bytes.

    Timing is (T(2K) - T(K)) / K over jitted fori_loops with a host fetch
    as the fence — block_until_ready can return at enqueue on the axon
    tunnel and would overestimate bandwidth wildly."""
    import jax
    import jax.numpy as jnp

    k = jax.random.PRNGKey(1)
    w = jax.random.normal(k, (config.hidden_size, config.intermediate_size),
                          jnp.bfloat16)
    x = jax.random.normal(k, (1, config.hidden_size), jnp.bfloat16)

    def make_loop(n):
        @jax.jit
        def loop(x):
            def body(i, carry):
                xp, s = carry
                y = xp @ w
                s2 = jnp.sum(y).astype(jnp.float32) * 1e-30
                return ((x * (1.0 + s2)).astype(x.dtype), s + s2)

            _, s = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
            return s

        return loop

    K = 256
    lk, l2k = make_loop(K), make_loop(2 * K)
    float(lk(x)), float(l2k(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(lk(x))
        t1 = time.perf_counter()
        float(l2k(x))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / K)
    bw = w.size * 2 / max(best, 1e-9)
    shapes = config.linear_shapes()
    layer_bytes = sum(o * i * 2 for o, i in shapes.values())
    total = layer_bytes * config.n_layers + (
        config.vocab_size * config.hidden_size * 2
    )
    return bw / total


def _phase_quant():
    import jax
    import jax.numpy as jnp

    from squeezellm_tpu import engine as engine_mod

    on_tpu = jax.default_backend() == "tpu"
    config, n_tokens = _flagship_config(on_tpu)
    roofline = _roofline_baseline_tok_s(config)

    def build_and_run(bits):
        # quant_head on TPU: the flagship ships a quantized lm_head (the
        # bf16 head alone streams 262 MB/token); pipeline parity exists
        # (cli quantize --quantize-lm-head). CPU smoke keeps the bf16 head.
        # topx=10 matches every published sparse sq-* checkpoint
        # (/root/reference/llama.py:301-306); measured cost on v5e is
        # within run noise (the hybrid one-hot chain fuses into the
        # decode dispatch pipeline).
        specs, params = _build_quantized_llama(
            config, bits=bits, sparsity=0.0045, key=jax.random.PRNGKey(0),
            quant_head=on_tpu, topx=10 if on_tpu else 0,
        )
        if on_tpu:
            from squeezellm_tpu.models import fuse

            specs, params = fuse.fuse_for_decode("llama", specs, params)
        params = put_dedup(params)
        # pallas-bf16: bf16-rounded dequant + activations (the same numeric
        # regime as the reference's fp16 decode benchmark, README.md:
        # 139-142); the spmv plans handle the sparse sidecar
        eng = engine_mod.Engine("llama", config, specs, params,
                                backend="pallas-bf16" if on_tpu else "xla",
                                dtype=jnp.bfloat16 if on_tpu else jnp.float32,
                                cache_dtype=jnp.bfloat16)
        tok_s, _ = _decode_tok_s(eng, n_tokens, config.vocab_size)
        return tok_s

    tok_s = build_and_run(bits=4)
    result = {"tok_s": tok_s, "roofline_baseline_tok_s": roofline,
              "on_tpu": on_tpu}
    if on_tpu:
        # the reference's headline 3-bit config, same protocol (a second
        # engine in the same process: both models fit HBM side by side)
        try:
            result["w3s45_tok_s"] = build_and_run(bits=3)
        except Exception as e:  # never lose the flagship number to the tail
            print(f"w3 flagship phase failed: {e!r}", file=sys.stderr)
    print(json.dumps(result))


def _phase_baseline():
    import jax
    import jax.numpy as jnp

    from squeezellm_tpu import engine as engine_mod
    from squeezellm_tpu.models import llama

    on_tpu = jax.default_backend() == "tpu"
    config, n_tokens = _flagship_config(on_tpu)
    dense_params = llama.random_dense_params(config, jax.random.PRNGKey(0),
                                             dtype=jnp.bfloat16)
    dspecs = llama.dense_specs(config)
    eng = engine_mod.Engine("llama", config, dspecs, dense_params,
                            backend="xla", dtype=jnp.bfloat16,
                            cache_dtype=jnp.bfloat16)
    # identical protocol to the quant phase (same token count, same KV
    # window) — a shorter baseline run would under-amortize fixed costs and
    # inflate vs_baseline
    tok_s, _ = _decode_tok_s(eng, n_tokens, config.vocab_size)
    print(json.dumps({"tok_s": tok_s}))


def _cpu_env():
    """Environment that CANNOT touch the TPU tunnel: the axon
    sitecustomize (PYTHONPATH) forces the axon platform even when
    JAX_PLATFORMS=cpu, and a wedged chip grant makes backend init hang
    forever — strip the site dir so the phase runs pure-CPU."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    pp = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = ":".join(
        p for p in pp.split(":") if p and "axon" not in p) or "."
    return env


def _run_phase(name, timeout_s, env_override=None):
    env = dict(env_override or os.environ, BENCH_PHASE=name)
    # persistent XLA compilation cache: the fused 7B decode step costs
    # ~3 min to compile over the axon tunnel, once per content hash
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        print(f"phase {name} timed out", file=sys.stderr)
        return None
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    print(f"phase {name} failed:\n{out.stderr[-2000:]}", file=sys.stderr)
    return None


def main():
    phase = os.environ.get("BENCH_PHASE")
    if phase == "quant":
        return _phase_quant()
    if phase == "baseline":
        return _phase_baseline()

    quant = _run_phase("quant", timeout_s=900)
    cpu_fallback = False
    if quant is None:
        # TPU phase hung or died (e.g. a wedged axon chip grant blocks
        # backend init forever) — record the CPU smoke number instead of
        # nothing so the driver always gets a real measurement
        print("quant phase failed on the default backend (timeout or "
              "crash — a wedged axon grant hangs init forever, but a "
              "kernel crash lands here too); retrying on CPU",
              file=sys.stderr)
        quant = _run_phase("quant", timeout_s=600, env_override=_cpu_env())
        cpu_fallback = quant is not None
    if quant is None:
        print(json.dumps({"metric": "llama2_7b_w4s45_decode_tok_s",
                          "value": None, "unit": "tokens/s",
                          "vs_baseline": None}))
        return 1
    # 900 s: with a cold compile cache the bf16 7B build alone costs
    # several minutes over the tunnel — a 600 s budget timed out in r03
    # and silently demoted vs_baseline to the roofline estimate
    baseline = _run_phase("baseline", timeout_s=900,
                          env_override=_cpu_env() if cpu_fallback else None)
    if baseline is None and not cpu_fallback:
        # the chip grant handoff from the quant subprocess is occasionally
        # slow enough to starve the first attempt — one retry keeps
        # vs_baseline a measured ratio instead of the roofline fallback
        print("baseline phase failed once — retrying", file=sys.stderr)
        baseline = _run_phase("baseline", timeout_s=900)
    base_tok_s = baseline["tok_s"] if baseline else quant["roofline_baseline_tok_s"]
    result = {
        "metric": "llama2_7b_w4s45_decode_tok_s" if quant["on_tpu"]
        else "llama_small_w4s45_decode_tok_s_cpu",
        "value": round(quant["tok_s"], 2),
        "unit": "tokens/s",
        "vs_baseline": round(quant["tok_s"] / base_tok_s, 3) if base_tok_s else None,
    }
    if baseline is None:
        result["baseline_kind"] = "roofline_estimate"  # bf16 phase failed
    if "w3s45_tok_s" in quant:
        # the reference's headline 3-bit config, same protocol/chip
        result["w3s45_tok_s"] = round(quant["w3s45_tok_s"], 2)
        if base_tok_s:
            result["w3s45_vs_baseline"] = round(
                quant["w3s45_tok_s"] / base_tok_s, 3)
    if cpu_fallback:
        result["note"] = ("default-backend quant phase failed (timeout or "
                          "crash — see stderr); CPU smoke fallback, not "
                          "comparable to TPU rounds")
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
