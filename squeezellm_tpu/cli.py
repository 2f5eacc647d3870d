"""Command-line interface.

Mirrors the reference's entry points with one CLI
(reference llama.py:252-363 and quantization/{chunk_models,
generate_outlier_config,nuq,pack}.py):

  quantize       dense HF ckpt (+optional grad^2 ckpt) -> quantized ckpt
                 (chunk -> outlier config -> k-means -> pack in one pass)
  chunk          HF ckpt -> per-layer weight chunks      (= chunk_models.py)
  outlier-config chunks -> IQR threshold json   (= generate_outlier_config.py)
  nuq            chunks -> per-layer LUTs, resumable     (= nuq.py)
  pack           HF ckpt + LUTs -> quantized ckpt        (= pack.py)
  convert        reference SqueezeLLM .pt ckpt -> our checkpoint format
  eval           perplexity (GPTQ protocol; == --eval)
  benchmark      per-token decode latency (== --benchmark/--check/--torch_profile)
  generate       greedy/sampled generation
"""

from __future__ import annotations

import argparse
import json
import sys


def _load_any(path: str):
    """Load either a quantized checkpoint dir (manifest.json) or a dense HF
    model dir. Returns (model_type, config, specs, params)."""
    import os

    if os.path.exists(os.path.join(path, "manifest.json")):
        from squeezellm_tpu import checkpoint

        return checkpoint.load_quantized(path)
    from squeezellm_tpu.utils import hf

    return hf.load_dense_model(path)


def _eval_tokens(args, config, model_dir=None):
    import numpy as np

    from squeezellm_tpu import data as data_mod

    tokenizer = None
    if args.dataset not in ("synthetic",) and not args.dataset.endswith(".npy"):
        from squeezellm_tpu.utils import hf

        if model_dir and hf.has_tokenizer(model_dir):
            tokenizer = hf.load_tokenizer(model_dir)
    _, test = data_mod.get_loaders(
        args.dataset, nsamples=args.nsamples, seed=args.seed,
        seqlen=args.seqlen, tokenizer=tokenizer, vocab_size=config.vocab_size,
    )
    return np.asarray(test)


def cmd_quantize(args):
    import numpy as np

    from squeezellm_tpu import checkpoint
    from squeezellm_tpu.models import registry
    from squeezellm_tpu.quantize import outlier_config as oc_mod
    from squeezellm_tpu.quantize import pipeline
    from squeezellm_tpu.utils import hf

    model_type, config, specs, params = hf.load_dense_model(args.model)
    module_names = registry.get_module_names(model_type)

    grads = None
    if args.gradient:
        import os

        grads = []
        for li in range(config.n_layers):
            pt = os.path.join(args.gradient, f"layer_{li}.pt")
            if os.path.exists(pt):
                # reference SqueezeLLM-gradients chunk format (torch)
                import torch

                g = torch.load(pt, map_location="cpu")
                grads.append({n: np.asarray(g[n].float().numpy())
                              for n in module_names})
            else:
                # our `fisher` subcommand's output (npz)
                g = np.load(os.path.join(args.gradient, f"layer_{li}.npz"))
                grads.append({n: np.asarray(g[n]) for n in module_names})

    outlier_cfg = None
    if args.outlier_range:
        layers_w = (
            {n: np.asarray(lp[n]["w"]) for n in module_names}
            for lp in params["layers"]
        )
        cfg = oc_mod.make_outlier_config(layers_w, args.outlier_range, verbose=True)
        outlier_cfg = cfg["outlier_config"]
        print(f"measured outlier %: {cfg['outlier_threshold']}")

    qspecs, qparams = pipeline.quantize_model(
        model_type, config, params, args.bits,
        gradients_per_layer=grads,
        sensitivity=args.sensitivity,
        outlier_config=outlier_cfg,
        method=args.method,
        quantize_lm_head=args.quantize_lm_head,
        verbose=True,
    )
    checkpoint.save_quantized(args.output, model_type, config, qspecs, qparams)
    print(f"saved quantized checkpoint to {args.output}")


def cmd_fisher(args):
    import numpy as np

    from squeezellm_tpu import data as data_mod
    from squeezellm_tpu.quantize import gradients
    from squeezellm_tpu.utils import hf

    model_type, config, specs, params = hf.load_dense_model(args.model)
    tokenizer = None
    if args.dataset not in ("synthetic",) and not args.dataset.endswith(".npy"):
        tokenizer = hf.load_tokenizer(args.model)
    calib, _ = data_mod.get_loaders(
        args.dataset, nsamples=args.nsamples, seed=args.seed,
        seqlen=args.seqlen, tokenizer=tokenizer, vocab_size=config.vocab_size,
    )
    grads = gradients.compute_fisher(
        model_type, config, params, calib, batch_size=args.batch_size,
        verbose=True,
    )
    gradients.save_gradient_chunks(grads, args.output, model_type, args.model)
    print(f"grad^2 chunks -> {args.output}")


def cmd_chunk(args):
    from squeezellm_tpu.quantize import staged

    n = staged.chunk_model(args.model, args.output, verbose=True)
    print(f"chunked {n} layers into {args.output}")


def cmd_outlier_config(args):
    from squeezellm_tpu.quantize import staged

    cfg = staged.make_outlier_config(args.chunks, args.range, args.output,
                                     verbose=True)
    print(f"measured outlier %: {cfg['outlier_threshold']} -> {args.output}")


def cmd_nuq(args):
    from squeezellm_tpu.quantize import staged

    staged.nuq(
        args.chunks, args.output, args.bits,
        gradient_chunks_dir=args.gradient_chunks,
        sensitivity=args.sensitivity,
        outlier_config_json=args.outlier_config,
        method=args.method, seed=args.seed, verbose=True,
    )
    print(f"nuq artifacts in {args.output}")


def cmd_pack(args):
    from squeezellm_tpu.quantize import staged

    staged.pack(args.model, args.nuq, args.wbits, args.output,
                build_spmv=not args.no_spmv, verbose=True)
    print(f"packed checkpoint -> {args.output}")


def cmd_convert(args):
    from squeezellm_tpu import convert

    convert.convert_reference_checkpoint(
        args.checkpoint, args.model, args.wbits, args.output
    )
    print(f"converted {args.checkpoint} -> {args.output}")


def cmd_eval(args):
    from squeezellm_tpu import eval as eval_mod

    model_type, config, specs, params = _load_any(args.model)
    tokens = _eval_tokens(args, config, args.model)
    ppl = eval_mod.perplexity(
        model_type, config, specs, params, tokens,
        seqlen=args.seqlen, nsamples=args.nsamples_eval,
        backend=args.backend, verbose=True,
    )
    print(json.dumps({"dataset": args.dataset, "seqlen": args.seqlen, "ppl": ppl}))


def cmd_benchmark(args):
    import numpy as np

    from squeezellm_tpu import engine as engine_mod

    model_type, config, specs, params = _load_any(args.model)
    ekw = {}
    kv = getattr(args, "kv_dtype", None)
    if kv:
        import jax.numpy as jnp
        ekw["cache_dtype"] = {"bf16": jnp.bfloat16, "f32": jnp.float32,
                              "int8": "int8"}[kv]
    eng = engine_mod.Engine(model_type, config, specs, params,
                            backend=args.backend, fuse=args.fuse, **ekw)
    tokens = _eval_tokens(args, config, args.model)
    ids = tokens[:, : args.tokens]

    if args.profile:
        import jax

        with jax.profiler.trace(args.profile):
            stats = eng.benchmark(ids, check=args.check)
        print(f"profile trace written to {args.profile}")
        # per-op self-time table, the reference's --torch_profile workflow
        # (llama.py:341-353)
        from squeezellm_tpu.utils import profiling

        profiling.print_trace_summary(args.profile)
    else:
        stats = eng.benchmark(ids, check=args.check)
    print(json.dumps(stats, indent=2))


def _build_serving_engine(args, model_type, config, specs, params):
    """One engine-construction ladder for serve-bench AND serve: picks
    {dense, paged} x {single-device, TP} from args, with speculation."""
    from squeezellm_tpu import serving

    spec = tuple(args.speculative) if args.speculative else None
    tp = getattr(args, "tp", 0) or 0
    kv = getattr(args, "kv_dtype", None)
    if kv == "int8" and not args.paged and tp > 1:
        raise SystemExit("--kv-dtype int8 on the dense engine is single-"
                         "device only (the TP dense cache paths are bf16/"
                         "f32; use --paged for TP int8 KV)")
    paged_kw = dict(
        page_size=args.page_size,
        n_pages=-(-args.seqlen // args.page_size) * args.slots,
    )
    common_kw = dict(slots=args.slots, backend=args.backend,
                     max_seq=args.seqlen, speculative=spec)
    if kv:
        import jax.numpy as jnp
        cd = {"bf16": jnp.bfloat16, "f32": jnp.float32, "int8": "int8"}[kv]
        (paged_kw if args.paged else common_kw)["cache_dtype"] = cd
    pc = getattr(args, "prefill_chunk", None)
    if pc:
        common_kw["prefill_chunk"] = pc
    if tp > 1 and args.paged:
        return serving.TPPagedContinuousBatchEngine(
            model_type, config, specs, params, tp=tp, **paged_kw, **common_kw)
    if tp > 1:
        return serving.TPContinuousBatchEngine(
            model_type, config, specs, params, tp=tp, **common_kw)
    if args.paged:
        return serving.PagedContinuousBatchEngine(
            model_type, config, specs, params, **paged_kw, **common_kw)
    return serving.ContinuousBatchEngine(
        model_type, config, specs, params, **common_kw)


def cmd_serve_bench(args):
    """Continuous-batching throughput: total generated tokens/s across a
    pool of concurrent requests (vs the latency-oriented 'benchmark')."""
    import time

    import numpy as np

    model_type, config, specs, params = _load_any(args.model)
    eng = _build_serving_engine(args, model_type, config, specs, params)
    rng = np.random.default_rng(args.seed)
    prompts = [
        rng.integers(0, config.vocab_size, rng.integers(4, 32)).tolist()
        for _ in range(args.requests)
    ]
    # warm (compile prefill + batched decode); windows apply to both
    # engines — the paged engine chains per-token dispatches per window
    eng.run(prompts[:1], max_new_tokens=2, window=args.window)

    # per-request latency: admit / first-token / completion timestamps.
    # run() admits in cohorts (add_requests); every rid in the cohort
    # shares the cohort's pre-admission timestamp, so TTFT still includes
    # the full (fused) admission dispatch.
    admit, first, done = {}, {}, {}
    orig_add = eng.add_requests

    def timed_add(prompts_, max_new_tokens, **akw):
        t = time.perf_counter()  # BEFORE prefill: TTFT includes admission
        rids = orig_add(prompts_, max_new_tokens, **akw)
        for rid in rids:
            admit[rid] = t
        return rids

    eng.add_requests = timed_add

    def on_token(rid, new, is_done):
        now = time.perf_counter()
        first.setdefault(rid, now)
        if is_done:
            done[rid] = now

    t0 = time.perf_counter()
    results = eng.run(prompts, max_new_tokens=args.max_new_tokens,
                      window=args.window, on_token=on_token)
    dt = time.perf_counter() - t0
    total = sum(len(t) for t in results.values())
    ttft = sorted(first[r] - admit[r] for r in first)
    lat = sorted(done[r] - admit[r] for r in done)

    def pct(xs, p):
        return round(xs[min(len(xs) - 1, int(p * len(xs)))], 4) if xs else None

    print(json.dumps({
        "engine": type(eng).__name__,
        "requests": args.requests, "slots": args.slots,
        "total_tokens": total, "elapsed_s": round(dt, 3),
        "throughput_tok_s": round(total / dt, 2),
        "ttft_s_p50": pct(ttft, 0.50), "ttft_s_p95": pct(ttft, 0.95),
        "request_latency_s_p50": pct(lat, 0.50),
        "request_latency_s_p95": pct(lat, 0.95),
    }))


def cmd_serve(args):
    import time

    from squeezellm_tpu import server as server_mod

    model_type, config, specs, params = _load_any(args.model)
    eng = _build_serving_engine(args, model_type, config, specs, params)
    httpd = server_mod.serve(eng, host=args.host, port=args.port,
                             window=args.window)
    print(json.dumps({"listening": f"http://{args.host}:{args.port}",
                      "slots": args.slots, "paged": args.paged}), flush=True)
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        httpd.serving_loop.shutdown()
        httpd.shutdown()


def cmd_generate(args):
    import numpy as np

    from squeezellm_tpu import engine as engine_mod

    model_type, config, specs, params = _load_any(args.model)
    eng = engine_mod.Engine(model_type, config, specs, params,
                            backend=args.backend, fuse=args.fuse)
    prompt = np.asarray([int(t) for t in args.prompt_tokens.split(",")], np.int32)[None]
    if args.draft_model or args.draft_layers:
        if args.temperature > 0:
            raise SystemExit("draft speculation is greedy-only (exactness)")
        if args.draft_model and args.draft_layers:
            raise SystemExit("--draft-model and --draft-layers are "
                             "mutually exclusive")
        if args.draft_model:
            d_type, d_config, d_specs, d_params = _load_any(args.draft_model)
        else:
            # early-exit draft: first k layers of the target, weights shared
            d_type = model_type
            d_config, d_specs, d_params = engine_mod.truncate_for_draft(
                config, specs, params, args.draft_layers)
        draft = engine_mod.Engine(d_type, d_config, d_specs, d_params,
                                  backend=args.backend)
        out = eng.generate_draft_speculative(prompt, args.max_new_tokens,
                                             draft,
                                             draft_len=args.draft_len)
        print(json.dumps({"tokens": out[0].tolist(),
                          "spec_stats": eng.spec_stats}))
        return
    if args.speculative:
        if args.temperature > 0:
            raise SystemExit("--speculative is greedy-only (exactness)")
        out = eng.generate_speculative(prompt, args.max_new_tokens,
                                       draft_len=args.draft_len,
                                       ngram=args.ngram)
        print(json.dumps({"tokens": out[0].tolist(),
                          "spec_stats": eng.spec_stats}))
        return
    out = eng.generate(prompt, args.max_new_tokens,
                       temperature=args.temperature, top_k=args.top_k,
                       top_p=args.top_p, seed=args.seed)
    print(json.dumps({"tokens": out[0].tolist()}))


def main(argv=None):
    p = argparse.ArgumentParser(prog="squeezellm-tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    q = sub.add_parser("quantize", help="quantize a dense HF checkpoint")
    q.add_argument("--model", required=True, help="HF model dir (config + weights)")
    q.add_argument("--gradient", default=None,
                   help="dir of chunked grad^2 files layer_{i}.pt")
    q.add_argument("--bits", type=int, default=4, choices=[3, 4])
    q.add_argument("--sensitivity", type=float, default=0.0,
                   help="top-%% of weights by grad^2 moved to sparse")
    q.add_argument("--outlier-range", type=float, default=None,
                   help="IQR multiplier for threshold outliers (e.g. 1.8)")
    q.add_argument("--method", default="auto",
                   choices=["auto", "native", "batched", "sklearn"])
    q.add_argument("--quantize-lm-head", action="store_true",
                   help="also quantize lm_head (TPU-side extension; the "
                        "reference keeps it fp16)")
    q.add_argument("--output", required=True)
    q.set_defaults(fn=cmd_quantize)

    fi = sub.add_parser("fisher", help="compute grad^2 sensitivity chunks "
                        "(JAX-native; replaces the external "
                        "SqueezeLLM-gradients repo)")
    fi.add_argument("--model", required=True)
    fi.add_argument("--dataset", default="synthetic")
    fi.add_argument("--nsamples", type=int, default=128)
    fi.add_argument("--seqlen", type=int, default=2048)
    fi.add_argument("--seed", type=int, default=0)
    fi.add_argument("--batch-size", type=int, default=1)
    fi.add_argument("--output", required=True)
    fi.set_defaults(fn=cmd_fisher)

    ch = sub.add_parser("chunk", help="split an HF ckpt into per-layer chunks")
    ch.add_argument("--model", required=True)
    ch.add_argument("--output", required=True)
    ch.set_defaults(fn=cmd_chunk)

    oc = sub.add_parser("outlier-config", help="IQR outlier thresholds")
    oc.add_argument("--chunks", required=True)
    oc.add_argument("--range", type=float, required=True,
                    help="IQR multiplier (e.g. 1.8)")
    oc.add_argument("--output", required=True)
    oc.set_defaults(fn=cmd_outlier_config)

    nq = sub.add_parser("nuq", help="per-layer weighted k-means (resumable)")
    nq.add_argument("--chunks", required=True)
    nq.add_argument("--gradient-chunks", default=None)
    nq.add_argument("--bits", type=int, default=4, choices=[3, 4])
    nq.add_argument("--sensitivity", type=float, default=0.0)
    nq.add_argument("--outlier-config", default=None)
    nq.add_argument("--method", default="auto",
                    choices=["auto", "native", "batched", "sklearn"])
    nq.add_argument("--seed", type=int, default=0)
    nq.add_argument("--output", required=True)
    nq.set_defaults(fn=cmd_nuq)

    pk = sub.add_parser("pack", help="collate LUTs into a quantized ckpt")
    pk.add_argument("--model", required=True)
    pk.add_argument("--nuq", required=True)
    pk.add_argument("--wbits", type=int, required=True, choices=[3, 4])
    pk.add_argument("--no-spmv", action="store_true")
    pk.add_argument("--output", required=True)
    pk.set_defaults(fn=cmd_pack)

    c = sub.add_parser("convert", help="convert a reference SqueezeLLM .pt")
    c.add_argument("--checkpoint", required=True)
    c.add_argument("--model", required=True, help="HF model dir with config.json")
    c.add_argument("--wbits", type=int, required=True, choices=[3, 4])
    c.add_argument("--output", required=True)
    c.set_defaults(fn=cmd_convert)

    def _common_eval(sp):
        sp.add_argument("model", help="quantized ckpt dir or dense HF dir")
        sp.add_argument("--dataset", default="synthetic")
        sp.add_argument("--seqlen", type=int, default=2048)
        sp.add_argument("--seed", type=int, default=0)
        sp.add_argument("--nsamples", type=int, default=128)
        sp.add_argument("--backend", default="auto", choices=["auto", "xla", "pallas", "pallas-bf16"])

    e = sub.add_parser("eval", help="perplexity evaluation")
    _common_eval(e)
    e.add_argument("--nsamples-eval", type=int, default=None)
    e.set_defaults(fn=cmd_eval)

    b = sub.add_parser("benchmark", help="decode latency benchmark")
    _common_eval(b)
    b.add_argument("--tokens", type=int, default=128)
    b.add_argument("--check", action="store_true")
    b.add_argument("--fuse", action="store_true",
                   help="fuse q|k|v and gate|up projections for decode")
    b.add_argument("--profile", default=None, help="write a jax profiler trace dir")
    b.add_argument("--kv-dtype", default=None,
                   choices=["bf16", "f32", "int8"],
                   help="KV-cache storage dtype; int8 stores codes + "
                        "per-row f32 scales (ops/kv_quant.py), ~half the "
                        "attention bytes at long context")
    b.set_defaults(fn=cmd_benchmark)

    sb = sub.add_parser("serve-bench",
                        help="continuous-batching throughput benchmark")
    sb.add_argument("model")
    sb.add_argument("--slots", type=int, default=8)
    sb.add_argument("--requests", type=int, default=32)
    sb.add_argument("--max-new-tokens", type=int, default=32)
    sb.add_argument("--seqlen", type=int, default=256)
    sb.add_argument("--seed", type=int, default=0)
    sb.add_argument("--window", type=int, default=8,
                    help="decode tokens per host sync (lax.scan window)")
    sb.add_argument("--paged", action="store_true",
                    help="paged KV pool + prefix sharing (ops/paged_attn.py)")
    sb.add_argument("--page-size", type=int, default=128)
    sb.add_argument("--speculative", nargs=2, type=int, default=None,
                    metavar=("DRAFT_LEN", "NGRAM"),
                    help="slot-batched prompt-lookup speculation "
                         "(greedy-exact; works with and without --paged)")
    sb.add_argument("--tp", type=int, default=0,
                    help="tensor-parallel serving over a tp-device mesh "
                         "(shard_map Megatron TP; dense-slot engine)")
    sb.add_argument("--backend", default="auto",
                    choices=["auto", "xla", "pallas", "pallas-bf16"])
    sb.add_argument("--kv-dtype", default=None,
                    choices=["bf16", "f32", "int8"],
                    help="KV-cache storage dtype; int8 stores codes + "
                         "per-row f32 scales (ops/kv_quant.py), ~2x tokens "
                         "per HBM byte (dense engines: single-device only; "
                         "--tp needs --paged)")
    sb.add_argument("--prefill-chunk", type=int, default=None,
                    help="admit long prompts in N-token chunks interleaved "
                         "with decode windows (all four engines)")
    sb.set_defaults(fn=cmd_serve_bench)

    sv = sub.add_parser("serve", help="HTTP serving front-end "
                        "(/v1/completions + /health)")
    sv.add_argument("model")
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8000)
    sv.add_argument("--slots", type=int, default=8)
    sv.add_argument("--window", type=int, default=8)
    sv.add_argument("--seqlen", type=int, default=2048)
    sv.add_argument("--paged", action="store_true")
    sv.add_argument("--page-size", type=int, default=128)
    sv.add_argument("--speculative", nargs=2, type=int, default=None,
                    metavar=("DRAFT_LEN", "NGRAM"))
    sv.add_argument("--tp", type=int, default=0,
                    help="tensor-parallel serving over a tp-device mesh")
    sv.add_argument("--backend", default="auto",
                    choices=["auto", "xla", "pallas", "pallas-bf16"])
    sv.add_argument("--kv-dtype", default=None,
                    choices=["bf16", "f32", "int8"],
                    help="KV-cache storage dtype (int8: dense single-device "
                         "or any paged engine; --tp needs --paged)")
    sv.add_argument("--prefill-chunk", type=int, default=None,
                    help="admit long prompts in N-token chunks interleaved "
                         "with decode windows (all four engines)")
    sv.set_defaults(fn=cmd_serve)

    g = sub.add_parser("generate", help="generate tokens")
    g.add_argument("model")
    g.add_argument("--prompt-tokens", required=True, help="comma-separated ids")
    g.add_argument("--max-new-tokens", type=int, default=32)
    g.add_argument("--temperature", type=float, default=0.0)
    g.add_argument("--top-k", type=int, default=0)
    g.add_argument("--top-p", type=float, default=1.0)
    g.add_argument("--seed", type=int, default=0)
    g.add_argument("--speculative", action="store_true",
                   help="prompt-lookup speculative decoding (greedy-exact)")
    g.add_argument("--draft-model", default=None,
                   help="checkpoint dir of a smaller same-vocab model: "
                        "two-model speculative decoding (greedy-exact)")
    g.add_argument("--draft-layers", type=int, default=0,
                   help="early-exit draft: speculate with the target's "
                        "first K layers (weights shared, no second "
                        "checkpoint; greedy-exact)")
    g.add_argument("--draft-len", type=int, default=8)
    g.add_argument("--ngram", type=int, default=2)
    g.add_argument("--fuse", action="store_true")
    g.add_argument("--backend", default="auto", choices=["auto", "xla", "pallas", "pallas-bf16"])
    g.set_defaults(fn=cmd_generate)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
