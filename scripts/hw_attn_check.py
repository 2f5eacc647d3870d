"""Hardware gate: model-level fused decode attention vs the XLA chain.

One decoder layer per variant (so caches compare bit-level without bf16
compounding through later layers): the fused token-major kernel's cache
writes must match the XLA chain exactly for bf16/int8 caches (f32
tolerates 1 ulp on the rope'd row — Mosaic FMA contraction), and logits
must agree within bf16 tolerance. Covers MHA/GQA, f32/bf16/int8 caches,
and sliding window.

Run: PYTHONPATH=.:/root/.axon_site python -u scripts/hw_attn_check.py
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp

from squeezellm_tpu.models import common, llama
from squeezellm_tpu.quantize import pipeline


def check(name, n_heads, n_kv, cache_dtype, sliding=None):
    config = llama.LlamaConfig(
        vocab_size=256, hidden_size=128 * n_heads, intermediate_size=512,
        n_layers=1, n_heads=n_heads, n_kv_heads=n_kv, max_seq=128,
        sliding_window=sliding)
    dense = llama.random_dense_params(config, jax.random.PRNGKey(0))
    specs, params = pipeline.quantize_model("llama", config, dense, bits=4)
    jp = jax.tree.map(jnp.asarray, params)
    tokens = jnp.asarray([[5, 7, 11, 13]], jnp.int32)

    def mk():
        return common.init_kv_cache(1, config.max_seq, config.n_layers,
                                    n_kv, config.head_dim, cache_dtype)

    _, c1 = llama.prefill(config, specs, jp, tokens, mk(), backend="xla")
    _, c2 = llama.prefill(config, specs, jp, tokens, mk(), backend="xla")
    tok = jnp.asarray([[3]], jnp.int32)
    pos = jnp.asarray(4, jnp.int32)
    l1, c1 = llama.decode_step(config, specs, jp, tok, pos, c1,
                               backend="xla")
    l2, c2 = llama.decode_step(config, specs, jp, tok, pos, c2,
                               backend="pallas")
    err = float(jnp.max(jnp.abs(l1 - l2)))
    kerr = max(float(jnp.max(jnp.abs(a["k"].astype(jnp.float32)
                                     - b["k"].astype(jnp.float32))))
               for a, b in zip(c1, c2))
    serr = 0.0
    if cache_dtype == "int8":
        serr = max(float(jnp.max(jnp.abs(a["ks"] - b["ks"])))
                   for a, b in zip(c1, c2))
    # int8 codes may sit +-1 at a rounding boundary (rope FMA); f32 keeps
    # the 1-ulp rope difference bf16 storage rounds away
    code_tol = 1.0 if cache_dtype == "int8" else (
        1e-6 if cache_dtype == jnp.float32 else 0.0)
    ok = err < 5e-3 and kerr <= code_tol and serr < 1e-6
    print(f"{'OK ' if ok else 'BAD'} {name}: logits {err:.2e} "
          f"cache {kerr:.2e} scales {serr:.2e}", flush=True)
    return ok


def main():
    print("backend:", jax.default_backend(), flush=True)
    ok = True
    ok &= check("mha bf16", 4, 4, jnp.bfloat16)
    ok &= check("gqa bf16", 4, 2, jnp.bfloat16)
    ok &= check("mha f32", 4, 4, jnp.float32)
    ok &= check("gqa int8", 4, 2, "int8")
    ok &= check("sliding bf16", 4, 4, jnp.bfloat16, sliding=48)
    print("ALL OK" if ok else "FAILURES", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
