"""Perplexity evaluator — GPTQ protocol.

Matches the reference's llama_eval semantics (reference llama.py:33-132):
non-overlapping seqlen strides over the eval corpus, shifted cross-entropy
per stride, ppl = exp(sum(nll) / (nsamples * seqlen)). Unlike the reference
there is no layer-streaming/offload: the quantized model fits in HBM, so each
stride is one jitted full forward.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from squeezellm_tpu.models import registry


def stride_nll(logits, tokens):
    """Mean token NLL of shifted next-token prediction for one stride.

    logits: (B, S, V) f32; tokens: (B, S) int32. Returns scalar f32 —
    mean over (S-1)*B shifted positions (CrossEntropyLoss default 'mean',
    reference llama.py:121-127).
    """
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = tokens[:, 1:]
    ll = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return -jnp.mean(ll)


def perplexity(
    model_type: str,
    config,
    specs,
    params,
    eval_tokens: np.ndarray,
    seqlen: int = 2048,
    nsamples: Optional[int] = None,
    backend: str = "auto",
    dtype=jnp.float32,
    verbose: bool = False,
    group: int = 8,
) -> float:
    """eval_tokens: (1, N) int32. Returns perplexity (float).

    group: strides evaluated per jitted forward (batch dim). Strides are
    causally independent, so batching changes no number — it amortizes the
    per-call static work (notably the sparse-sidecar dense materialization,
    one scatter per linear per CALL) over `group` strides and feeds the MXU
    larger batches. group=1 reproduces the reference's stride-at-a-time
    loop exactly.
    """
    mod = registry.get_model_module(model_type)
    total = eval_tokens.shape[-1] // seqlen
    n = total if nsamples is None else min(nsamples, total)
    if n == 0:
        raise ValueError(
            f"eval corpus too short: {eval_tokens.shape[-1]} tokens < seqlen {seqlen}"
        )
    g = max(1, min(group, n))

    @jax.jit
    def step(params, tok):
        logits = mod.forward(config, specs, params, tok, backend=backend, dtype=dtype)
        # per-stride loss * seqlen to match reference nll accumulation
        # (llama.py:127-129); each stride's mean is over its own (S-1)
        # shifted positions
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        ll = jnp.take_along_axis(logp, tok[:, 1:, None], axis=-1)[..., 0]
        return -jnp.mean(ll, axis=-1) * seqlen  # (g,)

    nlls = []
    flat = eval_tokens.reshape(-1)
    for i0 in range(0, n, g):
        rows = []
        for i in range(i0, i0 + g):
            j = min(i, n - 1)  # pad the last group with a repeat stride
            rows.append(flat[j * seqlen : (j + 1) * seqlen])
        tok = jnp.asarray(np.stack(rows), jnp.int32)
        nll = np.asarray(step(params, tok))
        nlls.extend(float(v) for v in nll[: n - i0])
        if verbose:
            running = float(np.exp(np.sum(nlls) / (len(nlls) * seqlen)))
            print(f"sample {len(nlls)}/{n}  running ppl {running:.4f}")
    return float(np.exp(np.sum(nlls) / (n * seqlen)))
