"""On-device batched sampling for serving decode loops.

Per-slot temperature / top-k / top-p sampling, vectorized over the slot
batch so it runs INSIDE the jitted decode step (no host round-trip per
token). Greedy slots (temperature <= 0) take the argmax through the same
code path, so one trace serves mixed greedy/sampled batches.

Determinism: each slot draws from its own PRNG stream keyed by
(engine seed, request id, position) — a request's sampled continuation is
reproducible regardless of which other requests share the batch or how
decode windows are sliced.

The reference repo has no serving/sampling layer (its generate() path is
HF greedy, reference llama.py:226-246); this mirrors what production
TPU serving needs (vLLM-style per-request params), built jit-first.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

# top-k/top-p operate inside the MAX_TOPK largest logits; per-slot k is a
# runtime value clamped to this static bound (keeps lax.top_k shapes static)
MAX_TOPK = 64


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Per-request sampling configuration (greedy by default)."""

    temperature: float = 0.0
    top_k: int = 0          # 0 = disabled (all MAX_TOPK candidates)
    top_p: float = 1.0      # 1.0 = disabled

    def __post_init__(self):
        if self.top_k > MAX_TOPK:
            raise ValueError(f"top_k > {MAX_TOPK} unsupported (static bound)")
        if not 0.0 < self.top_p <= 1.0:
            raise ValueError("top_p must be in (0, 1]")


GREEDY = SamplingParams()


def sample_tokens(logits, temperature, top_k, top_p, rids, pos, seed):
    """Draw one token per slot from (B, V) logits.

    Args:
      logits: (B, V) f32.
      temperature: (B,) f32 — <= 0 means greedy for that slot.
      top_k: (B,) int32 — 0 disables; else keep the k largest.
      top_p: (B,) f32 — nucleus mass; 1.0 disables.
      rids: (B,) int32 request ids (PRNG stream identity).
      pos: (B,) int32 current positions (PRNG stream step).
      seed: python int engine seed (static).

    Returns:
      (B,) int32 sampled token ids.
    """
    vals, idx = jax.lax.top_k(logits, MAX_TOPK)  # (B, K) each
    t = jnp.maximum(temperature, 1e-6)[:, None]
    logp = jax.nn.log_softmax(vals / t, axis=-1)
    probs = jnp.exp(logp)
    arange = jnp.arange(MAX_TOPK)[None, :]
    k = jnp.where(top_k > 0, jnp.minimum(top_k, MAX_TOPK), MAX_TOPK)
    keep = arange < k[:, None]
    # nucleus: keep the smallest prefix whose EXCLUSIVE cumulative mass is
    # below top_p (the first candidate always survives)
    cum = jnp.cumsum(probs, axis=-1)
    keep &= (cum - probs) < top_p[:, None]
    masked = jnp.where(keep, logp, -jnp.inf)

    base = jax.random.PRNGKey(seed)
    keys = jax.vmap(
        lambda r, p: jax.random.fold_in(jax.random.fold_in(base, r), p)
    )(rids, pos)
    sampled = jax.vmap(jax.random.categorical)(keys, masked)  # (B,)
    chosen = jnp.take_along_axis(idx, sampled[:, None], axis=1)[:, 0]
    greedy = idx[:, 0]
    return jnp.where(temperature <= 0.0, greedy, chosen).astype(jnp.int32)
