"""Flash (chunked online-softmax) prefill attention.

The XLA s>1 attention path (`models/common.attention`, used by eval
forwards, prefill, and continuation prefill) materializes the full
(B, H, Sq, Sk) logits tensor — ~0.5 GB per layer at 7B/2048 in f32 —
and, when a cache is attached, first `repeat_kv`-materializes the whole
max_seq cache. The reference leans on torch SDPA for this on GPU
(`/root/reference/llama.py:60-132` module forwards); this kernel is the
TPU equivalent: one Pallas launch per layer that

  * streams k/v in `chunk`-row slabs with double-buffered manual DMAs
    (k/v stay in ANY/HBM memory — works on the raw window OR the full
    cache array, reading only rows < offset+Sq),
  * keeps softmax online (flash form) so only (bq, chunk) logits ever
    exist in VMEM,
  * applies causal + sliding-window masking in-kernel from the q-block
    offset (query row r of block qi sits at position offset + qi*bq + r),
  * handles GQA by indexing kv head h // g per grid step (no repeat_kv
    materialization; re-reads per q head match what repeat_kv would have
    written+read anyway).

Gating (see models/llama.py): Sq and Sk must be 16-row tile-aligned,
offset must be a scalar (per-slot verify windows keep the XLA chain).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from squeezellm_tpu.ops.decode_attn import _pick_chunk

NEG_INF = -1e30


def _flash_kernel(off_ref, q_in, k_in, v_in, out_hbm,
                  qbuf, obuf, kbuf, vbuf, qsem, osem, ksem, vsem,
                  *, Sk: int, chunk: int, bq: int, scale: float,
                  window: int, g: int):
    # q and the output are ALSO moved with manual DMAs: a BlockSpec index
    # on the third axis of a 4D array ((b, h, i, 0)) is the middle-axis
    # block-index pattern that miscompiles silently on this TPU
    # generation (see ops/pallas_ops.py notes) — every array here stays
    # in ANY memory and only leading-axis .at[] slices are DMA'd, the
    # one pattern hardware-verified by the paged/decode kernels.
    b = pl.program_id(0)
    h = pl.program_id(1)
    qi = pl.program_id(2)
    kh = jax.lax.div(h, g)
    off = off_ref[0]
    qstart = off + qi * bq
    rq = pltpu.make_async_copy(
        q_in.at[b, h, pl.ds(qi * bq, bq)], qbuf, qsem)
    rq.start()
    # kv rows attended by this q block: [max(qstart - window + 1, 0),
    # qstart + bq) clipped causally per row below. Clamp to Sk so a
    # caller violating offset + Sq <= Sk degrades to masked reads
    # instead of an OOB chunk DMA past the cache array.
    n = jnp.minimum(qstart + bq, Sk)
    nchunks = jax.lax.div(n + chunk - 1, chunk)
    lo = jnp.maximum(qstart - window + 1, 0)
    c0 = jax.lax.div(lo, chunk)

    def k_copy(p, slot):
        return pltpu.make_async_copy(
            k_in.at[b, kh, pl.ds(p * chunk, chunk)], kbuf.at[slot],
            ksem.at[slot])

    def v_copy(p, slot):
        return pltpu.make_async_copy(
            v_in.at[b, kh, pl.ds(p * chunk, chunk)], vbuf.at[slot],
            vsem.at[slot])

    @pl.when(c0 < nchunks)
    def _prologue():
        k_copy(c0, jax.lax.rem(c0, 2)).start()
        v_copy(c0, jax.lax.rem(c0, 2)).start()

    rq.wait()
    q = qbuf[...].astype(jnp.float32)  # (bq, hd)
    qpos = qstart + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)

    def body(p, carry):
        m, l, acc = carry
        slot = jax.lax.rem(p, 2)

        @pl.when(p + 1 < nchunks)
        def _next():
            k_copy(p + 1, 1 - slot).start()
            v_copy(p + 1, 1 - slot).start()

        k_copy(p, slot).wait()
        v_copy(p, slot).wait()
        k = kbuf[slot].astype(jnp.float32)  # (chunk, hd)
        v = vbuf[slot].astype(jnp.float32)

        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (bq, chunk)
        kpos = p * chunk + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        logits = jnp.where((kpos <= qpos) & (kpos > qpos - window),
                           logits, NEG_INF)

        m2 = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m2)
        pexp = jnp.exp(logits - m2)
        l2 = l * alpha + jnp.sum(pexp, axis=-1, keepdims=True)
        acc2 = acc * alpha + jnp.dot(pexp, v,
                                     preferred_element_type=jnp.float32)
        return m2, l2, acc2

    hd = q.shape[1]
    init = (jnp.full((bq, 1), NEG_INF, jnp.float32),
            jnp.zeros((bq, 1), jnp.float32),
            jnp.zeros((bq, hd), jnp.float32))
    m, l, acc = jax.lax.fori_loop(c0, nchunks, body, init)
    obuf[...] = acc / jnp.maximum(l, 1e-30)
    wo = pltpu.make_async_copy(
        obuf, out_hbm.at[b, h, pl.ds(qi * bq, bq)], osem)
    wo.start()
    wo.wait()


def _pick_bq(Sq: int, cap: int = 512):
    """Largest 16-aligned divisor of Sq that is <= cap, or None."""
    return _pick_chunk(Sq, cap)


@functools.partial(jax.jit, static_argnames=("sliding_window", "interpret"))
def flash_attention(q, k, v, offset, *, sliding_window=None,
                    interpret: bool = False):
    """Causal chunked attention for a prefill window.

    Args:
      q:      (B, H, Sq, hd) rope'd queries for window positions
              [offset, offset + Sq)
      k, v:   (B, Hkv, Sk, hd) — either the window itself (Sk == Sq,
              offset == 0) or the FULL cache array whose rows
              [0, offset + Sq) are valid (continuation prefill; rows
              beyond are never read)
      offset: scalar int32 position of q[:, :, 0]
      sliding_window: attend only the trailing window positions.

    Returns attn_out (B, H, Sq, hd) f32.
    """
    B, H, Sq, hd = q.shape
    Hkv, Sk = k.shape[1], k.shape[2]
    g = H // Hkv
    assert g * Hkv == H, (H, Hkv)
    bq = _pick_bq(Sq)
    chunk = _pick_chunk(Sk)
    if bq is None or chunk is None:
        raise ValueError(
            f"Sq={Sq} / Sk={Sk} have no 16-aligned chunking — the caller "
            "should have fallen back to the XLA attention chain")
    scale = 1.0 / (hd ** 0.5)
    window = Sk + Sq + 1 if sliding_window is None else int(sliding_window)
    off1 = jnp.asarray(offset, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H, Sq // bq),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((bq, hd), q.dtype),
            pltpu.VMEM((bq, hd), jnp.float32),
            pltpu.VMEM((2, chunk, hd), k.dtype),
            pltpu.VMEM((2, chunk, hd), v.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_flash_kernel, Sk=Sk, chunk=chunk, bq=bq,
                          scale=scale, window=window, g=g),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Sq, hd), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(off1, q, k, v)

    return out
