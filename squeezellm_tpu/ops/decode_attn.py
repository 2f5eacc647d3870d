"""Fused dense-cache decode attention: cache write + attention, one launch.

The dense decode path (single-stream `engine.Engine` and the dense-slot
`serving.ContinuousBatchEngine`) previously issued, per layer per token:
two cache `dynamic_update_slice`s (or a batched scatter for per-slot
positions), a `repeat_kv` broadcast, a mask build, and a 4-op masked
softmax chain over the FULL (B, H, max_seq, hd) cache — ~10 small XLA ops
whose inter-op scheduling gaps dominate at decode (measured ~0.85 ms/step
of gaps across ~550 ops at 7B; ROADMAP round-2 notes). The reference's
CUDA decode has no analogue op-count problem (one fused attention kernel
per step via torch SDPA at `/root/reference/llama.py:60-132` module
forward), so this closes a TPU-specific gap, not a parity one.

This kernel folds all of it into ONE Pallas launch per layer, the dense
twin of `ops/paged_attn.py` (same manual-DMA + online-softmax structure,
page table replaced by direct row addressing):

  * the current token's k/v are DMA-written into row `len-1` of the slot's
    cache inside the kernel (aligned 16-row slab read-modify-write: token-
    dim DMA slices must align to the dtype tile height — see
    ops/paged_attn.py);
  * attention streams the cache in `chunk`-row slabs with double-buffered
    DMAs, reading ONLY ceil(len/chunk) chunks instead of all max_seq rows
    (the XLA path reads + masks the whole cache every token: ~1 GB/token
    at 7B/2048 — this reads just the valid prefix);
  * sliding-window models (Mistral) skip chunks wholly below the window;
  * GQA is grouped: one grid step per (slot, kv head) computes all
    `H/Hkv` query heads of that group; softmax is the online (flash) form.

Inactive slots (length 0) read nothing, write nothing, and emit zeros.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _pick_chunk(S: int, cap: int = 512, align: int = 16):
    """Largest divisor of S that is <= cap and DMA-tile-aligned (multiple
    of `align` rows — 16 is the bf16 tile height; f32 needs 8, 16 covers
    both; int8 caches need 32). Returns None when no aligned chunking
    exists (S not a multiple of `align`): chunk-loop DMAs would start at
    misaligned token offsets and the write slab would overrun the cache —
    callers must fall back to the XLA chain (see models/llama.py
    fused-branch gate)."""
    if S % align != 0:
        return None
    if S <= cap:
        return S
    for c in range(cap - cap % align, 0, -align):
        if S % c == 0:
            return c
    return align


def _rope_apply(x, cos, sin):
    """Rotate rows of x (r, hd) by precomputed cos/sin rows ((1|r, hd), HF
    rotate-half convention — the exact values of models/common.rope_cos_sin,
    passed in as kernel operands). An earlier revision recomputed cos/sin
    IN-kernel from rope_theta; that verified in interpret mode but
    diverged ~6.5e-3 from the XLA chain on hardware (Mosaic's large-angle
    sin/cos approximation differs from XLA:TPU's), so cache rows written
    by decode disagreed with prefill-written rows. The host computes
    cos/sin ONCE per decode step (shared by all layers) and the kernel is
    left with 3 VPU mul/adds — faster AND bit-identical to the host rope."""
    d2 = x.shape[1] // 2
    rot = jnp.concatenate([-x[:, d2:], x[:, :d2]], axis=1)
    return x * cos + rot * sin


def _dense_attn_kernel(len_ref, q_ref, kn_ref, vn_ref, cos_ref, sin_ref,
                       ck_in, cv_in,
                       ck_ref, cv_ref, out_ref,
                       kbuf, vbuf, pairk, pairv, ksem, vsem, wsem,
                       *, S: int, chunk: int, scale: float, window: int,
                       rope: bool):
    """One (slot b, kv-head h) grid step.

    len_ref: (B,) int32 valid tokens per slot INCLUDING the current one
    q_ref:   (1, g, hd) f32 — query heads of this kv group (pre-rope
             when `rope` — the kernel rotates q/k_new by the cos/sin
             operand rows — rope'd by the caller otherwise).
    cos/sin: (1, 1, hd) f32 — rope rows at this slot's position
             (models/common.rope_cos_sin values; identity rows when the
             model has no rope).
             q/kn/vn/out are (B*Hkv, ...)-shaped host-side so every
             BlockSpec index lands on the LEADING axis — a varying block
             index on a middle axis of a 3D/4D array is the Mosaic
             pattern that miscompiles silently on this TPU generation
             (see ops/pallas_ops.py notes); leading-axis indices are the
             hardware-verified form.
    kn/vn:   (1, 1, hd) f32 — current token's k/v for this kv head
    ck/cv:   (B, Hkv, S, hd) dense cache, ANY memory space, aliased in->out
             (only ever addressed via `.at[b, h]` manual-DMA slices)
    out_ref: (1, g, hd) f32
    kbuf/vbuf: (2, chunk, hd) VMEM double buffers
    """
    b = pl.program_id(0)
    h = pl.program_id(1)
    # clamp: the dense serving engine advances pos for INACTIVE slots too
    # inside a decode window (their stale pos rides along) — without the
    # clamp a stale slot near max_seq would push the chunk loop past the
    # cache array (OOB DMA). The XLA chain is naturally clamped by
    # dynamic_update_slice; mirror that here.
    n = jnp.minimum(len_ref[b], S)
    nchunks = jax.lax.div(n + chunk - 1, chunk)
    # sliding window: chunks wholly below kpos = n - window hold no
    # attended rows — start there instead of 0
    lo = jnp.maximum(n - window, 0)
    c0 = jax.lax.div(lo, chunk)

    # ---- write the current token's k/v into cache row n-1 (n >= 1) ----
    # (aligned-slab read-modify-write; grid steps are sequential per core
    # and the chunk loop below waits on this — race-free)
    last = n - 1
    slab = min(16, S)
    off2 = jax.lax.div(last, slab) * slab
    sub = last - off2

    kn = kn_ref[0].astype(jnp.float32)  # (1, hd)
    if rope:
        kn = _rope_apply(kn, cos_ref[0], sin_ref[0])

    @pl.when(n > 0)
    def _write():
        rk = pltpu.make_async_copy(
            ck_ref.at[b, h, pl.ds(off2, slab)], pairk, wsem.at[0])
        rv = pltpu.make_async_copy(
            cv_ref.at[b, h, pl.ds(off2, slab)], pairv, wsem.at[1])
        rk.start()
        rv.start()
        rk.wait()
        rv.wait()
        rows = jax.lax.broadcasted_iota(jnp.int32, (slab, 1), 0)
        pairk[:] = jnp.where(rows == sub, kn.astype(pairk.dtype),
                             pairk[:])
        pairv[:] = jnp.where(rows == sub, vn_ref[0].astype(pairv.dtype),
                             pairv[:])
        wk = pltpu.make_async_copy(
            pairk, ck_ref.at[b, h, pl.ds(off2, slab)], wsem.at[0])
        wv = pltpu.make_async_copy(
            pairv, cv_ref.at[b, h, pl.ds(off2, slab)], wsem.at[1])
        wk.start()
        wv.start()
        wk.wait()
        wv.wait()

    def k_copy(p, slot):
        return pltpu.make_async_copy(
            ck_ref.at[b, h, pl.ds(p * chunk, chunk)], kbuf.at[slot],
            ksem.at[slot])

    def v_copy(p, slot):
        return pltpu.make_async_copy(
            cv_ref.at[b, h, pl.ds(p * chunk, chunk)], vbuf.at[slot],
            vsem.at[slot])

    @pl.when(c0 < nchunks)
    def _prologue():
        k_copy(c0, jax.lax.rem(c0, 2)).start()
        v_copy(c0, jax.lax.rem(c0, 2)).start()

    q = q_ref[0].astype(jnp.float32)  # (g, hd)
    if rope:
        q = _rope_apply(q, cos_ref[0], sin_ref[0])
    g, hd = q.shape

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
        ) * scale  # (g, chunk)
        kpos = p * chunk + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        logits = jnp.where((kpos < n) & (kpos >= lo), logits, NEG_INF)

        m2 = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m2)
        pexp = jnp.exp(logits - m2)
        l2 = l * alpha + jnp.sum(pexp, axis=-1, keepdims=True)
        acc2 = acc * alpha + jnp.dot(pexp, v,
                                     preferred_element_type=jnp.float32)
        return m2, l2, acc2

    init = (jnp.full((g, 1), NEG_INF, jnp.float32),
            jnp.zeros((g, 1), jnp.float32),
            jnp.zeros((g, hd), jnp.float32))
    m, l, acc = jax.lax.fori_loop(c0, nchunks, body, init)
    out_ref[0] = acc / jnp.maximum(l, 1e-30)


def _rope_operand_rows(rope_cos, rope_sin, B, R, hd):
    """Kernel-shaped (B, R, hd) f32 rope rows; identity placeholders (and
    rope=False so the kernel skips the mul/adds) when the model has no
    rope (OPT)."""
    if rope_cos is None:
        z = jnp.zeros((B, R, hd), jnp.float32)
        return z, z, False
    return (rope_cos.reshape(B, R, hd).astype(jnp.float32),
            rope_sin.reshape(B, R, hd).astype(jnp.float32), True)


@functools.partial(jax.jit, static_argnames=("sliding_window", "interpret"))
def dense_decode_attention(q, k_new, v_new, ck, cv, lengths, *,
                           sliding_window=None, rope_cos=None, rope_sin=None,
                           interpret: bool = False):
    """Fused cache-write + attention for one dense-cache decode step.

    Args:
      q:       (B, H, hd) queries — PRE-rope when rope_cos/rope_sin are
               given ((B, hd) rows at position lengths-1, the values of
               models/common.rope_cos_sin — the kernel rotates q and
               k_new by them), rope'd otherwise
      k_new:   (B, Hkv, hd) current token's keys (same rope contract)
      v_new:   (B, Hkv, hd) values
      ck/cv:   (B, Hkv, S, hd) dense KV cache (DONATED/aliased: the updated
               cache is returned)
      lengths: (B,) int32 — valid tokens per slot INCLUDING the current one
               (0 = inactive slot: no write, zero output).
      sliding_window: attend only the last `sliding_window` positions
               (Mistral); None = full causal.

    Returns (attn_out (B, H, hd) f32, ck, cv).
    """
    B, H, hd = q.shape
    Hkv, S = ck.shape[1], ck.shape[2]
    assert ck.shape == cv.shape == (B, Hkv, S, hd), (ck.shape, q.shape)
    g = H // Hkv
    assert g * Hkv == H, (H, Hkv)
    chunk = _pick_chunk(S)
    if chunk is None:
        raise ValueError(
            f"max_seq={S} is not a multiple of 16 — no tile-aligned "
            "chunking exists; use the XLA attention chain for this cache "
            "(the model-level fused-branch gate should have caught this)")
    scale = 1.0 / (hd ** 0.5)
    window = S + 1 if sliding_window is None else int(sliding_window)

    # (B, Hkv) collapsed to one leading axis: all VMEM block indices are
    # leading-axis only (middle-axis block indices miscompile — see the
    # kernel docstring); the caches stay in ANY and are manually DMA'd.
    q4 = q.reshape(B * Hkv, g, hd).astype(jnp.float32)
    kn4 = k_new.reshape(B * Hkv, 1, hd).astype(jnp.float32)
    vn4 = v_new.reshape(B * Hkv, 1, hd).astype(jnp.float32)
    cos4, sin4, rope = _rope_operand_rows(rope_cos, rope_sin, B, 1, hd)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hkv),
        in_specs=[
            pl.BlockSpec((1, g, hd), lambda b, h, *_: (b * Hkv + h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hd), lambda b, h, *_: (b * Hkv + h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hd), lambda b, h, *_: (b * Hkv + h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hd), lambda b, h, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hd), lambda b, h, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, g, hd), lambda b, h, *_: (b * Hkv + h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, chunk, hd), ck.dtype),
            pltpu.VMEM((2, chunk, hd), cv.dtype),
            pltpu.VMEM((min(16, S), hd), ck.dtype),
            pltpu.VMEM((min(16, S), hd), cv.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    ck_out, cv_out, out = pl.pallas_call(
        functools.partial(_dense_attn_kernel, S=S, chunk=chunk, scale=scale,
                          window=window, rope=rope),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(ck.shape, ck.dtype),
            jax.ShapeDtypeStruct(cv.shape, cv.dtype),
            jax.ShapeDtypeStruct((B * Hkv, g, hd), jnp.float32),
        ],
        input_output_aliases={6: 0, 7: 1},  # cache in -> out (in-place)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, q4, kn4, vn4, cos4, sin4, ck, cv)

    return out.reshape(B, H, hd), ck_out, cv_out


def _dense_attn_kernel_q8(len_ref, q_ref, kn_ref, vn_ref, cos_ref, sin_ref,
                          ck_in, cv_in, sk_in, sv_in,
                          ck_ref, cv_ref, sk_ref, sv_ref, out_ref,
                          kbuf, vbuf, skbuf, svbuf,
                          pairk, pairv, pairsk, pairsv,
                          ksem, vsem, sksem, svsem, wsem,
                          *, S: int, chunk: int, scale: float, window: int,
                          rope: bool):
    """int8-KV twin of :func:`_dense_attn_kernel` — the dense-cache
    counterpart of ops/paged_attn._paged_attn_kernel_q8 (same quantize
    math, page table replaced by direct row addressing):

      * caches hold int8 codes (B, Hkv, S, hd) plus a lane-major f32
        scale sidecar (B, Hkv, NG*8, L): tokens [jL, (j+1)L) keep their
        scales in lane row 8j, rows 8j+1..8j+7 pad to the f32 tile so
        every scale DMA is a full (8, L) tile — see ops/kv_quant.py;
      * write: the rope'd current k and its v are quantized IN-KERNEL
        (`ops.paged_attn._quant_kv_rows`, the exact math of
        ops.kv_quant.quantize_rows); codes RMW-patch an aligned 32-row
        slab (int8 Mosaic tile height), scales patch lane last%L of
        group last//L;
      * read: the body iterates L-token chunks (chunk == L) and applies
        the scales POST-matmul along lanes — logits (g, L) by the k-row
        (1, L), p by the v-row — so the int8 codes feed the MXU raw and
        no lane<->sublane relayout exists. ~0.56x the bytes of bf16.
    """
    from squeezellm_tpu.ops.paged_attn import _quant_kv_rows

    b = pl.program_id(0)
    h = pl.program_id(1)
    n = jnp.minimum(len_ref[b], S)  # clamp: see _dense_attn_kernel
    nchunks = jax.lax.div(n + chunk - 1, chunk)
    lo = jnp.maximum(n - window, 0)
    c0 = jax.lax.div(lo, chunk)

    last = n - 1
    # int8 token-dim DMA slices must align to 32 rows; S < 32 only in
    # tiny interpret-mode tests (the wrapper asserts S % 32 == 0 else
    # falls back)
    slab = 32 if S % 32 == 0 else S
    off2 = jax.lax.div(last, slab) * slab
    sub = last - off2
    gi = jax.lax.div(last, chunk)  # scale group of the current token
    li = jax.lax.rem(last, chunk)  # its lane within the group row

    kn = kn_ref[0].astype(jnp.float32)  # (1, hd)
    if rope:
        kn = _rope_apply(kn, cos_ref[0], sin_ref[0])
    knq, kns = _quant_kv_rows(kn)
    vnq, vns = _quant_kv_rows(vn_ref[0].astype(jnp.float32))

    @pl.when(n > 0)
    def _write():
        rk = pltpu.make_async_copy(
            ck_ref.at[b, h, pl.ds(off2, slab)], pairk, wsem.at[0])
        rv = pltpu.make_async_copy(
            cv_ref.at[b, h, pl.ds(off2, slab)], pairv, wsem.at[1])
        rsk = pltpu.make_async_copy(
            sk_ref.at[b, h, pl.ds(8 * gi, 8)], pairsk, wsem.at[2])
        rsv = pltpu.make_async_copy(
            sv_ref.at[b, h, pl.ds(8 * gi, 8)], pairsv, wsem.at[3])
        for c in (rk, rv, rsk, rsv):
            c.start()
        for c in (rk, rv, rsk, rsv):
            c.wait()
        rows = jax.lax.broadcasted_iota(jnp.int32, (slab, 1), 0)
        pairk[:] = jnp.where(rows == sub, knq, pairk[:])
        pairv[:] = jnp.where(rows == sub, vnq, pairv[:])
        srow = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        spot = (srow == 0) & (lane == li)  # (8, chunk)
        pairsk[:] = jnp.where(spot, kns, pairsk[:])
        pairsv[:] = jnp.where(spot, vns, pairsv[:])
        wk = pltpu.make_async_copy(
            pairk, ck_ref.at[b, h, pl.ds(off2, slab)], wsem.at[0])
        wv = pltpu.make_async_copy(
            pairv, cv_ref.at[b, h, pl.ds(off2, slab)], wsem.at[1])
        wsk = pltpu.make_async_copy(
            pairsk, sk_ref.at[b, h, pl.ds(8 * gi, 8)], wsem.at[2])
        wsv = pltpu.make_async_copy(
            pairsv, sv_ref.at[b, h, pl.ds(8 * gi, 8)], wsem.at[3])
        for c in (wk, wv, wsk, wsv):
            c.start()
        for c in (wk, wv, wsk, wsv):
            c.wait()

    def copies(p, slot):
        return (
            pltpu.make_async_copy(
                ck_ref.at[b, h, pl.ds(p * chunk, chunk)], kbuf.at[slot],
                ksem.at[slot]),
            pltpu.make_async_copy(
                cv_ref.at[b, h, pl.ds(p * chunk, chunk)], vbuf.at[slot],
                vsem.at[slot]),
            pltpu.make_async_copy(
                sk_ref.at[b, h, pl.ds(8 * p, 8)], skbuf.at[slot],
                sksem.at[slot]),
            pltpu.make_async_copy(
                sv_ref.at[b, h, pl.ds(8 * p, 8)], svbuf.at[slot],
                svsem.at[slot]),
        )

    @pl.when(c0 < nchunks)
    def _prologue():
        for c in copies(c0, jax.lax.rem(c0, 2)):
            c.start()

    q = q_ref[0].astype(jnp.float32)  # (g, hd)
    if rope:
        q = _rope_apply(q, cos_ref[0], sin_ref[0])
    g, hd = q.shape

    def body(p, carry):
        m, l, acc = carry
        slot = jax.lax.rem(p, 2)

        @pl.when(p + 1 < nchunks)
        def _next():
            for c in copies(p + 1, 1 - slot):
                c.start()

        for c in copies(p, slot):
            c.wait()
        k = kbuf[slot].astype(jnp.float32)  # (chunk, hd) int8 codes
        v = vbuf[slot].astype(jnp.float32)
        ks_row = skbuf[slot][0:1]  # (1, chunk) lane-major group scales
        vs_row = svbuf[slot][0:1]

        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (ks_row * scale)  # (g, chunk): dequant folded in post-matmul
        kpos = p * chunk + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        logits = jnp.where((kpos < n) & (kpos >= lo), logits, NEG_INF)

        m2 = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m2)
        pexp = jnp.exp(logits - m2)
        l2 = l * alpha + jnp.sum(pexp, axis=-1, keepdims=True)
        acc2 = acc * alpha + jnp.dot(pexp * vs_row, v,  # v dequant folded
                                     preferred_element_type=jnp.float32)
        return m2, l2, acc2

    init = (jnp.full((g, 1), NEG_INF, jnp.float32),
            jnp.zeros((g, 1), jnp.float32),
            jnp.zeros((g, hd), jnp.float32))
    m, l, acc = jax.lax.fori_loop(c0, nchunks, body, init)
    out_ref[0] = acc / jnp.maximum(l, 1e-30)


@functools.partial(jax.jit, static_argnames=("sliding_window", "interpret"))
def dense_decode_attention_q8(q, k_new, v_new, ck, cv, sk, sv, lengths, *,
                              sliding_window=None, rope_cos=None,
                              rope_sin=None, interpret: bool = False):
    """:func:`dense_decode_attention` over int8 caches with lane-major
    f32 scale sidecars (format + rationale: ops/kv_quant.py).

    ck/cv: (B, Hkv, S, hd) int8 (aliased in->out)
    sk/sv: (B, Hkv, NG*8, L) f32, L = kv_quant.group_len(S) (aliased)

    Returns (attn_out (B, H, hd) f32, ck, cv, sk, sv).
    """
    from squeezellm_tpu.ops import kv_quant

    B, H, hd = q.shape
    Hkv, S = ck.shape[1], ck.shape[2]
    assert ck.dtype == jnp.int8 and cv.dtype == jnp.int8
    assert ck.shape == cv.shape == (B, Hkv, S, hd), (ck.shape, q.shape)
    side = (B, Hkv) + kv_quant.sidecar_shape(S)
    assert sk.shape == sv.shape == side, (sk.shape, side)
    g = H // Hkv
    assert g * Hkv == H, (H, Hkv)
    # the body iterates one scale group per chunk: L tokens (128, or S
    # itself for tiny interpret-mode tests)
    chunk = kv_quant.group_len(S)
    if S % 32 != 0 and S % chunk != 0:
        raise ValueError(
            f"max_seq={S} is not 32-row alignable — no int8-tile-aligned "
            "chunking exists; use the XLA attention chain for this cache "
            "(the model-level fused-branch gate should have caught this)")
    scale = 1.0 / (hd ** 0.5)
    window = S + 1 if sliding_window is None else int(sliding_window)
    slab = 32 if S % 32 == 0 else S

    q4 = q.reshape(B * Hkv, g, hd).astype(jnp.float32)
    kn4 = k_new.reshape(B * Hkv, 1, hd).astype(jnp.float32)
    # v quantizes in-kernel (not cast host-side): rounding must match the
    # XLA mirror's f32 math
    vn4 = v_new.reshape(B * Hkv, 1, hd).astype(jnp.float32)
    cos4, sin4, rope = _rope_operand_rows(rope_cos, rope_sin, B, 1, hd)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hkv),
        in_specs=[
            pl.BlockSpec((1, g, hd), lambda b, h, *_: (b * Hkv + h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hd), lambda b, h, *_: (b * Hkv + h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hd), lambda b, h, *_: (b * Hkv + h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hd), lambda b, h, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hd), lambda b, h, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, g, hd), lambda b, h, *_: (b * Hkv + h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, chunk, hd), jnp.int8),
            pltpu.VMEM((2, chunk, hd), jnp.int8),
            pltpu.VMEM((2, 8, chunk), jnp.float32),
            pltpu.VMEM((2, 8, chunk), jnp.float32),
            pltpu.VMEM((slab, hd), jnp.int8),
            pltpu.VMEM((slab, hd), jnp.int8),
            pltpu.VMEM((8, chunk), jnp.float32),
            pltpu.VMEM((8, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )

    ck_out, cv_out, sk_out, sv_out, out = pl.pallas_call(
        functools.partial(_dense_attn_kernel_q8, S=S, chunk=chunk,
                          scale=scale, window=window, rope=rope),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(ck.shape, ck.dtype),
            jax.ShapeDtypeStruct(cv.shape, cv.dtype),
            jax.ShapeDtypeStruct(sk.shape, sk.dtype),
            jax.ShapeDtypeStruct(sv.shape, sv.dtype),
            jax.ShapeDtypeStruct((B * Hkv, g, hd), jnp.float32),
        ],
        input_output_aliases={6: 0, 7: 1, 8: 2, 9: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, q4, kn4, vn4, cos4, sin4, ck, cv, sk, sv)

    return out.reshape(B, H, hd), ck_out, cv_out, sk_out, sv_out
