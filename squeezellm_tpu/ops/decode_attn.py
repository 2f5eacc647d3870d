"""Fused dense-cache decode attention: cache write + attention, one launch.

The dense decode path (single-stream `engine.Engine` and the dense-slot
`serving.ContinuousBatchEngine`) previously issued, per layer per token:
two cache `dynamic_update_slice`s (or a batched scatter for per-slot
positions), a `repeat_kv` broadcast, a mask build, and a 4-op masked
softmax chain over the FULL (B, max_seq, Hkv*hd) cache — ~10 small XLA ops
whose inter-op scheduling gaps dominate at decode (measured ~0.85 ms/step
of gaps across ~550 ops at 7B; ROADMAP round-2 notes). The reference's
CUDA decode has no analogue op-count problem (one fused attention kernel
per step via torch SDPA at `/root/reference/llama.py:60-132` module
forward), so this closes a TPU-specific gap, not a parity one.

Round-4 redesign — TOKEN-MAJOR cache, ALL KV HEADS PER GRID STEP:

  The round-2/3 kernel ran a (B, Hkv) grid over a head-major
  (B, Hkv, S, hd) cache: 32 sequential grid steps per layer at 7B, each
  paying its own serial DMA round-trips (slab RMW + chunk reads) —
  measured 50 us/layer-step on v5e, ~1.6 ms/step at 32 layers, almost
  all fixed latency. This kernel runs ONE grid step per slot over a
  token-major (B, S, Hkv*hd) cache:

  * a token row is CONTIGUOUS across heads, so the current token's k/v
    write is one aligned 16-row slab RMW (2+2 DMAs total, was 4*Hkv) and
    each attention chunk is one (chunk, Hkv*hd) contiguous DMA (2 per
    chunk, was 2*Hkv);
  * per-head attention folds into ONE MXU matmul via a BLOCK-DIAGONAL Q:
    qbd (H, Hkv*hd) carries q[hg] in the lane block of kv head hg//g and
    zeros elsewhere, so logits = qbd @ chunk^T gives logits[hg, t] =
    q[hg] . k[h(hg), t] exactly — zero terms add exactly 0.0 in the f32
    MXU accumulator, and the off-head FLOPs ride an otherwise idle MXU
    (decode is DMA/latency-bound);
  * p @ v runs the same way on the (chunk, Hkv*hd) v slab; only the
    diagonal hd-block of each output row is kept.

  Measured (v5e, 7B shape: B=1 Hkv=32 hd=128 S=128): 6.3 us/layer-step
  vs 50.2 for the per-head-grid kernel — ~0.2 ms/step total at 32
  layers, was 1.6 (scripts/attn_v2_probe.py).

  Token-major is also the PROJECTION-NATURAL layout: k_proj emits
  (B, S, Hkv*hd) directly, so prefill writes need no transpose.

Other properties (unchanged from the earlier kernel):
  * attention streams only ceil(len/chunk) chunks of the valid prefix
    (the XLA chain reads + masks all max_seq rows every token);
  * sliding-window models (Mistral) skip chunks wholly below the window;
  * rope (HF rotate-half) applies in-kernel to q and k_new from
    precomputed cos/sin operand rows (models/common.rope_cos_sin values;
    an in-kernel rope-from-theta diverged ~6.5e-3 from the XLA chain on
    hardware — Mosaic's large-angle sin/cos differs from XLA:TPU's);
  * online (flash) softmax; inactive slots (length 0) read nothing,
    write nothing, emit zeros;
  * int8 twin: codes cache (B, S, Hkv*hd) int8 + a head-major scale
    sidecar (B, Hkv8, S) f32 (Hkv8 = Hkv rounded to the 8-sublane f32
    tile; token axis on LANES so a chunk of scales is one (Hkv8, chunk)
    DMA). The current token quantizes IN-KERNEL after rope (the exact
    math of ops.kv_quant.quantize_rows); k scales fold into logits and
    v scales into p POST-matmul via g-row-repeated (H, chunk) tiles, so
    int8 codes feed the MXU raw.
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
    of `align` rows — 16 covers the bf16 tile height and f32's 8; int8
    codes need 32). Returns None when no aligned chunking exists (S not a
    multiple of `align`): chunk-loop DMAs would start at misaligned token
    offsets and the write slab would overrun the cache — callers must
    fall back to the XLA chain (see models/llama.py fused-branch gate)."""
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
    passed in as kernel operands; see the module docstring for why not
    recomputed in-kernel)."""
    d2 = x.shape[1] // 2
    rot = jnp.concatenate([-x[:, d2:], x[:, :d2]], axis=1)
    return x * cos + rot * sin


def _block_diag_q(q, hkv: int, g: int):
    """(H, hd) query rows -> (H, Hkv*hd) block-diagonal matrix: row hg
    carries q[hg] in lane block hg // g, zeros elsewhere."""
    H, hd = q.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (H, hd), 0) // g
    return jnp.concatenate(
        [jnp.where(row == j, q, 0.0) for j in range(hkv)], axis=1)


def _extract_diag(acc, hkv: int, g: int, hd: int):
    """(H, Hkv*hd) -> (H, hd): keep each row's own head block."""
    H = acc.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (H, hd), 0) // g
    o = jnp.zeros((H, hd), jnp.float32)
    for j in range(hkv):
        o = jnp.where(row == j, acc[:, j * hd:(j + 1) * hd], o)
    return o


def _repeat_rows(x, g: int):
    """(Hkv, L) -> (Hkv*g, L): row j repeated g times (query-head order
    hg = h * g + u)."""
    if g == 1:
        return x
    hkv = x.shape[0]
    return jnp.concatenate(
        [x[j:j + 1] for j in range(hkv) for _ in range(g)], axis=0)


def _dense_attn_kernel(len_ref, q_ref, kn_ref, vn_ref, cos_ref, sin_ref,
                       ck_in, cv_in,
                       ck_ref, cv_ref, out_ref,
                       kbuf, vbuf, pairk, pairv, ksem, vsem, wsem,
                       *, S: int, chunk: int, scale: float, window: int,
                       rope: bool, hkv: int, g: int, hd: int):
    """One grid step per slot b.

    len_ref: (B,) int32 valid tokens per slot INCLUDING the current one
    q_ref:   (1, H, hd) f32 — all query heads (pre-rope when `rope` — the
             kernel rotates q/k_new by the cos/sin operand rows — rope'd
             by the caller otherwise)
    kn/vn:   (1, Hkv, hd) f32 — current token's k/v rows
    cos/sin: (1, 1, hd) f32 — rope rows at this slot's position
    ck/cv:   (B, S, Hkv*hd) dense cache, ANY memory space, aliased in->out
             (only ever addressed via `.at[b, pl.ds(...)]` manual-DMA
             token slabs — contiguous across heads)
    out_ref: (1, H, hd) f32
    kbuf/vbuf: (2, chunk, Hkv*hd) VMEM double buffers
    pairk/pairv: (slab, Hkv*hd) write RMW staging
    """
    b = pl.program_id(0)
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

    kn = kn_ref[0].astype(jnp.float32)  # (Hkv, hd)
    if rope:
        kn = _rope_apply(kn, cos_ref[0], sin_ref[0])

    @pl.when(n > 0)
    def _write():
        rk = pltpu.make_async_copy(
            ck_ref.at[b, pl.ds(off2, slab)], pairk, wsem.at[0])
        rv = pltpu.make_async_copy(
            cv_ref.at[b, pl.ds(off2, slab)], pairv, wsem.at[1])
        rk.start()
        rv.start()
        rk.wait()
        rv.wait()
        hit = jax.lax.broadcasted_iota(jnp.int32, (slab, 1), 0) == sub
        vn = vn_ref[0]
        for j in range(hkv):  # per-head lane blocks of the token row
            sl = pl.ds(j * hd, hd)
            pairk[:, sl] = jnp.where(hit, kn[j:j + 1].astype(pairk.dtype),
                                     pairk[:, sl])
            pairv[:, sl] = jnp.where(hit, vn[j:j + 1].astype(pairv.dtype),
                                     pairv[:, sl])
        wk = pltpu.make_async_copy(
            pairk, ck_ref.at[b, pl.ds(off2, slab)], wsem.at[0])
        wv = pltpu.make_async_copy(
            pairv, cv_ref.at[b, pl.ds(off2, slab)], wsem.at[1])
        wk.start()
        wv.start()
        wk.wait()
        wv.wait()

    def k_copy(p, slot):
        return pltpu.make_async_copy(
            ck_ref.at[b, pl.ds(p * chunk, chunk)], kbuf.at[slot],
            ksem.at[slot])

    def v_copy(p, slot):
        return pltpu.make_async_copy(
            cv_ref.at[b, pl.ds(p * chunk, chunk)], vbuf.at[slot],
            vsem.at[slot])

    @pl.when(c0 < nchunks)
    def _prologue():
        k_copy(c0, jax.lax.rem(c0, 2)).start()
        v_copy(c0, jax.lax.rem(c0, 2)).start()

    q = q_ref[0].astype(jnp.float32)  # (H, hd)
    if rope:
        q = _rope_apply(q, cos_ref[0], sin_ref[0])
    H = hkv * g
    qbd = _block_diag_q(q, hkv, g)  # (H, Hkv*hd)

    def body(p, carry):
        m, l, acc = carry
        slot = jax.lax.rem(p, 2)

        @pl.when(p + 1 < nchunks)
        def _next():
            k_copy(p + 1, 1 - slot).start()
            v_copy(p + 1, 1 - slot).start()

        k_copy(p, slot).wait()
        v_copy(p, slot).wait()
        k = kbuf[slot].astype(jnp.float32)  # (chunk, Hkv*hd)
        v = vbuf[slot].astype(jnp.float32)

        logits = jax.lax.dot_general(
            qbd, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (H, chunk)
        kpos = p * chunk + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        logits = jnp.where((kpos < n) & (kpos >= lo), logits, NEG_INF)

        m2 = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m2)
        pexp = jnp.exp(logits - m2)
        l2 = l * alpha + jnp.sum(pexp, axis=-1, keepdims=True)
        acc2 = acc * alpha + jnp.dot(pexp, v,
                                     preferred_element_type=jnp.float32)
        return m2, l2, acc2

    init = (jnp.full((H, 1), NEG_INF, jnp.float32),
            jnp.zeros((H, 1), jnp.float32),
            jnp.zeros((H, hkv * hd), jnp.float32))
    m, l, acc = jax.lax.fori_loop(c0, nchunks, body, init)
    out_ref[0] = _extract_diag(acc, hkv, g, hd) / jnp.maximum(l, 1e-30)


def _rope_operand_rows(rope_cos, rope_sin, B, R, hd):
    """Kernel-shaped (B, R, hd) f32 rope rows; TRUE identity rows (cos=1,
    sin=0) and rope=False (so the kernel also skips the mul/adds) when the
    model has no rope (OPT)."""
    if (rope_cos is None) != (rope_sin is None):
        raise ValueError(
            "rope_cos and rope_sin must be passed together (got exactly "
            "one of them)")
    if rope_cos is None:
        return (jnp.ones((B, R, hd), jnp.float32),
                jnp.zeros((B, R, hd), jnp.float32), False)
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
      ck/cv:   (B, S, Hkv*hd) TOKEN-MAJOR dense KV cache (DONATED/aliased:
               the updated cache is returned)
      lengths: (B,) int32 — valid tokens per slot INCLUDING the current one
               (0 = inactive slot: no write, zero output).
      sliding_window: attend only the last `sliding_window` positions
               (Mistral); None = full causal.

    Returns (attn_out (B, H, hd) f32, ck, cv).
    """
    B, H, hd = q.shape
    Hkv = k_new.shape[1]
    KV = Hkv * hd
    S = ck.shape[1]
    assert ck.shape == cv.shape == (B, S, KV), (ck.shape, q.shape)
    g = H // Hkv
    assert g * Hkv == H, (H, Hkv)
    # VMEM budget: 4 buffers of (chunk, KV) (k+v double-buffered); cap
    # each at ~1 MB so 13B shapes (KV=5120) still fit comfortably. For
    # multi-slot pools, small chunks matter more than big DMAs: each
    # slot reads ceil(len/chunk) whole chunks, so a 128-row chunk over a
    # ~40-token slot streams 3x the valid bytes (measured 1.46 ->
    # ~0.5 ms/step at 16 slots with 32-row chunks; the extra DMA issues
    # hide under double buffering).
    cap = max(16, (1024 * 1024) // (KV * ck.dtype.itemsize) // 16 * 16)
    if B > 1:
        cap = min(cap, 32)
    chunk = _pick_chunk(S, cap=cap)
    if chunk is None:
        raise ValueError(
            f"max_seq={S} is not a multiple of 16 — no tile-aligned "
            "chunking exists; use the XLA attention chain for this cache "
            "(the model-level fused-branch gate should have caught this)")
    scale = 1.0 / (hd ** 0.5)
    window = S + 1 if sliding_window is None else int(sliding_window)

    q3 = q.astype(jnp.float32)
    kn3 = k_new.astype(jnp.float32)
    vn3 = v_new.astype(jnp.float32)
    cos3, sin3, rope = _rope_operand_rows(rope_cos, rope_sin, B, 1, hd)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, hd), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, hd), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, hd), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hd), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hd), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, H, hd), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, chunk, KV), ck.dtype),
            pltpu.VMEM((2, chunk, KV), cv.dtype),
            pltpu.VMEM((min(16, S), KV), ck.dtype),
            pltpu.VMEM((min(16, S), KV), cv.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    ck_out, cv_out, out = pl.pallas_call(
        functools.partial(_dense_attn_kernel, S=S, chunk=chunk, scale=scale,
                          window=window, rope=rope, hkv=Hkv, g=g, hd=hd),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(ck.shape, ck.dtype),
            jax.ShapeDtypeStruct(cv.shape, cv.dtype),
            jax.ShapeDtypeStruct((B, H, hd), jnp.float32),
        ],
        input_output_aliases={6: 0, 7: 1},  # cache in -> out (in-place)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(lengths, q3, kn3, vn3, cos3, sin3, ck, cv)

    return out, ck_out, cv_out


# ---------------------------------------------------------------------------
# int8 twin
# ---------------------------------------------------------------------------


def _dense_attn_kernel_q8(len_ref, q_ref, kn_ref, vn_ref, cos_ref, sin_ref,
                          ck_in, cv_in, sk_in, sv_in,
                          ck_ref, cv_ref, sk_ref, sv_ref, out_ref,
                          kbuf, vbuf, skbuf, svbuf,
                          pairk, pairv, pairsk, pairsv,
                          ksem, vsem, sksem, svsem, wsem,
                          *, S: int, chunk: int, scale: float, window: int,
                          rope: bool, hkv: int, hkv8: int, g: int, hd: int):
    """int8-KV twin of :func:`_dense_attn_kernel` (same one-step-per-slot
    structure; quantize math of ops.kv_quant inlined via
    ops.paged_attn._quant_kv_rows):

      * codes cache (B, S, Hkv*hd) int8; scale sidecar (B, Hkv8, S) f32 —
        head rows on SUBLANES (padded to the 8-row f32 tile), token axis
        on LANES, so a chunk of scales is one (Hkv8, chunk) DMA and a
        scale write is an RMW of the 128-lane group holding the token;
      * write: the rope'd current k and its v are quantized IN-KERNEL;
        codes RMW-patch an aligned 32-row slab (int8 tile height), scales
        patch lane last%128 of lane-group last//128;
      * read: k scales fold into logits POST-matmul and v scales into
        pexp — both as g-row-repeated (H, chunk) tiles — so int8 codes
        feed the MXU raw and no lane<->sublane relayout exists.
        ~0.53x the bytes of bf16.
    """
    from squeezellm_tpu.ops.paged_attn import _quant_kv_rows

    b = pl.program_id(0)
    KV = hkv * hd
    H = hkv * g
    n = jnp.minimum(len_ref[b], S)  # clamp: see _dense_attn_kernel
    nchunks = jax.lax.div(n + chunk - 1, chunk)
    lo = jnp.maximum(n - window, 0)
    c0 = jax.lax.div(lo, chunk)

    last = n - 1
    # int8 token-dim DMA slices must align to 32 rows; S < 32 only in
    # tiny interpret-mode tests (the wrapper falls back below 32)
    slab = 32 if S % 32 == 0 else S
    off2 = jax.lax.div(last, slab) * slab
    sub = last - off2
    gi = jax.lax.div(last, chunk)  # 128-lane scale group of the token
    li = jax.lax.rem(last, chunk)  # its lane within the group

    kn = kn_ref[0].astype(jnp.float32)  # (Hkv, hd)
    if rope:
        kn = _rope_apply(kn, cos_ref[0], sin_ref[0])
    knq, kns = _quant_kv_rows(kn)           # (Hkv, hd) int8, (Hkv, 1) f32
    vnq, vns = _quant_kv_rows(vn_ref[0].astype(jnp.float32))
    if hkv8 != hkv:
        pad = jnp.zeros((hkv8 - hkv, 1), jnp.float32)
        kns = jnp.concatenate([kns, pad], axis=0)
        vns = jnp.concatenate([vns, pad], axis=0)

    @pl.when(n > 0)
    def _write():
        rk = pltpu.make_async_copy(
            ck_ref.at[b, pl.ds(off2, slab)], pairk, wsem.at[0])
        rv = pltpu.make_async_copy(
            cv_ref.at[b, pl.ds(off2, slab)], pairv, wsem.at[1])
        rsk = pltpu.make_async_copy(
            sk_ref.at[b, :, pl.ds(gi * chunk, chunk)], pairsk, wsem.at[2])
        rsv = pltpu.make_async_copy(
            sv_ref.at[b, :, pl.ds(gi * chunk, chunk)], pairsv, wsem.at[3])
        for c in (rk, rv, rsk, rsv):
            c.start()
        for c in (rk, rv, rsk, rsv):
            c.wait()
        hit = jax.lax.broadcasted_iota(jnp.int32, (slab, 1), 0) == sub
        for j in range(hkv):
            sl = pl.ds(j * hd, hd)
            pairk[:, sl] = jnp.where(hit, knq[j:j + 1], pairk[:, sl])
            pairv[:, sl] = jnp.where(hit, vnq[j:j + 1], pairv[:, sl])
        spot = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1) == li
        pairsk[:] = jnp.where(spot, kns, pairsk[:])
        pairsv[:] = jnp.where(spot, vns, pairsv[:])
        wk = pltpu.make_async_copy(
            pairk, ck_ref.at[b, pl.ds(off2, slab)], wsem.at[0])
        wv = pltpu.make_async_copy(
            pairv, cv_ref.at[b, pl.ds(off2, slab)], wsem.at[1])
        wsk = pltpu.make_async_copy(
            pairsk, sk_ref.at[b, :, pl.ds(gi * chunk, chunk)], wsem.at[2])
        wsv = pltpu.make_async_copy(
            pairsv, sv_ref.at[b, :, pl.ds(gi * chunk, chunk)], wsem.at[3])
        for c in (wk, wv, wsk, wsv):
            c.start()
        for c in (wk, wv, wsk, wsv):
            c.wait()

    def copies(p, slot):
        return (
            pltpu.make_async_copy(
                ck_ref.at[b, pl.ds(p * chunk, chunk)], kbuf.at[slot],
                ksem.at[slot]),
            pltpu.make_async_copy(
                cv_ref.at[b, pl.ds(p * chunk, chunk)], vbuf.at[slot],
                vsem.at[slot]),
            pltpu.make_async_copy(
                sk_ref.at[b, :, pl.ds(p * chunk, chunk)], skbuf.at[slot],
                sksem.at[slot]),
            pltpu.make_async_copy(
                sv_ref.at[b, :, pl.ds(p * chunk, chunk)], svbuf.at[slot],
                svsem.at[slot]),
        )

    @pl.when(c0 < nchunks)
    def _prologue():
        for c in copies(c0, jax.lax.rem(c0, 2)):
            c.start()

    q = q_ref[0].astype(jnp.float32)  # (H, hd)
    if rope:
        q = _rope_apply(q, cos_ref[0], sin_ref[0])
    qbd = _block_diag_q(q, hkv, g)

    def body(p, carry):
        m, l, acc = carry
        slot = jax.lax.rem(p, 2)

        @pl.when(p + 1 < nchunks)
        def _next():
            for c in copies(p + 1, 1 - slot):
                c.start()

        for c in copies(p, slot):
            c.wait()
        k = kbuf[slot].astype(jnp.float32)  # (chunk, KV) int8 codes
        v = vbuf[slot].astype(jnp.float32)
        ks_rep = _repeat_rows(skbuf[slot][:hkv, :], g)  # (H, chunk)
        vs_rep = _repeat_rows(svbuf[slot][:hkv, :], g)

        logits = jax.lax.dot_general(
            qbd, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (ks_rep * scale)  # (H, chunk): k dequant folded post-matmul
        kpos = p * chunk + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        logits = jnp.where((kpos < n) & (kpos >= lo), logits, NEG_INF)

        m2 = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m2)
        pexp = jnp.exp(logits - m2)
        l2 = l * alpha + jnp.sum(pexp, axis=-1, keepdims=True)
        acc2 = acc * alpha + jnp.dot(pexp * vs_rep, v,  # v dequant folded
                                     preferred_element_type=jnp.float32)
        return m2, l2, acc2

    init = (jnp.full((H, 1), NEG_INF, jnp.float32),
            jnp.zeros((H, 1), jnp.float32),
            jnp.zeros((H, KV), jnp.float32))
    m, l, acc = jax.lax.fori_loop(c0, nchunks, body, init)
    out_ref[0] = _extract_diag(acc, hkv, g, hd) / jnp.maximum(l, 1e-30)


def q8_sidecar_shape(Hkv: int, S: int):
    """Dense-cache scale-sidecar trailing shape: (Hkv8, S) — kv-head rows
    padded to the 8-sublane f32 tile, token axis on lanes."""
    return (-(-Hkv // 8) * 8, S)


@functools.partial(jax.jit, static_argnames=("sliding_window", "interpret"))
def dense_decode_attention_q8(q, k_new, v_new, ck, cv, sk, sv, lengths, *,
                              sliding_window=None, rope_cos=None,
                              rope_sin=None, interpret: bool = False):
    """:func:`dense_decode_attention` over int8 caches with head-major
    f32 scale sidecars (layout: module docstring / ops/kv_quant.py).

    ck/cv: (B, S, Hkv*hd) int8 (aliased in->out)
    sk/sv: (B, Hkv8, S) f32 (aliased)

    Returns (attn_out (B, H, hd) f32, ck, cv, sk, sv).
    """
    B, H, hd = q.shape
    Hkv = k_new.shape[1]
    KV = Hkv * hd
    S = ck.shape[1]
    assert ck.dtype == jnp.int8 and cv.dtype == jnp.int8
    assert ck.shape == cv.shape == (B, S, KV), (ck.shape, q.shape)
    side = (B,) + q8_sidecar_shape(Hkv, S)
    assert sk.shape == sv.shape == side, (sk.shape, side)
    g = H // Hkv
    assert g * Hkv == H, (H, Hkv)
    # one 128-lane scale group per chunk (or S itself for tiny
    # interpret-mode tests)
    chunk = 128 if S % 128 == 0 else S
    if S % 32 != 0 and S % chunk != 0:
        raise ValueError(
            f"max_seq={S} is not 32-row alignable — no int8-tile-aligned "
            "chunking exists; use the XLA attention chain for this cache "
            "(the model-level fused-branch gate should have caught this)")
    scale = 1.0 / (hd ** 0.5)
    window = S + 1 if sliding_window is None else int(sliding_window)
    slab = 32 if S % 32 == 0 else S
    hkv8 = side[1]

    q3 = q.astype(jnp.float32)
    kn3 = k_new.astype(jnp.float32)
    # v quantizes in-kernel (not cast host-side): rounding must match the
    # XLA mirror's f32 math
    vn3 = v_new.astype(jnp.float32)
    cos3, sin3, rope = _rope_operand_rows(rope_cos, rope_sin, B, 1, hd)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, hd), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, hd), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, hd), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hd), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hd), lambda b, *_: (b, 0, 0),
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
            pl.BlockSpec((1, H, hd), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, chunk, KV), jnp.int8),
            pltpu.VMEM((2, chunk, KV), jnp.int8),
            pltpu.VMEM((2, hkv8, chunk), jnp.float32),
            pltpu.VMEM((2, hkv8, chunk), jnp.float32),
            pltpu.VMEM((slab, KV), jnp.int8),
            pltpu.VMEM((slab, KV), jnp.int8),
            pltpu.VMEM((hkv8, chunk), jnp.float32),
            pltpu.VMEM((hkv8, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )

    ck_out, cv_out, sk_out, sv_out, out = pl.pallas_call(
        functools.partial(_dense_attn_kernel_q8, S=S, chunk=chunk,
                          scale=scale, window=window, rope=rope,
                          hkv=Hkv, hkv8=hkv8, g=g, hd=hd),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(ck.shape, ck.dtype),
            jax.ShapeDtypeStruct(cv.shape, cv.dtype),
            jax.ShapeDtypeStruct(sk.shape, sk.dtype),
            jax.ShapeDtypeStruct(sv.shape, sv.dtype),
            jax.ShapeDtypeStruct((B, H, hd), jnp.float32),
        ],
        input_output_aliases={6: 0, 7: 1, 8: 2, 9: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(lengths, q3, kn3, vn3, cos3, sin3, ck, cv, sk, sv)

    return out, ck_out, cv_out, sk_out, sv_out
