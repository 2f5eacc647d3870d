"""Paged decode attention: Pallas TPU kernel over a shared KV page pool.

Round 1/2 serving used one dense preallocated cache per slot pool —
simple, but memory scales with slots x max_seq regardless of actual
lengths, and prompts cannot share cache. This kernel decouples storage
from slots (the vLLM design, rebuilt TPU-native):

  * KV lives in a global TOKEN-MAJOR page pool (n_pages, ps, Hkv*hd) per
    layer; each slot owns a list of page ids (its page table).
  * The decode kernel runs ONE grid step per slot with every kv head
    folded in (round-4 redesign, mirroring ops/decode_attn.py): a page
    row is contiguous across heads, so one page is ONE DMA — the earlier
    (slot, kv-head) grid paid ~Hkv serial DMA round-trips per page.
    Per-head attention folds into one MXU matmul via a block-diagonal Q
    (zero blocks add exactly 0.0 in the f32 accumulator; the off-head
    FLOPs ride an otherwise idle MXU).
  * The page table and per-slot lengths arrive via scalar prefetch;
    pages are pulled from HBM with explicit double-buffered DMAs
    (`make_async_copy`) — Pallas block specs cannot address scattered
    pages, manual DMA can.
  * The current token's k/v are DMA-written into the slot's last page
    inside the same kernel (pool aliased in->out), so a decode step does
    page-table attention AND the cache update in ONE fused launch: no XLA
    scatter, no separate cache op.
  * Softmax is the online (flash) form accumulated across pages in
    registers; GQA handled by grouping q-head rows per kv head.
  * int8 pools carry HEAD-MAJOR per-page f32 scale sidecars
    (P, HkvP, ps) — kv-head rows padded to the 8-sublane f32 tile (per
    TP shard: serving.PagedKVPool(head_pad)), token-in-page on LANES.
    Scales fold into logits / p POST-matmul as g-row-repeated tiles, so
    int8 codes feed the MXU raw.

The reference has no serving layer at all (SURVEY §2.4); this replaces
nothing there — it extends serving.py beyond fixed dense slots.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from squeezellm_tpu.ops.decode_attn import (_block_diag_q, _extract_diag,
                                            _repeat_rows, _rope_apply,
                                            _rope_operand_rows)
from squeezellm_tpu.ops.kv_quant import _EPS, _QMAX, _RQMAX

NEG_INF = -1e30


def _quant_kv_rows(x):
    """In-kernel twin of ops.kv_quant.quantize_rows on an (r, hd) f32
    block -> (int8 codes, (r, 1) f32 scale). Same expressions, so the
    Pallas path and the XLA mirror agree bit-for-bit."""
    s = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True) * _RQMAX,
                    _EPS)
    q = jnp.clip(jnp.round(x / s), -_QMAX, _QMAX).astype(jnp.int8)
    return q, s


def _patch_row_heads(pair, hit, rows, hkv: int, hd: int):
    """Patch the slab rows selected by `hit` ((slab, 1) bool) with the
    per-head lane blocks of `rows` ((Hkv, hd)) — the token-major twin of
    a single-row write."""
    for j in range(hkv):
        sl = pl.ds(j * hd, hd)
        pair[:, sl] = jnp.where(hit, rows[j:j + 1].astype(pair.dtype),
                                pair[:, sl])


def _paged_attn_kernel(pt_ref, len_ref, q_ref, kn_ref, vn_ref,
                       cos_ref, sin_ref,
                       pk_in, pv_in, pk_ref, pv_ref, out_ref,
                       kbuf, vbuf, pairk, pairv, ksem, vsem, wsem,
                       *, ps: int, maxp: int, scale: float, rope: bool,
                       window: int, hkv: int, g: int, hd: int):
    """One grid step per slot b.

    pt_ref:  (B, maxp) int32 page table (scalar prefetch, SMEM)
    len_ref: (B,) int32 valid tokens per slot INCLUDING the current one
    q_ref:   (1, H, hd) f32 — ALL query heads (pre-rope when `rope` —
             rotated in-kernel by the precomputed cos/sin operand rows,
             see ops/decode_attn._rope_apply — rope'd by the caller
             otherwise)
    cos/sin: (1, 1, hd) f32 rope rows at this slot's position
    kn/vn:   (1, Hkv, hd) f32 — current token's k/v rows
    pk/pv:   (P, ps, Hkv*hd) token-major pool, ANY memory space, aliased
    out_ref: (1, H, hd) f32
    kbuf/vbuf: (2, ps, Hkv*hd) VMEM double buffers
    """
    b = pl.program_id(0)
    H = hkv * g
    n = len_ref[b]
    npages = jax.lax.div(n + ps - 1, ps)
    # sliding window (Mistral): pages wholly below kpos = n - window hold
    # no attended rows — start the page loop there instead of 0
    lo = jnp.maximum(n - window, 0)
    p0 = jax.lax.div(lo, ps)

    # ---- write the current token's k/v into its page slot (n >= 1) ----
    # Pool tiling constrains token-dim DMA slices (8 rows f32 / 16 bf16),
    # so single-row writes are illegal: read an aligned 16-row SLAB, patch
    # one row with a vector select, write the slab back (grid steps are
    # sequential per core and the page loop waits on this — race-free).
    last = n - 1
    lpid = pt_ref[b, jax.lax.div(last, ps)]
    loff = jax.lax.rem(last, ps)
    slab = min(16, ps)  # >= hw tile height at ps >= 16; ps for tiny tests
    off2 = jax.lax.div(loff, slab) * slab
    sub = loff - off2

    kn = kn_ref[0].astype(jnp.float32)  # (Hkv, hd)
    if rope:
        kn = _rope_apply(kn, cos_ref[0], sin_ref[0])

    @pl.when(n > 0)
    def _write():
        rk = pltpu.make_async_copy(
            pk_ref.at[lpid, pl.ds(off2, slab)], pairk, wsem.at[0])
        rv = pltpu.make_async_copy(
            pv_ref.at[lpid, pl.ds(off2, slab)], pairv, wsem.at[1])
        rk.start()
        rv.start()
        rk.wait()
        rv.wait()
        hit = jax.lax.broadcasted_iota(jnp.int32, (slab, 1), 0) == sub
        _patch_row_heads(pairk, hit, kn, hkv, hd)
        _patch_row_heads(pairv, hit, vn_ref[0], hkv, hd)
        wk = pltpu.make_async_copy(
            pairk, pk_ref.at[lpid, pl.ds(off2, slab)], wsem.at[0])
        wv = pltpu.make_async_copy(
            pairv, pv_ref.at[lpid, pl.ds(off2, slab)], wsem.at[1])
        wk.start()
        wv.start()
        wk.wait()
        wv.wait()

    # attention streams WHOLE pages, double-buffered. 32-row sub-chunking
    # and a hybrid (whole pages + 32-row tail) were both built and
    # measured (round 4): at high occupancy sub-chunk DMAs are
    # issue-bound (0.465 vs 0.158 ms/layer at 8 slots x 2048 tokens) and
    # the hybrid's per-step branchy copy selection costs ~7 us/step;
    # whole-page reads overread at most one partial page per slot
    # (~1.2 us) — the simple page loop wins everywhere tested.
    def k_copy(p, slot):
        return pltpu.make_async_copy(
            pk_ref.at[pt_ref[b, p]], kbuf.at[slot], ksem.at[slot])

    def v_copy(p, slot):
        return pltpu.make_async_copy(
            pv_ref.at[pt_ref[b, p]], vbuf.at[slot], vsem.at[slot])

    @pl.when(p0 < npages)
    def _prologue():
        k_copy(p0, jax.lax.rem(p0, 2)).start()
        v_copy(p0, jax.lax.rem(p0, 2)).start()

    q = q_ref[0].astype(jnp.float32)  # (H, hd)
    if rope:
        q = _rope_apply(q, cos_ref[0], sin_ref[0])
    qbd = _block_diag_q(q, hkv, g)  # (H, Hkv*hd)

    def body(p, carry):
        m, l, acc = carry
        slot = jax.lax.rem(p, 2)

        @pl.when(p + 1 < npages)
        def _next():
            k_copy(p + 1, 1 - slot).start()
            v_copy(p + 1, 1 - slot).start()

        k_copy(p, slot).wait()
        v_copy(p, slot).wait()
        k = kbuf[slot].astype(jnp.float32)  # (ps, Hkv*hd)
        v = vbuf[slot].astype(jnp.float32)

        logits = jax.lax.dot_general(
            qbd, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (H, ps)
        pos = p * ps + jax.lax.broadcasted_iota(jnp.int32, (1, ps), 1)
        logits = jnp.where((pos < n) & (pos >= lo), logits, NEG_INF)

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
    m, l, acc = jax.lax.fori_loop(p0, npages, body, init)
    out_ref[0] = _extract_diag(acc, hkv, g, hd) / jnp.maximum(l, 1e-30)


def _paged_attn_kernel_q8(pt_ref, len_ref, q_ref, kn_ref, vn_ref,
                          cos_ref, sin_ref,
                          pk_in, pv_in, sk_in, sv_in,
                          pk_ref, pv_ref, sk_ref, sv_ref, out_ref,
                          kbuf, vbuf, skbuf, svbuf,
                          pairk, pairv, pairsk, pairsv,
                          ksem, vsem, sksem, svsem, wsem,
                          *, ps: int, maxp: int, scale: float, rope: bool,
                          window: int, hkv: int, hkvp: int, g: int, hd: int):
    """int8-KV twin of :func:`_paged_attn_kernel`. Pools hold token-major
    int8 codes (P, ps, Hkv*hd) plus a HEAD-MAJOR per-page f32 scale
    sidecar (P, HkvP, ps) — kv-head rows (padded to the 8-sublane f32
    tile), token-in-page on lanes:

      * write: the current token's rope'd k and its v are quantized
        IN-KERNEL (`_quant_kv_rows`, the exact math of
        ops.kv_quant.quantize_rows); codes RMW-patch a 32-row slab (int8
        Mosaic tile height), scales patch lane `loff` across head rows;
      * read: scales apply POST-matmul as g-row-repeated (H, ps) tiles —
        logits by the k scales, p by the v scales — so the int8 codes
        feed the MXU directly and no lane<->sublane relayout exists
        anywhere. HBM streams ~0.53x the bytes of the bf16 pool.
    """
    b = pl.program_id(0)
    H = hkv * g
    n = len_ref[b]
    npages = jax.lax.div(n + ps - 1, ps)
    lo = jnp.maximum(n - window, 0)
    p0 = jax.lax.div(lo, ps)

    last = n - 1
    lpid = pt_ref[b, jax.lax.div(last, ps)]
    loff = jax.lax.rem(last, ps)
    # int8 token-dim DMA slices must align to 32 rows; ps < 32 only in
    # tiny interpret-mode tests (hardware pools assert ps % 32 == 0)
    slab = 32 if ps % 32 == 0 else ps
    off2 = jax.lax.div(loff, slab) * slab
    sub = loff - off2

    kn = kn_ref[0].astype(jnp.float32)  # (Hkv, hd)
    if rope:
        kn = _rope_apply(kn, cos_ref[0], sin_ref[0])
    knq, kns = _quant_kv_rows(kn)       # (Hkv, hd) int8, (Hkv, 1) f32
    vnq, vns = _quant_kv_rows(vn_ref[0].astype(jnp.float32))
    if hkvp != hkv:
        pad = jnp.zeros((hkvp - hkv, 1), jnp.float32)
        kns = jnp.concatenate([kns, pad], axis=0)
        vns = jnp.concatenate([vns, pad], axis=0)

    @pl.when(n > 0)
    def _write():
        rk = pltpu.make_async_copy(
            pk_ref.at[lpid, pl.ds(off2, slab)], pairk, wsem.at[0])
        rv = pltpu.make_async_copy(
            pv_ref.at[lpid, pl.ds(off2, slab)], pairv, wsem.at[1])
        rsk = pltpu.make_async_copy(sk_ref.at[lpid], pairsk, wsem.at[2])
        rsv = pltpu.make_async_copy(sv_ref.at[lpid], pairsv, wsem.at[3])
        for c in (rk, rv, rsk, rsv):
            c.start()
        for c in (rk, rv, rsk, rsv):
            c.wait()
        hit = jax.lax.broadcasted_iota(jnp.int32, (slab, 1), 0) == sub
        _patch_row_heads(pairk, hit, knq, hkv, hd)
        _patch_row_heads(pairv, hit, vnq, hkv, hd)
        spot = jax.lax.broadcasted_iota(jnp.int32, (1, ps), 1) == loff
        pairsk[:] = jnp.where(spot, kns, pairsk[:])
        pairsv[:] = jnp.where(spot, vns, pairsv[:])
        wk = pltpu.make_async_copy(
            pairk, pk_ref.at[lpid, pl.ds(off2, slab)], wsem.at[0])
        wv = pltpu.make_async_copy(
            pairv, pv_ref.at[lpid, pl.ds(off2, slab)], wsem.at[1])
        wsk = pltpu.make_async_copy(pairsk, sk_ref.at[lpid], wsem.at[2])
        wsv = pltpu.make_async_copy(pairsv, sv_ref.at[lpid], wsem.at[3])
        for c in (wk, wv, wsk, wsv):
            c.start()
        for c in (wk, wv, wsk, wsv):
            c.wait()

    def copies(p, slot):
        pid = pt_ref[b, p]
        return (
            pltpu.make_async_copy(pk_ref.at[pid], kbuf.at[slot],
                                  ksem.at[slot]),
            pltpu.make_async_copy(pv_ref.at[pid], vbuf.at[slot],
                                  vsem.at[slot]),
            pltpu.make_async_copy(sk_ref.at[pid], skbuf.at[slot],
                                  sksem.at[slot]),
            pltpu.make_async_copy(sv_ref.at[pid], svbuf.at[slot],
                                  svsem.at[slot]),
        )

    @pl.when(p0 < npages)
    def _prologue():
        for c in copies(p0, jax.lax.rem(p0, 2)):
            c.start()

    q = q_ref[0].astype(jnp.float32)  # (H, hd)
    if rope:
        q = _rope_apply(q, cos_ref[0], sin_ref[0])
    qbd = _block_diag_q(q, hkv, g)

    def body(p, carry):
        m, l, acc = carry
        slot = jax.lax.rem(p, 2)

        @pl.when(p + 1 < npages)
        def _next():
            for c in copies(p + 1, 1 - slot):
                c.start()

        for c in copies(p, slot):
            c.wait()
        k = kbuf[slot].astype(jnp.float32)  # (ps, Hkv*hd) codes as f32
        v = vbuf[slot].astype(jnp.float32)
        ks_rep = _repeat_rows(skbuf[slot][:hkv, :], g)  # (H, ps)
        vs_rep = _repeat_rows(svbuf[slot][:hkv, :], g)

        logits = jax.lax.dot_general(
            qbd, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (ks_rep * scale)  # (H, ps): dequant folded in post-matmul
        pos = p * ps + jax.lax.broadcasted_iota(jnp.int32, (1, ps), 1)
        logits = jnp.where((pos < n) & (pos >= lo), logits, NEG_INF)

        m2 = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m2)
        pexp = jnp.exp(logits - m2)
        l2 = l * alpha + jnp.sum(pexp, axis=-1, keepdims=True)
        acc2 = acc * alpha + jnp.dot(pexp * vs_rep, v,  # v dequant folded
                                     preferred_element_type=jnp.float32)
        return m2, l2, acc2

    init = (jnp.full((H, 1), NEG_INF, jnp.float32),
            jnp.zeros((H, 1), jnp.float32),
            jnp.zeros((H, hkv * hd), jnp.float32))
    m, l, acc = jax.lax.fori_loop(p0, npages, body, init)
    out_ref[0] = _extract_diag(acc, hkv, g, hd) / jnp.maximum(l, 1e-30)


@functools.partial(
    jax.jit, static_argnames=("page_size", "sliding_window", "interpret"),
)
def paged_decode_attention_q8(q, k_new, v_new, pool_k, pool_v,
                              scale_k, scale_v, page_tables, lengths, *,
                              page_size: int, rope_cos=None, rope_sin=None,
                              sliding_window=None, interpret: bool = False):
    """:func:`paged_decode_attention` over int8 pools with head-major
    per-page f32 scale sidecars (module docstring / ops/kv_quant.py).

    pool_k/v:   (P, ps, Hkv*hd) int8 (aliased in->out)
    scale_k/v:  (P, HkvP, ps) f32, rows [0, Hkv) live (aliased in->out)

    Returns (attn_out, pool_k, pool_v, scale_k, scale_v).
    """
    B, H, hd = q.shape
    Hkv = k_new.shape[1]
    ps = page_size
    assert pool_k.dtype == jnp.int8 and pool_v.dtype == jnp.int8
    assert pool_k.shape[1:] == (ps, Hkv * hd), (pool_k.shape, ps)
    hkvp = scale_k.shape[1]
    assert scale_k.shape == (pool_k.shape[0], hkvp, ps), scale_k.shape
    maxp = page_tables.shape[1]
    g = H // Hkv
    scale = 1.0 / (hd ** 0.5)

    q3 = q.astype(jnp.float32)
    kn3 = k_new.astype(jnp.float32)
    # v is quantized in-kernel (not cast host-side): rounding must match
    # the XLA mirror's f32 math
    vn3 = v_new.astype(jnp.float32)
    cos3, sin3, rope = _rope_operand_rows(rope_cos, rope_sin, B, 1, hd)

    slab = 32 if ps % 32 == 0 else ps
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
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
            pltpu.VMEM((2, ps, Hkv * hd), jnp.int8),
            pltpu.VMEM((2, ps, Hkv * hd), jnp.int8),
            pltpu.VMEM((2, hkvp, ps), jnp.float32),
            pltpu.VMEM((2, hkvp, ps), jnp.float32),
            pltpu.VMEM((slab, Hkv * hd), jnp.int8),
            pltpu.VMEM((slab, Hkv * hd), jnp.int8),
            pltpu.VMEM((hkvp, ps), jnp.float32),
            pltpu.VMEM((hkvp, ps), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )

    pk_out, pv_out, sk_out, sv_out, out = pl.pallas_call(
        functools.partial(_paged_attn_kernel_q8, ps=ps, maxp=maxp,
                          scale=scale, rope=rope,
                          window=(maxp * ps + 1 if sliding_window is None
                                  else int(sliding_window)),
                          hkv=Hkv, hkvp=hkvp, g=g, hd=hd),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(pool_k.shape, pool_k.dtype),
            jax.ShapeDtypeStruct(pool_v.shape, pool_v.dtype),
            jax.ShapeDtypeStruct(scale_k.shape, scale_k.dtype),
            jax.ShapeDtypeStruct(scale_v.shape, scale_v.dtype),
            jax.ShapeDtypeStruct((B, H, hd), jnp.float32),
        ],
        input_output_aliases={7: 0, 8: 1, 9: 2, 10: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(page_tables, lengths, q3, kn3, vn3, cos3, sin3,
      pool_k, pool_v, scale_k, scale_v)

    return out, pk_out, pv_out, sk_out, sv_out


@functools.partial(
    jax.jit, static_argnames=("page_size", "sliding_window", "interpret"),
)
def paged_decode_attention(q, k_new, v_new, pool_k, pool_v, page_tables,
                           lengths, *, page_size: int, rope_cos=None,
                           rope_sin=None,
                           sliding_window=None, interpret: bool = False):
    """Fused cache-write + paged attention for one decode step.

    Args:
      q:        (B, H, hd) f32/bf16 queries — PRE-rope when rope_cos/
                rope_sin ((B, hd) rows at position lengths-1) are given
                (rotated in-kernel by them), rope'd otherwise
      k_new:    (B, Hkv, hd) current token's keys (same rope contract)
      v_new:    (B, Hkv, hd) values
      pool_k/v: (P, ps, Hkv*hd) TOKEN-MAJOR page pools (DONATED/aliased:
                updated pools are returned)
      page_tables: (B, maxp) int32; lengths: (B,) int32 — tokens per slot
                INCLUDING the current one (0 = inactive slot).

    Returns (attn_out (B, H, hd) f32, pool_k, pool_v).
    """
    B, H, hd = q.shape
    Hkv = k_new.shape[1]
    ps = page_size
    assert pool_k.shape[1:] == (ps, Hkv * hd), (pool_k.shape, ps)
    maxp = page_tables.shape[1]
    g = H // Hkv
    scale = 1.0 / (hd ** 0.5)

    q3 = q.astype(jnp.float32)
    # k stays f32 into the kernel (rope rotates it there before the cast
    # to pool dtype at the cache write); v is cast host-side as before
    kn3 = k_new.astype(jnp.float32)
    vn3 = v_new.astype(pool_v.dtype)
    cos3, sin3, rope = _rope_operand_rows(rope_cos, rope_sin, B, 1, hd)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
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
            pltpu.VMEM((2, ps, Hkv * hd), pool_k.dtype),
            pltpu.VMEM((2, ps, Hkv * hd), pool_v.dtype),
            pltpu.VMEM((min(16, ps), Hkv * hd), pool_k.dtype),
            pltpu.VMEM((min(16, ps), Hkv * hd), pool_v.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    pool_k_out, pool_v_out, out = pl.pallas_call(
        functools.partial(_paged_attn_kernel, ps=ps, maxp=maxp, scale=scale,
                          rope=rope,
                          window=(maxp * ps + 1 if sliding_window is None
                                  else int(sliding_window)),
                          hkv=Hkv, g=g, hd=hd),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(pool_k.shape, pool_k.dtype),
            jax.ShapeDtypeStruct(pool_v.shape, pool_v.dtype),
            jax.ShapeDtypeStruct((B, H, hd), jnp.float32),
        ],
        input_output_aliases={7: 0, 8: 1},  # pools in -> out (in-place)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(page_tables, lengths, q3, kn3, vn3, cos3, sin3, pool_k, pool_v)

    return out, pool_k_out, pool_v_out


# ---------------------------------------------------------------------------
# W-token speculative verify windows
# ---------------------------------------------------------------------------
#
# Query rows are (head, window-offset) pairs: R = H*W rows, row r = query
# head r // W at offset r % W; kv-head j owns the g*W-row block
# [j*g*W, (j+1)*g*W). The logits matmul and the p@v contraction run
# PER KV HEAD over the token-major page slab (lane block j*hd..): a
# block-diagonal Q at R rows would need an (R, Hkv*hd) accumulator
# (~8 MB at 7B/W=16) — the per-head loop keeps acc at (R, hd) and runs
# once per WINDOW, so its ~Hkv small dots amortize over W tokens.


def _verify_qbuild(q_ref, cos_ref, sin_ref, rope: bool, W: int):
    q = q_ref[0].astype(jnp.float32)  # (R, hd) = (H*W, hd)
    R = q.shape[0]
    if rope:
        # row r is head r//W at window offset r%W -> tile the (W, hd)
        # cos/sin rows H times (static, small)
        reps = R // W
        qcos = (jnp.concatenate([cos_ref[0]] * reps) if reps > 1
                else cos_ref[0])
        qsin = (jnp.concatenate([sin_ref[0]] * reps) if reps > 1
                else sin_ref[0])
        q = _rope_apply(q, qcos, qsin)
    return q


def _verify_logits(q, kslab, hkv: int, g: int, hd: int, W: int):
    """Per-kv-head logits over a token-major (ps, Hkv*hd) k slab ->
    (R, ps), rows grouped g*W per kv head."""
    parts = []
    for j in range(hkv):
        qj = q[j * g * W:(j + 1) * g * W]           # (gW, hd)
        kj = kslab[:, j * hd:(j + 1) * hd]          # (ps, hd)
        parts.append(jax.lax.dot_general(
            qj, kj, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))
    return parts[0] if hkv == 1 else jnp.concatenate(parts, axis=0)


def _verify_pv(pexp, vslab, hkv: int, g: int, hd: int, W: int):
    """Per-kv-head p @ v over a token-major (ps, Hkv*hd) v slab ->
    (R, hd)."""
    parts = []
    for j in range(hkv):
        pj = pexp[j * g * W:(j + 1) * g * W]        # (gW, ps)
        vj = vslab[:, j * hd:(j + 1) * hd]          # (ps, hd)
        parts.append(jnp.dot(pj, vj, preferred_element_type=jnp.float32))
    return parts[0] if hkv == 1 else jnp.concatenate(parts, axis=0)


def _paged_verify_kernel(pt_ref, start_ref, q_ref, kn_ref, vn_ref,
                         cos_ref, sin_ref,
                         pk_in, pv_in, pk_ref, pv_ref, out_ref,
                         kbuf, vbuf, pairk, pairv, ksem, vsem, wsem,
                         *, ps: int, W: int, scale: float, rope: bool,
                         window: int, hkv: int, g: int, hd: int):
    """One grid step per slot of the W-token verify window (speculative
    decoding): write W k/v rows at positions start..start+W-1 through the
    page table, then causal attention for the W query rows of each q head
    over (prefix + window).

    q_ref:  (1, H*W, hd) — row r is query head r // W, window offset
            r % W (pre-rope when cos/sin rope operands are given)
    kn/vn:  (1, Hkv*W, hd) — window k/v rows, row j*W + w = kv head j at
            offset w
    start_ref: (B,) int32 — 0-based position of the FIRST window token;
            < 0 marks an inactive slot (no write, zero output).
    """
    b = pl.program_id(0)
    start = start_ref[b]
    n_end = jnp.where(start < 0, 0, start + W)
    npages = jax.lax.div(n_end + ps - 1, ps)
    # sliding window: the EARLIEST attended position over the whole
    # window belongs to row w=0 → start the page loop there
    lo0 = jnp.maximum(start + 1 - window, 0)
    p0 = jax.lax.div(lo0, ps)
    slab = min(16, ps)

    kn = kn_ref[0].astype(jnp.float32)  # (Hkv*W, hd)
    if rope:
        reps = kn.shape[0] // W
        kcos = jnp.concatenate([cos_ref[0]] * reps) if reps > 1 else cos_ref[0]
        ksin = jnp.concatenate([sin_ref[0]] * reps) if reps > 1 else sin_ref[0]
        kn = _rope_apply(kn, kcos, ksin)

    # ---- write the window's k/v rows (start >= 0) ----------------------
    # W is small (draft_len+1); each row is an aligned-slab RMW through
    # the page table (rows may span a page boundary — each picks its own
    # page). Grid steps are sequential per core; the page loop below
    # waits on these, so reads see the writes.
    @pl.when(start >= 0)
    def _write():
        for w in range(W):
            posw = start + w
            pid = pt_ref[b, jax.lax.div(posw, ps)]
            off = jax.lax.rem(posw, ps)
            off2 = jax.lax.div(off, slab) * slab
            sub = off - off2
            rk = pltpu.make_async_copy(
                pk_ref.at[pid, pl.ds(off2, slab)], pairk, wsem.at[0])
            rv = pltpu.make_async_copy(
                pv_ref.at[pid, pl.ds(off2, slab)], pairv, wsem.at[1])
            rk.start()
            rv.start()
            rk.wait()
            rv.wait()
            hit = jax.lax.broadcasted_iota(jnp.int32, (slab, 1), 0) == sub
            for j in range(hkv):  # row w of each head's window block
                sl = pl.ds(j * hd, hd)
                pairk[:, sl] = jnp.where(
                    hit, kn[j * W + w:j * W + w + 1].astype(pairk.dtype),
                    pairk[:, sl])
                pairv[:, sl] = jnp.where(
                    hit,
                    vn_ref[0, j * W + w:j * W + w + 1].astype(pairv.dtype),
                    pairv[:, sl])
            wk = pltpu.make_async_copy(
                pairk, pk_ref.at[pid, pl.ds(off2, slab)], wsem.at[0])
            wv = pltpu.make_async_copy(
                pairv, pv_ref.at[pid, pl.ds(off2, slab)], wsem.at[1])
            wk.start()
            wv.start()
            wk.wait()
            wv.wait()

    def k_copy(p, slot):
        return pltpu.make_async_copy(
            pk_ref.at[pt_ref[b, p]], kbuf.at[slot], ksem.at[slot])

    def v_copy(p, slot):
        return pltpu.make_async_copy(
            pv_ref.at[pt_ref[b, p]], vbuf.at[slot], vsem.at[slot])

    @pl.when(p0 < npages)
    def _prologue():
        k_copy(p0, jax.lax.rem(p0, 2)).start()
        v_copy(p0, jax.lax.rem(p0, 2)).start()

    q = _verify_qbuild(q_ref, cos_ref, sin_ref, rope, W)
    R = q.shape[0]
    rw = jax.lax.rem(jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0), W)
    qpos = start + rw  # (R, 1) — each query row's own position

    def body(p, carry):
        m, l, acc = carry
        slot = jax.lax.rem(p, 2)

        @pl.when(p + 1 < npages)
        def _next():
            k_copy(p + 1, 1 - slot).start()
            v_copy(p + 1, 1 - slot).start()

        k_copy(p, slot).wait()
        v_copy(p, slot).wait()
        k = kbuf[slot].astype(jnp.float32)  # (ps, Hkv*hd)
        v = vbuf[slot].astype(jnp.float32)

        logits = _verify_logits(q, k, hkv, g, hd, W) * scale  # (R, ps)
        kpos = p * ps + jax.lax.broadcasted_iota(jnp.int32, (1, ps), 1)
        logits = jnp.where((kpos <= qpos) & (kpos > qpos - window),
                           logits, NEG_INF)

        m2 = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m2)
        pexp = jnp.exp(logits - m2)
        l2 = l * alpha + jnp.sum(pexp, axis=-1, keepdims=True)
        acc2 = acc * alpha + _verify_pv(pexp, v, hkv, g, hd, W)
        return m2, l2, acc2

    init = (jnp.full((R, 1), NEG_INF, jnp.float32),
            jnp.zeros((R, 1), jnp.float32),
            jnp.zeros((R, hd), jnp.float32))
    m, l, acc = jax.lax.fori_loop(p0, npages, body, init)
    out_ref[0] = acc / jnp.maximum(l, 1e-30)


def _paged_verify_kernel_q8(pt_ref, start_ref, q_ref, kn_ref, vn_ref,
                            cos_ref, sin_ref,
                            pk_in, pv_in, sk_in, sv_in,
                            pk_ref, pv_ref, sk_ref, sv_ref, out_ref,
                            kbuf, vbuf, skbuf, svbuf,
                            pairk, pairv, pairsk, pairsv,
                            ksem, vsem, sksem, svsem, wsem,
                            *, ps: int, W: int, scale: float, rope: bool,
                            window: int, hkv: int, hkvp: int, g: int,
                            hd: int):
    """int8-KV twin of :func:`_paged_verify_kernel`: each window row is
    quantized in-kernel (`_quant_kv_rows`) and RMW-patched into the int8
    pool + the page's head-major (HkvP, ps) scale block; reads apply the
    scales post-matmul, expanded to the (R, ps) row grouping."""
    b = pl.program_id(0)
    start = start_ref[b]
    n_end = jnp.where(start < 0, 0, start + W)
    npages = jax.lax.div(n_end + ps - 1, ps)
    lo0 = jnp.maximum(start + 1 - window, 0)
    p0 = jax.lax.div(lo0, ps)
    slab = 32 if ps % 32 == 0 else ps

    kn = kn_ref[0].astype(jnp.float32)  # (Hkv*W, hd)
    if rope:
        reps = kn.shape[0] // W
        kcos = jnp.concatenate([cos_ref[0]] * reps) if reps > 1 else cos_ref[0]
        ksin = jnp.concatenate([sin_ref[0]] * reps) if reps > 1 else sin_ref[0]
        kn = _rope_apply(kn, kcos, ksin)
    knq, kns = _quant_kv_rows(kn)                    # (Hkv*W, .)
    vnq, vns = _quant_kv_rows(vn_ref[0].astype(jnp.float32))

    @pl.when(start >= 0)
    def _write():
        for w in range(W):
            posw = start + w
            pid = pt_ref[b, jax.lax.div(posw, ps)]
            off = jax.lax.rem(posw, ps)
            off2 = jax.lax.div(off, slab) * slab
            sub = off - off2
            rk = pltpu.make_async_copy(
                pk_ref.at[pid, pl.ds(off2, slab)], pairk, wsem.at[0])
            rv = pltpu.make_async_copy(
                pv_ref.at[pid, pl.ds(off2, slab)], pairv, wsem.at[1])
            rsk = pltpu.make_async_copy(sk_ref.at[pid], pairsk, wsem.at[2])
            rsv = pltpu.make_async_copy(sv_ref.at[pid], pairsv, wsem.at[3])
            for c in (rk, rv, rsk, rsv):
                c.start()
            for c in (rk, rv, rsk, rsv):
                c.wait()
            hit = jax.lax.broadcasted_iota(jnp.int32, (slab, 1), 0) == sub
            for j in range(hkv):
                sl = pl.ds(j * hd, hd)
                pairk[:, sl] = jnp.where(hit, knq[j * W + w:j * W + w + 1],
                                         pairk[:, sl])
                pairv[:, sl] = jnp.where(hit, vnq[j * W + w:j * W + w + 1],
                                         pairv[:, sl])
            # scale column `off`: row j gets window row (j, w)'s scale
            srow = jax.lax.broadcasted_iota(jnp.int32, (hkvp, 1), 0)
            spot = jax.lax.broadcasted_iota(jnp.int32, (1, ps), 1) == off
            ksel = jnp.zeros((hkvp, 1), jnp.float32)
            vsel = jnp.zeros((hkvp, 1), jnp.float32)
            for j in range(hkv):
                ksel = jnp.where(srow == j, kns[j * W + w], ksel)
                vsel = jnp.where(srow == j, vns[j * W + w], vsel)
            pairsk[:] = jnp.where(spot, ksel, pairsk[:])
            pairsv[:] = jnp.where(spot, vsel, pairsv[:])
            wk = pltpu.make_async_copy(
                pairk, pk_ref.at[pid, pl.ds(off2, slab)], wsem.at[0])
            wv = pltpu.make_async_copy(
                pairv, pv_ref.at[pid, pl.ds(off2, slab)], wsem.at[1])
            wsk = pltpu.make_async_copy(pairsk, sk_ref.at[pid], wsem.at[2])
            wsv = pltpu.make_async_copy(pairsv, sv_ref.at[pid], wsem.at[3])
            for c in (wk, wv, wsk, wsv):
                c.start()
            for c in (wk, wv, wsk, wsv):
                c.wait()

    def copies(p, slot):
        pid = pt_ref[b, p]
        return (
            pltpu.make_async_copy(pk_ref.at[pid], kbuf.at[slot],
                                  ksem.at[slot]),
            pltpu.make_async_copy(pv_ref.at[pid], vbuf.at[slot],
                                  vsem.at[slot]),
            pltpu.make_async_copy(sk_ref.at[pid], skbuf.at[slot],
                                  sksem.at[slot]),
            pltpu.make_async_copy(sv_ref.at[pid], svbuf.at[slot],
                                  svsem.at[slot]),
        )

    @pl.when(p0 < npages)
    def _prologue():
        for c in copies(p0, jax.lax.rem(p0, 2)):
            c.start()

    q = _verify_qbuild(q_ref, cos_ref, sin_ref, rope, W)
    R = q.shape[0]
    rw = jax.lax.rem(jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0), W)
    qpos = start + rw

    def srep(row):
        """(1|Hkv rows, ps) page scales -> (R, ps): kv head j's row
        repeated g*W times."""
        return _repeat_rows(row, g * W)

    def body(p, carry):
        m, l, acc = carry
        slot = jax.lax.rem(p, 2)

        @pl.when(p + 1 < npages)
        def _next():
            for c in copies(p + 1, 1 - slot):
                c.start()

        for c in copies(p, slot):
            c.wait()
        k = kbuf[slot].astype(jnp.float32)
        v = vbuf[slot].astype(jnp.float32)
        ks_rep = srep(skbuf[slot][:hkv, :])  # (R, ps)
        vs_rep = srep(svbuf[slot][:hkv, :])

        logits = _verify_logits(q, k, hkv, g, hd, W) * (ks_rep * scale)
        kpos = p * ps + jax.lax.broadcasted_iota(jnp.int32, (1, ps), 1)
        logits = jnp.where((kpos <= qpos) & (kpos > qpos - window),
                           logits, NEG_INF)

        m2 = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m2)
        pexp = jnp.exp(logits - m2)
        l2 = l * alpha + jnp.sum(pexp, axis=-1, keepdims=True)
        acc2 = acc * alpha + _verify_pv(pexp * vs_rep, v, hkv, g, hd, W)
        return m2, l2, acc2

    init = (jnp.full((R, 1), NEG_INF, jnp.float32),
            jnp.zeros((R, 1), jnp.float32),
            jnp.zeros((R, hd), jnp.float32))
    m, l, acc = jax.lax.fori_loop(p0, npages, body, init)
    out_ref[0] = acc / jnp.maximum(l, 1e-30)


@functools.partial(
    jax.jit, static_argnames=("page_size", "sliding_window", "interpret"),
)
def paged_verify_attention(q, k_new, v_new, pool_k, pool_v, page_tables,
                           start, *, page_size: int, rope_cos=None,
                           rope_sin=None,
                           sliding_window=None, interpret: bool = False):
    """Fused W-token cache-write + causal paged attention (speculative
    verify window — the s>1 generalization of paged_decode_attention).

    Args:
      q:        (B, H, W, hd) queries — PRE-rope when rope_cos/rope_sin
                ((B, W, hd) rows at positions start..start+W-1) are given
      k_new:    (B, Hkv, W, hd) window keys (same rope contract)
      v_new:    (B, Hkv, W, hd) values
      pool_k/v: (P, ps, Hkv*hd) token-major page pools (aliased in->out)
      page_tables: (B, maxp) int32
      start:    (B,) int32 — position of the first window token; < 0 =
                inactive slot (no write, zero output). The slot's pages
                must cover start+W rows (reserve draft_len+1 at admission).

    Returns (attn_out (B, H, W, hd) f32, pool_k, pool_v).
    """
    B, H, W, hd = q.shape
    Hkv = k_new.shape[1]
    ps = page_size
    assert pool_k.shape[1:] == (ps, Hkv * hd), (pool_k.shape, ps)
    maxp = page_tables.shape[1]
    g = H // Hkv
    scale = 1.0 / (hd ** 0.5)

    # row order (head, window-offset): head r // W, offset r % W
    q3 = q.reshape(B, H * W, hd).astype(jnp.float32)
    kn3 = k_new.reshape(B, Hkv * W, hd).astype(jnp.float32)
    vn3 = v_new.reshape(B, Hkv * W, hd).astype(pool_v.dtype)
    cos3, sin3, rope = _rope_operand_rows(rope_cos, rope_sin, B, W, hd)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H * W, hd), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv * W, hd), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv * W, hd), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, hd), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, hd), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, H * W, hd), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, ps, Hkv * hd), pool_k.dtype),
            pltpu.VMEM((2, ps, Hkv * hd), pool_v.dtype),
            pltpu.VMEM((min(16, ps), Hkv * hd), pool_k.dtype),
            pltpu.VMEM((min(16, ps), Hkv * hd), pool_v.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    pool_k_out, pool_v_out, out = pl.pallas_call(
        functools.partial(_paged_verify_kernel, ps=ps, W=W, scale=scale,
                          rope=rope,
                          window=(maxp * ps + W + 1 if sliding_window is None
                                  else int(sliding_window)),
                          hkv=Hkv, g=g, hd=hd),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(pool_k.shape, pool_k.dtype),
            jax.ShapeDtypeStruct(pool_v.shape, pool_v.dtype),
            jax.ShapeDtypeStruct((B, H * W, hd), jnp.float32),
        ],
        input_output_aliases={7: 0, 8: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(page_tables, start, q3, kn3, vn3, cos3, sin3, pool_k, pool_v)

    return out.reshape(B, H, W, hd), pool_k_out, pool_v_out


@functools.partial(
    jax.jit, static_argnames=("page_size", "sliding_window", "interpret"),
)
def paged_verify_attention_q8(q, k_new, v_new, pool_k, pool_v,
                              scale_k, scale_v, page_tables, start, *,
                              page_size: int, rope_cos=None, rope_sin=None,
                              sliding_window=None, interpret: bool = False):
    """:func:`paged_verify_attention` over int8 pools + head-major
    per-page (HkvP, ps) f32 scale sidecars (see ops/kv_quant.py). Returns
    (attn_out (B, H, W, hd), pool_k, pool_v, scale_k, scale_v)."""
    B, H, W, hd = q.shape
    Hkv = k_new.shape[1]
    ps = page_size
    assert pool_k.dtype == jnp.int8 and pool_v.dtype == jnp.int8
    assert pool_k.shape[1:] == (ps, Hkv * hd), (pool_k.shape, ps)
    hkvp = scale_k.shape[1]
    assert scale_k.shape == (pool_k.shape[0], hkvp, ps), scale_k.shape
    maxp = page_tables.shape[1]
    g = H // Hkv
    scale = 1.0 / (hd ** 0.5)

    q3 = q.reshape(B, H * W, hd).astype(jnp.float32)
    kn3 = k_new.reshape(B, Hkv * W, hd).astype(jnp.float32)
    vn3 = v_new.reshape(B, Hkv * W, hd).astype(jnp.float32)
    cos3, sin3, rope = _rope_operand_rows(rope_cos, rope_sin, B, W, hd)

    slab = 32 if ps % 32 == 0 else ps
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H * W, hd), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv * W, hd), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv * W, hd), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, hd), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, hd), lambda b, *_: (b, 0, 0),
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
            pl.BlockSpec((1, H * W, hd), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, ps, Hkv * hd), jnp.int8),
            pltpu.VMEM((2, ps, Hkv * hd), jnp.int8),
            pltpu.VMEM((2, hkvp, ps), jnp.float32),
            pltpu.VMEM((2, hkvp, ps), jnp.float32),
            pltpu.VMEM((slab, Hkv * hd), jnp.int8),
            pltpu.VMEM((slab, Hkv * hd), jnp.int8),
            pltpu.VMEM((hkvp, ps), jnp.float32),
            pltpu.VMEM((hkvp, ps), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )

    pk_out, pv_out, sk_out, sv_out, out = pl.pallas_call(
        functools.partial(_paged_verify_kernel_q8, ps=ps, W=W, scale=scale,
                          rope=rope,
                          window=(maxp * ps + W + 1 if sliding_window is None
                                  else int(sliding_window)),
                          hkv=Hkv, hkvp=hkvp, g=g, hd=hd),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(pool_k.shape, pool_k.dtype),
            jax.ShapeDtypeStruct(pool_v.shape, pool_v.dtype),
            jax.ShapeDtypeStruct(scale_k.shape, scale_k.dtype),
            jax.ShapeDtypeStruct(scale_v.shape, scale_v.dtype),
            jax.ShapeDtypeStruct((B, H * W, hd), jnp.float32),
        ],
        input_output_aliases={7: 0, 8: 1, 9: 2, 10: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(page_tables, start, q3, kn3, vn3, cos3, sin3,
      pool_k, pool_v, scale_k, scale_v)

    return out.reshape(B, H, W, hd), pk_out, pv_out, sk_out, sv_out
