"""Fused Pallas (Mosaic) TPU kernels for LUT-dequant matmul.

TPU-native replacement for the reference CUDA kernel family
(quant_cuda_kernel.cu:741-1038, VecQuant{3,4}MatMulKernelNUQPerChannel
[+Batched]): packed int32 words and the per-output-channel lookup tables are
staged in VMEM; codes are unpacked with uniform shift/mask (VPU) and
dequantized via a binary select-tree against the LUT, then contracted on the
MXU. Accumulation across input blocks is grid-sequential into the output
block — deterministic, no atomics (the reference relies on atomicAdd).

Design notes:
* The activation is pre-reshaped to ``(B, codes_per_word, n_words)`` so the
  kernel never needs a lane-interleave: code ``j`` of every word forms the
  a contiguous 2D row-slab per code plane, and the per-plane dot
  accumulates the same sum as the natural order (reduction order is
  associative in f32-accum).
* 3-bit uses the lane-friendly 10-codes-per-word layout (formats.pack_codes),
  not the reference's cross-word bit-spill, so the unpack is one shift+mask
  per code plane.
* Dequant exploits a measured v5e Mosaic property: ``tpu.dynamic_gather``
  over an 8-sublane f32 table WRAPS the index mod 8 (uses only the low
  3 bits of the lane's index value, incl. for negative values). The kernel
  therefore gathers with the *shifted packed word itself* as the index —
  no mask, no cast: 3-bit dequant is shift+gather = ~2 VPU ops/weight;
  4-bit adds a second table plus a top-bit select = ~6 ops/weight.
* mode='bf16' pre-rounds the LUT and activations to bf16-representable f32
  and runs the MXU at default precision (operand truncation is then exact):
  one MXU pass, no per-weight cast op. mode='gather' keeps full-f32 tables
  with HIGHEST precision (exact f32 numerics, ~3 MXU passes).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from squeezellm_tpu import formats


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


def _select_tree(bit_planes, leaves):
    """Binary select-tree: combine ``2**n`` leaf rows by ``n`` code bits.

    Args:
      bit_planes: list of n boolean arrays (W, O), LSB first.
      leaves: list of 2**n arrays broadcastable to (W, O) — lut entries.

    Returns:
      (W, O) array: ``leaves[code]`` elementwise.
    """
    level = list(leaves)
    for b in bit_planes:
        level = [jnp.where(b, level[2 * m + 1], level[2 * m]) for m in range(len(level) // 2)]
    assert len(level) == 1
    return level[0]


def _dequant_plane_select(codes, lut_ref, bits):
    """Select-tree dequant: (W, O) codes -> (W, O) f32. ~2**bits ops/elem.
    Portable (works in interpret mode and on all TPU gens)."""
    leaves = [lut_ref[:, k][None, :] for k in range(2**bits)]
    bit_planes = [
        ((codes >> jnp.uint32(b)) & jnp.uint32(1)) != 0 for b in range(bits)
    ]
    return _select_tree(bit_planes, leaves)


_GATHER_DNUMS = lax.GatherDimensionNumbers(
    offset_dims=(),
    collapsed_slice_dims=(0,),
    start_index_map=(0,),
    operand_batching_dims=(1,),
    start_indices_batching_dims=(1,),
)


def _gather8(tab, idx, mask_idx: bool):
    """out[r, c] = tab[idx[r, c] mod 8, c] for an (8, O) f32 table.

    Lowers to ONE tpu.dynamic_gather (an in-register sublane shuffle). On
    v5e hardware the shuffle uses only the low 3 bits of each index value
    (measured: wraps mod 8, incl. negative values), so callers may pass the
    shifted packed word directly — no `& 7`, no dtype cast. Raw lax.gather
    is used instead of take_along_axis because the latter canonicalizes
    indices to a fresh int32 array.

    mask_idx=True (interpret mode) masks explicitly — the mod-8 wrap is a
    hardware property, not a lax.gather guarantee.
    """
    if mask_idx:
        idx = idx & 7
    return lax.gather(
        tab,
        idx[..., None],
        _GATHER_DNUMS,
        (1, 1),
        mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def _dequant_plane_gather(s, lut_t_ref, bits, mask_idx):
    """Wrap-gather dequant: (W, O) shifted words -> (W, O) f32.

    ~1 VPU op/element for 3-bit (the gather; the shift is done once by the
    caller), ~5 for 4-bit (two table gathers + top-bit select). lut_t_ref
    holds the transposed table (2**bits rows padded to 8, O); for 4-bit,
    rows 0-7 are centroids 0-7 ('lo') and rows 8-15 centroids 8-15 ('hi').
    The gather consumes the shifted word's low 3 bits via the mod-8 wrap;
    for 4-bit, bit 3 of the shifted word selects the hi table.
    """
    w_blk = s.shape[0]
    chunks = []
    if bits <= 3:
        tab = lut_t_ref[0:8, :]
        for c in range(0, w_blk, 8):
            chunks.append(_gather8(tab, s[c : c + 8, :], mask_idx))
        return jnp.concatenate(chunks, axis=0)
    assert bits == 4
    lo = lut_t_ref[0:8, :]
    hi = lut_t_ref[8:16, :]
    for c in range(0, w_blk, 8):
        s8 = s[c : c + 8, :]
        chunks.append(
            jnp.where(
                (s8 & 8) != 0,
                _gather8(hi, s8, mask_idx),
                _gather8(lo, s8, mask_idx),
            )
        )
    return jnp.concatenate(chunks, axis=0)


# NOTE on roads not taken (all measured on v5e, 2026-08-16):
# * bf16/int8 single-gather tables (16/32 sublanes in one vreg): Mosaic
#   reports "Byte gather not supported by this TPU generation" — a v5e
#   hardware limit, not a take_along_axis artifact. Revisit on v6.
# * f32 tables taller than one vreg (16+ rows, int32 idx): "Multiple source
#   vregs along gather dimension" is not implemented.
# * int16 packed arithmetic (2x VPU density for unpack): arith.shrsi fails
#   to legalize for int16 (andi is fine) — no sub-32-bit shift on this gen.
# * Packing a bf16 (lo, hi) centroid pair into one int32 table entry and
#   bit-selecting after a single gather: same op count as two gathers, and
#   relying on MXU default-precision truncation to drop the garbage low
#   mantissa bits is NOT exact (measured 5e-3 rel err) — rejected.


def _dequant_plane_struct(s, lut_t_ref, mask_idx):
    """STRUCTURED-codebook 4-bit dequant (round 5): for codebooks
    constrained to ``lut[c] = A[c & 7] + (c >> 3) * d`` (fit by
    quantize/kmeans.fit_structured_luts — 9 DOF/channel instead of 16),
    the dequant needs ONE 8-row wrap-gather for the A part plus a cheap
    bit-3 mask instead of the hi/lo two-gather+select: ~4 VPU ops/weight
    (shift amortized; gather + and + int->f32 convert) vs ~6 for a free
    16-entry table. The `* d` lands OUTSIDE the MXU: the caller contracts
    the mask with x as a second dot and scales that column sum by the
    per-channel d row (exact: d is constant per output channel).

    lut_t_ref rows 0-7 hold A (transposed); row 8 holds d / 8 — the /8
    absorbs the (s & 8) mask's value so the int mask converts straight to
    f32 without a renormalizing multiply.

    Returns (gA, f): (W, O) f32 each.
    """
    w_blk = s.shape[0]
    tab = lut_t_ref[0:8, :]
    ga_chunks = []
    f_chunks = []
    for c in range(0, w_blk, 8):
        s8 = s[c : c + 8, :]
        ga_chunks.append(_gather8(tab, s8, mask_idx))
        f_chunks.append((s8 & 8).astype(jnp.float32))
    cat = (lambda ch: ch[0] if len(ch) == 1 else jnp.concatenate(ch, axis=0))
    return cat(ga_chunks), cat(f_chunks)


def _dequant_plane_struct_sel(s, lut_t_ref, mask_idx):
    """Structured-codebook dequant, SELECT variant: one gather for A, a
    broadcast add of the per-channel d row, and a bit-3 select — ~5 VPU
    ops/weight with a single MXU dot per plane (the 'fdot' variant's
    second dot measured a net LOSS on v5e: 9.87 vs 8.54 ms/tok at w4
    flagship — small-batch MXU dots are launch-bound, not FLOP-bound).
    lut_t_ref row 8 holds d/8; the /8 is compensated here."""
    w_blk = s.shape[0]
    tab = lut_t_ref[0:8, :]
    drow = lut_t_ref[8:9, :] * 8.0  # one (1, O) op per block, amortized
    chunks = []
    for c in range(0, w_blk, 8):
        s8 = s[c : c + 8, :]
        ga = _gather8(tab, s8, mask_idx)
        chunks.append(jnp.where((s8 & 8) != 0, ga + drow, ga))
    return chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=0)


def _lut_matmul_kernel(x_ref, qw_ref, lut_ref, *rest, bits: int, cpw: int,
                       mode: str, b_blk: int, precision, interpret: bool,
                       has_y0: bool = False, n_i: int = 1,
                       cast_out: bool = False, structured: bool = False,
                       struct_variant: str = "sel"):
    """One (batch-block, out-block, in-block) grid step.

    x_ref:   (cpw * B_BLK, W_BLK) f32 — plane-major activation slice:
             rows [j*B_BLK, (j+1)*B_BLK) hold x values multiplying code
             plane j of each packed word (see the host-side relayout).
             All blocks are 2D: 3D blocks with a middle-axis slice
             miscompile silently in Mosaic (wrong values on hardware).
    qw_ref:  (W_BLK, O_BLK) int32 — packed words
    lut_ref: (O_BLK, 2**bits) f32 ('select') or (8*ceil(K/8), O_BLK) ('gather')
    rest:    [y0_ref (B_BLK, O_BLK),] out_ref (B_BLK, O_BLK)
             [, acc_ref (B_BLK, O_BLK) f32 VMEM scratch]
             y0 (optional) initializes the output block — callers fold a
             residual add / bias into the kernel instead of a separate
             XLA add op per linear (decode steps are small-op-bound).
             cast_out: out_ref holds a narrower dtype (bf16 decode path —
             removes a separate per-linear XLA convert op); accumulation
             then runs in the f32 scratch and the final in-step writes
             the converted block.
    """
    out_ref = rest[-2] if cast_out else rest[-1]
    acc_ref = rest[-1] if cast_out else out_ref
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = (rest[0][:].astype(jnp.float32) if has_y0
                      else jnp.zeros_like(acc_ref))

    _lut_matmul_body(x_ref, qw_ref, lut_ref, acc_ref, bits=bits, cpw=cpw,
                     mode=mode, b_blk=b_blk, precision=precision,
                     interpret=interpret, structured=structured,
                     struct_variant=struct_variant)

    if cast_out:
        @pl.when(i == n_i - 1)
        def _store():
            out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _lut_matmul_sp_kernel(x_ref, qw_ref, lut_ref, x2d_ref, meta_ref,
                          vals_ref, *rest, bits: int, cpw: int,
                          mode: str, b_blk: int, precision, interpret: bool,
                          sg_ih: int, o_rows: int, has_y0: bool = False,
                          n_i: int = 1, cast_out: bool = False,
                          structured: bool = False,
                          struct_variant: str = "sel"):
    """`_lut_matmul_kernel` with the sparse sidecar FOLDED IN: at the first
    in-block step the output block is initialized with this o-block's
    two-hop-gather SpMV tile (spmv.build_block_plans) instead of zeros —
    output feature o*128+l IS y2d[o, l], so the (8, 128) tile reshapes
    straight into the (1, o_blk) output row. Replaces the separate
    gather_spmv launch + add per linear on the decode path.

    x2d_ref:  (b_blk, ih, 128) f32 — full activation in y2d layout
    meta_ref: (1, R, 128) int32 — this o-block's slot plan
    vals_ref: (1, R, 128) f32
    rest:     [y0_ref (b_blk, o_blk),] out_ref [, acc_ref f32 scratch] —
              y0 (optional) adds a caller-provided init (residual fold) on
              top of the sparse tile; cast_out as in _lut_matmul_kernel
    """
    out_ref = rest[-2] if cast_out else rest[-1]
    acc_ref = rest[-1] if cast_out else out_ref
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        vals = vals_ref[0]
        rows_out = []
        for t in range(b_blk):
            cur = _two_hop_rows(x2d_ref[t], meta_ref[0], sg_ih,
                                interpret) * vals
            tile = jnp.zeros((8, 128), jnp.float32)
            for m in range(cur.shape[0] // 8):
                tile = tile + cur[8 * m : 8 * (m + 1), :]
            # OOB tile rows (o_blk < 1024, last block) hold no slots by
            # construction; slice before flattening into the block row
            rows_out.append(tile[:o_rows].reshape(1, o_rows * 128))
        init = (rows_out[0] if b_blk == 1
                else jnp.concatenate(rows_out, axis=0))
        if has_y0:
            init = init + rest[0][:].astype(jnp.float32)
        acc_ref[:] = init

    _lut_matmul_body(x_ref, qw_ref, lut_ref, acc_ref, bits=bits, cpw=cpw,
                     mode=mode, b_blk=b_blk, precision=precision,
                     interpret=interpret, structured=structured,
                     struct_variant=struct_variant)

    if cast_out:
        @pl.when(i == n_i - 1)
        def _store():
            out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _lut_matmul_body(x_ref, qw_ref, lut_ref, out_ref, *, bits: int,
                     cpw: int, mode: str, b_blk: int, precision,
                     interpret: bool, structured: bool = False,
                     struct_variant: str = "sel"):
    if structured:
        variant = struct_variant
        words = qw_ref[:]
        acc = out_ref[:]
        if variant == "fdot":
            # acc += x@A[c&7] + (x@bit3(c)) * d — measured LOSS on v5e
            # (extra per-plane dot); kept for A/Bs and other TPU gens
            drow = lut_ref[8:9, :]  # d / 8 per output channel
            for j in range(cpw):
                s = (words >> (bits * j)) if j else words
                ga, f = _dequant_plane_struct(s, lut_ref, interpret)
                xj = x_ref[j * b_blk : (j + 1) * b_blk, :]
                acc = (acc
                       + jnp.dot(xj, ga, preferred_element_type=jnp.float32,
                                 precision=None if mode == "bf16"
                                 else precision)
                       + jnp.dot(xj, f, preferred_element_type=jnp.float32,
                                 precision=None if mode == "bf16"
                                 else precision)
                       * drow)
            out_ref[:] = acc
            return
        for j in range(cpw):
            s = (words >> (bits * j)) if j else words
            wj = _dequant_plane_struct_sel(s, lut_ref, interpret)
            acc = acc + jnp.dot(
                x_ref[j * b_blk : (j + 1) * b_blk, :], wj,
                preferred_element_type=jnp.float32,
                precision=None if mode == "bf16" else precision,
            )
        out_ref[:] = acc
        return
    acc = out_ref[:]
    if mode == "select":
        words = qw_ref[:].astype(jnp.uint32)  # (W_BLK, O_BLK)
        for j in range(cpw):
            codes = (words >> jnp.uint32(bits * j)) & jnp.uint32(2**bits - 1)
            wj = _dequant_plane_select(codes, lut_ref, bits)
            acc = acc + jnp.dot(
                x_ref[j * b_blk : (j + 1) * b_blk, :], wj,
                preferred_element_type=jnp.float32, precision=precision,
            )
        out_ref[:] = acc
        return

    words = qw_ref[:]  # int32; arithmetic shifts keep the low code bits
    for j in range(cpw):
        s = (words >> (bits * j)) if j else words
        wj = _dequant_plane_gather(s, lut_ref, bits, mask_idx=interpret)
        # mode='bf16': LUT and x are pre-rounded to bf16-representable f32,
        # so the MXU's default-precision operand truncation is exact and the
        # dot is ONE pass. mode='gather': full-f32 values, HIGHEST (~3
        # passes) — default precision would silently truncate to bf16.
        acc = acc + jnp.dot(
            x_ref[j * b_blk : (j + 1) * b_blk, :], wj,
            preferred_element_type=jnp.float32,
            precision=None if mode == "bf16" else precision,
        )
    out_ref[:] = acc


# ---------------------------------------------------------------------------
# Two-hop-gather sparse matvec (see ops/spmv.py for the offline planner).
# Replaces both the XLA scatter-add path and round 1's 7-round butterfly:
# v5e's tpu.dynamic_gather shuffles along EITHER vreg axis (8 sublanes or
# 128 lanes, both wrapping), and gathers tolerate read collisions that
# send-routing cannot — so arbitrary (row, lane) -> (row, lane) movement is
# two chained gathers instead of 7 masked roll rounds (~8-40 VPU ops/slot
# vs ~60-80). Replaces the reference's atomicAdd CSR SpMV
# (quant_cuda_kernel.cu:1040-1089) with deterministic vector ops.
# ---------------------------------------------------------------------------


def _gather_lane(tab, idx, mask_idx: bool):
    """out[r, c] = tab[r, idx[r, c] mod 128] — the 128-lane shuffle twin of
    :func:`_gather8` (measured on v5e: wraps mod 128, negatives included)."""
    if mask_idx:
        idx = idx & 127
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(),
        collapsed_slice_dims=(1,),
        start_index_map=(1,),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    return lax.gather(
        tab,
        idx[..., None],
        dnums,
        (1, 1),
        mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def _two_hop_rows(x2, meta, ih: int, interpret: bool):
    """cur[k, l] = x-value routed to slot (k, l), for an (R, 128) int32
    meta block over x2 (ih, 128) f32 (layout: ops/spmv.py).

    Per 8-slot-row chunk:
      hop 1: t[k, m] = x2[(meta & 255)[k, m], m] — the mod-8 gather wrap
             consumes the row-in-group bits directly, bits 3-7 pick the
             8-row group;
      hop 2: xv[k, l] = t[k, (meta >> 8)[k, l] mod 128].
    """
    chunks = []
    for c0 in range(0, meta.shape[0], 8):
        m8 = meta[c0 : c0 + 8, :]
        grp = (m8 >> 3) & 31
        t = jnp.zeros((8, 128), jnp.float32)
        for g in range(ih // 8):
            cand = _gather8(x2[8 * g : 8 * (g + 1), :], m8, interpret)
            t = jnp.where(grp == g, cand, t)
        chunks.append(_gather_lane(t, m8 >> 8, interpret))
    return chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=0)


def _spmv_kernel(x_ref, meta_ref, vals_ref, out_ref, *,
                 ih: int, oh: int, r_blk: int, interpret: bool,
                 batch_minor: bool):
    """One grid step: (batch, slab-group), or (slab-group, batch) when
    batch_minor (the whole plan fits one slab).

    x_ref:    (1, ih, 128) f32 — batch row b's x2d
    meta_ref: (r_blk, 128) int32 — chirow | src_lane << 8 (ops/spmv.py)
    vals_ref: (r_blk, 128) f32
    out_ref:  (1, oh, 128) f32 — accumulated across slab steps

    batch_minor puts the batch on the TRAILING grid axis so the plan
    blocks' index map stays constant across it: the meta/vals sidecar is
    DMA'd ONCE per linear instead of once per batch row. At a 136-row
    admission prefill the old (batch, slab) order re-streamed ~7 MB of
    plan bytes x 136 rows x per layer (~1 GB/layer of redundant DMA) —
    the dominant cost of the 17..1023-row sparse band (round-5 VERDICT
    item 5). Requires n_steps == 1 (output accumulation across
    non-consecutive visits is not possible), which gather_spmv arranges
    by sizing the slab to the whole plan up to 8192 rows.
    """
    s = pl.program_id(0 if batch_minor else 1)

    @pl.when(s == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    cur = _two_hop_rows(x_ref[0], meta_ref[:], ih, interpret) * vals_ref[:]

    acc = out_ref[0]
    for m in range(r_blk // oh):
        acc = acc + cur[m * oh : (m + 1) * oh, :]
    out_ref[0] = acc


def _spmv_kernel_grouped(x_ref, meta_ref, vals_ref, grp_ref, out_ref, *,
                         oh: int, r_blk: int, interpret: bool):
    """One (1, batch) grid step of the GROUPED two-hop SpMV
    (spmv.build_plan_grouped): every 8-row chunk reads a single x group,
    whose offset comes from the per-chunk SMEM `grp_ref` — hop 1 is one
    sublane gather from a dynamically sliced (8, 128) window instead of
    the classic kernel's ih/8-iteration gather+select scan (~2 vs
    ~2+2*ih/8 VPU ops per chunk; the scan dominated the 17..1023-row
    sparse band's cost). The slice offset is written ``g * 8`` so Mosaic
    can PROVE 8-row alignment (see memory notes on DMA alignment).
    """
    cur_chunks = []
    for c in range(r_blk // 8):
        g = grp_ref[0, c]
        win = x_ref[0, pl.ds(g * 8, 8), :]
        m8 = meta_ref[8 * c : 8 * (c + 1), :]
        t = _gather8(win, m8, interpret)
        cur_chunks.append(
            _gather_lane(t, m8 >> 8, interpret)
            * vals_ref[8 * c : 8 * (c + 1), :])
    cur = (cur_chunks[0] if len(cur_chunks) == 1
           else jnp.concatenate(cur_chunks, axis=0))
    acc = jnp.zeros((oh, 128), jnp.float32)
    for m in range(r_blk // oh):
        acc = acc + cur[m * oh : (m + 1) * oh, :]
    out_ref[0] = acc


@functools.partial(
    jax.jit,
    static_argnames=("oh", "ih", "out_features", "interpret", "slab_rows"),
)
def gather_spmv(
    x,
    meta,
    vals,
    *,
    oh: int,
    ih: int,
    out_features: int,
    interpret: bool = False,
    slab_rows: int = 2048,
    groups=None,
):
    """Sparse contribution: x (in_features,) or (B, in_features) ->
    (out_features,) / (B, out_features).

    meta/vals: the (R, 128) arrays of an ops.spmv.SpmvPlan (R % oh == 0).
    The batch is a leading grid dimension — one kernel serves decode (B=1)
    and pooled continuous-batching steps alike.

    groups: optional (R // 8,) per-chunk source-group ids
    (spmv.build_plan_grouped) — routes through the grouped kernel (one
    dynamic-window gather per chunk) when the whole plan fits one slab;
    a grouped plan's meta is also a valid classic plan (full chirow
    stored), so oversized plans silently fall back to the scan kernel.
    """
    R = meta.shape[0]
    assert R % oh == 0, (R, oh)
    single = x.ndim == 1
    xb = x.reshape(1, -1) if single else x
    B = xb.shape[0]

    # grouped kernel is hardware-only: its per-chunk dynamic window slices
    # take ~26 s/chunk under the interpreter (CPU tests cover the grouped
    # PLAN through the classic-kernel fallback below — grouped meta is
    # classic-valid — and scripts/tpu_verify.py gates the kernel on hw)
    if groups is not None and R <= max(slab_rows, 8192) and not interpret:
        xf = xb.astype(jnp.float32)
        x2 = jnp.pad(xf, ((0, 0), (0, ih * 128 - xf.shape[1])))
        x2 = x2.reshape(B, ih, 128)
        grp = groups.reshape(1, -1).astype(jnp.int32)
        out = pl.pallas_call(
            functools.partial(_spmv_kernel_grouped, oh=oh, r_blk=R,
                              interpret=interpret),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, ih, 128), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 128), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 128), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R // 8), lambda b: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, oh, 128), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, oh, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
            interpret=interpret,
        )(x2, meta, vals, grp)
        out = out.reshape(B, -1)[:, :out_features]
        return out[0] if single else out
    # batch_minor: whenever the whole plan fits one slab (<= 8192 rows,
    # ~8.4 MB of meta+vals in VMEM — every 7B linear at 0.45% qualifies),
    # run it as ONE slab step with batch trailing so the plan is DMA'd
    # once per linear, not once per batch row (see _spmv_kernel).
    batch_minor = B > 1 and R <= max(slab_rows, 8192)
    if batch_minor:
        r_blk, n_steps, rp = R, 1, R
    else:
        # rows per grid step: a multiple of oh, close to slab_rows
        u = max(1, min(R // oh, slab_rows // oh))
        r_blk = u * oh
        n_steps = -(-R // r_blk)
        rp = n_steps * r_blk
    if rp != R:
        meta = jnp.pad(meta, ((0, rp - R), (0, 0)))
        vals = jnp.pad(vals, ((0, rp - R), (0, 0)))

    xf = xb.astype(jnp.float32)
    # pad, not .at[].set — the latter lowers to a (near-serial) scatter
    x2 = jnp.pad(xf, ((0, 0), (0, ih * 128 - xf.shape[1])))
    x2 = x2.reshape(B, ih, 128)

    if batch_minor:
        grid = (n_steps, B)
        bmap = lambda s, b: (b, 0, 0)  # noqa: E731
        pmap = lambda s, b: (s, 0)  # noqa: E731
        semantics = ("arbitrary", "parallel")
    else:
        grid = (B, n_steps)
        bmap = lambda b, s: (b, 0, 0)  # noqa: E731
        pmap = lambda b, s: (s, 0)  # noqa: E731
        semantics = ("parallel", "arbitrary")

    out = pl.pallas_call(
        functools.partial(_spmv_kernel, ih=ih, oh=oh, r_blk=r_blk,
                          interpret=interpret, batch_minor=batch_minor),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ih, 128), bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((r_blk, 128), pmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((r_blk, 128), pmap, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, oh, 128), bmap,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, oh, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
        ),
        interpret=interpret,
    )(x2, meta, vals)

    out = out.reshape(B, -1)[:, :out_features]
    return out[0] if single else out


def _lut_matmul_t_kernel(x_ref, qwt_ref, lutw_ref, out_ref, *, bits: int,
                         cpw: int, mode: str, w_blk: int, precision,
                         interpret: bool):
    """One (out-block, in-block) grid step of the transposed GEMV kernel.

    x_ref:    (cpw * W_BLK, B) f32 — per-i-chunk plane-blocked xT: rows
              [j*W_BLK, (j+1)*W_BLK) hold x[(i*W_BLK + w)*cpw + j]
    qwt_ref:  (O_BLK, W_BLK) int32 — TRANSPOSED packed words (row = output
              channel riding sublanes, word index along lanes)
    lutw_ref: (O_BLK, 128) f32 — wide table, entries replicated mod 2**bits
    out_ref:  (O_BLK, B) f32 — transposed output, revisited across i
    """
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    words = qwt_ref[:]
    tab = lutw_ref[:]
    acc = out_ref[:]
    for j in range(cpw):
        s = (words >> (bits * j)) if j else words
        # wide-table wrap-gather: the 128-lane dynamic_gather consumes bits
        # 0-6 of the shifted word (wraps mod 128); the table's period-
        # 2**bits replication absorbs the garbage bits above the code, so
        # tab[o, s & 127] == lut[o, s & (2**bits - 1)]. 4-bit dequant is
        # shift + ONE gather (~2 VPU ops/weight) — the (8, O) sublane-
        # gather layout needs two gathers + a select for 16-entry tables.
        chunks = [
            _gather_lane(tab, s[:, c : c + 128], interpret)
            for c in range(0, w_blk, 128)
        ]
        wj = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=1)
        xj = x_ref[j * w_blk : (j + 1) * w_blk, :]
        acc = acc + jnp.dot(
            wj, xj,
            preferred_element_type=jnp.float32,
            precision=None if mode == "bf16" else precision,
        )
    out_ref[:] = acc


def wide_lut(lut, bits: int):
    """(out, 2**bits) LUT -> (out, 128) wide gather table: entries tiled
    with period 2**bits so a mod-128 wrap-gather with ANY garbage bits
    above the code still lands on the right entry (numpy or jnp)."""
    reps = 128 // lut.shape[1]
    if isinstance(lut, np.ndarray):
        return np.tile(lut.astype(np.float32), (1, reps))
    return jnp.tile(lut.astype(jnp.float32), (1, reps))


@functools.partial(
    jax.jit,
    static_argnames=("bits", "o_blk", "w_blk", "interpret", "mode",
                     "precision"),
)
def lut_matmul_t(
    x,
    qweight_t,
    lut_w,
    bits: int,
    *,
    o_blk: int = 0,
    w_blk: int = 0,
    interpret: bool = False,
    mode: str = "gather",
    precision: str = "highest",
):
    """Transposed-layout fused LUT-dequant GEMV: ``x (..., in) -> (..., out)``.

    The decode-path twin of :func:`lut_matmul` for 4-bit: packed words are
    stored TRANSPOSED (out_features, n_words) so output channels ride
    sublanes, letting dequant run as one 128-LANE wrap-gather per plane
    against an (out, 128) wide table (see `wide_lut`) — ~2 VPU ops/weight
    vs ~6 for the sublane-gather hi/lo-select path. The dot contracts
    wjT (O, W) @ xT (W, B) in natural MXU orientation; the transposed
    (O, B) output is flipped back host-graph-side (B <= 8, trivial).

    Replaces the same reference kernels as `lut_matmul`
    (quant_cuda_kernel.cu:741-1038) for the batch<=8 decode case.
    """
    cpw = formats.CODES_PER_WORD[bits]
    *lead, in_features = x.shape
    out_features, nw = qweight_t.shape
    assert nw == formats.n_words(in_features, bits), (nw, in_features, bits)

    xf = x.reshape(-1, in_features).astype(jnp.float32)
    batch = xf.shape[0]
    assert batch <= 8, "lut_matmul_t is the GEMV (decode) path"
    b_lanes = 8  # lane dim of xT/out blocks; 1-lane blocks don't lower

    if not w_blk:
        n_i = max(1, _cdiv(nw, 512))
        w_blk = _round_up(_cdiv(nw, n_i), 128)
    n_i = _cdiv(nw, w_blk)
    wp = n_i * w_blk  # may overhang nw: OOB words dequant to finite junk
    if not o_blk:
        o_blk = 1024
    o_blk = min(o_blk, _round_up(out_features, 8))
    op = _round_up(out_features, o_blk)

    # xT relayout, plane-blocked per i-chunk: row i*(cpw*w_blk) + j*w_blk
    # + w holds x[:, (i*w_blk + w)*cpw + j] — each block is contiguous and
    # each plane is a contiguous slab inside it.
    xpad = jnp.pad(xf, ((0, b_lanes - batch), (0, wp * cpw - in_features)))
    x3 = (
        xpad.reshape(b_lanes, n_i, w_blk, cpw)
        .transpose(1, 3, 2, 0)
        .reshape(n_i * cpw * w_blk, b_lanes)
    )
    if mode == "bf16":
        x3 = x3.astype(jnp.bfloat16).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(
            _lut_matmul_t_kernel, bits=bits, cpw=cpw, mode=mode, w_blk=w_blk,
            precision=jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT,
            interpret=interpret,
        ),
        grid=(op // o_blk, n_i),
        in_specs=[
            pl.BlockSpec((cpw * w_blk, b_lanes), lambda o, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((o_blk, w_blk), lambda o, i: (o, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((o_blk, 128), lambda o, i: (o, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((o_blk, b_lanes), lambda o, i: (o, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((op, b_lanes), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_lanes * op * wp * cpw,
            bytes_accessed=wp * op * 4 + op * 128 * 4 + op * b_lanes * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x3, qweight_t, lut_w)

    y = out[:out_features, :batch].T
    return y.reshape(*lead, out_features)


BIG_BATCH = 1024  # rows at which lut_matmul switches to the scratch path


def _dequant_dense_kernel(qw_ref, lut_ref, out_ref, *, bits: int, cpw: int,
                          out_dtype, interpret: bool):
    """Dequantize one (w_blk, o_blk) packed block to a dense
    (cpw*w_blk, o_blk) block in BLOCK-PLANE-MAJOR row order: rows
    [j*w_blk, (j+1)*w_blk) hold code plane j of this block's words."""
    words = qw_ref[:]
    planes = []
    for j in range(cpw):
        s = (words >> (bits * j)) if j else words
        planes.append(_dequant_plane_gather(s, lut_ref, bits, interpret))
    out_ref[:] = jnp.concatenate(planes, axis=0).astype(out_dtype)


def _lut_matmul_bigbatch(xf, qweight, lut_in, bits, cpw, mode, precision,
                         interpret, out_features, coo=None):
    """Large-batch (eval/prefill) path: dequantize each layer's weights
    ONCE per call into an HBM scratch, then one dense MXU matmul.

    The fused kernel re-runs dequant for every batch block (VMEM bounds
    b_blk at ~512), so a 16k-row eval stride pays ~32x the dequant VPU
    work — at 4-bit that is ~340 ms per call, dominating the stride. Here
    dequant is O(weights) once (+ a scratch write/read at the matmul's
    operand precision), and the matmul runs at full MXU batch efficiency.

    The scratch is BLOCK-plane-major (see _dequant_dense_kernel); x is
    relayouted host-graph-side to the matching row order, so no in-kernel
    interleave is ever needed and the contraction order stays associative.

    coo: optional (sp_rows, sp_cols, sp_vals) sparse sidecar. The values
    are scattered INTO the scratch (one small scatter per call, amortized
    over the stride group) so ONE matmul serves dense + sparse — the
    separate materialize-then-matmul previously DOUBLED the stride's MXU
    work (at f32 HIGHEST, ~1.3 s of a 2.0 s stride). Exact by the
    zero-correction identity: scratch holds centroid-nearest-zero at an
    outlier slot and the stored value is w - that centroid.
    """
    batch, in_features = xf.shape
    nw = qweight.shape[0]
    w_blk = 128
    o_blk = 512
    wp = _round_up(nw, w_blk)
    op = _round_up(out_features, o_blk)
    n_i = wp // w_blk

    out_dtype = jnp.bfloat16 if mode == "bf16" else jnp.float32
    w_dense = pl.pallas_call(
        functools.partial(_dequant_dense_kernel, bits=bits, cpw=cpw,
                          out_dtype=out_dtype, interpret=interpret),
        grid=(n_i, op // o_blk),
        in_specs=[
            pl.BlockSpec((w_blk, o_blk), lambda i, o: (i, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lut_in.shape[0], o_blk), lambda i, o: (0, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cpw * w_blk, o_blk), lambda i, o: (i, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_i * cpw * w_blk, op), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(qweight, lut_in)

    if coo is not None:
        sp_rows, sp_cols, sp_vals = coo
        w = sp_cols // cpw
        j = sp_cols % cpw
        rows2 = (w // w_blk) * (cpw * w_blk) + j * w_blk + (w % w_blk)
        w_dense = w_dense.at[rows2, sp_rows].add(
            sp_vals.astype(w_dense.dtype))

    # x rows -> block-plane-major: x2[b, i*cpw*w_blk + j*w_blk + w] =
    # x[b, (i*w_blk + w)*cpw + j]
    xpad = jnp.pad(xf, ((0, 0), (0, wp * cpw - in_features)))
    x2 = (
        xpad.reshape(batch, n_i, w_blk, cpw)
        .transpose(0, 1, 3, 2)
        .reshape(batch, n_i * cpw * w_blk)
    )
    if mode == "bf16":
        x2 = x2.astype(jnp.bfloat16)
    y = jnp.dot(
        x2, w_dense,
        preferred_element_type=jnp.float32,
        precision=None if mode == "bf16" else precision,
    )
    return y[:, :out_features]


@functools.partial(
    jax.jit,
    static_argnames=("bits", "b_blk", "w_blk", "o_blk", "interpret", "mode",
                     "precision", "big_batch", "sgb_ih", "out_dtype",
                     "lut_t_rounded", "struct_variant"),
)
def lut_matmul(
    x,
    qweight,
    lut,
    bits: int,
    *,
    b_blk: int = 512,
    w_blk: int = 0,
    o_blk: int = 0,
    interpret: bool = False,
    mode: str = "gather",
    precision: str = "highest",
    lut_t=None,
    big_batch: int = BIG_BATCH,
    sp_rows=None,
    sp_cols=None,
    sp_vals=None,
    sgb_meta=None,
    sgb_vals=None,
    sgb_ih: int = 0,
    y0=None,
    out_dtype=None,
    lut_t_rounded: bool = False,
    lut_t_struct=None,
    struct_variant: str = "sel",
):
    """Fused LUT-dequant matmul: ``x (..., in) -> (..., out)`` f32
    (or ``out_dtype``).

    lut_t_struct: optional (16, out) STRUCTURED-codebook table (rows 0-7
    A transposed, row 8 d/8 — see _dequant_plane_struct): 4-bit dequant
    drops from ~6 to ~4 VPU ops/weight for codebooks fit under
    ``lut[c] = A[c & 7] + (c >> 3) * d``. GEMV/serving path only (the
    big-batch scratch path amortizes dequant and keeps free tables).

    y0: optional (..., out) initializer added to the result INSIDE the
    kernel (residual/bias fold): the output block starts from y0 instead
    of zeros at the first in-block step, removing a separate XLA add op
    per linear from the decode step.

    out_dtype: optional narrower output dtype (bf16 decode path):
    accumulation stays f32 in a VMEM scratch and only the final store
    converts — removes the separate per-linear XLA convert op
    (`.astype(in_dtype)` becomes a no-op downstream).

    lut_t_rounded: the provided lut_t is ALREADY bf16-representable
    (models/fuse attaches 'lut_t_bf16'), so bf16 mode skips its per-call
    round-trip convert (measured ~0.12 ms/step at 7B w3 across 129 calls).

    Handles any leading batch shape (flattened). Non-dividing weight/out
    dims are handled by Pallas's native out-of-bounds block masking — no
    in-graph pad copy of the packed weights. OOB packed words read as
    garbage bits, but they dequant (via the mod-8 gather wrap) to finite
    LUT values that multiply explicitly ZERO-padded activation slots, so
    the padded region contributes exactly 0; OOB output columns are sliced
    off before returning.

    w_blk/o_blk 0 = auto: GEMV-shaped calls (decode) take narrow weight
    blocks with wide lanes (w128/o1024, the measured v5e optimum); batched
    calls take squarer blocks.
    """
    cpw = formats.CODES_PER_WORD[bits]
    *lead, in_features = x.shape
    nw, out_features = qweight.shape
    assert nw == formats.n_words(in_features, bits), (nw, in_features, bits)

    xf = x.reshape(-1, in_features).astype(jnp.float32)
    batch = xf.shape[0]

    if mode in ("gather", "bf16") and bits <= 4 and batch >= big_batch:
        # eval/prefill: dequant-to-scratch once + one dense MXU matmul
        # (the fused kernel would re-run dequant per ~512-row batch block)
        cpw_ = formats.CODES_PER_WORD[bits]
        k_rows = max(8, 2**bits)
        if lut_t is not None:
            lut_in = lut_t.astype(jnp.float32)
        else:
            lut_in = jnp.pad(lut.astype(jnp.float32).T,
                             ((0, k_rows - 2**bits), (0, 0)))
        if mode == "bf16":
            lut_in = lut_in.astype(jnp.bfloat16).astype(jnp.float32)
        prec = (jax.lax.Precision.HIGHEST if precision == "highest"
                else jax.lax.Precision.DEFAULT)
        coo = (None if sp_rows is None
               else (sp_rows, sp_cols, sp_vals))
        y = _lut_matmul_bigbatch(xf, qweight, lut_in, bits, cpw_, mode, prec,
                                 interpret, out_features, coo=coo)
        if y0 is not None:
            y = y + y0.reshape(-1, out_features).astype(jnp.float32)
        return y.reshape(*lead, out_features)

    if not o_blk:
        o_blk = 1024 if batch <= 64 else 512
    if not w_blk:
        # decode sweep (v5e): w512/o1024 streams packed words at ~530-730
        # GB/s vs ~380-480 at w128/w256 — big w-blocks amortize DMA issue.
        # Distribute rows evenly over ceil(nw/512) steps: a fixed 512 would
        # spend a mostly-OOB tail block (e.g. nw=1101 -> 512/512/77 rows
        # burns ~28% of the kernel's compute on masked garbage).
        if batch <= 64:
            # serving-pool batches (<=64) keep the GEMV-style wide blocks:
            # the w128 narrow-block branch measured 1.5x slower at b=16
            # (scripts/batch_anatomy.py — 70.9us vs 46.1us for the 7B qkv
            # shape). VMEM still fits: x block cpw*b x 512 and one
            # 512x1024 dequant plane.
            # x2's lane dim is blocked by w_blk: multiple blocks need a
            # 128-multiple; a single block may equal the array dim (8-mult)
            n_i = max(1, _cdiv(nw, 512))
            w_blk = _round_up(_cdiv(nw, n_i), 8 if n_i == 1 else 128)
        else:
            w_blk = 128  # large batch: b_blk 512 dominates VMEM; narrow w fits

    if batch <= 8:
        # GEMV: block the batch dim at its true size — rounding 1 -> 8 makes
        # the plane-major relayout copy 8x the activation bytes per call
        # (measured 0.5 ms/decode-step at 7B) for all-zero padding rows
        b_blk = min(b_blk, batch)
    else:
        b_blk = min(b_blk, _round_up(batch, 8))
    o_blk = min(o_blk, _round_up(out_features, 128))
    # last-two block dims must be (8,128)-aligned on hardware
    w_blk = min(w_blk, _round_up(nw, 128))

    bp = _round_up(batch, b_blk)
    op = _round_up(out_features, o_blk)
    wp = _round_up(nw, w_blk)

    # Pre-reshape activation to plane-major 2D layout: for batch-block b,
    # rows [b*cpw*b_blk + j*b_blk + t] hold x[b*b_blk + t, w*cpw + j].
    # (x is small — this pad/transpose is cheap, unlike a weights pad.)
    xpad = jnp.pad(xf, ((0, bp - batch), (0, wp * cpw - in_features)))
    x2 = (
        xpad.reshape(bp // b_blk, b_blk, wp, cpw)
        .transpose(0, 3, 1, 2)
        .reshape(bp // b_blk * cpw * b_blk, wp)
    )

    qw = qweight  # OOB blocks masked by Pallas — see docstring
    lutp = lut.astype(jnp.float32)

    structured = (lut_t_struct is not None and bits == 4
                  and mode in ("gather", "bf16"))
    if mode in ("gather", "bf16") and bits > 4:
        mode = "select"  # >16-entry tables can't hardware-gather
    if mode == "bf16":
        # round LUT + activations to bf16-representable f32: the MXU's
        # default-precision truncation is then exact, one pass, and the
        # kernel needs no per-weight cast op
        x2 = x2.astype(jnp.bfloat16).astype(jnp.float32)
    if mode in ("gather", "bf16"):
        # transposed table, rows padded to the 8-sublane vreg height; a
        # pre-transposed table (quant_linear.transposed_lut, prepared once
        # at engine init) skips the per-call transpose+pad fusion chain
        k_rows = max(8, 2**bits)
        if structured:
            # (16, out) structured table: rows 0-7 A, row 8 d/8 (see
            # _dequant_plane_struct); attach pre-rounds it for bf16 mode
            lut_in = lut_t_struct.astype(jnp.float32)
            k_rows = lut_t_struct.shape[0]
        elif lut_t is not None:
            lut_in = lut_t.astype(jnp.float32)
        else:
            lut_in = jnp.pad(lutp.T, ((0, k_rows - 2**bits), (0, 0)))
        if mode == "bf16" and not lut_t_rounded and not structured:
            lut_in = lut_in.astype(jnp.bfloat16).astype(jnp.float32)
        lut_spec = pl.BlockSpec(
            (k_rows, o_blk), lambda b, o, i: (0, o), memory_space=pltpu.VMEM
        )
    else:
        lut_in = lutp
        lut_spec = pl.BlockSpec(
            (o_blk, 2**bits), lambda b, o, i: (o, 0), memory_space=pltpu.VMEM
        )

    grid = (bp // b_blk, op // o_blk, wp // w_blk)
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)

    in_specs = [
        pl.BlockSpec(
            (cpw * b_blk, w_blk),
            lambda b, o, i: (b, i),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (w_blk, o_blk), lambda b, o, i: (i, o), memory_space=pltpu.VMEM
        ),
        lut_spec,
    ]
    inputs = [x2, qw, lut_in]

    if sgb_meta is not None:
        # fold the sparse sidecar into this kernel (spmv.build_block_plans):
        # the o-block's slot tile initializes out_ref at the first in-step.
        # Serving-pool batches (<= 16 slots) fold too: the b_blk-unrolled
        # two-hop init is pure VPU work (~1 us per o-block per row), while
        # the separate gather_spmv launches it replaces cost ~45 us each
        # at B=16 (5.8 ms/step across a 7B model's 128 linears).
        assert batch <= 64 and bp == b_blk, (
            "fused sparse GEMV path requires a single batch block")
        n_ob, r_rows, _ = sgb_meta.shape
        assert n_ob == op // o_blk and o_blk <= 1024, (
            (n_ob, op, o_blk), "block plans were built for o_blk=1024")
        x2d = jnp.pad(xf, ((0, bp - batch),
                           (0, sgb_ih * 128 - in_features)))
        x2d = x2d.reshape(bp, sgb_ih, 128)
        in_specs += [
            pl.BlockSpec((bp, sgb_ih, 128), lambda b, o, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_rows, 128), lambda b, o, i: (o, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_rows, 128), lambda b, o, i: (o, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        inputs += [x2d, sgb_meta, sgb_vals]
        kernel = functools.partial(
            _lut_matmul_sp_kernel, bits=bits, cpw=cpw, mode=mode,
            b_blk=b_blk, precision=prec, interpret=interpret,
            sg_ih=sgb_ih, o_rows=o_blk // 128, has_y0=y0 is not None,
            n_i=wp // w_blk, cast_out=out_dtype is not None,
            structured=structured, struct_variant=struct_variant,
        )
    else:
        kernel = functools.partial(
            _lut_matmul_kernel, bits=bits, cpw=cpw, mode=mode, b_blk=b_blk,
            precision=prec, interpret=interpret, has_y0=y0 is not None,
            n_i=wp // w_blk, cast_out=out_dtype is not None,
            structured=structured, struct_variant=struct_variant,
        )
    if y0 is not None:
        # keep y0's own dtype (bf16 residuals convert in-kernel); pad is a
        # no-op at decode shapes (out divides o_blk, batch == bp)
        y0f = y0.reshape(-1, out_features)
        y0p = jnp.pad(y0f, ((0, bp - batch), (0, op - out_features)))
        in_specs.append(pl.BlockSpec((b_blk, o_blk), lambda b, o, i: (b, o),
                                     memory_space=pltpu.VMEM))
        inputs.append(y0p)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (b_blk, o_blk), lambda b, o, i: (b, o), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bp, op), out_dtype or jnp.float32),
        scratch_shapes=(
            [pltpu.VMEM((b_blk, o_blk), jnp.float32)]
            if out_dtype is not None else []
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * op * wp * cpw,
            bytes_accessed=wp * op * 4 + bp * wp * cpw * 4 + bp * op * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*inputs)

    return out[:batch, :out_features].reshape(*lead, out_features)
