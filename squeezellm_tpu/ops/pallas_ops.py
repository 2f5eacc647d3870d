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
  contiguous slice ``x3[:, j, :]``, and the dot
  ``x3[:, j, :] @ dequant_j`` accumulates the same sum as the natural
  order (reduction order is associative in f32-accum).
* 3-bit uses the lane-friendly 10-codes-per-word layout (formats.pack_codes),
  not the reference's cross-word bit-spill, so the unpack is one shift+mask
  per code plane.
* The select-tree costs ``2**bits - 1`` vector selects per code plane; at
  4 bits that is ~21 VPU ops per weight element, which keeps batch-1 decode
  at fp16-latency parity while streaming 4x fewer HBM bytes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
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


def _lut_matmul_kernel(x_ref, qw_ref, lut_ref, out_ref, *, bits: int, cpw: int):
    """One (batch-block, out-block, in-block) grid step.

    x_ref:   (B_BLK, cpw, W_BLK) f32 — pre-reshaped activation slice
    qw_ref:  (W_BLK, O_BLK) int32 — packed words
    lut_ref: (O_BLK, 2**bits) f32
    out_ref: (B_BLK, O_BLK) f32 — revisited across the in-block grid dim
    """
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    words = qw_ref[:].astype(jnp.uint32)  # (W_BLK, O_BLK)
    # LUT leaf rows, broadcast over the word (sublane) axis.
    leaves = [lut_ref[:, k][None, :] for k in range(2**bits)]

    acc = out_ref[:]
    for j in range(cpw):
        codes = (words >> jnp.uint32(bits * j)) & jnp.uint32(2**bits - 1)
        bit_planes = [
            ((codes >> jnp.uint32(b)) & jnp.uint32(1)) != 0 for b in range(bits)
        ]
        wj = _select_tree(bit_planes, leaves)  # (W_BLK, O_BLK) f32
        acc = acc + jnp.dot(
            x_ref[:, j, :], wj, preferred_element_type=jnp.float32
        )
    out_ref[:] = acc


@functools.partial(
    jax.jit,
    static_argnames=("bits", "b_blk", "w_blk", "o_blk", "interpret"),
)
def lut_matmul(
    x,
    qweight,
    lut,
    bits: int,
    *,
    b_blk: int = 256,
    w_blk: int = 256,
    o_blk: int = 512,
    interpret: bool = False,
):
    """Fused LUT-dequant matmul: ``x (..., in) -> (..., out)`` f32.

    Handles any leading batch shape (flattened); pads every dim to block
    multiples (zero codes x zero activations contribute 0).
    """
    cpw = formats.CODES_PER_WORD[bits]
    *lead, in_features = x.shape
    nw, out_features = qweight.shape
    assert nw == formats.n_words(in_features, bits), (nw, in_features, bits)

    xf = x.reshape(-1, in_features).astype(jnp.float32)
    batch = xf.shape[0]

    b_blk = min(b_blk, _round_up(batch, 8))
    o_blk = min(o_blk, _round_up(out_features, 128))
    w_blk = min(w_blk, _round_up(nw, 8))

    bp = _round_up(batch, b_blk)
    op = _round_up(out_features, o_blk)
    wp = _round_up(nw, w_blk)

    # Pre-reshape activation to (B, cpw, nw): x3[b, j, w] = x[b, w*cpw + j].
    xpad = jnp.pad(xf, ((0, bp - batch), (0, wp * cpw - in_features)))
    x3 = xpad.reshape(bp, wp, cpw).transpose(0, 2, 1)

    qw = jnp.pad(qweight, ((0, wp - nw), (0, op - out_features)))
    lutp = jnp.pad(lut.astype(jnp.float32), ((0, op - out_features), (0, 0)))

    grid = (bp // b_blk, op // o_blk, wp // w_blk)

    out = pl.pallas_call(
        functools.partial(_lut_matmul_kernel, bits=bits, cpw=cpw),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (b_blk, cpw, w_blk),
                lambda b, o, i: (b, 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (w_blk, o_blk), lambda b, o, i: (i, o), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (o_blk, 2**bits), lambda b, o, i: (o, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (b_blk, o_blk), lambda b, o, i: (b, o), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bp, op), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * op * wp * cpw,
            bytes_accessed=wp * op * 4 + bp * wp * cpw * 4 + bp * op * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x3, qw, lutp)

    return out[:batch, :out_features].reshape(*lead, out_features)
