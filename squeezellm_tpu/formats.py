"""Packed-weight, LUT and sparse-outlier tensor formats.

The on-device format is designed for TPU lane-friendly unpacking, NOT copied
from the reference CUDA layout:

* 4-bit: 8 codes per int32 word, code ``j`` of a word at bits ``4*j``.
  (This happens to coincide with the reference's 4-bit layout,
  reference squeezellm/quant.py:180-184, so conversion is free.)
* 3-bit: 10 codes per int32 word at bits ``3*j`` (2 bits/word unused).
  The reference instead spills codes across word boundaries
  (reference squeezellm/quant.py:185-203) which cannot be unpacked with a
  uniform shift/mask per lane; we trade 6.7% storage for vectorized unpack.
* 2-bit/8-bit supported with 16 / 4 codes per word.

Shapes (one quantized linear, ``y = x @ W^T`` with torch ``W`` of shape
``(out, in)``):

* ``qweight`` int32 ``(n_words(in, bits), out)`` — packed along the INPUT dim
  so the matmul reduction walks rows; out is the 128-lane axis.
* ``lut`` float32 ``(out, 2**bits)`` — one codebook per OUTPUT channel
  (reference quant.py:58-61).
* sparse outliers, flat COO sorted by output row, zero-padded to a static
  size: ``sp_rows/sp_cols`` int32 ``(nnz_pad,)``, ``sp_vals`` f32 ``(nnz_pad,)``
  with ``vals == 0`` on padding. Semantics match the reference CSR sidecar
  incl. the zero-correction trick (quant.py:117-123): the stored value is
  ``w - centroid_nearest_zero(channel)`` because the dense path dequantizes
  the (zeroed) outlier slot to that centroid.
* hybrid top-X dense channels: ``topx_weights`` f32 ``(in, topX)``,
  ``topx_indices`` int32 ``(topX,)`` (reference quant.py:74-80).

All pack/unpack helpers exist in numpy (offline pipeline) and the unpackers
also in jnp (in-graph XLA fallback path).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

SUPPORTED_BITS = (2, 3, 4, 8)

# Codes packed per int32 word in the TPU-native layout.
CODES_PER_WORD = {2: 16, 3: 10, 4: 8, 8: 4}


def n_words(in_features: int, bits: int) -> int:
    """Number of packed int32 words along the input dim."""
    cpw = CODES_PER_WORD[bits]
    return (in_features + cpw - 1) // cpw


# ---------------------------------------------------------------------------
# TPU-native packing (numpy, offline)
# ---------------------------------------------------------------------------


def pack_codes(codes: np.ndarray, bits: int) -> np.ndarray:
    """Pack integer codes into the TPU-native int32 layout.

    Args:
      codes: ``(in, out)`` integer array, values in ``[0, 2**bits)``.
      bits: one of SUPPORTED_BITS.

    Returns:
      int32 ``(n_words(in, bits), out)``.
    """
    if bits not in SUPPORTED_BITS:
        raise ValueError(f"bits must be one of {SUPPORTED_BITS}, got {bits}")
    codes = np.asarray(codes)
    if codes.ndim != 2:
        raise ValueError(f"codes must be (in, out), got shape {codes.shape}")
    in_features, out_features = codes.shape
    cpw = CODES_PER_WORD[bits]
    nw = n_words(in_features, bits)
    padded = np.zeros((nw * cpw, out_features), dtype=np.uint32)
    padded[:in_features] = codes.astype(np.uint32) & ((1 << bits) - 1)
    padded = padded.reshape(nw, cpw, out_features)
    words = np.zeros((nw, out_features), dtype=np.uint32)
    for j in range(cpw):
        words |= padded[:, j, :] << np.uint32(bits * j)
    return words.view(np.int32)


def unpack_codes(qweight: np.ndarray, bits: int, in_features: int) -> np.ndarray:
    """Inverse of :func:`pack_codes`; returns uint8 ``(in, out)``."""
    cpw = CODES_PER_WORD[bits]
    words = np.asarray(qweight).view(np.uint32)
    nw, out_features = words.shape
    if nw != n_words(in_features, bits):
        raise ValueError(
            f"qweight has {nw} words; expected {n_words(in_features, bits)}"
        )
    codes = np.zeros((nw, cpw, out_features), dtype=np.uint8)
    mask = np.uint32((1 << bits) - 1)
    for j in range(cpw):
        codes[:, j, :] = ((words >> np.uint32(bits * j)) & mask).astype(np.uint8)
    return codes.reshape(nw * cpw, out_features)[:in_features]


def unpack_codes_jnp(qweight, bits: int, in_features: int):
    """jnp in-graph unpack: int32 ``(n_words, out)`` -> int32 ``(in, out)``.

    Pure shift/mask — vectorizes on the VPU and fuses under jit.
    """
    import jax.numpy as jnp

    cpw = CODES_PER_WORD[bits]
    nw = qweight.shape[0]
    words = qweight.astype(jnp.uint32)
    mask = jnp.uint32((1 << bits) - 1)
    # (nw, cpw, out): code j of each word.
    parts = [
        ((words >> jnp.uint32(bits * j)) & mask).astype(jnp.int32) for j in range(cpw)
    ]
    codes = jnp.stack(parts, axis=1).reshape(nw * cpw, qweight.shape[1])
    return codes[:in_features]


# ---------------------------------------------------------------------------
# Reference (SqueezeLLM CUDA) layout — used only by the checkpoint converter
# and parity tests. Layout contract: reference squeezellm/quant.py:171-207.
# ---------------------------------------------------------------------------


def pack_codes_ref(codes: np.ndarray, bits: int) -> np.ndarray:
    """Pack codes in the reference layout: int32 ``(in//32*bits, out)``.

    Reimplemented from the layout *description* (quant.py pack2): 4-bit packs
    8 codes/word LSB-first; 3-bit packs 32 codes into 3 words with 2/1-bit
    spills at the word boundaries.
    """
    codes = np.asarray(codes).astype(np.uint32)
    in_features, out_features = codes.shape
    if bits == 4:
        if in_features % 8:
            raise ValueError("reference 4-bit layout needs in % 8 == 0")
        w = codes.reshape(in_features // 8, 8, out_features)
        words = np.zeros((in_features // 8, out_features), dtype=np.uint32)
        for j in range(8):
            words |= w[:, j, :] << np.uint32(4 * j)
        return words.view(np.int32)
    if bits == 3:
        if in_features % 32:
            raise ValueError("reference 3-bit layout needs in % 32 == 0")
        g = codes.reshape(in_features // 32, 32, out_features)
        words = np.zeros((in_features // 32, 3, out_features), dtype=np.uint32)
        w0, w1, w2 = words[:, 0], words[:, 1], words[:, 2]
        for j in range(10):  # inputs 0..9 -> word0 bits 0..29
            w0 |= g[:, j] << np.uint32(3 * j)
        w0 |= g[:, 10] << np.uint32(30)          # input 10 low 2 bits
        w1 |= (g[:, 10] >> np.uint32(2)) & 1     # input 10 high bit
        for j in range(10):  # inputs 11..20 -> word1 bits 1..30
            w1 |= g[:, 11 + j] << np.uint32(3 * j + 1)
        w1 |= g[:, 21] << np.uint32(31)          # input 21 low bit
        w2 |= (g[:, 21] >> np.uint32(1)) & 0x3   # input 21 high 2 bits
        for j in range(10):  # inputs 22..31 -> word2 bits 2..31
            w2 |= g[:, 22 + j] << np.uint32(3 * j + 2)
        return words.reshape(in_features // 32 * 3, out_features).view(np.int32)
    raise ValueError(f"reference layout supports bits in (3, 4), got {bits}")


def unpack_codes_ref(qweight: np.ndarray, bits: int, in_features: int) -> np.ndarray:
    """Unpack reference-layout words back to uint8 codes ``(in, out)``."""
    words = np.asarray(qweight).view(np.uint32)
    out_features = words.shape[1]
    if bits == 4:
        codes = np.zeros((in_features // 8, 8, out_features), dtype=np.uint8)
        for j in range(8):
            codes[:, j, :] = ((words >> np.uint32(4 * j)) & 0xF).astype(np.uint8)
        return codes.reshape(in_features, out_features)
    if bits == 3:
        g = words.reshape(in_features // 32, 3, out_features)
        w0, w1, w2 = g[:, 0], g[:, 1], g[:, 2]
        codes = np.zeros((in_features // 32, 32, out_features), dtype=np.uint8)
        for j in range(10):
            codes[:, j] = ((w0 >> np.uint32(3 * j)) & 0x7).astype(np.uint8)
        codes[:, 10] = (((w0 >> np.uint32(30)) & 0x3) | ((w1 & 0x1) << 2)).astype(
            np.uint8
        )
        for j in range(10):
            codes[:, 11 + j] = ((w1 >> np.uint32(3 * j + 1)) & 0x7).astype(np.uint8)
        codes[:, 21] = (((w1 >> np.uint32(31)) & 0x1) | (((w2 & 0x3)) << 1)).astype(
            np.uint8
        )
        for j in range(10):
            codes[:, 22 + j] = ((w2 >> np.uint32(3 * j + 2)) & 0x7).astype(np.uint8)
        return codes.reshape(in_features, out_features)
    raise ValueError(f"reference layout supports bits in (3, 4), got {bits}")


def convert_ref_qweight(qweight_ref: np.ndarray, bits: int, in_features: int):
    """Reference-layout packed words -> TPU-native packed words."""
    codes = unpack_codes_ref(qweight_ref, bits, in_features)
    return pack_codes(codes, bits)


# ---------------------------------------------------------------------------
# Quantize / dequantize against per-channel LUTs
# ---------------------------------------------------------------------------


def assign_codes(weight: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """Nearest-centroid assignment.

    Args:
      weight: ``(out, in)`` float (torch W orientation).
      lut: ``(out, 2**bits)`` per-output-channel centroids.

    Returns:
      uint8 codes ``(out, in)``.

    Matches the reference's ``round_to_nearest_pole_sim`` semantics
    (quant.py:8-24): argmin of |w - c|, first-match tie-break.
    """
    d = np.abs(weight[:, :, None] - lut[:, None, :])  # (out, in, K)
    return np.argmin(d, axis=-1).astype(np.uint8)


def dequant_np(codes: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """codes ``(in, out)`` + lut ``(out, K)`` -> weights ``(in, out)`` f32."""
    return np.take_along_axis(lut.T, codes.astype(np.int64), axis=0).astype(
        np.float32
    )


def nearest_to_zero(lut_row: np.ndarray) -> float:
    """Centroid nearest zero — the dense dequant value at a zeroed slot."""
    return float(lut_row[np.argmin(np.abs(lut_row))])


# ---------------------------------------------------------------------------
# Sparse outlier sidecar
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class SparseCOO:
    """Flat COO over output rows, padded to a static nnz.

    rows/cols index (out, in) of the original torch-orientation W.
    Padding entries have ``vals == 0`` (rows/cols 0) and are harmless to a
    segment-sum / scatter-add accumulation.
    """

    rows: np.ndarray  # int32 (nnz_pad,)
    cols: np.ndarray  # int32 (nnz_pad,)
    vals: np.ndarray  # float32 (nnz_pad,)
    nnz: int
    out_features: int
    in_features: int

    @staticmethod
    def from_dense(
        outlier_matrix: np.ndarray, pad_to: Optional[int] = None, pad_multiple: int = 512
    ) -> "SparseCOO":
        """Build from a dense (out, in) matrix of outlier values (0 = absent)."""
        out_features, in_features = outlier_matrix.shape
        rows, cols = np.nonzero(outlier_matrix)
        order = np.lexsort((cols, rows))  # CSR order: sorted by row then col
        rows, cols = rows[order], cols[order]
        vals = outlier_matrix[rows, cols].astype(np.float32)
        nnz = len(vals)
        if pad_to is None:
            pad_to = max(pad_multiple, ((nnz + pad_multiple - 1) // pad_multiple) * pad_multiple)
        if pad_to < nnz:
            raise ValueError(f"pad_to={pad_to} < nnz={nnz}")
        pr = np.zeros(pad_to, dtype=np.int32)
        pc = np.zeros(pad_to, dtype=np.int32)
        pv = np.zeros(pad_to, dtype=np.float32)
        pr[:nnz], pc[:nnz], pv[:nnz] = rows, cols, vals
        return SparseCOO(pr, pc, pv, nnz, out_features, in_features)

    @staticmethod
    def from_csr(
        crow: np.ndarray,
        col: np.ndarray,
        val: np.ndarray,
        in_features: int,
        pad_multiple: int = 512,
    ) -> "SparseCOO":
        """From reference CSR buffers (quant.py:66-71)."""
        out_features = len(crow) - 1
        nnz = len(val)
        rows = np.repeat(
            np.arange(out_features, dtype=np.int32), np.diff(crow).astype(np.int64)
        )
        pad_to = max(pad_multiple, ((nnz + pad_multiple - 1) // pad_multiple) * pad_multiple)
        pr = np.zeros(pad_to, dtype=np.int32)
        pc = np.zeros(pad_to, dtype=np.int32)
        pv = np.zeros(pad_to, dtype=np.float32)
        pr[:nnz] = rows
        pc[:nnz] = np.asarray(col, dtype=np.int32)
        pv[:nnz] = np.asarray(val, dtype=np.float32)
        return SparseCOO(pr, pc, pv, nnz, out_features, in_features)

    def to_dense(self) -> np.ndarray:
        d = np.zeros((self.out_features, self.in_features), dtype=np.float32)
        n = self.nnz
        np.add.at(d, (self.rows[:n], self.cols[:n]), self.vals[:n])
        return d
