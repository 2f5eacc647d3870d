"""Pure-XLA implementations of the LUT-dequant matmul family.

These are the semantic reference for the fused Pallas kernels
(ops/pallas_ops.py) and the fallback path on CPU. Functionally equivalent
to the reference CUDA ops (quant_cuda_kernel.cu:132-738):

  dense       y = x @ dequant(qweight, lut)                (+ bias)
  +sparse     y += sparse-outlier contribution (COO)       [N5/N6 SpMV]
  +hybrid     y[topx_idx] += x @ topx_weights              [N7/N8, additive]

Everything is jittable, statically shaped, and fuses under XLA. The gather
`lut[o, code]` is expressed as take_along_axis which XLA lowers to a
dynamic-gather; on TPU the Pallas path replaces it with an in-VMEM
select-tree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from squeezellm_tpu import formats


def dequantize(qweight, lut, bits: int, in_features: int):
    """Packed words + per-channel LUT -> dense weights ``(in, out)`` f32."""
    codes = formats.unpack_codes_jnp(qweight, bits, in_features)  # (in, out)
    # W[i, o] = lut[o, codes[i, o]]
    return jnp.take_along_axis(lut, codes.T, axis=1).T.astype(jnp.float32)


def lut_matmul(x, qweight, lut, bits: int):
    """Dense LUT matmul: ``x (..., in) -> (..., out)`` in f32 accumulation."""
    in_features = x.shape[-1]
    w = dequantize(qweight, lut, bits, in_features)
    return jnp.matmul(x.astype(jnp.float32), w, preferred_element_type=jnp.float32)


def sparse_matmul(x, sp_rows, sp_cols, sp_vals, out_features: int):
    """Sparse-outlier contribution: ``y[..., r] += v * x[..., c]``.

    COO entries are zero-padded (vals == 0) so padding is a no-op.
    Deterministic on TPU (no atomics), replacing the reference's atomicAdd
    CSR SpMV (quant_cuda_kernel.cu:1040-1089).

    Two regimes: small batch scatters per-row contributions; large batch
    (eval/prefill strides) materializes the sparse matrix ONCE with a single
    scatter and rides the MXU — the per-row scatter would otherwise gather+
    scatter batch * nnz elements through TPU XLA's near-serial engine
    (~100 ms per linear at 2048 x 200k).
    """
    import numpy as np

    flat_b = int(np.prod(x.shape[:-1]))
    if flat_b > 16:
        w = jnp.zeros((x.shape[-1], out_features), jnp.float32)
        w = w.at[sp_cols, sp_rows].add(sp_vals.astype(jnp.float32))
        # f32 activations (exact eval): HIGHEST, or the MXU truncates the
        # outlier values to bf16 (2.4e-3 relerr) — the sidecar exists to be
        # an exact correction. bf16 activations: one pass is already the
        # operating precision.
        prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        return jnp.matmul(x.astype(jnp.float32), w,
                          preferred_element_type=jnp.float32, precision=prec)
    contrib = x[..., sp_cols].astype(jnp.float32) * sp_vals  # (..., nnz)
    y = jnp.zeros(x.shape[:-1] + (out_features,), dtype=jnp.float32)
    return y.at[..., sp_rows].add(contrib, indices_are_sorted=False)


def hybrid_matmul(x, topx_weights, topx_indices, out_features: int,
                  topx_sel=None, topx_idx_f=None, base=None):
    """Top-X dense-channel contribution (additive, matching atomicAdd
    semantics of DenseMatVecKernel, quant_cuda_kernel.cu:1091-1123).

    Scatter-free: the (..., topX) partials are placed into the output with
    a one-hot ``(topX, out)`` matmul instead of ``y.at[idx].add`` — XLA
    scatter is near-serial on TPU and every published sq-* sparse
    checkpoint carries topX=10, so a scatter here would tax each linear of
    every decode step. One-hot placement is exact: each output column of
    the selector has at most one nonzero, so the dot sums a single product
    (HIGHEST keeps the f32 value unrounded on the MXU).

    Placement strategy (SQUEEZELLM_TOPX_MODE, trace-time like the other
    A/B env gates; default 'auto'):
      'auto'     scatter at GEMV/serving batch (<= 16 rows), one-hot
        matmul above. Measured on v5e (scripts/topx_probe.py, w3
        flagship): every one-hot variant loses ~0.45 ms/step to the
        scatter at decode — the in-graph compare makes XLA copy each
        tiny s32 index array into SCALAR memory every dispatch
        (~9 us/copy, copy-done s32[10|30]{S(1)} in the trace), while a
        <=30-element scatter is near-free. At eval-stride batches the
        MXU placement matmul amortizes and scatter's near-serial row
        loop does not.
      'onehot'   in-graph iota+compare on the s32 indices.
      'onehot-f' same compare against an f32 copy of the indices
        ('topx_idx_f', attached by models/fuse.attach_decode_luts) — f32
        operands take the vector-memory path (~0.08 ms/step cheaper).
      'sel'      precomputed f32 selector ('topx_sel').
      'scatter'  y.at[idx].add for every batch size.

    base: optional accumulator the contribution is added to IN ITS OWN
    dtype (y = base + hybrid) — scattering straight into a bf16 decode
    output avoids re-promoting it to f32 (which would resurrect the
    per-layer convert op the bf16 kernel output exists to remove).
    """
    import os

    import numpy as np

    # topx_weights: (in, topX)
    part = jnp.matmul(
        x.astype(jnp.float32), topx_weights, preferred_element_type=jnp.float32
    )  # (..., topX)
    mode = os.environ.get("SQUEEZELLM_TOPX_MODE", "auto")
    if mode == "auto":
        flat_b = int(np.prod(x.shape[:-1]))
        mode = "scatter" if flat_b <= 16 else "onehot"
    sel = topx_sel
    if sel is None and mode == "scatter":
        y = (base if base is not None
             else jnp.zeros(x.shape[:-1] + (out_features,), jnp.float32))
        return y.at[..., topx_indices].add(part.astype(y.dtype))
    if sel is None and mode == "onehot-f" and topx_idx_f is not None:
        sel = (
            topx_idx_f[:, None]
            == jax.lax.broadcasted_iota(jnp.float32, (1, out_features), 1)
        ).astype(jnp.float32)
    if sel is None:
        sel = (
            topx_indices[:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (1, out_features), 1)
        ).astype(jnp.float32)  # (topX, out)
    if sel.dtype == jnp.bfloat16:
        # bf16 selector: one MXU pass, part rounded to bf16 — the same
        # numeric regime as the pallas-bf16 decode path
        y = jnp.matmul(part.astype(jnp.bfloat16), sel,
                       preferred_element_type=jnp.float32)
    else:
        y = jnp.matmul(part, sel, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    if base is not None:
        return base + y.astype(base.dtype)
    return y
