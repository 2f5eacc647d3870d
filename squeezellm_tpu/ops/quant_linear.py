"""QuantLinear: the functional TPU equivalent of the reference's
``QuantLinearLUT`` module (reference squeezellm/quant.py:28-383).

No module mutation: a quantized linear is a static :class:`QuantLinearSpec`
plus a params dict of arrays (a pytree leaf-group), applied with
:func:`quant_linear_apply`. Dispatch over (dense | +sparse | +hybrid) is
static — it is baked into the jitted graph, mirroring the reference's 12
fused CUDA entry points without runtime branching.

Params dict keys:
  qweight       int32 (n_words, out)      packed codes (formats.pack_codes)
  lut           f32   (out, 2**bits)      per-output-channel codebook
  bias          f32   (out,)              optional
  sp_rows/cols  int32 (nnz_pad,)          optional sparse sidecar (COO)
  sp_vals       f32   (nnz_pad,)
  topx_weights  f32   (in, topX)          optional hybrid dense channels
  topx_indices  int32 (topX,)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from squeezellm_tpu import formats


@dataclasses.dataclass(frozen=True)
class QuantLinearSpec:
    bits: int
    in_features: int
    out_features: int
    has_bias: bool = False
    nnz_pad: int = 0  # 0 => no sparse sidecar
    topx: int = 0  # 0 => no hybrid dense channels
    # two-hop-gather SpMV plan shape (ops/spmv.py); 0 => no plan. When
    # present, params also carry sg_meta/sg_vals (sg_rows, 128) and the TPU
    # decode path uses them instead of the COO scatter.
    sg_rows: int = 0
    sg_oh: int = 0
    sg_ih: int = 0
    # per-o-block plan rows (spmv.build_block_plans): params carry
    # sgb_meta/sgb_vals (n_ob, sgb_rows, 128) and GEMV-shaped calls fold
    # the sparse contribution INTO the lut kernel (no separate launch)
    sgb_rows: int = 0

    @property
    def include_sparse(self) -> bool:
        return self.nnz_pad > 0


def quant_linear_apply(spec: QuantLinearSpec, params, x, *,
                       backend: str = "auto", y0=None):
    """y = y0 + x @ dequant(qweight)^T-layout + sparse + hybrid + bias.

    Args:
      x: (..., in_features) array; accumulation is f32, output cast back to
        x.dtype (matching reference forward, quant.py:311).
      backend: 'auto' | 'xla' | 'pallas' | 'pallas-bf16'. 'auto' uses the
        fused Pallas kernel on TPU and XLA elsewhere. 'pallas-bf16' rounds
        the dequantized weights and activations to bf16 inside the kernel
        (single-gather dequant + native one-pass MXU — ~2x faster decode,
        ~1e-3 relative error).
      y0: optional (..., out_features) initializer (residual fold): the
        Pallas decode path initializes the kernel's output block from it
        (one fewer XLA add op per linear per step); other paths add it.
    """
    import jax.numpy as jnp

    from squeezellm_tpu.ops import xla_ops

    import jax

    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"

    in_dtype = x.dtype
    flat_b = int(np.prod(x.shape[:-1]))
    sparse_folded = False
    sgb_fused = False
    if backend.startswith("pallas"):
        from squeezellm_tpu.ops import pallas_ops

        # off-TPU the Pallas kernel only runs interpreted
        interpret = jax.default_backend() != "tpu"
        # large-batch path: fold the sparse sidecar INTO the dequant
        # scratch (one small scatter) so one matmul serves dense + sparse;
        # a separate materialize-then-matmul would double the MXU work.
        # SQUEEZELLM_SPARSE_FOLD_MIN (trace-time) lowers the engage point
        # for A/Bs of the 17..1023 band (scripts/band_probe.py): the
        # scratch path costs 2x weight-bytes of HBM but its sparse cost is
        # one batch-independent scatter, while the two-hop SpMV's VPU work
        # grows ~linearly with batch rows.
        import os as _os

        fold_min = int(_os.environ.get("SQUEEZELLM_SPARSE_FOLD_MIN",
                                       pallas_ops.BIG_BATCH))
        sparse_folded = (
            spec.include_sparse and spec.bits <= 4
            and flat_b >= min(fold_min, pallas_ops.BIG_BATCH)
        )
        mode = "bf16" if backend == "pallas-bf16" else "gather"
        use_qwt = flat_b <= 8 and spec.bits == 4 and "qweight_t" in params
        # GEMV/decode + serving pools: fold the sparse sidecar INTO the
        # lut kernel via the per-o-block plans (no separate SpMV launch,
        # no add op). Above SQUEEZELLM_SGB_MAX rows (default 16) the
        # unrolled per-row init stops paying; gather_spmv (batch as grid
        # dim) takes over. The env knob exists for pool-batch A/Bs (a
        # 32-slot serving step pays ~9.8 ms of separate gather_spmv
        # launches — round-5 profile). SGB_MAX=32 was tried on hardware:
        # numerically exact, but the 32-row unrolled two-hop init makes
        # the Mosaic compile run >45 min per linear shape — impractical;
        # 16 stays the bound.
        sgb_max = int(_os.environ.get("SQUEEZELLM_SGB_MAX", "16"))
        sgb_fused = (
            spec.include_sparse and spec.sgb_rows > 0 and flat_b <= sgb_max
            and not use_qwt and "sgb_meta" in params
        )
        if use_qwt:
            # 4-bit decode via the transposed wide-table lane-gather GEMV.
            # NOT attached by default on v5e (lane-dim dynamic_gather costs
            # ~8 VPU ops/vreg there, measured 2.7x slower than the sublane
            # hi/lo path) — a v6 byte-gather/lane-shuffle target. Activates
            # only when a loader explicitly attaches qweight_t/lut_w.
            y = pallas_ops.lut_matmul_t(
                x, params["qweight_t"], params["lut_w"], spec.bits,
                interpret=interpret, mode=mode,
            )
            if y0 is not None:
                y = y + y0.astype(jnp.float32)
        else:
            # bf16 decode: emit the output in bf16 straight from the kernel
            # (f32 scratch accumulation) so the downstream
            # `.astype(in_dtype)` is a no-op — removes one XLA convert op
            # per linear per step. Pre-rounded tables ('lut_t_bf16',
            # models/fuse) likewise skip the per-call round-trip convert.
            import os

            lut_t = params.get("lut_t")
            lut_t_rounded = False
            if (mode == "bf16" and "lut_t_bf16" in params
                    and os.environ.get("SQUEEZELLM_LUT_PREROUND", "1") == "1"):
                lut_t, lut_t_rounded = params["lut_t_bf16"], True
            # bf16 kernel output (SQUEEZELLM_BF16_OUT=1): measured a LOSS
            # on v5e (round 5: 5.33 vs 4.97 ms/tok at w3 flagship) — the
            # (1, o_blk) bf16 store is a partial-tile write and the f32
            # scratch adds a per-o-block copy, together costing more than
            # the per-linear XLA convert they remove. OFF by default.
            out_dtype = (jnp.bfloat16 if mode == "bf16" and flat_b <= 16
                         and x.dtype == jnp.bfloat16
                         and os.environ.get("SQUEEZELLM_BF16_OUT", "0") == "1"
                         else None)
            # structured additive codebook fast path (~4 VPU ops/weight;
            # attached by models/fuse when the lut decomposes) — GEMV and
            # serving-pool batches; the big-batch scratch path amortizes
            # dequant and keeps the generic table
            lut_t_struct = (
                params.get("lut_t_struct")
                if spec.bits == 4 and flat_b < pallas_ops.BIG_BATCH
                and os.environ.get("SQUEEZELLM_STRUCT", "1") == "1"
                else None)
            y = pallas_ops.lut_matmul(
                x, params["qweight"], params["lut"], spec.bits,
                interpret=interpret,
                mode=mode,
                big_batch=(min(fold_min, pallas_ops.BIG_BATCH)
                           if sparse_folded else pallas_ops.BIG_BATCH),
                lut_t=lut_t,
                lut_t_rounded=lut_t_rounded,
                sp_rows=params["sp_rows"] if sparse_folded else None,
                sp_cols=params["sp_cols"] if sparse_folded else None,
                sp_vals=params["sp_vals"] if sparse_folded else None,
                sgb_meta=params["sgb_meta"] if sgb_fused else None,
                sgb_vals=params["sgb_vals"] if sgb_fused else None,
                sgb_ih=spec.sg_ih if sgb_fused else 0,
                y0=y0,
                out_dtype=out_dtype,
                lut_t_struct=lut_t_struct,
                struct_variant=os.environ.get(
                    "SQUEEZELLM_STRUCT_VARIANT", "sel"),
            )
    else:
        y = xla_ops.lut_matmul(x, params["qweight"], params["lut"], spec.bits)
        if y0 is not None:
            y = y + y0.astype(jnp.float32)

    if spec.include_sparse and not sparse_folded and not sgb_fused:
        if spec.sg_rows > 0 and backend.startswith("pallas") and (
                flat_b < pallas_ops.BIG_BATCH):
            # two-hop-gather SpMV: ~100-1000x faster than the XLA scatter
            # on TPU at decode/serving batch sizes (batch = leading grid
            # dim); at BIG_BATCH and above the sidecar folds into the
            # dequant scratch instead, so every batch size has a
            # scatter-free sparse path

            interpret = jax.default_backend() != "tpu"
            sp = pallas_ops.gather_spmv(
                x.reshape(flat_b, spec.in_features), params["sg_meta"],
                params["sg_vals"], oh=spec.sg_oh,
                ih=spec.sg_ih, out_features=spec.out_features,
                interpret=interpret,
                groups=params.get("sg_groups"),
            )
            y = y + sp.reshape(*x.shape[:-1], spec.out_features)
        else:
            y = y + xla_ops.sparse_matmul(
                x, params["sp_rows"], params["sp_cols"], params["sp_vals"],
                spec.out_features,
            )
    if spec.topx > 0:
        # base=y: the scatter path adds the contribution in y's own dtype
        # (a bf16 decode output stays bf16 — no re-promotion to f32)
        y = xla_ops.hybrid_matmul(
            x, params["topx_weights"], params["topx_indices"],
            spec.out_features, topx_sel=params.get("topx_sel"),
            topx_idx_f=params.get("topx_idx_f"), base=y,
        )
    if spec.has_bias:
        y = y + params["bias"].astype(y.dtype)
    return y.astype(in_dtype)


# ---------------------------------------------------------------------------
# Offline packing (numpy) — the functional analogue of QuantLinearLUT.pack2
# (reference quant.py:97-208).
# ---------------------------------------------------------------------------


def pack_linear(
    weight: np.ndarray,
    lut: np.ndarray,
    labels: Optional[np.ndarray] = None,
    bias: Optional[np.ndarray] = None,
    outliers: Optional[np.ndarray] = None,
    bits: int = 4,
    nnz_pad_multiple: int = 512,
    topx_weights: Optional[np.ndarray] = None,
    topx_indices: Optional[np.ndarray] = None,
    build_spmv: bool = False,
):
    """Pack one linear layer into (spec, params-as-numpy).

    Args:
      weight: (out, in) dense weight with outlier slots already zeroed
        (as produced by the outlier-removal pass).
      lut: (out, 2**bits) per-channel centroids.
      labels: (out, in) k-means labels; if None, nearest-centroid assigned.
      outliers: optional (out, in) dense matrix of extracted outlier values.
        Stored with the zero-correction applied: each value becomes
        ``w - centroid_nearest_zero(channel)`` because the dense path
        dequantizes the zeroed slot to that centroid (quant.py:117-123).

    Returns:
      (QuantLinearSpec, dict of numpy arrays)
    """
    out_features, in_features = weight.shape
    assert lut.shape == (out_features, 2**bits), lut.shape
    if labels is None:
        labels = formats.assign_codes(weight, lut)
    params = {
        "qweight": formats.pack_codes(labels.T, bits),
        "lut": lut.astype(np.float32),
    }
    nnz_pad = 0
    if outliers is not None:
        corrected = np.asarray(outliers, dtype=np.float32).copy()
        zero_map = lut[
            np.arange(out_features), np.argmin(np.abs(lut), axis=1)
        ].astype(np.float32)  # centroid nearest 0, per channel
        nz = corrected != 0
        corrected[nz] -= np.broadcast_to(zero_map[:, None], corrected.shape)[nz]
        coo = formats.SparseCOO.from_dense(corrected, pad_multiple=nnz_pad_multiple)
        params["sp_rows"] = coo.rows
        params["sp_cols"] = coo.cols
        params["sp_vals"] = coo.vals
        nnz_pad = len(coo.vals)
    topx = 0
    if topx_weights is not None:
        assert topx_indices is not None
        params["topx_weights"] = topx_weights.astype(np.float32)
        params["topx_indices"] = topx_indices.astype(np.int32)
        topx = len(topx_indices)
    if bias is not None:
        params["bias"] = bias.astype(np.float32)
    spec = QuantLinearSpec(
        bits=bits,
        in_features=in_features,
        out_features=out_features,
        has_bias=bias is not None,
        nnz_pad=nnz_pad,
        topx=topx,
    )
    if build_spmv and nnz_pad:
        from squeezellm_tpu.ops import spmv

        spec, params = spmv.attach_plan(spec, params)
    return spec, params


def transposed_lut(lut: np.ndarray, bits: int) -> np.ndarray:
    """(out, 2**bits) -> (k_rows, out) gather-layout table, rows padded to
    the 8-sublane vreg height. Preparing this ONCE at engine init (params
    key 'lut_t') removes a transpose+pad fusion chain from every decode
    kernel call."""
    k_rows = max(8, 2**bits)
    t = np.asarray(lut, np.float32).T
    return np.pad(t, ((0, k_rows - t.shape[0]), (0, 0)))


def make_random_params(
    key,
    spec: QuantLinearSpec,
    lut_scale: float = 0.02,
    on_device: bool = True,
):
    """Random packed params with realistic LUT statistics (for benchmarks)."""
    import jax
    import jax.numpy as jnp

    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    nw = formats.n_words(spec.in_features, spec.bits)
    params = {
        "qweight": jax.random.randint(
            k1, (nw, spec.out_features), jnp.iinfo(jnp.int32).min,
            jnp.iinfo(jnp.int32).max, dtype=jnp.int32,
        ),
        "lut": jnp.sort(
            jax.random.normal(k2, (spec.out_features, 2**spec.bits)) * lut_scale,
            axis=1,
        ).astype(jnp.float32),
    }
    if spec.include_sparse:
        params["sp_rows"] = jax.random.randint(
            k3, (spec.nnz_pad,), 0, spec.out_features, dtype=jnp.int32
        )
        params["sp_cols"] = jax.random.randint(
            k4, (spec.nnz_pad,), 0, spec.in_features, dtype=jnp.int32
        )
        params["sp_vals"] = (
            jax.random.normal(k5, (spec.nnz_pad,)) * lut_scale * 4
        ).astype(jnp.float32)
        # keep COO sorted by row, CSR-order invariant
        order = jnp.argsort(params["sp_rows"])
        params["sp_rows"] = params["sp_rows"][order]
        params["sp_cols"] = params["sp_cols"][order]
    if spec.topx > 0:
        params["topx_weights"] = (
            jax.random.normal(k6, (spec.in_features, spec.topx)) * lut_scale
        ).astype(jnp.float32)
        params["topx_indices"] = jnp.arange(spec.topx, dtype=jnp.int32)
    if spec.has_bias:
        params["bias"] = jnp.zeros((spec.out_features,), jnp.float32)
    return params
