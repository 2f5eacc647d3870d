"""Decode-time module fusion: concatenate q|k|v and gate|up along output
channels into single quantized linears.

Batch-1 decode is launch- and lane-bound: 7 kernel calls per layer each pay
an activation relayout and run with a modest lane dim. q,k,v (and gate,up)
share the same input activation, so their packed weights concatenate along
the output axis for free — 7 calls/layer become 4, and the fused lane dims
(e.g. 4096 -> 12288, 4096 -> 22016) keep the VPU/MXU busier per call.

The reference has no analogue (its CUDA GEMVs launch per-module); this is a
TPU-side optimization applied at load time. Fused params are a pure data
transform; sparse sidecars are re-planned for the fused matrix with the
spmv planner.

Note: apply BEFORE sharding only on a single chip. Under tensor parallelism
fuse the per-device locals instead (a fused column split would interleave
q/k/v channels across shards).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List

import numpy as np

from squeezellm_tpu.models.common import LinearSpec
from squeezellm_tpu.ops.quant_linear import QuantLinearSpec

_FUSE_GROUPS = {
    "llama": [("qkv", ("q", "k", "v")), ("gateup", ("gate", "up"))],
    "opt": [("qkv", ("q", "k", "v"))],
}


def _fusable(specs: Dict[str, LinearSpec], names) -> bool:
    ls = [specs.get(n) for n in names]
    if any(l is None or not l.is_quant for l in ls):
        return False
    q0 = ls[0].quant
    return all(
        l.quant.bits == q0.bits
        and l.in_features == ls[0].in_features
        for l in ls
    )


def _fuse_linears(names, specs, params, build_spmv=True):
    """Concatenate quantized linears along the output dim."""
    ls = [specs[n] for n in names]
    ps = [params[n] for n in names]
    outs = [l.out_features for l in ls]
    offsets = np.cumsum([0] + outs)
    bits = ls[0].quant.bits
    in_f = ls[0].in_features
    out_f = int(offsets[-1])

    new_p = {
        "qweight": np.concatenate(
            [np.asarray(p["qweight"]) for p in ps], axis=1
        ),
        "lut": np.concatenate([np.asarray(p["lut"]) for p in ps], axis=0),
    }
    has_bias = any(l.quant.has_bias for l in ls)
    if has_bias:
        new_p["bias"] = np.concatenate([
            np.asarray(p["bias"]) if l.quant.has_bias
            else np.zeros(l.out_features, np.float32)
            for l, p in zip(ls, ps)
        ])
    nnz_pad = 0
    if any(l.quant.nnz_pad for l in ls):
        rows, cols, vals = [], [], []
        for off, l, p in zip(offsets, ls, ps):
            if not l.quant.nnz_pad:
                continue
            r = np.asarray(p["sp_rows"])
            v = np.asarray(p["sp_vals"])
            live = v != 0
            rows.append(r[live] + off)
            cols.append(np.asarray(p["sp_cols"])[live])
            vals.append(v[live])
        rows = np.concatenate(rows)
        cols = np.concatenate(cols)
        vals = np.concatenate(vals)
        nnz_pad = max(8, -(-len(vals) // 8) * 8)
        new_p["sp_rows"] = np.pad(rows.astype(np.int32), (0, nnz_pad - len(rows)))
        new_p["sp_cols"] = np.pad(cols.astype(np.int32), (0, nnz_pad - len(cols)))
        new_p["sp_vals"] = np.pad(vals.astype(np.float32), (0, nnz_pad - len(vals)))

    topx_tot = 0
    if any(l.quant.topx for l in ls):
        # hybrid top-X channels fuse too: indices move to the fused
        # output space (offset per member), weights concatenate along the
        # channel axis — one hybrid_matmul per fused linear instead of
        # one per member (each costs ~3 small XLA ops per decode step)
        ws, idxs = [], []
        for off, l, p in zip(offsets, ls, ps):
            if not l.quant.topx:
                continue
            ws.append(np.asarray(p["topx_weights"]))
            idxs.append(np.asarray(p["topx_indices"]) + off)
        new_p["topx_weights"] = np.concatenate(ws, axis=1)
        new_p["topx_indices"] = np.concatenate(idxs).astype(np.int32)
        topx_tot = int(new_p["topx_indices"].shape[0])

    qspec = QuantLinearSpec(
        bits=bits, in_features=in_f, out_features=out_f,
        has_bias=has_bias, nnz_pad=nnz_pad, topx=topx_tot,
    )
    spec = LinearSpec(in_features=in_f, out_features=out_f,
                      has_bias=has_bias, quant=qspec)
    if nnz_pad and build_spmv:
        from squeezellm_tpu.ops import spmv

        qspec, new_p = spmv.attach_plan(qspec, new_p)
        spec = dataclasses.replace(spec, quant=qspec)
    return spec, new_p


def fuse_for_decode(model_type: str, specs, params, build_spmv=True):
    """Returns (fused_specs, fused_params). Unfusable layers pass through."""
    groups = _FUSE_GROUPS.get(model_type if model_type in _FUSE_GROUPS
                              else "llama", [])
    spec_layers: List[dict] = []
    param_layers: List[dict] = []
    memo: dict = {}  # layers sharing the same arrays (synthetic benchmarks)
    for spec_d, param_d in zip(specs["layers"], params["layers"]):
        sd, pd = dict(spec_d), dict(param_d)
        for fused_name, names in groups:
            if not _fusable(sd, names):
                continue
            key = tuple(id(v) for n in names for v in
                        (pd[n]["qweight"], pd[n]["lut"]))
            if key in memo:
                fspec, fp = memo[key]
            else:
                fspec, fp = _fuse_linears(names, sd, pd, build_spmv)
                memo[key] = (fspec, fp)
            for n in names:
                del sd[n], pd[n]
            sd[fused_name] = fspec
            pd[fused_name] = fp
        spec_layers.append(sd)
        param_layers.append(pd)
    new_specs = dict(specs)
    new_specs["layers"] = tuple(spec_layers)
    new_params = dict(params)
    new_params["layers"] = param_layers
    return attach_decode_luts(new_specs, new_params)


def attach_decode_luts(specs, params, transposed: bool = False):
    """Add decode-path derived buffers to every quantized linear
    (idempotent; numpy-side, deduplicated for array-sharing synthetic
    models):

    * 'lut_t' — gather-layout LUT (removes a per-call transpose+pad)
    * 'sgb_meta'/'sgb_vals' — per-o-block SpMV plans
      (spmv.build_block_plans) for sparse linears: GEMV-shaped decode
      calls fold the sparse sidecar INTO the lut kernel (one launch per
      linear instead of lut + spmv + add)
    * with ``transposed=True``, 4-bit linears also get 'qweight_t'/'lut_w'
      (transposed packed words + wide replicated table) and route through
      `pallas_ops.lut_matmul_t`. OFF by default: on v5e the lane-dim
      dynamic_gather it relies on costs ~8 VPU ops/vreg (measured 2.7x
      slower than the sublane hi/lo path); it is a v6 target.
    """
    from squeezellm_tpu.ops import spmv
    from squeezellm_tpu.ops.pallas_ops import wide_lut
    from squeezellm_tpu.ops.quant_linear import transposed_lut

    memo: dict = {}
    bmemo: dict = {}
    spec_layers: List[dict] = []
    param_layers = []
    for spec_d, param_d in zip(specs["layers"], params["layers"]):
        sd = dict(spec_d)
        pd = dict(param_d)
        for name, ls in spec_d.items():
            q = getattr(ls, "quant", None)
            if q is None or q.bits > 4:
                continue
            lut = pd[name]["lut"]
            if getattr(lut, "ndim", 2) != 2:  # tp-stacked locals: skip
                continue
            if "lut_t" not in pd[name]:
                key = (id(lut), id(pd[name]["qweight"]))
                if key not in memo:
                    import ml_dtypes

                    extra = {"lut_t": transposed_lut(np.asarray(lut), q.bits)}
                    # bf16-representable copy: the pallas-bf16 decode path
                    # otherwise round-trips the table through bf16 on every
                    # call (~0.12 ms/step at 7B across 129 linears)
                    extra["lut_t_bf16"] = (
                        extra["lut_t"].astype(ml_dtypes.bfloat16)
                        .astype(np.float32))
                    if q.bits == 4:
                        # STRUCTURED codebook (quantize.kmeans.
                        # fit_structured_luts): if the 16-entry table is
                        # additively decomposable, attach the fast-dequant
                        # table (rows 0-7 A^T, row 8 d/8) — the kernel then
                        # needs ONE gather + a bit-3 mask per weight
                        # (~4 VPU ops) instead of two gathers + select (~6)
                        from squeezellm_tpu.quantize.kmeans import (
                            structured_decomposition,
                        )

                        dec = structured_decomposition(np.asarray(lut))
                        if dec is not None:
                            A, d = dec
                            st = np.zeros((16, A.shape[0]), np.float32)
                            st[0:8] = A.T
                            st[8] = d / 8.0
                            extra["lut_t_struct"] = st
                    if transposed and q.bits == 4:
                        qw = np.asarray(pd[name]["qweight"])
                        extra["qweight_t"] = np.ascontiguousarray(qw.T)
                        extra["lut_w"] = wide_lut(np.asarray(lut), q.bits)
                    memo[key] = extra
                pd[name] = dict(pd[name], **memo[key])
            # NOTE: a precomputed f32 one-hot 'topx_sel' (hybrid_matmul's
            # optional operand) was measured SLOWER than the in-graph
            # iota+compare on v5e at w4 (-2.3% flagship): a materialized
            # selector pays ~1.5 MB of HBM reads per fused linear per
            # step. But the round-5 w3 profile showed the s32 indices
            # being copied to scalar memory at ~9 us per dispatch, so an
            # f32 index copy is attached for the 'onehot-f' mode (64
            # bytes; vector-memory path), and SQUEEZELLM_TOPX_MODE=sel[-bf16]
            # attaches the materialized selector for A/Bs.
            if q.topx and "topx_idx_f" not in pd[name]:
                tkey = ("topx", id(pd[name]["topx_indices"]), q.out_features)
                if tkey not in memo:
                    idx = np.asarray(pd[name]["topx_indices"])
                    extra = {"topx_idx_f": idx.astype(np.float32)}
                    tmode = os.environ.get("SQUEEZELLM_TOPX_MODE", "")
                    if tmode in ("sel", "sel-bf16"):
                        sel = np.zeros((q.topx, q.out_features), np.float32)
                        sel[np.arange(q.topx), idx] = 1.0
                        if tmode == "sel-bf16":
                            import ml_dtypes

                            sel = sel.astype(ml_dtypes.bfloat16)
                        extra["topx_sel"] = sel
                    memo[tkey] = extra
                pd[name] = dict(pd[name], **memo[tkey])
            if (q.nnz_pad and q.sgb_rows == 0 and "sp_rows" in pd[name]
                    and "sgb_meta" not in pd[name]):
                bkey = (id(pd[name]["sp_rows"]), id(pd[name]["sp_vals"]))
                if bkey not in bmemo:
                    bmemo[bkey] = spmv.build_block_plans(
                        np.asarray(pd[name]["sp_rows"]),
                        np.asarray(pd[name]["sp_cols"]),
                        np.asarray(pd[name]["sp_vals"]),
                        q.out_features, q.in_features)
                bmeta, bvals, ih = bmemo[bkey]
                pd[name] = dict(pd[name], sgb_meta=bmeta, sgb_vals=bvals)
                q = dataclasses.replace(
                    q, sgb_rows=bmeta.shape[1],
                    sg_ih=q.sg_ih or ih)
                sd[name] = dataclasses.replace(ls, quant=q)
        spec_layers.append(sd)
        param_layers.append(pd)
    new_specs = dict(specs)
    new_specs["layers"] = tuple(spec_layers)
    new_params = dict(params)
    new_params["layers"] = param_layers
    return new_specs, new_params
