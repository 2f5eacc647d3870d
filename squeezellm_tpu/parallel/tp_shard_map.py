"""Explicit shard_map tensor parallelism for quantized models.

The GSPMD path (parallel/gspmd.py) lets XLA partition the XLA-backend graph,
but the fused Pallas LUT kernel (ops/pallas_ops.py) does not auto-partition
under GSPMD. This module implements Megatron-style TP explicitly: the packed
weights, LUTs, sparse sidecars and KV cache are resharded host-side into
per-device locals, and the decode/prefill steps run under ``jax.shard_map``
with `psum` / `all_gather` collectives placed by the model code
(models/llama.py, models/opt.py `axis_name=`). Every per-device matmul goes
through the normal quant_linear_apply, so the Pallas kernel runs unchanged
on each shard and the collectives ride ICI.

Sharding plan (mesh axis ``'tp'``):
  column-parallel (q,k,v,gate,up, lm_head): output channels split; each
      device holds qweight (nw, out/tp), lut (out/tp, K), its output-row
      slice of the sparse COO sidecar, and its topX channels.
  row-parallel (o,down): input dim split at CODE granularity — the packed
      words are unpacked, row-sliced and repacked per shard (the 3-bit
      10-codes/word layout does not align to arbitrary splits); LUT is
      replicated; partial outputs are psum-reduced. Row-parallel biases are
      pre-scaled by 1/tp so the psum reconstructs them exactly.
  sparse sidecars: entries are partitioned to the shard owning their output
      row (column-parallel) or input column (row-parallel), zero-padded to
      the max shard nnz — the static shape shard_map requires. This is the
      nnz-balance question from SURVEY §7 "hard parts" #6: padding cost is
      bounded by the worst shard.

All per-device arrays carry a leading ``tp`` axis (P('tp') in_specs);
replicated arrays carry none. Inside the shard_map body the leading
singleton axis is squeezed off.

The reference has no distributed execution at all (SURVEY §2.4); this is
new, TPU-first capability.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from squeezellm_tpu import formats
from squeezellm_tpu.models import common, registry
from squeezellm_tpu.models.common import LinearSpec

from squeezellm_tpu.parallel.gspmd import _COLUMN

AXIS = "tp"


def make_tp_mesh(tp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if len(devices) < tp:
        raise ValueError(f"need {tp} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:tp]), (AXIS,))


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _pad1(a: np.ndarray, n: int) -> np.ndarray:
    return np.pad(a, (0, n - a.shape[0]))


def _stack_spec(arr: np.ndarray) -> P:
    """P for a tp-stacked array: leading axis sharded, rest local."""
    return P(AXIS, *([None] * (arr.ndim - 1)))


def _repl_spec(arr) -> P:
    return P(*([None] * np.ndim(arr)))


def _split_sparse(rows, cols, vals, tp, *, by: str, size: int):
    """Partition COO entries into tp shards by output row ('row') or input
    col ('col'); rebase the split index; pad all shards to the max nnz.

    Padding entries have vals == 0 (scatter-add no-op)."""
    chunk = size // tp
    key = rows if by == "row" else cols
    live = vals != 0
    shards = []
    for s in range(tp):
        m = live & (key >= s * chunk) & (key < (s + 1) * chunk)
        r, c, v = rows[m], cols[m], vals[m]
        if by == "row":
            r = r - s * chunk
        else:
            c = c - s * chunk
        shards.append((r, c, v))
    nnz_max = max(8, _round_up(max(len(v) for _, _, v in shards), 8))
    R = np.stack([_pad1(r.astype(np.int32), nnz_max) for r, _, _ in shards])
    C = np.stack([_pad1(c.astype(np.int32), nnz_max) for _, c, _ in shards])
    V = np.stack([_pad1(v.astype(np.float32), nnz_max) for _, _, v in shards])
    return R, C, V, nnz_max


def _split_topx(weights, indices, tp, *, col: bool, out_features: int,
                in_features: int):
    """Partition the hybrid top-X dense channels.

    column-parallel: each shard keeps the channels whose (global) output index
    falls in its range, index rebased; padded with zero-weight channels.
    row-parallel: channel indices are global outputs (replicated); the (in,
    topX) weight rows are split by input shard; psum sums the partials."""
    if not col:
        in_l = in_features // tp
        W = np.stack([weights[s * in_l : (s + 1) * in_l] for s in range(tp)])
        return W, indices.astype(np.int32), indices.shape[0], False
    out_l = out_features // tp
    per = []
    for s in range(tp):
        m = (indices >= s * out_l) & (indices < (s + 1) * out_l)
        per.append((weights[:, m], indices[m] - s * out_l))
    topx_max = max(1, max(w.shape[1] for w, _ in per))
    W = np.stack([
        np.pad(w, ((0, 0), (0, topx_max - w.shape[1]))) for w, _ in per
    ]).astype(np.float32)
    I = np.stack([_pad1(i.astype(np.int32), topx_max) for _, i in per])
    return W, I, topx_max, True


def _shard_spmv(R, C, V, tp, out_l, in_l):
    """Per-shard spmv plans from the already-split COO (stacked rows/
    cols/vals). Plans are padded to the max row count so the stacked arrays
    are rectangular; dead rows route nothing."""
    from squeezellm_tpu.ops import spmv

    plans = [spmv.build_plan(R[s], C[s], V[s], out_l, in_l)
             for s in range(tp)]
    rmax = max(p.n_rows for p in plans)
    # all shards share (oh, ih) — same local (out, in)
    rmax = -(-rmax // plans[0].oh) * plans[0].oh

    def pad(a):
        return np.pad(a, ((0, rmax - a.shape[0]), (0, 0)))

    meta = np.stack([pad(p.meta) for p in plans])
    vals = np.stack([pad(p.vals) for p in plans])
    return meta, vals, rmax, plans[0].oh, plans[0].ih


def shard_linear(
    name: str, lspec: LinearSpec, params: dict, tp: int,
    build_spmv: bool = False,
) -> Tuple[LinearSpec, dict, dict]:
    """Reshard one linear into per-device locals.

    Returns (local LinearSpec, stacked/replicated numpy params, pspec tree).
    build_spmv: re-plan the sparse sidecar per shard so the TP decode
    keeps the gather-SpMV path (the vectorized planner is cheap offline).
    """
    col = name in _COLUMN or name == "lm_head"
    o, i = lspec.out_features, lspec.in_features
    if col and o % tp:
        raise ValueError(f"{name}: out {o} % tp {tp} != 0")
    if not col and i % tp:
        raise ValueError(f"{name}: in {i} % tp {tp} != 0")

    new_p, pspecs = {}, {}

    if not lspec.is_quant:
        w = np.asarray(params["w"])  # (out, in)
        if col:
            new_p["w"] = np.stack(np.split(w, tp, axis=0))
        else:
            new_p["w"] = np.stack(np.split(w, tp, axis=1))
        pspecs["w"] = _stack_spec(new_p["w"])
        if lspec.has_bias:
            b = np.asarray(params["b"])
            if col:
                new_p["b"] = np.stack(np.split(b, tp))
                pspecs["b"] = _stack_spec(new_p["b"])
            else:
                # psum over tp shards re-adds the bias tp times: pre-scale
                new_p["b"] = (b / tp).astype(b.dtype)
                pspecs["b"] = _repl_spec(b)
        local = dataclasses.replace(
            lspec,
            out_features=o // tp if col else o,
            in_features=i if col else i // tp,
        )
        return local, new_p, pspecs

    q = lspec.quant
    bits = q.bits
    from squeezellm_tpu.ops.quant_linear import transposed_lut

    if col:
        out_l = o // tp
        new_p["qweight"] = np.stack(
            np.split(np.asarray(params["qweight"]), tp, axis=1)
        )
        new_p["lut"] = np.stack(np.split(np.asarray(params["lut"]), tp, axis=0))
        pspecs["qweight"] = _stack_spec(new_p["qweight"])
        pspecs["lut"] = _stack_spec(new_p["lut"])
        # per-shard gather-layout LUTs: same decode fast path the
        # single-device engines get from fuse.attach_decode_luts
        new_p["lut_t"] = np.stack([transposed_lut(s, bits)
                                   for s in new_p["lut"]])
        pspecs["lut_t"] = _stack_spec(new_p["lut_t"])
        in_l = i
    else:
        in_l = i // tp
        # repack at code granularity: word boundaries don't align to splits
        codes = formats.unpack_codes(np.asarray(params["qweight"]), bits, i)
        new_p["qweight"] = np.stack([
            formats.pack_codes(codes[s * in_l : (s + 1) * in_l], bits)
            for s in range(tp)
        ])
        pspecs["qweight"] = _stack_spec(new_p["qweight"])
        new_p["lut"] = np.asarray(params["lut"])  # replicated
        pspecs["lut"] = _repl_spec(new_p["lut"])
        new_p["lut_t"] = transposed_lut(new_p["lut"], bits)
        pspecs["lut_t"] = _repl_spec(new_p["lut_t"])
        out_l = o

    nnz_max = 0
    sg_rows = sg_oh = sg_ih = 0
    if q.nnz_pad:
        R, C, V, nnz_max = _split_sparse(
            np.asarray(params["sp_rows"]), np.asarray(params["sp_cols"]),
            np.asarray(params["sp_vals"]), tp,
            by="row" if col else "col", size=o if col else i,
        )
        new_p.update(sp_rows=R, sp_cols=C, sp_vals=V)
        pspecs.update(sp_rows=_stack_spec(R), sp_cols=_stack_spec(C),
                      sp_vals=_stack_spec(V))
        if build_spmv:
            meta, svals, sg_rows, sg_oh, sg_ih = _shard_spmv(
                R, C, V, tp, out_l, in_l
            )
            new_p.update(sg_meta=meta, sg_vals=svals)
            pspecs.update(sg_meta=_stack_spec(meta),
                          sg_vals=_stack_spec(svals))

    topx_l = 0
    if q.topx:
        W, I, topx_l, i_stacked = _split_topx(
            np.asarray(params["topx_weights"]),
            np.asarray(params["topx_indices"]), tp,
            col=col, out_features=o, in_features=i,
        )
        new_p["topx_weights"] = W
        pspecs["topx_weights"] = _stack_spec(W)
        new_p["topx_indices"] = I
        pspecs["topx_indices"] = _stack_spec(I) if i_stacked else _repl_spec(I)

    if q.has_bias:
        b = np.asarray(params["bias"])
        if col:
            new_p["bias"] = np.stack(np.split(b, tp))
            pspecs["bias"] = _stack_spec(new_p["bias"])
        else:
            new_p["bias"] = (b / tp).astype(b.dtype)
            pspecs["bias"] = _repl_spec(b)

    # the full-matrix spmv plan never survives a split; per-shard plans
    # are rebuilt above when build_spmv is set
    q_local = dataclasses.replace(
        q,
        in_features=in_l,
        out_features=out_l,
        nnz_pad=nnz_max,
        topx=topx_l,
        sg_rows=sg_rows, sg_oh=sg_oh, sg_ih=sg_ih,
    )
    local = dataclasses.replace(
        lspec, in_features=in_l, out_features=out_l, quant=q_local
    )
    return local, new_p, pspecs


def shard_model_params(model_type: str, config, specs, params, tp: int,
                       build_spmv: bool = False):
    """Reshard a full (specs, params) tree for tp-way shard_map TP.

    Returns (local_specs, stacked_params, pspecs) — stacked_params/pspecs are
    parallel pytrees; device_put with `put_params` before use.
    build_spmv: rebuild per-shard spmv plans for the sparse
    sidecars so TP decode keeps the fast SpMV path.
    """
    module_names = set(registry.get_module_names(model_type))

    def repl(tree):
        return (jax.tree.map(np.asarray, tree),
                jax.tree.map(_repl_spec, tree))

    new_params, pspecs = {}, {}
    for k, v in params.items():
        if k == "layers":
            continue
        if k == "lm_head":
            lh_spec, new_params[k], pspecs[k] = shard_linear(
                "lm_head", specs["lm_head"], v, tp
            )
        else:
            new_params[k], pspecs[k] = repl(v)

    spec_layers = []
    p_layers, s_layers = [], []
    for spec_d, param_d in zip(specs["layers"], params["layers"]):
        new_d, ps_d, spec_new = {}, {}, {}
        for name, v in param_d.items():
            if name in module_names:
                spec_new[name], new_d[name], ps_d[name] = shard_linear(
                    name, spec_d[name], v, tp,
                    build_spmv=build_spmv,
                )
            else:
                new_d[name], ps_d[name] = repl(v)
        for name in spec_d:
            if name not in spec_new:
                spec_new[name] = spec_d[name]
        spec_layers.append(spec_new)
        p_layers.append(new_d)
        s_layers.append(ps_d)
    new_params["layers"] = p_layers
    pspecs["layers"] = s_layers

    local_specs = {"layers": tuple(spec_layers), "lm_head": lh_spec}
    return local_specs, new_params, pspecs


def put_params(params, pspecs, mesh: Mesh):
    """device_put the stacked params with their NamedShardings."""
    return jax.tree.map(
        lambda x, s: jax.device_put(jnp.asarray(x), NamedSharding(mesh, s)),
        params, pspecs,
    )


def _unstack(params, pspecs):
    """Inside shard_map: drop the leading singleton shard axis of stacked
    leaves (their pspec leads with the tp axis)."""
    def f(x, s):
        if len(s) > 0 and s[0] == AXIS:
            return jnp.squeeze(x, axis=0)
        return x

    return jax.tree.map(f, params, pspecs)


def cache_pspecs(n_layers: int):
    """Token-major KV cache (B, S, H_kv*D) sharded over the head-flat
    last axis — a contiguous KV/t lane block per shard IS that shard's
    kv-head group, so the per-shard fused decode kernel sees a normal
    (B, S, KV_local) cache."""
    return [{"k": P(None, None, AXIS), "v": P(None, None, AXIS)}
            for _ in range(n_layers)]


def init_tp_cache(config, mesh: Mesh, batch: int = 1, max_seq=None,
                  dtype=jnp.float32):
    # token axis rounded to 16 like the single-device engines: keeps the
    # fused decode attention kernel's tile-aligned chunking engaged
    s = -(-(max_seq or config.max_seq) // 16) * 16
    cache = common.init_kv_cache(
        batch, s, config.n_layers, config.n_kv_heads,
        config.head_dim, dtype,
    )
    cs = cache_pspecs(config.n_layers)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), cache, cs
    )


def make_tp_step_fns(model_type: str, config, local_specs, pspecs, mesh: Mesh,
                     *, backend: str = "auto", dtype=jnp.float32):
    """Build jitted shard_map (prefill, decode) functions.

    prefill(params, tokens (B,S), cache) -> (logits (B,1,V), cache)
    decode(params, token (B,1), pos scalar, cache) -> (logits, cache)
    """
    mod = registry.get_model_module(model_type)
    cspec = cache_pspecs(config.n_layers)
    rep3 = P(None, None, None)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(pspecs, P(None, None), cspec),
             out_specs=(rep3, cspec), check_vma=False)
    def prefill(params, tokens, cache):
        p = _unstack(params, pspecs)
        return mod.prefill(config, local_specs, p, tokens, cache,
                           backend=backend, dtype=dtype, axis_name=AXIS)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(pspecs, P(None, None), P(), cspec),
             out_specs=(rep3, cspec), check_vma=False)
    def decode(params, token, pos, cache):
        p = _unstack(params, pspecs)
        return mod.decode_step(config, local_specs, p, token, pos, cache,
                               backend=backend, dtype=dtype, axis_name=AXIS)

    return (jax.jit(prefill, donate_argnums=(2,)),
            jax.jit(decode, donate_argnums=(3,)))


def make_tp_serving_fns(model_type: str, config, local_specs, pspecs,
                        mesh: Mesh, *, backend: str = "auto",
                        dtype=jnp.float32, seed: int = 0):
    """Jitted shard_map functions for the TP continuous-batching engine
    (serving.TPContinuousBatchEngine):

    prefill(params, tokens (B,S), cache) -> (logits (B,S?,V), cache)
    decode_adv[sampled](params, token (B,1), pos (B,), cache,
                        temp, topk, topp, rids) -> (nxt (B,), pos+1, cache)

    decode_adv advances token/pos ON DEVICE so windows chain k dispatches
    back-to-back with cache donation (the dense engine's chained-window
    pattern); `sampled` selects the greedy or per-slot-sampling trace.
    """
    from squeezellm_tpu import sampling as sampling_mod

    mod = registry.get_model_module(model_type)
    cspec = cache_pspecs(config.n_layers)
    rep = P(None)
    rep3 = P(None, None, None)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(pspecs, P(None, None), cspec),
             out_specs=(rep3, cspec), check_vma=False)
    def prefill(params, tokens, cache):
        p = _unstack(params, pspecs)
        return mod.prefill(config, local_specs, p, tokens, cache,
                           backend=backend, dtype=dtype, axis_name=AXIS)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(pspecs, P(None, None), cspec, P()),
             out_specs=(rep3, cspec), check_vma=False)
    def prefill_cont(params, tokens, cache, start):
        # continuation prefill into a staging cache holding rows
        # [0, start) — the chunked-admission workhorse (serving.py
        # ContinuousBatchEngine._advance_prefill)
        p = _unstack(params, pspecs)
        return mod.prefill(config, local_specs, p, tokens, cache,
                           backend=backend, dtype=dtype, axis_name=AXIS,
                           start=start)

    def _adv(sampled):
        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(pspecs, P(None, None), rep, cspec,
                           rep, rep, rep, rep),
                 out_specs=(rep, rep, cspec), check_vma=False)
        def decode_adv(params, token, pos, cache, temp, topk, topp, rids):
            p = _unstack(params, pspecs)
            logits, nc = mod.decode_step(config, local_specs, p, token, pos,
                                         cache, backend=backend, dtype=dtype,
                                         axis_name=AXIS)
            if sampled:
                nxt = sampling_mod.sample_tokens(
                    logits[:, -1].astype(jnp.float32), temp, topk, topp,
                    rids, pos, seed)
            else:
                nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return nxt, pos + 1, nc

        return jax.jit(decode_adv, donate_argnums=(3,))

    return (jax.jit(prefill), {False: _adv(False), True: _adv(True)},
            jax.jit(prefill_cont, donate_argnums=(2,)))


def pool_pspecs(n_layers: int, quantized: bool = False):
    """Token-major paged KV pools (P_pages, ps, H_kv*D) sharded over the
    head-flat last axis (a contiguous KV/t block per shard = its head
    group). `quantized`: int8 pools carry head-major (P_pages, HkvP, ps)
    f32 scale sidecars (ops/kv_quant.py; HkvP = head_rows(Hkv, tp), so
    every shard's row slice is whole f32 tiles), sharded over rows."""
    one = {"pk": P(None, None, AXIS), "pv": P(None, None, AXIS)}
    if quantized:
        one = dict(one, sk=P(None, AXIS, None),
                   sv=P(None, AXIS, None))
    return [dict(one) for _ in range(n_layers)]


def make_tp_paged_fns(model_type: str, config, local_specs, pspecs,
                      mesh: Mesh, *, ps: int, max_seq: int,
                      backend: str = "auto", dtype=jnp.float32,
                      seed: int = 0, quantized: bool = False):
    """Jitted shard_map functions for the TP paged engine
    (serving.TPPagedContinuousBatchEngine) — identical call signatures
    to the single-device paged engine's jitted closures, with the page
    pools and dense admission cache sharded over kv heads (all paged
    ops are head-local; the only collectives are the model's two psums
    per layer and the lm_head reduce).
    """
    from squeezellm_tpu import sampling as sampling_mod
    from squeezellm_tpu import serving as serving_mod

    mod = registry.get_model_module(model_type)
    plspec = pool_pspecs(config.n_layers, quantized)
    cspec = cache_pspecs(config.n_layers)
    rep = P(None)
    rep2 = P(None, None)
    rep3 = P(None, None, None)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(pspecs, rep2, cspec, P()),
             out_specs=(rep3, cspec), check_vma=False)
    def prefill(params, tokens, cache, start):
        p = _unstack(params, pspecs)
        return mod.prefill(config, local_specs, p, tokens, cache,
                           backend=backend, dtype=dtype, axis_name=AXIS,
                           start=start)

    def _adv(sampled):
        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(pspecs, rep2, rep, plspec, rep2,
                           rep, rep, rep, rep),
                 out_specs=(rep, rep, plspec), check_vma=False)
        def decode_adv(params, token, pos, caches, pt, temp, topk, topp,
                       rids):
            p = _unstack(params, pspecs)
            c2 = [dict(c, pt=pt) for c in caches]
            logits, nc = mod.decode_step(config, local_specs, p, token, pos,
                                         c2, backend=backend, dtype=dtype,
                                         axis_name=AXIS)
            nc = [{k: v for k, v in c.items() if k != "pt"} for c in nc]
            if sampled:
                nxt = sampling_mod.sample_tokens(
                    logits[:, -1].astype(jnp.float32), temp, topk, topp,
                    rids, jnp.maximum(pos, 0), seed)
            else:
                nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            p2 = jnp.where(pos < 0, pos, pos + 1)
            return nxt, p2, nc

        return jax.jit(decode_adv, donate_argnums=(3,))

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(plspec, cspec, rep), out_specs=cspec,
             check_vma=False)
    def prime_dense(pools, dense, pids):
        return serving_mod._prime_dense_impl(
            pools, dense, pids, ps=ps, max_seq=max_seq,
            n_kv_heads=config.n_kv_heads // mesh.devices.size)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(plspec, cspec, rep, P(), P()), out_specs=plspec,
             check_vma=False)
    def scatter_all(pools, dense, pids, first_page, cnt):
        return serving_mod._scatter_all_impl(
            pools, dense, pids, first_page, cnt, ps=ps,
            n_kv_heads=config.n_kv_heads // mesh.devices.size)

    def make_spec_fn(draft_len, ngram):
        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(pspecs, rep2, rep2, rep, plspec, rep2),
                 out_specs=(rep2, rep, rep2, rep2, plspec), check_vma=False)
        def spec_window(params, ctx, cur, pos, caches, pt):
            p = _unstack(params, pspecs)
            draft = serving_mod._prompt_lookup_draft(ctx, pos, draft_len,
                                                     ngram)
            window = jnp.concatenate([cur, draft], axis=1)
            c2 = [dict(c, pt=pt) for c in caches]
            logits, nc = mod.verify_window(config, local_specs, p, window,
                                           pos, c2, backend=backend,
                                           dtype=dtype, axis_name=AXIS)
            nc = [{k: v for k, v in c.items() if k != "pt"} for c in nc]
            emit, n_acc, cur2, ctx = serving_mod._accept_drafts(
                logits, draft, ctx, pos)
            return emit, n_acc, cur2, ctx, nc

        return jax.jit(spec_window, donate_argnums=(4,))

    return {
        "prefill": jax.jit(prefill),
        "adv": {False: _adv(False), True: _adv(True)},
        "prime": jax.jit(prime_dense, donate_argnums=(1,)),
        "scatter": jax.jit(scatter_all, donate_argnums=(0,)),
        "make_spec": make_spec_fn,
    }


def make_tp_spec_window_fn(model_type: str, config, local_specs, pspecs,
                           mesh: Mesh, draft_len: int, ngram: int, *,
                           backend: str = "auto", dtype=jnp.float32):
    """Slot-batched prompt-lookup speculative window under shard_map TP:
    drafts/acceptance run replicated, the verify forward is the sharded
    verify_window (serving._prompt_lookup_draft/_accept_drafts parity)."""
    from squeezellm_tpu import serving as serving_mod

    mod = registry.get_model_module(model_type)
    cspec = cache_pspecs(config.n_layers)
    rep = P(None)
    rep2 = P(None, None)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(pspecs, rep2, rep2, rep, cspec),
             out_specs=(rep2, rep, rep2, rep2, cspec), check_vma=False)
    def spec_window(params, ctx, cur, pos, cache):
        p = _unstack(params, pspecs)
        draft = serving_mod._prompt_lookup_draft(ctx, pos, draft_len, ngram)
        window = jnp.concatenate([cur, draft], axis=1)
        logits, cache = mod.verify_window(config, local_specs, p, window,
                                          pos, cache, backend=backend,
                                          dtype=dtype, axis_name=AXIS)
        emit, n_acc, cur2, ctx = serving_mod._accept_drafts(
            logits, draft, ctx, pos)
        return emit, n_acc, cur2, ctx, cache

    return jax.jit(spec_window, donate_argnums=(4,))
