"""Two-hop-gather sparse matvec: TPU-native unstructured SpMV.

The reference applies sparse outliers with an atomicAdd CSR SpMV
(reference squeezellm/quant_cuda_kernel.cu:1040-1089). XLA lowers
scatter/gather on TPU to a near-serial engine (~2 ms per linear at 0.45%
nnz), so round 1 routed the sparse contribution through vector registers
with a 7-round lane-rotation butterfly (collision-free routing, ~60 VPU
ops per slot). This module replaces the butterfly: v5e's
``tpu.dynamic_gather`` supports BOTH axes of a vreg — an 8-row sublane
shuffle and a 128-lane shuffle — and gathers tolerate read collisions that
send-routing cannot, which collapses the whole routing problem into two
chained gathers (~5 + 3*ceil(in/1024) VPU ops per slot) and a far looser
slot-assignment (slack ~1.2 vs ~2).

offline (this module, numpy):
  * x is viewed as x2d (IH, 128) f32 — element c lives at (c//128, c%128);
    y likewise (OH, 128). A slot array (R, 128) holds one sparse entry per
    slot: slot (k, l) contributes to y2d[k % OH, l], so an entry with
    output row r must land in a slot with l = r % 128 and k ≡ r//128
    (mod OH) — a final slab-sum y2d[h] = sum_m slots[m*OH + h] finishes.
  * Each slot needs x[src] where src = (sg, sr, sl): 8-row group c//1024,
    row-in-group (c//128) % 8, lane c % 128. One packed int32 per lane
    position carries BOTH hop indices as disjoint bit fields:
      meta[k, j] = chirow(j-as-source-lane) | sl(j-as-slot) << 8
    where chirow = full x2d source row (bits 0-7; its low 3 bits are the
    row-in-group, consumed directly by the mod-8 gather wrap, bits 3-7
    select the 8-row group) and sl = the slot's source lane (bits 8-14,
    consumed mod 128 by the lane-gather wrap).

on device (pallas_ops.gather_spmv), per 8-slot-row chunk:
  * hop 1 (sublane gather + group scan):
      t[k, m] = x2d[meta[k, m] & 255, m]
  * hop 2 (lane gather):  xv[k, l] = t[k, (meta[k, l] >> 8) & 127]
  * cur = xv * vals; slab-sum into y2d.

Assignment constraints per slot row k (much looser than the butterfly's
collision-free lane paths):
  (a) slot (k, r%128) free;
  (b) hop-1 field at (k, sl) unset or already equal to this entry's source
      row (two slots in one row MAY share a source — reads don't collide).
Everything is static data + static control flow: one compilation serves
every sparse pattern of the same padded shape.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

LANES = 128
GROUP = 8 * LANES  # x elements addressable by one (sublane, lane) gather pair


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


@dataclasses.dataclass
class SpmvPlan:
    """Device arrays for one sparse linear (both (R, 128))."""

    meta: np.ndarray  # int32: chirow | (src_lane << 8) — see module doc
    vals: np.ndarray  # float32: entry value (0 => dead slot)
    oh: int  # output rows of y2d (out padded to OH * 128, OH % 8 == 0)
    ih: int  # input rows of x2d (IH % 8 == 0); n_groups = ih // 8
    out_features: int
    in_features: int
    # GROUPED plans (build_plan_grouped): per-8-row-chunk source-group id
    # (R // 8,) int32 — every slot of chunk c reads x-group groups[c], so
    # the kernel's hop 1 is ONE gather from a dynamically sliced 8-row
    # window instead of an ih/8-iteration gather+select scan. None for
    # classic plans.
    groups: Optional[np.ndarray] = None

    @property
    def n_rows(self) -> int:
        return self.meta.shape[0]

    @property
    def n_slabs(self) -> int:
        return self.meta.shape[0] // self.oh


def build_plan(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    out_features: int,
    in_features: int,
    slack: float = 1.2,
    max_slack: float = 512.0,
    method: str = "auto",
) -> SpmvPlan:
    """Assign every entry to a slot; grows the slot array geometrically
    until all entries fit (terminates: one entry per row has no conflicts).

    method: 'auto' (native C++ when built, else numpy) | 'native' |
    'numpy'. Both backends implement the same greedy; plans are validated
    by construction (tests pin both against the dense oracle)."""
    live = np.asarray(vals) != 0
    rows = np.asarray(rows)[live].astype(np.int64)
    cols = np.asarray(cols)[live].astype(np.int64)
    vals = np.asarray(vals)[live].astype(np.float64)
    nnz = len(vals)

    oh = max(8, _round_up(_round_up(out_features, LANES) // LANES, 8))
    ih = max(8, _round_up(_round_up(in_features, LANES) // LANES, 8))
    assert ih <= 256, (ih, "chirow must fit 8 bits; shard the linear first")

    if method != "numpy" and nnz:
        from squeezellm_tpu import _native

        if _native.available():
            oh_true = max(1, _round_up(out_features, LANES) // LANES)
            meta, v = _native.spmv_plan(rows, cols, vals, oh, oh_true,
                                        slack, max_slack)
            return SpmvPlan(meta=meta, vals=v, oh=oh, ih=ih,
                            out_features=out_features,
                            in_features=in_features)
        if method == "native":
            raise RuntimeError("native library not built (make -C csrc)")

    if nnz == 0:  # all-dead plan: contributes exact zeros
        return SpmvPlan(
            meta=np.zeros((oh, LANES), np.int32),
            vals=np.zeros((oh, LANES), np.float32),
            oh=oh, ih=ih, out_features=out_features, in_features=in_features,
        )

    h = rows // LANES  # class: slot row k must have k % oh == h
    dl = (rows % LANES).astype(np.int64)
    chirow = (cols // LANES).astype(np.int64)  # full x2d source row (8 bits)
    sl = (cols % LANES).astype(np.int64)

    # rank within the (class, dst-lane) bucket: bucket entries start on
    # DISTINCT slabs (rank r -> slab r), so dst-slot collisions only come
    # from round-to-round spill, not from the bucket structure itself. The
    # minimum feasible slab count is the largest bucket.
    bkey = h * LANES + dl
    order = np.argsort(bkey, kind="stable")
    bk = bkey[order]
    newgrp = np.ones(len(bk), np.bool_)
    newgrp[1:] = bk[1:] != bk[:-1]
    grp_start = np.maximum.accumulate(np.where(newgrp, np.arange(len(bk)), 0))
    rank = np.empty(nnz, np.int64)
    rank[order] = np.arange(len(bk)) - grp_start
    max_bucket = int(rank.max()) + 1

    s = slack
    while True:
        plan = _try_assign(h, dl, chirow, sl, vals, rank, max_bucket,
                           oh, ih, out_features, in_features, s)
        if plan is not None:
            return plan
        s *= 1.5
        if s > max_slack:
            raise RuntimeError(
                f"spmv assignment failed at slack {s / 1.5:.1f} "
                f"(nnz={nnz}, out={out_features}, in={in_features})"
            )


def _try_assign(h, dl, chirow, sl, vals, rank, max_bucket, oh, ih,
                out_features, in_features, slack) -> Optional[SpmvPlan]:
    nnz = len(vals)
    n_slabs = max(1, int(np.ceil(slack * max_bucket)))
    R = n_slabs * oh

    occupied = np.zeros(R * LANES, np.bool_)  # dst slot taken
    hop1 = np.full(R * LANES, -1, np.int32)  # required source row per (k, m)
    slot_meta_lo = np.zeros(R * LANES, np.int32)  # chirow field (bits 0-7)
    slot_meta_hi = np.zeros(R * LANES, np.int32)  # src-lane field (bits 8-14)
    val_arr = np.zeros(R * LANES, np.float32)

    remaining = np.arange(nnz)
    for t in range(n_slabs):
        if len(remaining) == 0:
            break
        slab = (rank[remaining] + t) % n_slabs
        k = slab * oh + h[remaining]
        key_dst = k * LANES + dl[remaining]
        key_src = k * LANES + sl[remaining]

        # (a) dst-slot uniqueness: first entry per key_dst this round, and
        # the slot must not be occupied from earlier rounds
        order = np.argsort(key_dst, kind="stable")
        kd = key_dst[order]
        first_dst = np.ones(len(order), np.bool_)
        first_dst[1:] = kd[1:] != kd[:-1]
        ok = np.zeros(len(remaining), np.bool_)
        ok[order] = first_dst
        ok &= ~occupied[key_dst]

        # (b) hop-1 consistency at (k, sl): winners of (a) grouped by
        # key_src must agree on chirow with any earlier occupant and with
        # the round's first winner of that key (shared reads are fine)
        w = np.flatnonzero(ok)
        if len(w):
            ks = key_src[w]
            cr = chirow[remaining[w]]
            prior = hop1[ks]
            ok_w = (prior == -1) | (prior == cr)
            # within-round agreement: sort by (key_src, chirow); the first
            # per key_src (after prior filtering) sets the value
            o2 = np.argsort(ks * 512 + cr, kind="stable")
            ks2 = ks[o2]
            cr2 = cr[o2]
            first_src = np.ones(len(o2), np.bool_)
            first_src[1:] = ks2[1:] != ks2[:-1]
            # entry agrees if it matches the first entry of its key group
            grp_start = np.maximum.accumulate(
                np.where(first_src, np.arange(len(o2)), 0))
            agree = cr2 == cr2[grp_start]
            ok2 = np.zeros(len(w), np.bool_)
            ok2[o2] = agree
            ok_w &= ok2
            # where a prior exists, within-round "first" must also match it;
            # (prior == cr) already enforces per-entry match, and agreement
            # with the group's first only matters when prior == -1 — if the
            # group's first conflicts with a prior, it was filtered by ok_w.
            accept = w[ok_w]
        else:
            accept = w

        if len(accept):
            idxs = remaining[accept]
            ka = key_dst[accept]
            ksrc = key_src[accept]
            occupied[ka] = True
            hop1[ksrc] = chirow[idxs]
            slot_meta_lo[ksrc] = chirow[idxs]
            slot_meta_hi[ka] |= sl[idxs].astype(np.int32) << 8
            val_arr[ka] = vals[idxs]
            keep = np.ones(len(remaining), np.bool_)
            keep[accept] = False
            remaining = remaining[keep]

    if len(remaining):
        return None

    meta = (slot_meta_lo | slot_meta_hi).reshape(R, LANES)
    return SpmvPlan(
        meta=meta, vals=val_arr.reshape(R, LANES), oh=oh, ih=ih,
        out_features=out_features, in_features=in_features,
    )


def build_plan_grouped(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    out_features: int,
    in_features: int,
    slack: float = 1.2,
    max_slack: float = 512.0,
    method: str = "auto",
) -> SpmvPlan:
    """GROUP-HOMOGENEOUS plan (round-5 VERDICT item 5): partition entries
    by their x source group (8-row window of x2d) and build one classic
    sub-plan per group, concatenated vertically. Every 8-row chunk then
    reads from a single group, so the device hop 1 is ONE sublane gather
    from a dynamically sliced window (offset from the per-chunk `groups`
    array in SMEM) instead of an ih/8-iteration gather+select scan — the
    scan is what made the 17..1023-row band's VPU cost ~G x per chunk
    (G = ih/8: 4 for a 4096-in linear, 11 for an 11008-in down-proj).

    Concatenation preserves the slab-sum invariant: each sub-plan's row
    count is a multiple of oh, so global row k keeps k % oh == class.
    Costs ~20-50% more (dead) slot rows than the classic plan (per-group
    buckets have spikier maxima).

    MEASURED LOSS on v5e (round 5, scripts/band_probe.py): 73 vs 43 ms
    sparse overhead on a 136-token admission — the per-chunk SMEM scalar
    read + dynamic window slice costs more than the group scan it
    removes, and the extra dead rows compound it. NOT attached by
    default; kept (with the hardware gate in scripts/tpu_verify.py) for
    explicit use and for TPU generations with cheaper scalar/dynamic
    addressing.
    """
    live = np.asarray(vals) != 0
    rows = np.asarray(rows)[live]
    cols = np.asarray(cols)[live]
    vals = np.asarray(vals)[live]

    oh = max(8, _round_up(_round_up(out_features, LANES) // LANES, 8))
    ih = max(8, _round_up(_round_up(in_features, LANES) // LANES, 8))
    if len(vals) == 0:
        return SpmvPlan(
            meta=np.zeros((oh, LANES), np.int32),
            vals=np.zeros((oh, LANES), np.float32),
            oh=oh, ih=ih, out_features=out_features,
            in_features=in_features,
            groups=np.zeros((oh // 8,), np.int32),
        )

    g = (cols // LANES) // 8  # source group per entry
    metas, valses, gids = [], [], []
    for gid in range(ih // 8):
        m = g == gid
        if not m.any():
            continue
        p = build_plan(rows[m], cols[m], vals[m], out_features, in_features,
                       slack=slack, max_slack=max_slack, method=method)
        assert p.n_rows % 8 == 0 and p.n_rows % oh == 0
        metas.append(p.meta)
        valses.append(p.vals)
        gids.append(np.full(p.n_rows // 8, gid, np.int32))
        # validate homogeneity: every LIVE slot's source row (found by
        # following its hop-2 lane index to the hop-1 field) sits in gid
        chir = p.meta & 255
        src_lane = (p.meta >> 8) & 127
        src_row = np.take_along_axis(chir, src_lane, axis=1)
        livem = p.vals != 0
        assert ((src_row[livem] >> 3) == gid).all()
    meta = np.concatenate(metas, axis=0)
    return SpmvPlan(
        meta=meta, vals=np.concatenate(valses, axis=0), oh=oh, ih=ih,
        out_features=out_features, in_features=in_features,
        groups=np.concatenate(gids),
    )


def build_block_plans(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    out_features: int,
    in_features: int,
    o_blk: int = 1024,
    slack: float = 1.2,
    max_slack: float = 512.0,
    method: str = "auto",
):
    """Per-output-block slot plans for the FUSED lut_matmul+spmv decode
    kernel (``pallas_ops.lut_matmul`` ``sgb_*`` args).

    The y2d layout (slot row r, lane l -> output feature r*128 + l) makes
    an o_blk=1024 output block exactly an (8, 128) y2d tile, so entries of
    block ``ob`` (output features [ob*o_blk, (ob+1)*o_blk)) form their own
    oh=8 plan and the lut kernel adds the tile straight into the output
    block it is already revisiting — no separate SpMV kernel launch, no
    per-linear add op. Padding blocks to the widest R costs only dead
    slots (meta=0, val=0 contributes exactly 0).

    Returns ``(meta, vals, ih)`` with meta/vals of shape (n_ob, R, 128).
    """
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    vals = np.asarray(vals)
    assert o_blk % 128 == 0 and o_blk <= 1024, o_blk
    n_ob = max(1, -(-out_features // o_blk))
    plans = []
    for ob in range(n_ob):
        lo = ob * o_blk
        hi = min(lo + o_blk, out_features)
        m = (rows >= lo) & (rows < hi) & (vals != 0)
        p = build_plan(rows[m] - lo, cols[m], vals[m], hi - lo, in_features,
                       slack=slack, max_slack=max_slack, method=method)
        assert p.oh == 8, p.oh  # <=1024 features is always one 8-row tile
        plans.append(p)
    r_max = max(p.n_rows for p in plans)
    meta = np.zeros((n_ob, r_max, LANES), np.int32)
    v = np.zeros((n_ob, r_max, LANES), np.float32)
    for i, p in enumerate(plans):
        meta[i, : p.n_rows] = p.meta
        v[i, : p.n_rows] = p.vals
    return meta, v, plans[0].ih


# ---------------------------------------------------------------------------
# Attachment to quantized linears / whole models
# ---------------------------------------------------------------------------


def attach_plan(spec, params, slack: float = 1.2):
    """Build a plan from a linear's COO sidecar and add it to (spec, params).

    spec: QuantLinearSpec with nnz_pad > 0; params must hold numpy or device
    arrays sp_rows/sp_cols/sp_vals. Returns (new_spec, new_params)."""
    rows = np.asarray(params["sp_rows"])
    cols = np.asarray(params["sp_cols"])
    vals = np.asarray(params["sp_vals"])
    # classic plans by default: the grouped variant (build_plan_grouped)
    # measured SLOWER on v5e hardware (73 vs 43 ms sparse overhead on a
    # 136-token admission, scripts/band_probe.py round 5 — per-chunk SMEM
    # scalar reads + dynamic window slices cost more than the group scan
    # they remove). Grouped stays available for explicit use / other gens.
    plan = build_plan(rows, cols, vals, spec.out_features,
                      spec.in_features, slack=slack)
    bmeta, bvals, _ = build_block_plans(
        rows, cols, vals, spec.out_features, spec.in_features, slack=slack)
    new_params = dict(params)
    new_params["sg_meta"] = plan.meta
    new_params["sg_vals"] = plan.vals
    if plan.groups is not None:  # grouped plans only (None breaks npz save)
        new_params["sg_groups"] = plan.groups
    new_params["sgb_meta"] = bmeta
    new_params["sgb_vals"] = bvals
    new_spec = dataclasses.replace(
        spec, sg_rows=plan.n_rows, sg_oh=plan.oh, sg_ih=plan.ih,
        sgb_rows=bmeta.shape[1],
    )
    return new_spec, new_params


def _attach_task(args):
    spec, coo = args
    rows, cols, vals = coo
    return build_plan(rows, cols, vals, spec.out_features, spec.in_features)


def prepare_model(specs, params, module_names, processes: Optional[int] = None):
    """Attach spmv plans to every sparse linear of a model (in place on
    copies). Parallelized across linears with a process pool (cf. the
    reference's multiprocessing k-means, nuq.py:117,179).

    Returns (new_specs, new_params)."""
    import multiprocessing as mp

    tasks = []
    sites = []
    for li, (spec_d, param_d) in enumerate(zip(specs["layers"],
                                               params["layers"])):
        for name in module_names:
            sp = spec_d[name]
            q = getattr(sp, "quant", None)
            if q is not None and q.nnz_pad > 0 and q.sg_rows == 0:
                coo = (np.asarray(param_d[name]["sp_rows"]),
                       np.asarray(param_d[name]["sp_cols"]),
                       np.asarray(param_d[name]["sp_vals"]))
                tasks.append((q, coo))
                sites.append((li, name))
    if not tasks:
        return specs, params

    if processes is None:
        processes = min(len(tasks), mp.cpu_count())
    if processes > 1:
        with mp.get_context("fork").Pool(processes) as pool:
            plans = pool.map(_attach_task, tasks)
    else:
        plans = [_attach_task(t) for t in tasks]

    spec_layers = [dict(d) for d in specs["layers"]]
    new_layers = [dict(d) for d in params["layers"]]
    for (li, name), plan in zip(sites, plans):
        lspec = spec_layers[li][name]
        q = dataclasses.replace(
            lspec.quant, sg_rows=plan.n_rows, sg_oh=plan.oh, sg_ih=plan.ih
        )
        spec_layers[li][name] = dataclasses.replace(lspec, quant=q)
        pd = dict(new_layers[li][name])
        pd["sg_meta"] = plan.meta
        pd["sg_vals"] = plan.vals
        if plan.groups is not None:
            pd["sg_groups"] = plan.groups
        new_layers[li][name] = pd
    new_specs = dict(specs)
    new_specs["layers"] = tuple(spec_layers)
    new_params = dict(params)
    new_params["layers"] = new_layers
    return new_specs, new_params


def reference_apply(plan: SpmvPlan, x: np.ndarray) -> np.ndarray:
    """Numpy simulation of the kernel — the numerics oracle for tests."""
    x2d = np.zeros((plan.ih, LANES), np.float32)
    xf = np.asarray(x, np.float32).reshape(-1)
    x2d.reshape(-1)[: plan.in_features] = xf
    chir = plan.meta & 255
    lanes = np.arange(LANES)[None, :]
    t = x2d[chir % plan.ih, lanes]  # hop 1 (per source-lane position)
    idx2 = (plan.meta >> 8) & 127
    xv = np.take_along_axis(t, idx2, axis=1)  # hop 2
    cur = xv * plan.vals
    y2d = cur.reshape(plan.n_slabs, plan.oh, LANES).sum(axis=0)
    return y2d.reshape(-1)[: plan.out_features]
