"""Butterfly-routed sparse matvec: TPU-native unstructured SpMV.

The reference applies sparse outliers with an atomicAdd CSR SpMV
(quant_cuda_kernel.cu:1040-1089). On TPU, XLA lowers scatter/gather to a
near-serial engine (~2 ms per linear at 0.45% nnz — 100x the roofline), so
the rebuild routes the sparse contribution through vector registers instead:

offline (this module, numpy):
  * x is viewed as (IH, 128) f32 — element c lives at (c // 128, c % 128);
    y likewise (OH, 128). An entry (r, c, v) must move data from lane
    c % 128 to lane r % 128: a lane rotation by delta = (r - c) % 128.
  * Every entry is assigned a slot (k, c % 128) in an (R, 128) slot array
    such that the 7-round butterfly (roll lanes by 2^j for bit j of delta)
    is collision-free, and k ≡ r // 128 (mod OH) so a final slab-sum
    y2d[h] = sum_m slots[m * OH + h] lands every value on its output row.
    The assignment is a greedy matching grouped by (source lane, delta) —
    all entries of a group share one lane path, so slot feasibility is one
    vectorized occupancy lookup per group.

on device (pallas_ops.butterfly_spmv):
  * gather   xv[k, l] = x2d[chi[k, l], l]   (8-sublane dynamic_gather chain)
  * multiply by vals
  * 7 rounds: cur = take ? roll(cur, 2^j) : (keep ? cur : 0)
  * slab-sum into y2d

Everything is static data + static control flow: one compilation serves
every sparse pattern of the same padded shape.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

LANES = 128
N_ROUNDS = 7  # log2(LANES)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


@dataclasses.dataclass
class ButterflyPlan:
    """Device arrays for one sparse linear (all (R, 128))."""

    chi: np.ndarray  # int32: source sublane-row (c // 128) per slot
    vals: np.ndarray  # float32: entry value (0 => dead slot)
    route: np.ndarray  # int32: per-round take/keep bits (bit 2j = keep_j,
    #                     bit 2j+1 = take_j)
    oh: int  # output rows of y2d (out padded to OH * 128, OH % 8 == 0)
    ih: int  # input rows of x2d (IH % 8 == 0)
    out_features: int
    in_features: int

    @property
    def n_rows(self) -> int:
        return self.chi.shape[0]

    @property
    def n_slabs(self) -> int:
        return self.chi.shape[0] // self.oh


def _lane_path(src_lane: int, delta: int) -> np.ndarray:
    """Lane occupied at levels 0..7 (level j+1 = after round j)."""
    lanes = np.empty(N_ROUNDS + 1, np.int64)
    lane = src_lane
    lanes[0] = lane
    for j in range(N_ROUNDS):
        if (delta >> j) & 1:
            lane = (lane + (1 << j)) % LANES
        lanes[j + 1] = lane
    return lanes


def build_plan(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    out_features: int,
    in_features: int,
    slack: float = 2.0,
    max_slack: float = 512.0,
    method: str = "auto",
) -> ButterflyPlan:
    """Assign every entry to a collision-free butterfly slot.

    Grows the slot array geometrically until all entries fit (guaranteed to
    terminate: a row with a single entry has no conflicts).

    method: 'auto' (native C++ solver when built, ~20x faster) | 'native' |
    'numpy'."""
    live = vals != 0
    rows = np.asarray(rows[live], np.int64)
    cols = np.asarray(cols[live], np.int64)
    vals = np.asarray(vals[live], np.float64)
    nnz = len(vals)

    oh = max(8, _round_up(_round_up(out_features, LANES) // LANES, 8))
    ih = max(8, _round_up(_round_up(in_features, LANES) // LANES, 8))

    if method != "numpy":
        from squeezellm_tpu import _native

        if _native.available():
            oh_true = max(1, _round_up(out_features, LANES) // LANES)
            chi, v, route = _native.butterfly_solve(
                rows, cols, vals, oh, oh_true, slack, max_slack
            )
            return ButterflyPlan(chi=chi, vals=v, route=route, oh=oh, ih=ih,
                                 out_features=out_features,
                                 in_features=in_features)
        if method == "native":
            raise RuntimeError("native library not built (make -C csrc)")

    if nnz == 0:  # all-dead plan: contributes exact zeros
        return ButterflyPlan(
            chi=np.zeros((oh, LANES), np.int32),
            vals=np.zeros((oh, LANES), np.float32),
            route=np.zeros((oh, LANES), np.int32),
            oh=oh, ih=ih, out_features=out_features, in_features=in_features,
        )

    src_lane = cols % LANES
    chi_e = cols // LANES
    h_e = rows // LANES
    delta = (rows - cols) % LANES

    s = slack
    while True:
        plan = _try_assign(src_lane, chi_e, h_e, delta, vals, nnz, oh, ih,
                           out_features, in_features, s)
        if plan is not None:
            return plan
        s *= 1.5
        if s > max_slack:
            raise RuntimeError(
                f"butterfly assignment failed at slack {s / 1.5:.1f} "
                f"(nnz={nnz}, out={out_features}, in={in_features})"
            )


def _try_assign(src_lane, chi_e, h_e, delta, vals, nnz, oh, ih,
                out_features, in_features, slack) -> Optional[ButterflyPlan]:
    # rows with k % oh >= oh_true can never host an entry (their slab-sum
    # position is padding), so slab count must come from USABLE rows
    oh_true = max(1, _round_up(out_features, LANES) // LANES)
    n_slabs = max(1, int(np.ceil(slack * max(nnz, 1) / (LANES * oh_true))))
    R = n_slabs * oh

    # occupancy per level: level 0 = start (gather), level j+1 = after round j
    occ = np.zeros((N_ROUNDS + 1, R, LANES), np.bool_)
    chi = np.zeros((R, LANES), np.int32)
    val_arr = np.zeros((R, LANES), np.float32)
    take = np.zeros((N_ROUNDS, R, LANES), np.bool_)
    keep = np.zeros((N_ROUNDS, R, LANES), np.bool_)

    # group by (src_lane, delta): one lane path per group
    gkey = src_lane * LANES + delta
    order = np.argsort(gkey, kind="stable")
    gkey_sorted = gkey[order]
    bounds = np.flatnonzero(np.diff(gkey_sorted)) + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [len(order)]])
    # big groups first: they are the hardest to place
    group_order = np.argsort(starts - ends, kind="stable")

    for g in group_order:
        idx = order[starts[g] : ends[g]]
        if len(idx) == 0:
            continue
        sl = int(src_lane[idx[0]])
        d = int(delta[idx[0]])
        path = _lane_path(sl, d)
        # rows whose full path is free
        free = ~occ[np.arange(N_ROUNDS + 1), :, path].any(axis=0)  # (R,)
        free_rows = np.flatnonzero(free)
        if len(free_rows) < len(idx):
            return None
        # match entries to free rows by class (k % oh == h_e), vectorized:
        # sort free rows by class, then entry e takes the rank-th free row
        # of its class
        cls_free = free_rows % oh
        f_order = np.argsort(cls_free, kind="stable")
        sorted_free = free_rows[f_order]
        sorted_cls = cls_free[f_order]
        cls_lo = np.searchsorted(sorted_cls, np.arange(oh))
        cls_hi = np.searchsorted(sorted_cls, np.arange(oh), side="right")
        h_cls = h_e[idx] % oh
        need = np.bincount(h_cls, minlength=oh)
        if np.any(need > cls_hi - cls_lo):
            return None
        e_order = np.argsort(h_cls, kind="stable")
        rank = np.arange(len(idx)) - np.searchsorted(
            h_cls[e_order], h_cls[e_order]
        )
        chosen = np.empty(len(idx), np.int64)
        chosen[e_order] = sorted_free[cls_lo[h_cls[e_order]] + rank]
        # claim slots + write masks
        occ[np.arange(N_ROUNDS + 1)[:, None], chosen[None, :],
            path[:, None]] = True
        chi[chosen, sl] = chi_e[idx]
        val_arr[chosen, sl] = vals[idx]
        for j in range(N_ROUNDS):
            if (d >> j) & 1:
                take[j, chosen, path[j + 1]] = True
            else:
                keep[j, chosen, path[j + 1]] = True

    route = np.zeros((R, LANES), np.int32)
    for j in range(N_ROUNDS):
        route |= keep[j].astype(np.int32) << (2 * j)
        route |= take[j].astype(np.int32) << (2 * j + 1)

    return ButterflyPlan(
        chi=chi, vals=val_arr, route=route, oh=oh, ih=ih,
        out_features=out_features, in_features=in_features,
    )


# ---------------------------------------------------------------------------
# Attachment to quantized linears / whole models
# ---------------------------------------------------------------------------


def attach_plan(spec, params, slack: float = 2.0):
    """Build a plan from a linear's COO sidecar and add it to (spec, params).

    spec: QuantLinearSpec with nnz_pad > 0; params must hold numpy or device
    arrays sp_rows/sp_cols/sp_vals. Returns (new_spec, new_params)."""
    rows = np.asarray(params["sp_rows"])
    cols = np.asarray(params["sp_cols"])
    vals = np.asarray(params["sp_vals"])
    plan = build_plan(rows, cols, vals, spec.out_features, spec.in_features,
                      slack=slack)
    new_params = dict(params)
    new_params["bf_chi"] = plan.chi
    new_params["bf_vals"] = plan.vals
    new_params["bf_route"] = plan.route
    new_spec = dataclasses.replace(
        spec, bf_rows=plan.n_rows, bf_oh=plan.oh, bf_ih=plan.ih
    )
    return new_spec, new_params


def _attach_task(args):
    spec, coo = args
    rows, cols, vals = coo
    plan = build_plan(rows, cols, vals, spec.out_features, spec.in_features)
    return plan


def prepare_model(specs, params, module_names, processes: Optional[int] = None):
    """Attach butterfly plans to every sparse linear of a model (in place on
    copies). Parallelized across linears with a process pool — the greedy
    assignment is CPU-bound numpy (cf. the reference's multiprocessing
    k-means, nuq.py:117,179).

    Returns (new_specs, new_params)."""
    import multiprocessing as mp

    tasks = []
    sites = []
    for li, (spec_d, param_d) in enumerate(zip(specs["layers"],
                                               params["layers"])):
        for name in module_names:
            sp = spec_d[name]
            q = getattr(sp, "quant", None)
            if q is not None and q.nnz_pad > 0 and q.bf_rows == 0:
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
            lspec.quant, bf_rows=plan.n_rows, bf_oh=plan.oh, bf_ih=plan.ih
        )
        spec_layers[li][name] = dataclasses.replace(lspec, quant=q)
        pd = dict(new_layers[li][name])
        pd["bf_chi"] = plan.chi
        pd["bf_vals"] = plan.vals
        pd["bf_route"] = plan.route
        new_layers[li][name] = pd
    new_specs = dict(specs)
    new_specs["layers"] = tuple(spec_layers)
    new_params = dict(params)
    new_params["layers"] = new_layers
    return new_specs, new_params


def reference_apply(plan: ButterflyPlan, x: np.ndarray) -> np.ndarray:
    """Numpy simulation of the kernel — the numerics oracle for tests."""
    x2d = np.zeros((plan.ih, LANES), np.float32)
    xf = np.asarray(x, np.float32).reshape(-1)
    x2d.reshape(-1)[: plan.in_features] = xf
    cur = x2d[plan.chi, np.arange(LANES)[None, :]] * plan.vals
    for j in range(N_ROUNDS):
        rolled = np.roll(cur, 1 << j, axis=1)
        take_j = (plan.route >> (2 * j + 1)) & 1
        keep_j = (plan.route >> (2 * j)) & 1
        cur = np.where(take_j == 1, rolled, np.where(keep_j == 1, cur, 0.0))
    y2d = cur.reshape(plan.n_slabs, plan.oh, LANES).sum(axis=0)
    return y2d.reshape(-1)[: plan.out_features]
