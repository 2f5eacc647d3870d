"""Probe: which f32 scale-sidecar layouts can Mosaic DMA-slice on this TPU?

The int8-KV kernels failed hardware verify because the (P, Hkv, ps, 1)
f32 scale sidecar produces memref slices of lane-extent 1, which Mosaic
rejects ("Slice shape along dimension 3 must be aligned to tiling (128),
but is 1"). Candidates:

  A. (P, H, 1, ps)  — scales on LANES; whole-row `.at[p, h]` DMAs and
     lane slices at multiples of 128.
  B. (P, H, 8, ps)  — one full f32 tile per (page, head); sublane 0 = k
     scales, sublane 1 = v (fallback if A's extent-1 sublane dim also
     trips the tiling rules).

Each candidate: read-DMA, lane-partial read (A only), RMW patch + write
back, then verify against numpy. Run on the real chip; prints OK/FAIL
per case.
"""

import functools
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _probe_kernel_a(idx_ref, s_in, s_ref, out_ref, row, sem, wsem, *, ps):
    b = pl.program_id(0)
    pid = idx_ref[b]
    # whole-row read (1, ps)
    c = pltpu.make_async_copy(s_ref.at[pid, 0], row, sem)
    c.start()
    c.wait()
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, ps), 1)
    row[:] = jnp.where(lane == idx_ref[b + 2], jnp.float32(42.5), row[:])
    w = pltpu.make_async_copy(row, s_ref.at[pid, 0], wsem)
    w.start()
    w.wait()
    out_ref[0] = row[:]


def probe_a(ps=128, partial=False):
    P, H, B = 4, 2, 1
    s = np.arange(P * H * ps, dtype=np.float32).reshape(P, H, 1, ps)
    idx = np.asarray([1, 0, 7, 0], np.int32)  # pid=1, patch lane 7

    def kern(idx_ref, s_in, s_ref, out_ref, row, sem, wsem):
        b = pl.program_id(0)
        pid = idx_ref[b]
        if partial:
            c = pltpu.make_async_copy(
                s_ref.at[pid, 0, 0, pl.ds(0, ps)], row.at[0], sem)
        else:
            c = pltpu.make_async_copy(s_ref.at[pid, 0], row, sem)
        c.start()
        c.wait()
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, ps), 1)
        row[:] = jnp.where(lane == idx_ref[b + 2], jnp.float32(42.5), row[:])
        w = pltpu.make_async_copy(row, s_ref.at[pid, 0], wsem)
        w.start()
        w.wait()
        out_ref[...] = row[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, ps), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, ps), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    s_out, out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(s.shape, jnp.float32),
                   jax.ShapeDtypeStruct((B, ps), jnp.float32)],
        input_output_aliases={1: 0},
    )(jnp.asarray(idx), jnp.asarray(s))
    want = s[1, 0, 0].copy()
    want[7] = 42.5
    np.testing.assert_allclose(np.asarray(out)[0], want)
    np.testing.assert_allclose(np.asarray(s_out)[1, 0, 0], want)


def probe_b(ps=128):
    P, H, B = 4, 2, 1
    s = np.arange(P * H * 8 * ps, dtype=np.float32).reshape(P, H, 8, ps)
    idx = np.asarray([2, 0, 5, 0], np.int32)

    def kern(idx_ref, s_in, s_ref, out_ref, slab, sem, wsem):
        b = pl.program_id(0)
        pid = idx_ref[b]
        c = pltpu.make_async_copy(s_ref.at[pid, 0], slab, sem)
        c.start()
        c.wait()
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, ps), 1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (8, ps), 0)
        slab[:] = jnp.where((lane == idx_ref[b + 2]) & (rows == 1),
                            jnp.float32(7.25), slab[:])
        w = pltpu.make_async_copy(slab, s_ref.at[pid, 0], wsem)
        w.start()
        w.wait()
        out_ref[...] = slab[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, ps), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, ps), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    s_out, out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(s.shape, jnp.float32),
                   jax.ShapeDtypeStruct((B, 8, ps), jnp.float32)],
        input_output_aliases={1: 0},
    )(jnp.asarray(idx), jnp.asarray(s))
    want = s[2, 0].copy()
    want[1, 5] = 7.25
    np.testing.assert_allclose(np.asarray(out)[0], want)
    np.testing.assert_allclose(np.asarray(s_out)[2, 0], want)


def probe_a_lane_slice(ps=256):
    """Partial lane slices (1, 128) at 128-multiples from (P, H, 1, ps)."""
    P, H, B = 4, 2, 1
    s = np.arange(P * H * ps, dtype=np.float32).reshape(P, H, 1, ps)
    idx = np.asarray([3, 0, 1, 0], np.int32)  # pid=3, segment 1

    def kern(idx_ref, s_in, s_ref, out_ref, row, sem, wsem):
        b = pl.program_id(0)
        pid = idx_ref[b]
        seg = idx_ref[b + 2]
        c = pltpu.make_async_copy(
            s_ref.at[pid, 0, 0, pl.ds(seg * 128, 128)], row.at[0], sem)
        c.start()
        c.wait()
        out_ref[...] = row[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 128), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    _, out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(s.shape, jnp.float32),
                   jax.ShapeDtypeStruct((B, 128), jnp.float32)],
        input_output_aliases={1: 0},
    )(jnp.asarray(idx), jnp.asarray(s))
    np.testing.assert_allclose(np.asarray(out)[0], s[3, 0, 0, 128:256])


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    ok = True
    for name, fn in [("A whole-row (P,H,1,ps)", probe_a),
                     ("A lane-slice 128 of (P,H,1,256)", probe_a_lane_slice),
                     ("B tile-slab (P,H,8,ps)", probe_b)]:
        try:
            fn()
            print(f"OK   {name}")
        except Exception as e:
            ok = False
            msg = str(e).splitlines()
            print(f"FAIL {name}: {msg[0] if msg else type(e).__name__}")
    sys.exit(0 if ok else 1)
