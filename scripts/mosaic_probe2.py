"""Probe Mosaic capabilities that gate the round-2 dequant kernel redesign.

Run:  PYTHONPATH=/root/.axon_site:. python scripts/mosaic_probe2.py

Questions (all answered empirically on the real chip):
  E1  Does tpu.dynamic_gather lower with a bf16 (16,128) table + int16
      indices when constructed via raw lax.gather (bypassing
      take_along_axis's int32 canonicalization)?
  E2  Do int16 shift/and lower natively (packed, 2 elems per 32-bit lane)?
  E3  Same as E1 for int8 (32,128) table + int8 indices.
  E4  Does the f32 8-row gather wrap (mod 8) or clamp for idx in [8, 16)?
  E5  f32 (16,128) table + int32 idx — multi-vreg-height gather?
"""

import functools
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def gather_rows(tab, idx):
    """out[r, c] = tab[idx[r, c], c] — the tpu.dynamic_gather form, with the
    index dtype preserved (take_along_axis would canonicalize to int32)."""
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(),
        collapsed_slice_dims=(0,),
        start_index_map=(0,),
        operand_batching_dims=(1,),
        start_indices_batching_dims=(1,),
    )
    return lax.gather(
        tab,
        idx[..., None],
        dnums,
        (1, 1),
        mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def run(name, fn, args, want):
    try:
        got = np.asarray(fn(*args))
        ok = np.array_equal(got, np.asarray(want))
        print(f"{name}: {'OK' if ok else 'WRONG VALUES'}")
        if not ok:
            print("  got[:2,:6]", got[:2, :6])
            print("  want[:2,:6]", np.asarray(want)[:2, :6])
        return ok
    except Exception as e:  # noqa: BLE001
        msg = str(e).splitlines()[0][:200]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
        return False


def pcall(kernel, out_sd, *args):
    return pl.pallas_call(kernel, out_shape=out_sd)(*args)


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)

    # ---- E1: bf16 16-row table, int16 idx ----
    tab16 = rng.normal(size=(16, 128)).astype(jnp.bfloat16)
    idx16 = rng.integers(0, 16, (16, 128)).astype(np.int16)
    want = np.take_along_axis(np.asarray(tab16), np.asarray(idx16).astype(np.int32), axis=0)

    def k_e1(tab_ref, idx_ref, out_ref):
        out_ref[:] = gather_rows(tab_ref[:], idx_ref[:])

    run(
        "E1 bf16(16,128) gather int16 idx",
        jax.jit(lambda t, i: pcall(k_e1, jax.ShapeDtypeStruct((16, 128), jnp.bfloat16), t, i)),
        (tab16, idx16),
        want,
    )

    # ---- E2: int16 shift/and arithmetic ----
    w16 = rng.integers(-(2**15), 2**15, (16, 128)).astype(np.int16)
    want2 = ((w16.astype(np.int32) >> 4) & 15).astype(np.int16)

    def k_e2(w_ref, out_ref):
        v = w_ref[:]
        out_ref[:] = (v >> jnp.int16(4)) & jnp.int16(15)

    run(
        "E2 int16 shift/and",
        jax.jit(lambda w: pcall(k_e2, jax.ShapeDtypeStruct((16, 128), jnp.int16), w)),
        (w16,),
        want2,
    )

    # ---- E2b: int16 extract -> gather bf16, fused (the real pattern) ----
    def k_e2b(w_ref, tab_ref, out_ref):
        idx = (w_ref[:] >> jnp.int16(4)) & jnp.int16(15)
        out_ref[:] = gather_rows(tab_ref[:], idx)

    want2b = np.take_along_axis(np.asarray(tab16), want2.astype(np.int32), axis=0)
    run(
        "E2b int16 extract + bf16 gather fused",
        jax.jit(lambda w, t: pcall(k_e2b, jax.ShapeDtypeStruct((16, 128), jnp.bfloat16), w, t)),
        (w16, tab16),
        want2b,
    )

    # ---- E3: int8 32-row table, int8 idx ----
    tab8 = rng.integers(-128, 127, (32, 128)).astype(np.int8)
    idx8 = rng.integers(0, 32, (32, 128)).astype(np.int8)
    want3 = np.take_along_axis(tab8, idx8.astype(np.int32), axis=0)

    def k_e3(tab_ref, idx_ref, out_ref):
        out_ref[:] = gather_rows(tab_ref[:], idx_ref[:])

    run(
        "E3 int8(32,128) gather int8 idx",
        jax.jit(lambda t, i: pcall(k_e3, jax.ShapeDtypeStruct((32, 128), jnp.int8), t, i)),
        (tab8, idx8),
        want3,
    )

    # ---- E4: f32 8-row gather with idx in [0,16) — wrap or clamp? ----
    tabf = rng.normal(size=(8, 128)).astype(np.float32)
    idxw = rng.integers(0, 16, (8, 128)).astype(np.int32)

    def k_e4(tab_ref, idx_ref, out_ref):
        out_ref[:] = gather_rows(tab_ref[:], idx_ref[:])

    try:
        got = np.asarray(
            jax.jit(lambda t, i: pcall(k_e4, jax.ShapeDtypeStruct((8, 128), jnp.float32), t, i))(
                tabf, idxw
            )
        )
        wrap = np.take_along_axis(tabf, idxw % 8, axis=0)
        clamp = np.take_along_axis(tabf, np.minimum(idxw, 7), axis=0)
        if np.array_equal(got, wrap):
            print("E4 f32 8-row gather idx 0..15: WRAPS mod 8")
        elif np.array_equal(got, clamp):
            print("E4 f32 8-row gather idx 0..15: CLAMPS")
        else:
            print("E4 f32 8-row gather idx 0..15: OTHER/GARBAGE")
    except Exception as e:  # noqa: BLE001
        print(f"E4: FAIL {type(e).__name__}: {str(e).splitlines()[0][:160]}")

    # ---- E5: f32 16-row table, int32 idx (2-vreg-height table) ----
    tabf16 = rng.normal(size=(16, 128)).astype(np.float32)
    idxf16 = rng.integers(0, 16, (16, 128)).astype(np.int32)
    want5 = np.take_along_axis(tabf16, idxf16, axis=0)

    def k_e5(tab_ref, idx_ref, out_ref):
        out_ref[:] = gather_rows(tab_ref[:], idx_ref[:])

    run(
        "E5 f32(16,128) gather int32 idx",
        jax.jit(lambda t, i: pcall(k_e5, jax.ShapeDtypeStruct((16, 128), jnp.float32), t, i)),
        (tabf16, idxf16),
        want5,
    )

    # ---- E6: int16 -> int32 convert + 8-row f32 two-gather fallback cost
    # (no correctness question; skip)

    # ---- E7: bf16 (16, O) gather where idx rows span two code planes,
    # larger lane width (the production block shape) ----
    O = 512
    tabw = rng.normal(size=(16, O)).astype(jnp.bfloat16)
    idxw2 = rng.integers(0, 16, (16, O)).astype(np.int16)
    want7 = np.take_along_axis(np.asarray(tabw), np.asarray(idxw2).astype(np.int32), axis=0)

    run(
        "E7 bf16(16,512) gather int16 idx",
        jax.jit(lambda t, i: pcall(k_e1, jax.ShapeDtypeStruct((16, O), jnp.bfloat16), t, i)),
        (tabw, idxw2),
        want7,
    )

    # ---- E8: bf16 gather result feeds MXU dot directly ----
    def k_e8(x_ref, idx_ref, tab_ref, out_ref):
        wj = gather_rows(tab_ref[:], idx_ref[:])
        out_ref[:] = jnp.dot(x_ref[:], wj, preferred_element_type=jnp.float32)

    x = rng.normal(size=(8, 16)).astype(jnp.bfloat16)
    want8 = np.asarray(x, np.float32) @ want7.astype(np.float32)
    try:
        got = np.asarray(
            jax.jit(
                lambda x_, i_, t_: pcall(
                    k_e8, jax.ShapeDtypeStruct((8, O), jnp.float32), x_, i_, t_
                )
            )(x, idxw2, tabw)
        )
        err = np.abs(got - want8).max()
        print(f"E8 gather->MXU dot: max err {err:.3e} ({'OK' if err < 1e-1 else 'WRONG'})")
    except Exception as e:  # noqa: BLE001
        print(f"E8: FAIL {type(e).__name__}: {str(e).splitlines()[0][:160]}")


if __name__ == "__main__":
    sys.exit(main())
