"""Probe: where does the transposed lane-gather w4 GEMV lose its time?

Variants isolate dequant-gather cost vs lane-concat vs MXU orientation.
All run on the qkv shape (in 4096 -> out 12288), b=1 (8 padded lanes),
w4: qwT (12288, 512) int32, wide table (12288, 128) f32.

Run: python -u scripts/mosaic_probe3.py
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "scripts")
from kernel_bench import bench  # noqa: E402

from squeezellm_tpu.ops.pallas_ops import (  # noqa: E402
    _gather_lane, _gather8, _cdiv, _round_up)

OUTF, NW, CPW, BITS = 12288, 512, 8, 4
B = 8


def _mk_kernel(variant):
    def kern(x_ref, qwt_ref, lutw_ref, out_ref, *, w_blk):
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _init():
            out_ref[:] = jnp.zeros_like(out_ref)

        words = qwt_ref[:]
        tab = lutw_ref[:]
        acc = out_ref[:]
        for j in range(CPW):
            s = (words >> (BITS * j)) if j else words
            if variant in ("deq_only", "deq_dot", "deq_dot128"):
                chunks = [_gather_lane(tab, s[:, c:c + 128], False)
                          for c in range(0, w_blk, 128)]
                if variant == "deq_only":
                    # consume wj without the MXU: one lane-slab add
                    for ch in chunks:
                        acc = acc + ch[:, 0:B]
                elif variant == "deq_dot128":
                    # K=128 dot per chunk, no lane-concat
                    for k, ch in enumerate(chunks):
                        xj = x_ref[j * w_blk + 128 * k:
                                   j * w_blk + 128 * (k + 1), :]
                        acc = acc + jnp.dot(
                            ch, xj, preferred_element_type=jnp.float32)
                else:
                    wj = (chunks[0] if len(chunks) == 1
                          else jnp.concatenate(chunks, axis=1))
                    xj = x_ref[j * w_blk:(j + 1) * w_blk, :]
                    acc = acc + jnp.dot(
                        wj, xj, preferred_element_type=jnp.float32)
            elif variant in ("deq8_dot128", "deq8_only"):
                # lane gather in (8,128) single-vreg tiles (the shape the
                # spmv kernel uses) instead of one tall (o_blk,128) gather
                for c in range(0, w_blk, 128):
                    sc = s[:, c:c + 128]
                    rows = [
                        _gather_lane(tab[r:r + 8, :], sc[r:r + 8, :], False)
                        for r in range(0, sc.shape[0], 8)
                    ]
                    ch = jnp.concatenate(rows, axis=0)
                    if variant == "deq8_only":
                        acc = acc + ch[:, 0:B]
                    else:
                        xj = x_ref[j * w_blk + c:j * w_blk + c + 128, :]
                        acc = acc + jnp.dot(
                            ch, xj, preferred_element_type=jnp.float32)
            elif variant == "shift_only":
                acc = acc + (s[:, 0:B]).astype(jnp.float32)
            elif variant == "dot_only":
                # gathered-but-constant "weights": isolates the transposed-
                # MXU orientation (one cheap op stands in for dequant)
                wj = (words & 1).astype(jnp.float32)
                xj = x_ref[j * w_blk:(j + 1) * w_blk, :]
                acc = acc + jnp.dot(wj, xj,
                                    preferred_element_type=jnp.float32)
        out_ref[:] = acc

    return kern


def run_variant(variant, o_blk=1024, w_blk=512):
    n_i = _cdiv(NW, w_blk)
    wp = n_i * w_blk
    op = _round_up(OUTF, o_blk)
    rng = np.random.default_rng(0)
    qwt = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (OUTF, NW),
                                   dtype=np.int32))
    lutw = jnp.asarray(rng.normal(size=(OUTF, 128)).astype(np.float32))
    x3 = jnp.asarray(rng.normal(size=(wp * CPW, B)).astype(np.float32))

    fn = pl.pallas_call(
        functools.partial(_mk_kernel(variant), w_blk=w_blk),
        grid=(op // o_blk, n_i),
        in_specs=[
            pl.BlockSpec((CPW * w_blk, B), lambda o, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((o_blk, w_blk), lambda o, i: (o, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((o_blk, 128), lambda o, i: (o, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((o_blk, B), lambda o, i: (o, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((op, B), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )

    t = bench(lambda a: fn(a, qwt, lutw), x3, K=64)
    gbs = NW * OUTF * 4 / t / 1e9
    print(f"{variant:12s} o{o_blk} w{w_blk}: {t*1e6:8.1f}us ({gbs:6.1f}GB/s)",
          flush=True)


def main():
    for v in ("dot_only", "shift_only", "deq_only", "deq_dot", "deq_dot128"):
        run_variant(v)
    run_variant("deq_dot", o_blk=512, w_blk=256)


if __name__ == "__main__":
    main()
