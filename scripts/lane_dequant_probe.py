"""Hardware probe: transposed wide-table lane-gather w4 GEMV (lut_matmul_t)
vs the sublane-gather path (lut_matmul), per-shape, with tunnel-proof
differential fori_loop timing (see scripts/kernel_bench.py).

Run: PYTHONPATH=/root/.axon_site python -u scripts/lane_dequant_probe.py
"""

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "scripts")
from kernel_bench import bench  # noqa: E402

from squeezellm_tpu import formats  # noqa: E402
from squeezellm_tpu.ops import pallas_ops, xla_ops  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--mode", type=str, default="bf16")
    ap.add_argument("--o-blks", type=str, default="512,1024,2048")
    ap.add_argument("--shapes", type=str,
                    default="4096x12288,4096x4096,4096x22016,11008x4096")
    args = ap.parse_args()
    bits = args.bits

    print("devices:", jax.devices(), flush=True)
    shapes = [tuple(map(int, s.split("x"))) for s in args.shapes.split(",")]
    rng = np.random.default_rng(0)

    for (in_f, out_f) in shapes:
        nw = formats.n_words(in_f, bits)
        qw = rng.integers(-(2**31), 2**31 - 1, (nw, out_f), dtype=np.int32)
        lut = np.sort(rng.normal(size=(out_f, 2**bits)).astype(np.float32)
                      * 0.02, axis=1)
        qweight = jnp.asarray(qw)
        qweight_t = jnp.asarray(np.ascontiguousarray(qw.T))
        lut_j = jnp.asarray(lut)
        lut_t = jnp.asarray(np.pad(lut.T, ((0, max(8, 2**bits) - 2**bits),
                                           (0, 0))))
        lut_w = jnp.asarray(pallas_ops.wide_lut(lut, bits))
        wq_bytes = nw * out_f * 4

        x = jnp.asarray(rng.normal(size=(args.batch, in_f)).astype(np.float32))

        # numerics first (hardware wrap-gather correctness). Reference is
        # the already-hardware-validated sublane-gather kernel, NOT the XLA
        # oracle — take_along_axis dequant at 7B shapes is near-serial on
        # TPU (~minutes per call).
        ref = pallas_ops.lut_matmul(x, qweight, lut_j, bits, mode=args.mode,
                                    lut_t=lut_t)
        got = pallas_ops.lut_matmul_t(x, qweight_t, lut_w, bits,
                                      mode=args.mode)
        err = float(jnp.max(jnp.abs(ref - got)) /
                    (jnp.max(jnp.abs(ref)) + 1e-9))
        print(f"[{in_f}x{out_f}] rel_err(mode={args.mode}) = {err:.2e}",
              flush=True)

        t_old = bench(
            lambda a: pallas_ops.lut_matmul(a, qweight, lut_j, bits,
                                            mode=args.mode, lut_t=lut_t),
            x, K=args.iters)
        print(f"  old sublane-gather: {t_old*1e6:8.1f}us "
              f"({wq_bytes/t_old/1e9:6.1f}GB/s)", flush=True)
        for o_blk in map(int, args.o_blks.split(",")):
            t_new = bench(
                lambda a: pallas_ops.lut_matmul_t(
                    a, qweight_t, lut_w, bits, mode=args.mode, o_blk=o_blk),
                x, K=args.iters)
            print(f"  new lane-gather o{o_blk:5d}: {t_new*1e6:8.1f}us "
                  f"({wq_bytes/t_new/1e9:6.1f}GB/s) "
                  f"speedup {t_old/t_new:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
