"""Microbenchmark: fused Pallas LUT-dequant matmul vs XLA paths on the chip.

Measures per-shape latency and achieved HBM bandwidth for the decode GEMV
(batch 1) and prefill GEMM shapes of LLaMA-2-7B, against:
  * bf16 dense matmul (the fp16-equivalent the reference compares to)
  * f32 dense matmul
  * XLA dequant path (unpack+gather, fallback)

Run standalone on the real chip: python scripts/kernel_bench.py [--bits 4]
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from squeezellm_tpu import formats
from squeezellm_tpu.ops import pallas_ops, xla_ops


def timeit(fn, *args, iters=50, warmup=5):
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=4, choices=[3, 4])
    ap.add_argument("--batch", type=int, nargs="*", default=[1, 16, 2048])
    ap.add_argument("--b-blk", type=int, default=256)
    ap.add_argument("--w-blk", type=int, default=256)
    ap.add_argument("--o-blk", type=int, default=512)
    args = ap.parse_args()
    bits = args.bits

    print("devices:", jax.devices())
    # LLaMA-2-7B linear shapes (in, out)
    shapes = [(4096, 4096), (4096, 11008), (11008, 4096), (4096, 12288)]

    key = jax.random.PRNGKey(0)
    for (in_f, out_f) in shapes:
        nw = formats.n_words(in_f, bits)
        qweight = jax.random.randint(key, (nw, out_f), -(2**31), 2**31 - 1, jnp.int32)
        lut = jnp.sort(jax.random.normal(key, (out_f, 2**bits)) * 0.02, axis=1)
        wq_bytes = nw * out_f * 4 + out_f * (2**bits) * 4
        w16 = jax.random.normal(key, (in_f, out_f), jnp.bfloat16) * 0.02
        w32 = w16.astype(jnp.float32)

        for batch in args.batch:
            x = jax.random.normal(key, (batch, in_f), jnp.float32)
            xb = x.astype(jnp.bfloat16)

            t_pl = timeit(
                functools.partial(
                    pallas_ops.lut_matmul, bits=bits,
                    b_blk=args.b_blk, w_blk=args.w_blk, o_blk=args.o_blk,
                ),
                x, qweight, lut,
            )
            t_xla = timeit(
                jax.jit(functools.partial(xla_ops.lut_matmul, bits=bits)),
                x, qweight, lut,
            )
            t_bf16 = timeit(
                jax.jit(lambda a, w: (a @ w).astype(jnp.float32)), xb, w16
            )
            t_f32 = timeit(jax.jit(lambda a, w: a @ w), x, w32)

            gbs = wq_bytes / t_pl / 1e9
            gbs_bf16 = in_f * out_f * 2 / t_bf16 / 1e9
            print(
                f"[{in_f}x{out_f} b={batch}] pallas {t_pl*1e6:8.1f}us ({gbs:6.1f}GB/s) | "
                f"xla {t_xla*1e6:8.1f}us | bf16 {t_bf16*1e6:8.1f}us ({gbs_bf16:6.1f}GB/s) | "
                f"f32 {t_f32*1e6:8.1f}us | speedup vs bf16 {t_bf16/t_pl:5.2f}x"
            )


if __name__ == "__main__":
    main()
