"""Microbenchmark: fused Pallas LUT-dequant matmul vs bf16/f32 dense + XLA
dequant, with tunnel-proof timing.

Timing protocol (see memory: axon tunnel's block_until_ready is a no-op):
each op is repeated K times inside ONE jitted lax.fori_loop with a loop-
carried perturbation of the input (prevents LICM hoisting), and the window
is fenced by fetching a scalar to host. Per-op time = window / K.

Run: python -u scripts/kernel_bench.py [--bits 4] [--batch 1 16]
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp

from squeezellm_tpu import formats
from squeezellm_tpu.ops import pallas_ops, xla_ops


def bench(fn, x, K=64, trials=3):
    """fn: x -> y. Returns seconds per op.

    The axon tunnel costs ~29ms per dispatch+fetch, so a single timed loop
    of K iterations measures overhead/K, not the op. Instead time loops of
    K and 2K iterations and report (T(2K) - T(K)) / K — the fixed dispatch,
    fetch and warm-up costs cancel exactly."""

    def make_loop(n):
        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(x, n):
            def body(i, carry):
                xp, s = carry
                y = fn(xp)
                s2 = jnp.sum(y[0].astype(jnp.float32)) * 1e-30
                return ((x * (1.0 + s2)).astype(x.dtype), s + s2)

            _, s = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
            return s

        return lambda x: loop(x, n)

    lk, l2k = make_loop(K), make_loop(2 * K)
    float(lk(x)), float(l2k(x))  # compile + warm
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        float(lk(x))
        t1 = time.perf_counter()
        float(l2k(x))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / K)
    return max(best, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=4, choices=[3, 4])
    ap.add_argument("--batch", type=int, nargs="*", default=[1])
    ap.add_argument("--b-blk", type=int, default=256)
    ap.add_argument("--w-blk", type=int, default=256)
    ap.add_argument("--o-blk", type=int, default=512)
    ap.add_argument("--shapes", type=str, default="4096x4096,4096x11008,11008x4096")
    ap.add_argument("--iters", type=int, default=64)
    args = ap.parse_args()
    bits = args.bits

    print("devices:", jax.devices(), flush=True)
    shapes = [tuple(map(int, s.split("x"))) for s in args.shapes.split(",")]

    key = jax.random.PRNGKey(0)
    for (in_f, out_f) in shapes:
        nw = formats.n_words(in_f, bits)
        qweight = jax.random.randint(key, (nw, out_f), -(2**31), 2**31 - 1, jnp.int32)
        lut = jnp.sort(jax.random.normal(key, (out_f, 2**bits)) * 0.02, axis=1)
        wq_bytes = nw * out_f * 4
        w16 = (jax.random.normal(key, (in_f, out_f)) * 0.02).astype(jnp.bfloat16)

        for batch in args.batch:
            x = jax.random.normal(key, (batch, in_f), jnp.float32)
            xb = x.astype(jnp.bfloat16)

            t_pl = bench(
                lambda a: pallas_ops.lut_matmul(
                    a, qweight, lut, bits,
                    b_blk=args.b_blk, w_blk=args.w_blk, o_blk=args.o_blk,
                ),
                x, K=args.iters,
            )
            t_xla = bench(lambda a: xla_ops.lut_matmul(a, qweight, lut, bits),
                          x, K=args.iters)
            t_bf16 = bench(lambda a: (a @ w16).astype(jnp.float32), xb,
                           K=args.iters)

            gbs = wq_bytes / t_pl / 1e9
            gbs16 = in_f * out_f * 2 / t_bf16 / 1e9
            print(
                f"[{in_f}x{out_f} b={batch}] pallas {t_pl*1e6:8.1f}us ({gbs:6.1f}GB/s)"
                f" | xla {t_xla*1e6:8.1f}us | bf16 {t_bf16*1e6:8.1f}us"
                f" ({gbs16:6.1f}GB/s) | speedup vs bf16 {t_bf16/t_pl:5.2f}x",
                flush=True,
            )


if __name__ == "__main__":
    main()
