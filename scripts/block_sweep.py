"""Sweep Pallas block sizes / modes for the LUT matmul on the real chip.

Tunnel-proof timing: (T(2K) - T(K)) / K inside jitted fori_loops (the axon
tunnel costs ~29ms per dispatch+fetch; block_until_ready is unreliable).

Run: PYTHONPATH=.:/root/.axon_site python -u scripts/block_sweep.py [in out batch]
"""

import functools
import itertools
import sys
import time

import jax
import jax.numpy as jnp

from squeezellm_tpu import formats
from squeezellm_tpu.ops import pallas_ops


def bench(fn, x, K=128, trials=3):
    def make_loop(n):
        @jax.jit
        def loop(x):
            def body(i, carry):
                xp, s = carry
                y = fn(xp)
                s2 = jnp.sum(y[0].astype(jnp.float32)) * 1e-30
                return ((x * (1.0 + s2)).astype(x.dtype), s + s2)

            _, s = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
            return s

        return loop

    lk, l2k = make_loop(K), make_loop(2 * K)
    float(lk(x)), float(l2k(x))
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
    bits = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    in_f, out_f = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (4096, 4096)
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    key = jax.random.PRNGKey(0)
    nw = formats.n_words(in_f, bits)
    qweight = jax.random.randint(key, (nw, out_f), -(2**31), 2**31 - 1, jnp.int32)
    lut = jnp.sort(jax.random.normal(key, (out_f, 2**bits)) * 0.02, axis=1)
    x = jax.random.normal(key, (batch, in_f), jnp.float32)
    bytes_q = nw * out_f * 4
    print(f"shape {in_f}x{out_f} b={batch} bits={bits} "
          f"(roofline {bytes_q/819e9*1e6:.1f}us @819GB/s)", flush=True)

    for mode, w_blk, o_blk in itertools.product(
        ["gather", "select"], [128, 256, 512], [512, 1024, 2048]
    ):
        if w_blk * o_blk * 4 > 8 * 1024 * 1024:
            continue
        try:
            t = bench(
                lambda a: pallas_ops.lut_matmul(
                    a, qweight, lut, bits, b_blk=8, w_blk=w_blk, o_blk=o_blk,
                    mode=mode,
                ),
                x,
            )
            print(f"{mode:7s} w_blk={w_blk:4d} o_blk={o_blk:4d}: {t*1e6:8.1f}us "
                  f"{bytes_q/t/1e9:7.1f}GB/s", flush=True)
        except Exception as e:
            print(f"{mode:7s} w_blk={w_blk:4d} o_blk={o_blk:4d}: "
                  f"FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
