"""Sweep Pallas block sizes for the LUT matmul on the real chip."""
import functools
import itertools
import sys
import time

import jax
import jax.numpy as jnp

from squeezellm_tpu import formats
from squeezellm_tpu.ops import pallas_ops


def timeit(fn, *args, iters=30, warmup=3):
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def main():
    bits = 4
    in_f, out_f = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (4096, 4096)
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    key = jax.random.PRNGKey(0)
    nw = formats.n_words(in_f, bits)
    qweight = jax.random.randint(key, (nw, out_f), -(2**31), 2**31 - 1, jnp.int32)
    lut = jnp.sort(jax.random.normal(key, (out_f, 2**bits)) * 0.02, axis=1)
    x = jax.random.normal(key, (batch, in_f), jnp.float32)
    bytes_q = nw * out_f * 4

    for w_blk, o_blk in itertools.product([64, 128, 256, 512], [256, 512, 1024, 2048]):
        if w_blk * o_blk * 4 > 8 * 1024 * 1024:
            continue
        try:
            t = timeit(
                functools.partial(pallas_ops.lut_matmul, bits=bits,
                                  b_blk=8, w_blk=w_blk, o_blk=o_blk),
                x, qweight, lut,
            )
            print(f"w_blk={w_blk:4d} o_blk={o_blk:4d}: {t*1e6:8.1f}us  {bytes_q/t/1e9:7.1f}GB/s")
        except Exception as e:
            print(f"w_blk={w_blk:4d} o_blk={o_blk:4d}: FAIL {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
