"""Calibrate device timing through the axon tunnel.

Short dispatches measure tunnel overhead, not device time. This harness
repeats each op inside ONE jitted lax.fori_loop with a data dependency, so
wall-clock ≈ device time * iters. Calibrates:

  * peak bf16 matmul FLOPs (v5e spec ~394 TFLOP/s)
  * HBM read bandwidth via a big-array reduction (v5e spec ~819 GB/s)
  * per-dispatch overhead (tiny op)
"""

import time

import jax
import jax.numpy as jnp


def timed(fn, *args, n=3):
    r = fn(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)

    # --- dispatch overhead ---
    tiny = jnp.ones((8, 128), jnp.float32)
    f_tiny = jax.jit(lambda x: x + 1.0)
    t = timed(f_tiny, tiny, n=10)
    print(f"dispatch overhead (tiny op): {t*1e6:.0f}us", flush=True)

    # --- matmul peak: loop K dependent 4096^3 bf16 matmuls in one jit ---
    K = 32
    a = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
    b = jax.random.normal(key, (4096, 4096), jnp.bfloat16)

    @jax.jit
    def mm_loop(a, b):
        def body(i, acc):
            return jnp.tanh(acc @ b)  # dependency chain
        return jax.lax.fori_loop(0, K, body, a)

    t = timed(mm_loop, a, b)
    flops = K * 2 * 4096**3
    print(f"bf16 matmul chain: {t*1e3:.2f}ms -> {flops/t/1e12:.1f} TFLOP/s "
          f"(v5e spec ~394)", flush=True)

    # --- HBM read BW: reduce a 1-GiB array K times with dependency ---
    big = jax.random.normal(key, (256, 1024, 1024), jnp.float32)  # 1 GiB
    K2 = 8

    @jax.jit
    def red_loop(x):
        def body(i, acc):
            return acc + jnp.sum(x * (1.0 + acc * 1e-30))
        return jax.lax.fori_loop(0, K2, body, 0.0)

    t = timed(red_loop, big)
    bw = K2 * big.size * 4 / t
    print(f"HBM reduction: {t*1e3:.2f}ms -> {bw/1e9:.0f} GB/s (v5e spec ~819)",
          flush=True)

    # --- single bf16 GEMV dispatch vs in-jit loop (decode-shape truth) ---
    w = jax.random.normal(key, (4096, 11008), jnp.bfloat16)
    x = jax.random.normal(key, (1, 4096), jnp.bfloat16)
    f1 = jax.jit(lambda x, w: x @ w)
    t1 = timed(f1, x, w, n=10)

    K3 = 64

    @jax.jit
    def gemv_loop(x, w):
        def body(i, acc):
            y = (x + acc * 1e-30) @ w
            return jnp.sum(y) * 1e-30
        return jax.lax.fori_loop(0, K3, body, 0.0)

    t2 = timed(gemv_loop, x, w)
    per = t2 / K3
    gbs = w.size * 2 / per / 1e9
    print(f"bf16 GEMV 4096x11008: single-dispatch {t1*1e6:.0f}us | "
          f"in-jit {per*1e6:.1f}us ({gbs:.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
