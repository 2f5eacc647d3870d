"""Microbenchmark the sparse-outlier paths at 7B decode shapes.

Isolates the suspected bottleneck in the w4-s45 decode: the per-linear COO
scatter-add (xla_ops.sparse_matmul). Compares formulations:

  coo-scatter   x[cols]*vals scatter-added into y (current)
  coo-sorted    same with indices_are_sorted=True
  ell-gather    row-padded ELL: gather x at (out, E) cols, weighted row-sum
  segsum        jax.ops.segment_sum over sorted rows

Run: PYTHONPATH=. python -u scripts/sparse_bench.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


def fence(x):
    return float(jnp.sum(x).astype(jnp.float32))


def bench(fn, *args, K=32, trials=3):
    @jax.jit
    def loop(*a):
        def body(i, s):
            y = fn(*a)
            return s + jnp.sum(y).astype(jnp.float32) * 1e-30

        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    float(loop(*args))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        float(loop(*args))
        best = min(best, (time.perf_counter() - t0) / K)
    return best


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    for (in_f, out_f) in [(4096, 4096), (4096, 11008), (11008, 4096)]:
        nnz = int(in_f * out_f * 0.0045)
        rows = np.sort(rng.integers(0, out_f, nnz)).astype(np.int32)
        cols = rng.integers(0, in_f, nnz).astype(np.int32)
        vals = rng.standard_normal(nnz).astype(np.float32) * 0.1
        x = jnp.asarray(rng.standard_normal((1, in_f)).astype(np.float32))
        r, c, v = map(jnp.asarray, (rows, cols, vals))

        def coo(x, r=r, c=c, v=v):
            contrib = x[..., c] * v
            y = jnp.zeros(x.shape[:-1] + (out_f,), jnp.float32)
            return y.at[..., r].add(contrib)

        def coo_sorted(x, r=r, c=c, v=v):
            contrib = x[..., c] * v
            y = jnp.zeros(x.shape[:-1] + (out_f,), jnp.float32)
            return y.at[..., r].add(contrib, indices_are_sorted=True,
                                    unique_indices=False)

        def segsum(x, r=r, c=c, v=v):
            contrib = (x[0, c] * v)
            return jax.ops.segment_sum(contrib, r, num_segments=out_f,
                                       indices_are_sorted=True)[None]

        # ELL layout: pad each output row to fixed width E
        counts = np.bincount(rows, minlength=out_f)
        E = int(np.max(counts))
        ell_cols = np.zeros((out_f, E), np.int32)
        ell_vals = np.zeros((out_f, E), np.float32)
        fill = np.zeros(out_f, np.int64)
        for k in range(nnz):
            rr = rows[k]
            ell_cols[rr, fill[rr]] = cols[k]
            ell_vals[rr, fill[rr]] = vals[k]
            fill[rr] += 1
        ec, ev = jnp.asarray(ell_cols), jnp.asarray(ell_vals)

        def ell(x, ec=ec, ev=ev):
            g = x[0, ec]  # (out, E) gather
            return jnp.sum(g * ev, axis=1)[None]

        t1 = bench(coo, x)
        t2 = bench(coo_sorted, x)
        t3 = bench(segsum, x)
        t4 = bench(ell, x)
        print(
            f"[{in_f}x{out_f} nnz={nnz} E={E}] coo {t1*1e6:9.1f}us | "
            f"sorted {t2*1e6:9.1f}us | segsum {t3*1e6:9.1f}us | "
            f"ell {t4*1e6:9.1f}us",
            flush=True,
        )


if __name__ == "__main__":
    main()
