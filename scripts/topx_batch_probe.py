"""Micro A/B: hybrid topX placement (scatter vs one-hot) across batch.

Decides the 'auto' boundary in xla_ops.hybrid_matmul. Timed with the
T(2K)-T(K) fori_loop protocol (axon-tunnel-proof, see kernel_bench).

Run: PYTHONPATH=.:/root/.axon_site python -u scripts/topx_batch_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
from kernel_bench import bench  # noqa: E402

from squeezellm_tpu.ops import xla_ops  # noqa: E402


def main():
    out_f, in_f, topx = 22016, 4096, 20
    k = jax.random.PRNGKey(0)
    w = jax.random.normal(k, (in_f, topx), jnp.float32) * 0.05
    idx = jax.random.choice(k, out_f, (topx,), replace=False).astype(jnp.int32)
    idx_f = idx.astype(jnp.float32)
    for b in (1, 8, 16, 32, 64, 256, 2048):
        x = jax.random.normal(k, (b, in_f), jnp.float32)
        for mode in ("scatter", "onehot", "onehot-f"):
            os.environ["SQUEEZELLM_TOPX_MODE"] = mode

            def fn(x, mode=mode):
                return xla_ops.hybrid_matmul(x, w, idx, out_f,
                                             topx_idx_f=idx_f)

            t = bench(jax.jit(fn), x, K=64)
            print(f"b={b:5d} {mode:9s} {t*1e6:9.2f} us", flush=True)


if __name__ == "__main__":
    main()
