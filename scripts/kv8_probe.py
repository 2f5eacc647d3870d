"""int8-KV paged attention A/B on the real chip (ROADMAP item 9 tail).

Times ONE layer's paged decode attention at 7B geometry (Hkv=32, hd=128,
ps=128) over a full 2048-token context, bf16 pools vs int8+scale pools.
The int8 pool streams ~half the bytes, so at full context the kernel
should approach a 2x time win (the VPU dequant — convert + one broadcast
multiply per element — rides under the DMA).

Timing follows scripts/kernel_bench.py: K vs 2K jitted fori_loop windows,
scalar-fenced, (T(2K)-T(K))/K — dispatch and fetch costs cancel. The
attention output feeds a tiny perturbation of q so the loop body cannot
be hoisted; pools are loop-carried (each iteration re-writes the current
token, exactly the serving steady state).

Run: PYTHONPATH=.:/root/.axon_site python -u scripts/kv8_probe.py
"""

import argparse
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from squeezellm_tpu.ops import kv_quant, paged_attn


def bench_loop(step, carry0, K=32, trials=3):
    """step: carry -> carry (pools + q threaded through). Seconds/step."""

    def make(n):
        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(carry, n):
            carry = jax.lax.fori_loop(0, n, lambda i, c: step(c), carry)
            return carry[-1]  # scalar fence

        return lambda c: loop(c, n)

    lk, l2k = make(K), make(2 * K)
    float(jnp.sum(lk(carry0))), float(jnp.sum(l2k(carry0)))  # compile+warm
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        float(jnp.sum(lk(carry0)))
        t1 = time.perf_counter()
        float(jnp.sum(l2k(carry0)))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / K)
    return max(best, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hkv", type=int, default=32)
    ap.add_argument("--hd", type=int, default=128)
    ap.add_argument("--ps", type=int, default=128)
    ap.add_argument("--ctx", type=int, default=2048)
    ap.add_argument("--batch", type=int, nargs="*", default=[1, 8])
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()
    Hkv, hd, ps, ctx = args.hkv, args.hd, args.ps, args.ctx
    npages_slot = ctx // ps
    on_tpu = jax.default_backend() == "tpu"
    print("backend:", jax.default_backend(), flush=True)

    rng = np.random.default_rng(0)
    for B in args.batch:
        P = B * npages_slot + 1
        q = jnp.asarray(rng.standard_normal((B, Hkv, hd)), jnp.float32)
        kn = jnp.asarray(rng.standard_normal((B, Hkv, hd)), jnp.float32)
        vn = jnp.asarray(rng.standard_normal((B, Hkv, hd)), jnp.float32)
        pt = jnp.asarray(
            np.arange(1, P).reshape(B, npages_slot), jnp.int32)
        lengths = jnp.full((B,), ctx - 1, jnp.int32)  # steady state: full
        from squeezellm_tpu.models import common as _c
        rcos, rsin = _c.rope_cos_sin(lengths - 1, hd, 10000.0)
        hist4 = rng.standard_normal((P, Hkv, ps, hd)).astype(np.float32)
        # token-major pool layout (P, ps, Hkv*hd) — round 4
        hist = np.ascontiguousarray(
            hist4.transpose(0, 2, 1, 3).reshape(P, ps, Hkv * hd))

        # bf16 pools
        pk = jnp.asarray(hist, jnp.bfloat16)
        pv = jnp.asarray(hist, jnp.bfloat16)

        def step16(c):
            q_, pk_, pv_, s = c
            out, pk2, pv2 = paged_attn.paged_decode_attention(
                q_, kn, vn, pk_, pv_, pt, lengths, page_size=ps,
                rope_cos=rcos, rope_sin=rsin, interpret=not on_tpu)
            s2 = jnp.sum(out) * 1e-30
            return (q * (1.0 + s2), pk2, pv2, s + s2)

        t16 = bench_loop(step16, (q, pk, pv, jnp.float32(0)), K=args.iters)

        # int8 pools + head-major f32 scale sidecars
        qk4, sk4 = kv_quant.quantize_rows(jnp.asarray(hist4))
        qk = jnp.asarray(np.ascontiguousarray(
            np.asarray(qk4).transpose(0, 2, 1, 3).reshape(P, ps, Hkv * hd)))
        sk = kv_quant.pool_pack_scales(sk4)
        qv, sv = qk, sk

        def step8(c):
            q_, pk_, pv_, sk_, sv_, s = c
            out, pk2, pv2, sk2, sv2 = paged_attn.paged_decode_attention_q8(
                q_, kn, vn, pk_, pv_, sk_, sv_, pt, lengths, page_size=ps,
                rope_cos=rcos, rope_sin=rsin, interpret=not on_tpu)
            s2 = jnp.sum(out) * 1e-30
            return (q * (1.0 + s2), pk2, pv2, sk2, sv2, s + s2)

        t8 = bench_loop(step8, (q, qk, qv, sk, sv, jnp.float32(0)),
                        K=args.iters)

        bytes16 = 2 * B * Hkv * ctx * hd * 2  # k+v, bf16
        bytes8 = 2 * B * Hkv * ctx * (hd * 1 + 4)  # codes + row scale
        print(f"B={B:2d} ctx={ctx} bf16: {t16*1e3:7.3f} ms "
              f"({bytes16/t16/1e9:6.1f} GB/s) | int8: {t8*1e3:7.3f} ms "
              f"({bytes8/t8/1e9:6.1f} GB/s) | speedup {t16/t8:5.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
