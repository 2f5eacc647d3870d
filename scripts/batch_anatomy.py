"""Decompose the batched-decode step cost (ROADMAP item 8: a 16-slot
decode step measured ~4x a batch-1 step although weights stream once).

Times each decode-path component SEPARATELY vs batch, with the
kernel_bench differencing protocol (tunnel-proof):

  lut      fused LUT-dequant matmul at the 7B fused-decode shapes
           (qkv 4096->12288, o 4096->4096, gateup 4096->22016,
           down 11008->4096), default block auto-tuning
  lut/wXXX same with a forced w_blk (batched-branch hypothesis: the
           batch>8 branch drops to w_blk=128 whose packed-word streaming
           rate is ~1.5x lower than w512)
  spmv     two-hop-gather SpMV (batch = leading grid dim -> linear in B)
  attn     fused dense decode attention, S=2048 cache, len=512

Run: PYTHONPATH=.:/root/.axon_site python -u scripts/batch_anatomy.py
"""

import sys

sys.path.insert(0, "scripts")

import numpy as np
import jax
import jax.numpy as jnp

from kernel_bench import bench
from squeezellm_tpu import formats
from squeezellm_tpu.ops import pallas_ops, spmv
from squeezellm_tpu.ops.quant_linear import transposed_lut


SHAPES = [  # (name, in_features, out_features) — 7B fused decode
    ("qkv", 4096, 12288),
    ("o", 4096, 4096),
    ("gateup", 4096, 22016),
    ("down", 11008, 4096),
]
BATCHES = [1, 8, 16, 32]


def main():
    print("backend:", jax.default_backend(), flush=True)
    bits = 4
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)

    total = {b: 0.0 for b in BATCHES}
    for name, in_f, out_f in SHAPES:
        nw = formats.n_words(in_f, bits)
        qweight = jax.random.randint(key, (nw, out_f), -(2 ** 31),
                                     2 ** 31 - 1, jnp.int32)
        lut = jnp.sort(jax.random.normal(key, (out_f, 2 ** bits)) * 0.02,
                       axis=1)
        lut_t = jnp.asarray(transposed_lut(np.asarray(lut), bits))
        wq_bytes = nw * out_f * 4

        # sparse plan at 0.45% nnz
        nnz = int(in_f * out_f * 0.0045)
        rows = rng.integers(0, out_f, nnz).astype(np.int32)
        cols = rng.integers(0, in_f, nnz).astype(np.int32)
        vals = rng.normal(size=nnz).astype(np.float32)
        plan = spmv.build_plan(rows, cols, vals, out_f, in_f)
        meta, pvals = jnp.asarray(plan.meta), jnp.asarray(plan.vals)

        for b in BATCHES:
            x = jax.random.normal(key, (b, in_f), jnp.float32)
            t_lut = bench(
                lambda a: pallas_ops.lut_matmul(a, qweight, lut, bits,
                                                mode="bf16", lut_t=lut_t),
                x, K=32)
            t_sp = bench(
                lambda a: pallas_ops.gather_spmv(
                    a, meta, pvals, oh=plan.oh, ih=plan.ih,
                    out_features=out_f),
                x, K=32)
            extra = ""
            if b > 8:
                for wb in (512,):
                    t_w = bench(
                        lambda a: pallas_ops.lut_matmul(
                            a, qweight, lut, bits, mode="bf16", lut_t=lut_t,
                            w_blk=wb, o_blk=1024),
                        x, K=32)
                    extra += f" | lut/w{wb} {t_w*1e6:7.1f}us"
            gbs = wq_bytes / t_lut / 1e9
            print(f"[{name:6s} b={b:<3d}] lut {t_lut*1e6:7.1f}us "
                  f"({gbs:6.1f}GB/s) | spmv {t_sp*1e6:7.1f}us{extra}",
                  flush=True)
            total[b] += t_lut + t_sp

    # fused decode attention: 7B dims, 2048-cache, 512 valid rows
    from squeezellm_tpu.ops import decode_attn

    H, Hkv, hd, S = 32, 32, 128, 2048
    for b in [1, 8, 16]:
        q = jax.random.normal(key, (b, H, hd), jnp.float32)
        kn = jax.random.normal(key, (b, Hkv, hd), jnp.float32)
        vn = jax.random.normal(key, (b, Hkv, hd), jnp.float32)
        ck = jnp.zeros((b, Hkv, S, hd), jnp.bfloat16)
        cv = jnp.zeros((b, Hkv, S, hd), jnp.bfloat16)
        lengths = jnp.full((b,), 512, jnp.int32)
        from squeezellm_tpu.models import common as _c
        rcos, rsin = _c.rope_cos_sin(lengths - 1, hd, 10000.0)

        def attn(a, ck=ck, cv=cv, kn=kn, vn=vn, lengths=lengths):
            o, _, _ = decode_attn.dense_decode_attention(
                a, kn, vn, ck, cv, lengths, rope_cos=rcos, rope_sin=rsin)
            return o

        t_at = bench(attn, q, K=32)
        print(f"[attn   b={b:<3d}] {t_at*1e6:7.1f}us "
              f"(x32 layers = {t_at*32*1e3:6.2f} ms/step)", flush=True)

    for b in BATCHES:
        print(f"b={b:<3d}: linears sum x32 layers = "
              f"{total[b]*32*1e3:7.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
