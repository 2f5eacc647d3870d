"""Probe: token-major fused decode attention (v2 design) vs the shipped
per-(slot, head) kernel.

v2 folds ALL kv heads of a slot into one grid step: the cache is
token-major (B, S, Hkv*hd) so one chunk DMA moves every head's rows in a
single contiguous copy, and per-head attention becomes ONE MXU matmul via
a block-diagonal Q (H, Hkv*hd) — logits[hg, t] = q[hg] . k[h(hg), t]
exactly (zero columns contribute exactly 0 in f32 accumulation).

Run: PYTHONPATH=.:/root/.axon_site python -u scripts/attn_v2_probe.py
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _rope_rows(x, cos, sin):
    d2 = x.shape[1] // 2
    rot = jnp.concatenate([-x[:, d2:], x[:, :d2]], axis=1)
    return x * cos + rot * sin


def _v2_kernel(len_ref, q_ref, kn_ref, vn_ref, cos_ref, sin_ref,
               ck_in, cv_in, ck_ref, cv_ref, out_ref,
               kbuf, vbuf, pairk, pairv, ksem, vsem, wsem,
               *, S, chunk, scale, window, rope, hkv, g, hd):
    b = pl.program_id(0)
    KV = hkv * hd
    H = hkv * g
    n = jnp.minimum(len_ref[b], S)
    nchunks = jax.lax.div(n + chunk - 1, chunk)
    lo = jnp.maximum(n - window, 0)
    c0 = jax.lax.div(lo, chunk)

    last = n - 1
    slab = min(16, S)
    off2 = jax.lax.div(last, slab) * slab
    sub = last - off2

    kn = kn_ref[0].astype(jnp.float32)  # (hkv, hd)
    if rope:
        kn = _rope_rows(kn, cos_ref[0], sin_ref[0])

    @pl.when(n > 0)
    def _write():
        rk = pltpu.make_async_copy(ck_ref.at[b, pl.ds(off2, slab)], pairk,
                                   wsem.at[0])
        rv = pltpu.make_async_copy(cv_ref.at[b, pl.ds(off2, slab)], pairv,
                                   wsem.at[1])
        rk.start(); rv.start(); rk.wait(); rv.wait()
        rows = jax.lax.broadcasted_iota(jnp.int32, (slab, 1), 0)
        hit = rows == sub
        vn = vn_ref[0]
        for j in range(hkv):
            sl = pl.ds(j * hd, hd)
            pairk[:, sl] = jnp.where(hit, kn[j:j + 1].astype(pairk.dtype),
                                     pairk[:, sl])
            pairv[:, sl] = jnp.where(hit, vn[j:j + 1].astype(pairv.dtype),
                                     pairv[:, sl])
        wk = pltpu.make_async_copy(pairk, ck_ref.at[b, pl.ds(off2, slab)],
                                   wsem.at[0])
        wv = pltpu.make_async_copy(pairv, cv_ref.at[b, pl.ds(off2, slab)],
                                   wsem.at[1])
        wk.start(); wv.start(); wk.wait(); wv.wait()

    def k_copy(p, slot):
        return pltpu.make_async_copy(
            ck_ref.at[b, pl.ds(p * chunk, chunk)], kbuf.at[slot],
            ksem.at[slot])

    def v_copy(p, slot):
        return pltpu.make_async_copy(
            cv_ref.at[b, pl.ds(p * chunk, chunk)], vbuf.at[slot],
            vsem.at[slot])

    @pl.when(c0 < nchunks)
    def _prologue():
        k_copy(c0, jax.lax.rem(c0, 2)).start()
        v_copy(c0, jax.lax.rem(c0, 2)).start()

    q = q_ref[0].astype(jnp.float32)  # (H, hd)
    if rope:
        q = _rope_rows(q, cos_ref[0], sin_ref[0])

    # block-diagonal Q: (H, KV), rows hg carry q[hg] in columns of kv head
    # hg // g, zeros elsewhere
    row = jax.lax.broadcasted_iota(jnp.int32, (H, hd), 0) // g
    qbd = jnp.concatenate(
        [jnp.where(row == j, q, 0.0) for j in range(hkv)], axis=1)

    def body(p, carry):
        m, l, acc = carry
        slot = jax.lax.rem(p, 2)

        @pl.when(p + 1 < nchunks)
        def _next():
            k_copy(p + 1, 1 - slot).start()
            v_copy(p + 1, 1 - slot).start()

        k_copy(p, slot).wait()
        v_copy(p, slot).wait()
        k = kbuf[slot].astype(jnp.float32)  # (chunk, KV)
        v = vbuf[slot].astype(jnp.float32)

        logits = jax.lax.dot_general(
            qbd, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (H, chunk)
        kpos = p * chunk + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        logits = jnp.where((kpos < n) & (kpos >= lo), logits, NEG_INF)

        m2 = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m2)
        pexp = jnp.exp(logits - m2)
        l2 = l * alpha + jnp.sum(pexp, axis=-1, keepdims=True)
        acc2 = acc * alpha + jnp.dot(pexp, v,
                                     preferred_element_type=jnp.float32)
        return m2, l2, acc2

    init = (jnp.full((H, 1), NEG_INF, jnp.float32),
            jnp.zeros((H, 1), jnp.float32),
            jnp.zeros((H, KV), jnp.float32))
    m, l, acc = jax.lax.fori_loop(c0, nchunks, body, init)
    # extract diagonal blocks: out[hg] = acc[hg, h(hg)*hd : +hd]
    rowm = jax.lax.broadcasted_iota(jnp.int32, (H, hd), 0) // g
    o = jnp.zeros((H, hd), jnp.float32)
    for j in range(hkv):
        o = jnp.where(rowm == j, acc[:, j * hd:(j + 1) * hd], o)
    out_ref[0] = o / jnp.maximum(l, 1e-30)


@functools.partial(jax.jit,
                   static_argnames=("hkv", "hd", "window", "interpret"))
def v2_attention(q, kn, vn, ck, cv, lengths, cos, sin, *, hkv, hd,
                 window=None, interpret=False):
    B, H, _ = q.shape
    S = ck.shape[1]
    KV = hkv * hd
    g = H // hkv
    chunk = min(512 if KV <= 1024 else 128, S)
    win = S + 1 if window is None else window
    out = pl.pallas_call(
        functools.partial(_v2_kernel, S=S, chunk=chunk,
                          scale=1.0 / hd ** 0.5, window=win, rope=True,
                          hkv=hkv, g=g, hd=hd),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, H, hd), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hkv, hd), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hkv, hd), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, hd), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, hd), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, H, hd), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, chunk, KV), ck.dtype),
                pltpu.VMEM((2, chunk, KV), cv.dtype),
                pltpu.VMEM((min(16, S), KV), ck.dtype),
                pltpu.VMEM((min(16, S), KV), cv.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(ck.shape, ck.dtype),
            jax.ShapeDtypeStruct(cv.shape, cv.dtype),
            jax.ShapeDtypeStruct((B, H, hd), jnp.float32),
        ],
        input_output_aliases={6: 0, 7: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(lengths, q, kn, vn, cos, sin, ck, cv)
    return out[2], out[0], out[1]


def mirror(q, kn, vn, ck4, cv4, lengths, cos, sin, *, hkv, hd, window=None):
    """XLA reference on token-major (B, S, Hkv, hd) caches."""
    B, H, _ = q.shape
    g = H // hkv
    S = ck4.shape[1]

    def rope(x):
        d2 = hd // 2
        rot = jnp.concatenate([-x[..., d2:], x[..., :d2]], axis=-1)
        return x * cos + rot * sin  # cos/sin (B, 1, hd) broadcast over heads

    qr = rope(q.astype(jnp.float32))
    knr = rope(kn.astype(jnp.float32))
    idx = jnp.arange(B)
    ck4 = ck4.at[idx, lengths - 1].set(knr.astype(ck4.dtype))
    cv4 = cv4.at[idx, lengths - 1].set(vn.astype(cv4.dtype))
    k = jnp.repeat(ck4.astype(jnp.float32), g, axis=2)
    v = jnp.repeat(cv4.astype(jnp.float32), g, axis=2)
    logits = jnp.einsum("bhd,bshd->bhs", qr.astype(jnp.bfloat16).astype(
        jnp.float32), k, preferred_element_type=jnp.float32) / hd ** 0.5
    kpos = jnp.arange(S)[None, None]
    n = lengths[:, None, None]
    lo = 0 if window is None else jnp.maximum(n - window, 0)
    mask = (kpos < n) & (kpos >= lo)
    logits = jnp.where(mask, logits, NEG_INF)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhs,bshd->bhd", p, v,
                      preferred_element_type=jnp.float32), ck4, cv4


def run_case(B, S, hkv, g, hd, n_iter=200, interpret=False):
    H = hkv * g
    KV = hkv * hd
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, hd)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((B, hkv, hd)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((B, hkv, hd)), jnp.float32)
    ck = jnp.asarray(rng.standard_normal((B, S, KV)), jnp.bfloat16)
    cv = jnp.asarray(rng.standard_normal((B, S, KV)), jnp.bfloat16)
    lengths = jnp.asarray(
        rng.integers(1, S + 1, (B,)), jnp.int32)
    cos = jnp.asarray(rng.standard_normal((B, 1, hd)), jnp.float32)
    sin = jnp.asarray(rng.standard_normal((B, 1, hd)), jnp.float32)

    out, ck2, cv2 = v2_attention(q, kn, vn, ck, cv, lengths, cos, sin,
                                 hkv=hkv, hd=hd, interpret=interpret)
    ref, ck4r, cv4r = jax.jit(functools.partial(
        mirror, hkv=hkv, hd=hd))(q, kn, vn,
                                 ck.reshape(B, S, hkv, hd),
                                 cv.reshape(B, S, hkv, hd),
                                 lengths, cos, sin)
    err = float(jnp.max(jnp.abs(out - ref)))
    cerr = float(jnp.max(jnp.abs(
        ck2.reshape(B, S, hkv, hd).astype(jnp.float32)
        - ck4r.astype(jnp.float32))))
    # timing: chain steps through the cache
    @jax.jit
    def loop(q, kn, vn, ck, cv, lengths, cos, sin):
        def body(i, carry):
            ck, cv, acc = carry
            out, ck, cv = v2_attention(q, kn, vn, ck, cv, lengths, cos, sin,
                                       hkv=hkv, hd=hd)
            return ck, cv, acc + jnp.sum(out) * 1e-30
        ck, cv, acc = jax.lax.fori_loop(
            0, n_iter, body, (ck, cv, jnp.float32(0)))
        return acc

    if not interpret:
        float(loop(q, kn, vn, ck, cv, lengths, cos, sin))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(q, kn, vn, ck, cv, lengths, cos, sin))
            best = min(best, time.perf_counter() - t0)
        us = best / n_iter * 1e6
    else:
        us = float("nan")
    print(f"B={B:<3d} S={S:<5d} hkv={hkv:<3d} g={g} "
          f"err={err:.2e} cache_err={cerr:.2e} {us:8.2f} us/layer-step",
        flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    interp = jax.default_backend() != "tpu"
    run_case(1, 128, 32, 1, 128, interpret=interp)   # 7B flagship shape
    if not interp:
        run_case(1, 2048, 32, 1, 128)                # long context
        run_case(16, 512, 32, 1, 128)                # dense serving pool
        run_case(1, 1024, 8, 4, 128)                 # Mistral GQA
        run_case(1, 2048, 40, 1, 128)                # 13B
