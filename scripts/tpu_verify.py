"""Hardware correctness smoke for the fused kernels (run on the real chip).

Catches Mosaic-lowering bugs that interpret mode cannot (e.g. the default
MXU precision truncating f32 operands to bf16, or 3D-block layout bugs).
Exit code 0 iff every config matches the dense-math reference.
"""

import sys

import numpy as np
import jax.numpy as jnp

from squeezellm_tpu import formats
from squeezellm_tpu.ops import pallas_ops


def _flatp(pool):
    """Head-major (.., Hkv, S, hd) -> token-major (.., S, Hkv*hd)."""
    *lead, Hkv, S, hd = pool.shape
    perm = list(range(len(lead))) + [len(lead) + 1, len(lead),
                                     len(lead) + 2]
    return np.ascontiguousarray(np.transpose(pool, perm).reshape(
        *lead, S, Hkv * hd))


def _hmp(pool, Hkv):
    """Token-major (.., S, Hkv*hd) -> head-major (.., Hkv, S, hd)."""
    pool = np.asarray(pool)
    *lead, S, KV = pool.shape
    hd = KV // Hkv
    perm = list(range(len(lead))) + [len(lead) + 1, len(lead),
                                     len(lead) + 2]
    return np.transpose(pool.reshape(*lead, S, Hkv, hd), perm)


def main():
    rng = np.random.default_rng(0)
    failures = 0
    for bits in (3, 4):
        for (in_f, out_f, batch) in ((640, 512, 4), (4096, 1024, 1),
                                     (4096, 1024, 20), (11008, 512, 1)):
            lut = np.sort(
                rng.normal(size=(out_f, 2**bits)).astype(np.float32), axis=1
            )
            codes = rng.integers(0, 2**bits, size=(in_f, out_f), dtype=np.uint8)
            qweight = formats.pack_codes(codes, bits)
            w_dense = formats.dequant_np(codes, lut)
            x = rng.normal(size=(batch, in_f)).astype(np.float32)
            for mode in ("select", "gather"):
                y = pallas_ops.lut_matmul(
                    jnp.asarray(x), jnp.asarray(qweight), jnp.asarray(lut),
                    bits, b_blk=8, w_blk=128, o_blk=512, mode=mode,
                )
                err = np.abs(np.asarray(y) - x @ w_dense).max()
                ok = err < 5e-4 * np.sqrt(in_f / 640)
                failures += not ok
                print(
                    f"{'OK ' if ok else 'BAD'} bits={bits} in={in_f} "
                    f"out={out_f} b={batch} {mode}: err {err:.2e}",
                    flush=True,
                )
            # large-batch dequant-to-scratch path (forced via big_batch)
            y = pallas_ops.lut_matmul(
                jnp.asarray(x), jnp.asarray(qweight), jnp.asarray(lut),
                bits, mode="gather", big_batch=1,
            )
            err = np.abs(np.asarray(y) - x @ w_dense).max()
            ok = err < 5e-4 * np.sqrt(in_f / 640)
            failures += not ok
            print(f"{'OK ' if ok else 'BAD'} bits={bits} in={in_f} "
                  f"out={out_f} b={batch} bigbatch: err {err:.2e}", flush=True)

    # structured additive codebook kernel (round 5): both variants, plus
    # the y0 residual-fold init — hardware gathers/selects only
    for variant in ("sel", "fdot"):
        in_f, out_f, batch = 4096, 1024, 1
        A = np.sort(rng.normal(size=(out_f, 8)).astype(np.float32), axis=1)
        dv = (np.abs(rng.normal(size=(out_f,))) * 0.3 + 0.05).astype(
            np.float32)
        lut = np.concatenate([A, A + dv[:, None]], axis=1)
        codes = rng.integers(0, 16, size=(in_f, out_f), dtype=np.uint8)
        qweight = formats.pack_codes(codes, 4)
        w_dense = formats.dequant_np(codes, lut)
        st = np.zeros((16, out_f), np.float32)
        st[0:8] = A.T
        st[8] = dv / 8.0
        x = rng.normal(size=(batch, in_f)).astype(np.float32)
        y0 = rng.normal(size=(batch, out_f)).astype(np.float32)
        y = np.asarray(pallas_ops.lut_matmul(
            jnp.asarray(x), jnp.asarray(qweight), jnp.asarray(lut), 4,
            mode="gather", lut_t_struct=jnp.asarray(st),
            struct_variant=variant, y0=jnp.asarray(y0)))
        err = np.abs(y - (y0 + x @ w_dense)).max()
        ok = err < 5e-4 * np.sqrt(in_f / 640)
        failures += not ok
        print(f"{'OK ' if ok else 'BAD'} structured-{variant}+y0: "
              f"err {err:.2e}", flush=True)

    # two-hop-gather SpMV (classic scan kernel + grouped-window kernel)
    from squeezellm_tpu.ops import spmv

    o, i = 1000, 1300
    nnz = int(o * i * 0.01)
    r = rng.integers(0, o, nnz)
    c = rng.integers(0, i, nnz)
    v = rng.standard_normal(nnz).astype(np.float32)
    plan = spmv.build_plan(r, c, v, o, i)
    x = rng.standard_normal((2, i)).astype(np.float32)
    dense = np.zeros((o, i), np.float32)
    np.add.at(dense, (r, c), v)
    y = np.asarray(pallas_ops.gather_spmv(
        jnp.asarray(x), jnp.asarray(plan.meta), jnp.asarray(plan.vals),
        oh=plan.oh, ih=plan.ih, out_features=o))
    err = np.abs(y - x @ dense.T).max()
    ok = err < 1e-4
    failures += not ok
    print(f"{'OK ' if ok else 'BAD'} gather_spmv: err {err:.2e}", flush=True)

    gp = spmv.build_plan_grouped(r, c, v, o, i)
    yg = np.asarray(pallas_ops.gather_spmv(
        jnp.asarray(x), jnp.asarray(gp.meta), jnp.asarray(gp.vals),
        oh=gp.oh, ih=gp.ih, out_features=o,
        groups=jnp.asarray(gp.groups)))
    err = np.abs(yg - x @ dense.T).max()
    ok = err < 1e-4
    failures += not ok
    print(f"{'OK ' if ok else 'BAD'} gather_spmv grouped: err {err:.2e}",
          flush=True)

    # fused sparse GEMV: per-o-block plans folded into the lut kernel
    for bits in (3, 4):
        in_f, out_f, batch = 4096, 2560, 1
        lut = np.sort(rng.normal(size=(out_f, 2**bits)).astype(np.float32),
                      axis=1)
        codes = rng.integers(0, 2**bits, size=(in_f, out_f), dtype=np.uint8)
        qweight = formats.pack_codes(codes, bits)
        w_dense = formats.dequant_np(codes, lut)
        nnz = int(out_f * in_f * 0.0045)
        r = rng.integers(0, out_f, nnz)
        c = rng.integers(0, in_f, nnz)
        v = rng.standard_normal(nnz).astype(np.float32)
        bmeta, bvals, ih = spmv.build_block_plans(r, c, v, out_f, in_f)
        x = rng.normal(size=(batch, in_f)).astype(np.float32)
        y = np.asarray(pallas_ops.lut_matmul(
            jnp.asarray(x), jnp.asarray(qweight), jnp.asarray(lut), bits,
            mode="gather", sgb_meta=jnp.asarray(bmeta),
            sgb_vals=jnp.asarray(bvals), sgb_ih=ih))
        sp = np.zeros((in_f, out_f), np.float32)
        np.add.at(sp, (c, r), v)
        err = np.abs(y - x @ (w_dense + sp)).max()
        ok = err < 5e-4 * np.sqrt(in_f / 640)
        failures += not ok
        print(f"{'OK ' if ok else 'BAD'} fused-sparse bits={bits}: "
              f"err {err:.2e}", flush=True)

    # paged decode attention (fused cache write + page-table attention)
    from squeezellm_tpu.ops import paged_attn

    B, Hkv, g, hd, ps, P, maxp = 2, 4, 2, 128, 128, 8, 4
    H = g * Hkv
    lengths = np.asarray([5, 300], np.int32)
    pt = np.arange(B * maxp, dtype=np.int32).reshape(B, maxp)
    pk = rng.standard_normal((P, Hkv, ps, hd)).astype(np.float32)
    pv = rng.standard_normal((P, Hkv, ps, hd)).astype(np.float32)
    q = rng.standard_normal((B, H, hd)).astype(np.float32)
    kn = rng.standard_normal((B, Hkv, hd)).astype(np.float32)
    vn = rng.standard_normal((B, Hkv, hd)).astype(np.float32)
    out, pk2, pv2 = paged_attn.paged_decode_attention(
        jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn),
        jnp.asarray(_flatp(pk)), jnp.asarray(_flatp(pv)),
        jnp.asarray(pt), jnp.asarray(lengths), page_size=ps)
    out = np.asarray(out)
    pk2, pv2 = _hmp(pk2, Hkv), _hmp(pv2, Hkv)
    werr = 0.0
    for b in range(B):
        n = int(lengths[b])
        pidx = pt[b, (n - 1) // ps]
        werr = max(werr, np.abs(pk2[pidx, :, (n - 1) % ps] - kn[b]).max())
    aerr = 0.0
    for b in range(B):
        n = int(lengths[b])
        ks = np.concatenate([pk2[pt[b, p]] for p in range((n + ps - 1) // ps)],
                            axis=1)[:, :n]
        vs = np.concatenate([pv2[pt[b, p]] for p in range((n + ps - 1) // ps)],
                            axis=1)[:, :n]
        for h in range(H):
            kh = h // g
            lg = (ks[kh].astype(np.float64) @ q[b, h]) / np.sqrt(hd)
            pr = np.exp(lg - lg.max()); pr /= pr.sum()
            aerr = max(aerr, np.abs(out[b, h] - pr @ vs[kh]).max())
    ok = werr < 1e-6 and aerr < 5e-2
    failures += not ok
    print(f"{'OK ' if ok else 'BAD'} paged_attn: write err {werr:.1e} "
          f"attn err {aerr:.2e}", flush=True)

    # fused dense-cache decode attention (cache write + chunked attention)
    from squeezellm_tpu.ops import decode_attn

    B, Hkv, g, hd, S = 3, 4, 2, 128, 2048
    H = g * Hkv
    for window in (None, 700):
        lengths = np.asarray([900, 1, 0], np.int32)
        ck = rng.standard_normal((B, Hkv, S, hd)).astype(np.float32)
        cv = rng.standard_normal((B, Hkv, S, hd)).astype(np.float32)
        q = rng.standard_normal((B, H, hd)).astype(np.float32)
        kn = rng.standard_normal((B, Hkv, hd)).astype(np.float32)
        vn = rng.standard_normal((B, Hkv, hd)).astype(np.float32)
        out, ck2, cv2 = decode_attn.dense_decode_attention(
            jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn),
            jnp.asarray(_flatp(ck)), jnp.asarray(_flatp(cv)),
            jnp.asarray(lengths),
            sliding_window=window)
        out = np.asarray(out)
        ck2, cv2 = _hmp(ck2, Hkv), _hmp(cv2, Hkv)
        werr = max(np.abs(ck2[b, :, int(lengths[b]) - 1] - kn[b]).max()
                   for b in range(B) if lengths[b] > 0)
        aerr = 0.0
        for b in range(B):
            n = int(lengths[b])
            if n == 0:
                aerr = max(aerr, np.abs(out[b]).max())
                continue
            lo = max(0, n - (window or S + 1))
            for h in range(H):
                kh = h // g
                lg = (ck2[b, kh, lo:n].astype(np.float64) @ q[b, h]
                      ) / np.sqrt(hd)
                pr = np.exp(lg - lg.max()); pr /= pr.sum()
                aerr = max(aerr, np.abs(out[b, h] - pr @ cv2[b, kh, lo:n]
                                        ).max())
        ok = werr < 1e-6 and aerr < 5e-2
        failures += not ok
        print(f"{'OK ' if ok else 'BAD'} dense_attn window={window}: "
              f"write err {werr:.1e} attn err {aerr:.2e}", flush=True)

    # paged verify window (speculative): W-token write + causal window
    # attention vs the numpy oracle, page-boundary crossing write
    from squeezellm_tpu.ops import paged_attn

    Bv, Hkvv, hdv, Pv, maxpv, psv, gv, Wv = 2, 2, 128, 10, 3, 128, 2, 4
    Hv = gv * Hkvv
    startv = np.asarray([126, 0], np.int32)  # crosses page 0 -> 1; fresh
    ptv = np.zeros((Bv, maxpv), np.int32)
    ptv[0] = [1, 2, 3]
    ptv[1] = [4, 5, 6]
    pkv = rng.standard_normal((Pv, Hkvv, psv, hdv)).astype(np.float32)
    pvv = rng.standard_normal((Pv, Hkvv, psv, hdv)).astype(np.float32)
    qv = rng.standard_normal((Bv, Hv, Wv, hdv)).astype(np.float32)
    knv = rng.standard_normal((Bv, Hkvv, Wv, hdv)).astype(np.float32)
    vnv = rng.standard_normal((Bv, Hkvv, Wv, hdv)).astype(np.float32)
    outv, pk2v, pv2v = paged_attn.paged_verify_attention(
        jnp.asarray(qv), jnp.asarray(knv), jnp.asarray(vnv),
        jnp.asarray(_flatp(pkv)), jnp.asarray(_flatp(pvv)),
        jnp.asarray(ptv), jnp.asarray(startv), page_size=psv)
    outv = np.asarray(outv)
    pk2v, pv2v = _hmp(pk2v, Hkvv), _hmp(pv2v, Hkvv)
    werr = 0.0
    aerr = 0.0
    for b in range(Bv):
        for w in range(Wv):
            posw = startv[b] + w
            pid, off = ptv[b, posw // psv], posw % psv
            werr = max(werr, np.abs(pk2v[pid, :, off] - knv[b, :, w]).max())
        Sv = maxpv * psv
        k_all = np.zeros((Hkvv, Sv, hdv))
        v_all = np.zeros((Hkvv, Sv, hdv))
        for p in range(maxpv):
            k_all[:, p * psv:(p + 1) * psv] = pk2v[ptv[b, p]]
            v_all[:, p * psv:(p + 1) * psv] = pv2v[ptv[b, p]]
        for h in range(Hv):
            kh = h // gv
            for w in range(Wv):
                nw = startv[b] + w + 1
                lg = (k_all[kh, :nw] @ qv[b, h, w]) / np.sqrt(hdv)
                pr = np.exp(lg - lg.max())
                pr /= pr.sum()
                aerr = max(aerr, np.abs(outv[b, h, w] - pr @ v_all[kh, :nw]
                                        ).max())
    ok = werr < 1e-6 and aerr < 5e-2
    failures += not ok
    print(f"{'OK ' if ok else 'BAD'} paged_verify: write err {werr:.1e} "
          f"attn err {aerr:.2e}", flush=True)

    # int8 KV paged decode (q8): quantized pools + lane-major f32 scale
    # sidecar (kv_quant.pack_scales layout), in-kernel quantize at the
    # write, dequant on chunk load. The (8, ps) f32 sidecar tile DMA is
    # the hardware-risk piece (interpret mode can't catch Mosaic
    # slice-alignment rules).
    from squeezellm_tpu.ops import kv_quant

    B, Hkv, g, hd, ps, P, maxp = 2, 4, 2, 128, 128, 8, 4
    H = g * Hkv
    lengths = np.asarray([5, 300], np.int32)
    pt = np.arange(B * maxp, dtype=np.int32).reshape(B, maxp)
    hist_k = rng.standard_normal((P, Hkv, ps, hd)).astype(np.float32)
    hist_v = rng.standard_normal((P, Hkv, ps, hd)).astype(np.float32)
    qk, sk = kv_quant.quantize_rows(jnp.asarray(hist_k))
    qv_, sv = kv_quant.quantize_rows(jnp.asarray(hist_v))
    sk, sv = kv_quant.pool_pack_scales(sk), kv_quant.pool_pack_scales(sv)
    q = rng.standard_normal((B, H, hd)).astype(np.float32)
    kn = rng.standard_normal((B, Hkv, hd)).astype(np.float32)
    vn = rng.standard_normal((B, Hkv, hd)).astype(np.float32)
    out, pk2, pv2, sk2, sv2 = paged_attn.paged_decode_attention_q8(
        jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn),
        jnp.asarray(_flatp(np.asarray(qk))), jnp.asarray(_flatp(np.asarray(qv_))),
        sk, sv, jnp.asarray(pt), jnp.asarray(lengths), page_size=ps)
    out = np.asarray(out)
    kd = np.asarray(kv_quant.dequantize_rows(
        jnp.asarray(_hmp(pk2, Hkv)), kv_quant.pool_unpack_scales(sk2, Hkv)))
    vd = np.asarray(kv_quant.dequantize_rows(
        jnp.asarray(_hmp(pv2, Hkv)), kv_quant.pool_unpack_scales(sv2, Hkv)))
    werr = 0.0
    for b in range(B):
        n = int(lengths[b])
        pidx = pt[b, (n - 1) // ps]
        # write path: dequantized row within half a quant step of kn
        werr = max(werr, np.abs(kd[pidx, :, (n - 1) % ps] - kn[b]).max())
    aerr = 0.0
    for b in range(B):
        n = int(lengths[b])
        ks = np.concatenate([kd[pt[b, p]] for p in range((n + ps - 1) // ps)],
                            axis=1)[:, :n]
        vs = np.concatenate([vd[pt[b, p]] for p in range((n + ps - 1) // ps)],
                            axis=1)[:, :n]
        for h in range(H):
            kh = h // g
            lg = (ks[kh].astype(np.float64) @ q[b, h]) / np.sqrt(hd)
            pr = np.exp(lg - lg.max()); pr /= pr.sum()
            aerr = max(aerr, np.abs(out[b, h] - pr @ vs[kh]).max())
    # werr bound: half a quant step of a ~N(0,1) row, |max| ~ 3-4 -> ~0.02
    ok = werr < 0.05 and aerr < 5e-2
    failures += not ok
    print(f"{'OK ' if ok else 'BAD'} paged_attn_q8: write err {werr:.1e} "
          f"attn err {aerr:.2e}", flush=True)

    # int8 KV verify window (q8 speculative twin), page-crossing write
    startq = np.asarray([126, 0], np.int32)
    ptq = np.zeros((2, 3), np.int32)
    ptq[0] = [1, 2, 3]
    ptq[1] = [4, 5, 6]
    Wq = 4
    hist_k = rng.standard_normal((10, 2, 128, 128)).astype(np.float32)
    hist_v = rng.standard_normal((10, 2, 128, 128)).astype(np.float32)
    qk, sk = kv_quant.quantize_rows(jnp.asarray(hist_k))
    qv_, sv = kv_quant.quantize_rows(jnp.asarray(hist_v))
    sk, sv = kv_quant.pool_pack_scales(sk), kv_quant.pool_pack_scales(sv)
    qw = rng.standard_normal((2, 4, Wq, 128)).astype(np.float32)
    knw = rng.standard_normal((2, 2, Wq, 128)).astype(np.float32)
    vnw = rng.standard_normal((2, 2, Wq, 128)).astype(np.float32)
    outw, pk2, pv2, sk2, sv2 = paged_attn.paged_verify_attention_q8(
        jnp.asarray(qw), jnp.asarray(knw), jnp.asarray(vnw),
        jnp.asarray(_flatp(np.asarray(qk))), jnp.asarray(_flatp(np.asarray(qv_))),
        sk, sv, jnp.asarray(ptq), jnp.asarray(startq),
        page_size=128)
    outw = np.asarray(outw)
    kd = np.asarray(kv_quant.dequantize_rows(
        jnp.asarray(_hmp(pk2, 2)), kv_quant.pool_unpack_scales(sk2, 2)))
    vd = np.asarray(kv_quant.dequantize_rows(
        jnp.asarray(_hmp(pv2, 2)), kv_quant.pool_unpack_scales(sv2, 2)))
    werr = aerr = 0.0
    for b in range(2):
        for w in range(Wq):
            posw = startq[b] + w
            pid, off = ptq[b, posw // 128], posw % 128
            werr = max(werr, np.abs(kd[pid, :, off] - knw[b, :, w]).max())
        k_all = np.concatenate([kd[ptq[b, p]] for p in range(3)], axis=1)
        v_all = np.concatenate([vd[ptq[b, p]] for p in range(3)], axis=1)
        for h in range(4):
            kh = h // 2
            for w in range(Wq):
                nw = startq[b] + w + 1
                lg = (k_all[kh, :nw].astype(np.float64) @ qw[b, h, w]
                      ) / np.sqrt(128)
                pr = np.exp(lg - lg.max()); pr /= pr.sum()
                aerr = max(aerr,
                           np.abs(outw[b, h, w] - pr @ v_all[kh, :nw]).max())
    ok = werr < 0.05 and aerr < 5e-2
    failures += not ok
    print(f"{'OK ' if ok else 'BAD'} paged_verify_q8: write err {werr:.1e} "
          f"attn err {aerr:.2e}", flush=True)

    # int8 DENSE-cache decode (q8 twin of dense_decode_attention): slab
    # RMW on the int8 cache + (8, L) sidecar tiles, multi-group S
    from squeezellm_tpu.ops import decode_attn as _da

    Bd, Hkvd, gd, hdd, Sd = 2, 2, 2, 128, 256
    Hd = gd * Hkvd
    lengths_d = np.asarray([5, 200], np.int32)
    hist_k = rng.standard_normal((Bd, Hkvd, Sd, hdd)).astype(np.float32)
    hist_v = rng.standard_normal((Bd, Hkvd, Sd, hdd)).astype(np.float32)
    qk, sk = kv_quant.quantize_rows(jnp.asarray(hist_k))
    qv_, sv = kv_quant.quantize_rows(jnp.asarray(hist_v))
    # dense q8 sidecar (B, Hkv8, S): head rows padded to the f32 tile
    # (quantize_rows on (B, Hkv, S, hd) already yields head-major rows)
    hkv8 = _da.q8_sidecar_shape(Hkvd, Sd)[0]
    skd = jnp.asarray(np.pad(np.asarray(sk)[..., 0],
                             ((0, 0), (0, hkv8 - Hkvd), (0, 0))))
    svd = jnp.asarray(np.pad(np.asarray(sv)[..., 0],
                             ((0, 0), (0, hkv8 - Hkvd), (0, 0))))
    qd = rng.standard_normal((Bd, Hd, hdd)).astype(np.float32)
    knd = rng.standard_normal((Bd, Hkvd, hdd)).astype(np.float32)
    vnd = rng.standard_normal((Bd, Hkvd, hdd)).astype(np.float32)
    outd, ck2, cv2, sk2, sv2 = _da.dense_decode_attention_q8(
        jnp.asarray(qd), jnp.asarray(knd), jnp.asarray(vnd),
        jnp.asarray(_flatp(np.asarray(qk))), jnp.asarray(_flatp(np.asarray(qv_))),
        skd, svd, jnp.asarray(lengths_d))
    outd = np.asarray(outd)
    kd = (_hmp(ck2, Hkvd).astype(np.float32)
          * np.asarray(sk2)[:, :Hkvd][..., None])
    vd = (_hmp(cv2, Hkvd).astype(np.float32)
          * np.asarray(sv2)[:, :Hkvd][..., None])
    werr = aerr = 0.0
    for b in range(Bd):
        n = int(lengths_d[b])
        werr = max(werr, np.abs(kd[b, :, n - 1] - knd[b]).max())
        for h in range(Hd):
            kh = h // gd
            lg = (kd[b, kh, :n].astype(np.float64) @ qd[b, h]) / np.sqrt(hdd)
            pr = np.exp(lg - lg.max()); pr /= pr.sum()
            aerr = max(aerr, np.abs(outd[b, h] - pr @ vd[b, kh, :n]).max())
    ok = werr < 0.05 and aerr < 5e-2
    failures += not ok
    print(f"{'OK ' if ok else 'BAD'} dense_attn_q8: write err {werr:.1e} "
          f"attn err {aerr:.2e}", flush=True)

    # flash prefill attention vs the dense-math oracle (causal + GQA +
    # continuation offset + sliding window)
    from squeezellm_tpu.models import common as _c
    from squeezellm_tpu.ops import flash_attn

    for (Sq, Sk, off, win, gg) in ((2048, 2048, 0, None, 1),
                                   (256, 2048, 512, None, 2),
                                   (2048, 2048, 0, 700, 1)):
        Hkvf = 2
        Hf = gg * Hkvf
        qf = rng.standard_normal((1, Hf, Sq, 128)).astype(np.float32)
        kf = rng.standard_normal((1, Hkvf, Sk, 128)).astype(np.float32)
        vf = rng.standard_normal((1, Hkvf, Sk, 128)).astype(np.float32)
        outf = np.asarray(flash_attn.flash_attention(
            jnp.asarray(qf), jnp.asarray(kf), jnp.asarray(vf),
            jnp.asarray(off, jnp.int32), sliding_window=win))
        kkr = np.asarray(_c.repeat_kv(jnp.asarray(kf), gg))
        vvr = np.asarray(_c.repeat_kv(jnp.asarray(vf), gg))
        aerr = 0.0
        for h in range(Hf):
            for r in range(0, Sq, max(1, Sq // 8)):  # spot-check rows
                qp = off + r
                lo = max(0, qp + 1 - (win or Sk + Sq + 1))
                lg = (kkr[0, h, lo:qp + 1].astype(np.float64)
                      @ qf[0, h, r]) / np.sqrt(128)
                pr = np.exp(lg - lg.max())
                pr /= pr.sum()
                aerr = max(aerr, np.abs(outf[0, h, r]
                                        - pr @ vvr[0, h, lo:qp + 1]).max())
        ok = aerr < 5e-2
        failures += not ok
        print(f"{'OK ' if ok else 'BAD'} flash Sq={Sq} off={off} win={win} "
              f"g={gg}: attn err {aerr:.2e}", flush=True)

    # in-kernel rope: kernel(pre-rope q/k + cos/sin operand rows) vs
    # host-rope oracle — exact parity by construction (the kernel applies
    # the SAME cos/sin values; an earlier rope-from-theta variant
    # diverged 6.5e-3 on hardware via Mosaic's large-angle sin/cos)
    from squeezellm_tpu.models import common

    # local dims: earlier blocks leave B=2 behind, this one runs 3 slots
    B, Hkv, g, hd, S = 3, 4, 2, 128, 2048
    H = g * Hkv
    lengths = np.asarray([900, 1, 0], np.int32)
    q = rng.standard_normal((B, H, hd)).astype(np.float32)
    kn = rng.standard_normal((B, Hkv, hd)).astype(np.float32)
    vn = rng.standard_normal((B, Hkv, hd)).astype(np.float32)
    ck = _flatp(rng.standard_normal((B, Hkv, S, hd)).astype(np.float32))
    cv = _flatp(rng.standard_normal((B, Hkv, S, hd)).astype(np.float32))
    pos = np.maximum(lengths - 1, 0)
    cos, sin = common.rope_cos_sin(jnp.asarray(pos), hd, 10000.0)
    out_r, ck_r, _ = decode_attn.dense_decode_attention(
        jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn),
        jnp.asarray(ck), jnp.asarray(cv), jnp.asarray(lengths),
        rope_cos=cos, rope_sin=sin)
    qr = np.asarray(common.apply_rope(
        jnp.asarray(q)[:, :, None, :], cos[:, None, :], sin[:, None, :]))
    knr = np.asarray(common.apply_rope(
        jnp.asarray(kn)[:, :, None, :], cos[:, None, :], sin[:, None, :]))
    out_x, ck_x, _ = decode_attn.dense_decode_attention(
        jnp.asarray(qr[:, :, 0]), jnp.asarray(knr[:, :, 0]), jnp.asarray(vn),
        jnp.asarray(ck), jnp.asarray(cv), jnp.asarray(lengths))
    oerr = np.abs(np.asarray(out_r) - np.asarray(out_x)).max()
    kerr = np.abs(np.asarray(ck_r) - np.asarray(ck_x)).max()
    ok = oerr < 5e-2 and kerr < 1e-4
    failures += not ok
    print(f"{'OK ' if ok else 'BAD'} dense_attn rope: out err {oerr:.2e} "
          f"cache err {kerr:.2e}", flush=True)
    sys.exit(1 if failures else 0)


def from_reference_ckpt(argv):
    """One-command real-checkpoint rehearsal (round-5 VERDICT item 10):
    convert a published sq-*.pt -> eval perplexity -> decode benchmark.
    A weights-bearing environment runs exactly:

      python scripts/tpu_verify.py --from-reference-ckpt CKPT.pt MODEL_DIR \
          [--wbits 4] [--dataset wikitext2] [--tokens 128]

    Matches the reference workflow (reference README.md:149-195: download
    sq-* checkpoint, `llama.py --eval`, `--benchmark 128 --check`).
    """
    import argparse
    import json
    import subprocess
    import tempfile

    ap = argparse.ArgumentParser()
    ap.add_argument("--from-reference-ckpt", dest="ckpt", required=True)
    ap.add_argument("model_dir")
    ap.add_argument("--wbits", type=int, default=4)
    ap.add_argument("--dataset", default="wikitext2")
    ap.add_argument("--tokens", type=int, default=128)
    ap.add_argument("--output", default=None,
                    help="converted-checkpoint dir (default: temp)")
    args = ap.parse_args(argv)

    out_dir = args.output or tempfile.mkdtemp(prefix="sq_tpu_ckpt_")
    steps = [
        ("convert", [sys.executable, "-m", "squeezellm_tpu.cli", "convert",
                     "--checkpoint", args.ckpt, "--model", args.model_dir,
                     "--wbits", str(args.wbits), "--output", out_dir]),
        ("eval", [sys.executable, "-m", "squeezellm_tpu.cli", "eval",
                  out_dir, "--dataset", args.dataset, "--seqlen", "2048"]),
        ("benchmark", [sys.executable, "-m", "squeezellm_tpu.cli",
                       "benchmark", out_dir, "--tokens", str(args.tokens),
                       "--check"]),
    ]
    results = {}
    for name, cmd in steps:
        print(f"== {name}: {' '.join(cmd)}", flush=True)
        r = subprocess.run(cmd)
        results[name] = r.returncode
        if r.returncode != 0:
            print(f"{name} FAILED rc={r.returncode}", flush=True)
            print(json.dumps({"stages": results, "ckpt_dir": out_dir}))
            return r.returncode
    print(json.dumps({"stages": results, "ckpt_dir": out_dir}))
    return 0


if __name__ == "__main__":
    if any(a.startswith("--from-reference-ckpt") for a in sys.argv[1:]):
        sys.exit(from_reference_ckpt(sys.argv[1:]))
    main()
