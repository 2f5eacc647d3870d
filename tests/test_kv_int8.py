"""int8 KV cache (ops/kv_quant.py + the _q8 paged kernels + engine).

Layers of checking:
  * quantize/dequant roundtrip error bound (the format's contract);
  * the q8 decode/verify kernels vs a numpy mirror that reimplements the
    exact same quantize math — EXACT agreement on everything except the
    rope'd k rows, which tolerate 1 ulp: the kernel's _rope_apply
    (x*cos + rot*sin over the cos/sin operand rows) runs under Mosaic,
    the mirror under numpy, and the two may contract mul+add to FMA
    differently in the last f32 bit; any drift between the in-kernel
    expressions and ops.kv_quant fails here;
  * model-level decode logits with int8 pools vs f32 pools primed with
    the identical history — within quantization tolerance;
  * engine-level: the int8 paged engine completes multi-slot runs,
    shares prefix pages, and the TP int8 engine is token-identical to
    the single-device int8 engine.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from squeezellm_tpu import serving
from squeezellm_tpu.models import llama
from squeezellm_tpu.ops import paged_attn
from squeezellm_tpu.ops.kv_quant import (dequantize_rows, head_rows,
                                         pool_pack_scales,
                                         pool_unpack_scales, quantize_rows)


def _flatp(pool):
    """Head-major test pool (P, Hkv, ps, hd) -> token-major
    (P, ps, Hkv*hd) kernel layout."""
    P, Hkv, ps, hd = pool.shape
    return np.ascontiguousarray(
        pool.transpose(0, 2, 1, 3).reshape(P, ps, Hkv * hd))


def _hmp(pool, Hkv):
    """Token-major kernel pool -> head-major test view."""
    pool = np.asarray(pool)
    P, ps, KV = pool.shape
    hd = KV // Hkv
    return pool.reshape(P, ps, Hkv, hd).transpose(0, 2, 1, 3)
from squeezellm_tpu.quantize import pipeline


def _rope_np(x, pos, theta=10000.0):
    """Mirror rope via the kernel's own `_rope_apply` with the same
    rope_cos_sin operand rows the kernel receives: parity with the HF
    convention is covered by test_paged_attn rope tests — here the target
    is the QUANTIZATION math, so the rotation must be bit-identical
    between kernel and mirror."""
    from squeezellm_tpu.models import common
    from squeezellm_tpu.ops.decode_attn import _rope_apply

    posv = jnp.asarray(pos, jnp.int32).reshape(-1)
    cos, sin = common.rope_cos_sin(posv, x.shape[-1], theta)
    return np.asarray(_rope_apply(jnp.asarray(x, jnp.float32), cos, sin))


def _rope_cs(pos, hd, theta=10000.0):
    """cos/sin operand rows for the kernel calls (f32 jnp arrays)."""
    from squeezellm_tpu.models import common

    return common.rope_cos_sin(jnp.asarray(pos, jnp.int32), hd, theta)


def _quant_np(x):
    """numpy twin of ops.kv_quant.quantize_rows (f32 math; the scale is
    max|row| * f32(1/127) — see kv_quant._RQMAX for why a multiply)."""
    xf = np.asarray(x, np.float32)
    s = np.maximum(np.abs(xf).max(axis=-1, keepdims=True)
                   * np.float32(1.0 / 127.0), np.float32(1e-12))
    # np.round is round-half-to-even, matching jnp.round
    q = np.clip(np.round(xf / s), -127, 127).astype(np.int8)
    return q, s.astype(np.float32)


def test_quantize_roundtrip_bound():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((64, 128)).astype(np.float32) * 3.0
    q, s = quantize_rows(jnp.asarray(x))
    back = np.asarray(dequantize_rows(q, s))
    # error per element bounded by half a quantization step of its row
    assert np.all(np.abs(back - x) <= np.asarray(s) / 2 + 1e-7)
    # and the jnp math matches the numpy mirror bit-for-bit
    qn, sn = _quant_np(x)
    np.testing.assert_array_equal(np.asarray(q), qn)
    np.testing.assert_array_equal(np.asarray(s), sn)


def test_q8_decode_kernel_matches_mirror():
    rng = np.random.default_rng(1)
    B, H, Hkv, hd, ps, P, maxp = 2, 4, 2, 64, 32, 7, 3
    g = H // Hkv
    q = rng.standard_normal((B, H, hd)).astype(np.float32)
    kn = rng.standard_normal((B, Hkv, hd)).astype(np.float32)
    vn = rng.standard_normal((B, Hkv, hd)).astype(np.float32)
    pk, sk = _quant_np(rng.standard_normal((P, Hkv, ps, hd)))
    pv, sv = _quant_np(rng.standard_normal((P, Hkv, ps, hd)))
    pt = np.asarray([[1, 3, 5], [2, 4, 6]], np.int32)
    lengths = np.asarray([40, 0], np.int32)  # slot 1 inactive

    rcos, rsin = _rope_cs(np.maximum(lengths - 1, 0), hd)
    out, pk2, pv2, sk2, sv2 = paged_attn.paged_decode_attention_q8(
        jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn),
        jnp.asarray(_flatp(pk)), jnp.asarray(_flatp(pv)),
        pool_pack_scales(jnp.asarray(sk)), pool_pack_scales(jnp.asarray(sv)),
        jnp.asarray(pt), jnp.asarray(lengths), page_size=ps,
        rope_cos=rcos, rope_sin=rsin,
        interpret=True)
    out = np.asarray(out)
    pk2, pv2 = _hmp(pk2, Hkv), _hmp(pv2, Hkv)
    # back to (P, Hkv, ps, 1) row scales for the mirror comparison
    sk2 = np.asarray(pool_unpack_scales(sk2, Hkv))
    sv2 = np.asarray(pool_unpack_scales(sv2, Hkv))

    # inactive slot: no output, no write
    assert np.abs(out[1]).max() == 0.0
    np.testing.assert_array_equal(pk2[pt[1]], pk[pt[1]])

    # mirror for slot 0: quantize the rope'd current row, patch, attend
    b, n = 0, 40
    last = n - 1
    knq, kns = _quant_np(_rope_np(kn[b], np.full(Hkv, last)))
    vnq, vns = _quant_np(vn[b])
    pk_m, sk_m = pk.copy(), sk.copy()
    pv_m, sv_m = pv.copy(), sv.copy()
    pid, off = pt[b, last // ps], last % ps
    pk_m[pid, :, off], sk_m[pid, :, off] = knq, kns
    pv_m[pid, :, off], sv_m[pid, :, off] = vnq, vns
    # v (no rope): the quantization math is shared verbatim, so the
    # kernel and the numpy mirror agree bit-for-bit
    np.testing.assert_array_equal(pv2[pid], pv_m[pid])
    np.testing.assert_array_equal(sv2[pid], sv_m[pid])
    # k: every row EXCEPT the patched one is untouched (exact); the
    # patched row went through _rope_apply on the cos/sin operand rows,
    # and Mosaic may contract its mul+add to FMA differently from the
    # numpy mirror in the last f32 bit -> scale within 1 ulp, codes
    # within +-1 where the rounding boundary moved
    keep = np.arange(ps) != off
    np.testing.assert_array_equal(pk2[pid][:, keep], pk[pid][:, keep])
    np.testing.assert_array_equal(sk2[pid][:, keep], sk[pid][:, keep])
    np.testing.assert_allclose(sk2[pid][:, off], kns, rtol=3e-7)
    assert np.abs(pk2[pid][:, off].astype(np.int32)
                  - knq.astype(np.int32)).max() <= 1

    rows_k = np.zeros((Hkv, n, hd), np.float32)
    rows_v = np.zeros((Hkv, n, hd), np.float32)
    for t in range(n):
        p, o = pt[b, t // ps], t % ps
        rows_k[:, t] = pk_m[p, :, o].astype(np.float32) * sk_m[p, :, o]
        rows_v[:, t] = pv_m[p, :, o].astype(np.float32) * sv_m[p, :, o]
    qr = _rope_np(q[b], np.full(H, last))
    want = np.zeros((H, hd), np.float32)
    for hh in range(H):
        kvh = hh // g
        lg = rows_k[kvh].astype(np.float64) @ qr[hh] / np.sqrt(hd)
        w = np.exp(lg - lg.max())
        w /= w.sum()
        want[hh] = w @ rows_v[kvh].astype(np.float64)
    np.testing.assert_allclose(out[0], want, rtol=2e-5, atol=2e-5)


def test_q8_verify_kernel_matches_mirror():
    rng = np.random.default_rng(2)
    B, H, Hkv, hd, ps, P, maxp, W = 2, 2, 1, 64, 32, 5, 3, 3
    g = H // Hkv
    q = rng.standard_normal((B, H, W, hd)).astype(np.float32)
    kn = rng.standard_normal((B, Hkv, W, hd)).astype(np.float32)
    vn = rng.standard_normal((B, Hkv, W, hd)).astype(np.float32)
    pk, sk = _quant_np(rng.standard_normal((P, Hkv, ps, hd)))
    pv, sv = _quant_np(rng.standard_normal((P, Hkv, ps, hd)))
    pt = np.asarray([[0, 2, 4], [1, 3, 0]], np.int32)
    start = np.asarray([30, -1], np.int32)  # window crosses a page; b1 off

    rcos, rsin = _rope_cs(start[:, None] + np.arange(W), hd)
    out, pk2, pv2, sk2, sv2 = paged_attn.paged_verify_attention_q8(
        jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn),
        jnp.asarray(_flatp(pk)), jnp.asarray(_flatp(pv)),
        pool_pack_scales(jnp.asarray(sk)), pool_pack_scales(jnp.asarray(sv)),
        jnp.asarray(pt), jnp.asarray(start), page_size=ps,
        rope_cos=rcos, rope_sin=rsin,
        interpret=True)
    out = np.asarray(out)
    pk2, pv2 = _hmp(pk2, Hkv), _hmp(pv2, Hkv)
    sk2 = np.asarray(pool_unpack_scales(sk2, Hkv))
    sv2 = np.asarray(pool_unpack_scales(sv2, Hkv))

    assert np.abs(out[1]).max() == 0.0

    b, s0 = 0, 30
    pk_m, sk_m = pk.copy(), sk.copy()
    pv_m, sv_m = pv.copy(), sv.copy()
    knq, kns = _quant_np(_rope_np(kn[b, 0], s0 + np.arange(W)))
    vnq, vns = _quant_np(vn[b, 0])
    patched = np.zeros((P, ps), bool)
    for w in range(W):
        posw = s0 + w
        pid, off = pt[b, posw // ps], posw % ps
        pk_m[pid, 0, off], sk_m[pid, 0, off] = knq[w], kns[w]
        pv_m[pid, 0, off], sv_m[pid, 0, off] = vnq[w], vns[w]
        patched[pid, off] = True
    # v (no rope) bit-exact everywhere; k rows that went through
    # _rope_apply may sit 1 ulp off the numpy mirror's rope (Mosaic FMA
    # contraction; see the decode test) -> scale 1 ulp, codes +-1
    np.testing.assert_array_equal(pv2, pv_m)
    np.testing.assert_array_equal(sv2, sv_m)
    keep = ~patched
    np.testing.assert_array_equal(pk2[:, 0][keep], pk_m[:, 0][keep])
    np.testing.assert_array_equal(sk2[:, 0][keep], sk_m[:, 0][keep])
    np.testing.assert_allclose(sk2[:, 0][patched], sk_m[:, 0][patched],
                               rtol=3e-7)
    assert np.abs(pk2[:, 0][patched].astype(np.int32)
                  - pk_m[:, 0][patched].astype(np.int32)).max() <= 1

    n_end = s0 + W
    rows_k = np.zeros((n_end, hd), np.float32)
    rows_v = np.zeros((n_end, hd), np.float32)
    for t in range(n_end):
        pid, o = pt[b, t // ps], t % ps
        rows_k[t] = pk_m[pid, 0, o].astype(np.float32) * sk_m[pid, 0, o]
        rows_v[t] = pv_m[pid, 0, o].astype(np.float32) * sv_m[pid, 0, o]
    for hh in range(H):
        for w in range(W):
            posw = s0 + w
            qr = _rope_np(q[b, hh, w:w + 1], [posw])[0]
            lg = rows_k[: posw + 1].astype(np.float64) @ qr / np.sqrt(hd)
            p = np.exp(lg - lg.max())
            p /= p.sum()
            want = p @ rows_v[: posw + 1].astype(np.float64)
            np.testing.assert_allclose(out[b, hh, w], want, rtol=2e-5,
                                       atol=2e-5)


def _small_model():
    config = llama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        n_layers=2, n_heads=4, n_kv_heads=2, max_seq=64,
    )
    dense = llama.random_dense_params(config, jax.random.PRNGKey(0))
    specs, params = pipeline.quantize_model("llama", config, dense, bits=4)
    return config, specs, jax.tree.map(jnp.asarray, params)


PS = 8


def _paged(config, specs, params, cache_dtype, slots=2, n_pages=24, **kw):
    return serving.PagedContinuousBatchEngine(
        "llama", config, specs, params, slots=slots, n_pages=n_pages,
        page_size=PS, backend="xla", cache_dtype=cache_dtype, **kw)


def test_q8_pool_memory_layout():
    config, specs, params = _small_model()
    e8 = _paged(config, specs, params, "int8")
    e16 = _paged(config, specs, params, jnp.bfloat16)
    bytes8 = sum(int(np.prod(v.shape)) * v.dtype.itemsize
                 for v in e8.pool.pools[0].values())
    bytes16 = sum(int(np.prod(v.shape)) * v.dtype.itemsize
                  for v in e16.pool.pools[0].values())
    # int8 codes halve the data bytes; the head-major scale sidecar adds
    # (HkvP, ps) f32 per page (kv_quant.pool_pack_scales: kv-head rows
    # padded to the 8-sublane f32 tile). At real dims (Hkv=32, hd=128)
    # that is 1 byte/element of codes + 1/hd scale f32 per (token, head)
    # ~= 0.52x the bf16 pool.
    n_pages = int(e8.pool.pools[0]["sk"].shape[0])
    rows = head_rows(config.n_kv_heads)
    scale_bytes = 2 * n_pages * rows * PS * 4
    assert bytes8 == bytes16 // 2 + scale_bytes


@pytest.mark.medium
def test_q8_engine_completes_and_tokens_close():
    config, specs, params = _small_model()
    ef = _paged(config, specs, params, jnp.float32)
    e8 = _paged(config, specs, params, "int8")
    prompts = [[1, 2, 3], list(range(7, 7 + 18)), [11, 13, 17, 19], [23]]
    max_new = 6
    rf = ef.run(prompts, max_new_tokens=max_new)
    r8 = e8.run(prompts, max_new_tokens=max_new)
    assert sorted(r8) == sorted(rf)
    for rid in r8:
        assert len(r8[rid]) == len(rf[rid]) == max_new
        # int8 KV is lossy: tokens may legitimately diverge on a random
        # tiny model, but wholesale disagreement from step one would mean
        # the path is broken, not merely quantized
        agree = np.mean(np.asarray(r8[rid]) == np.asarray(rf[rid]))
        assert agree >= 0.5, (rid, r8[rid], rf[rid])


def test_q8_prefix_sharing_and_page_recycling():
    config, specs, params = _small_model()
    eng = _paged(config, specs, params, "int8", slots=2)
    base = list(range(2, 2 + 2 * PS))  # two full shareable pages
    r1 = eng.add_request(base + [3], 2)
    while eng.step():
        pass
    free_before = len(eng.pool._free)
    r2 = eng.add_request(base + [5], 2)
    # shared prefix: only the suffix pages were newly allocated
    assert eng._slot_shared[[i for i, s in enumerate(eng._slots)
                            if s.active][0]] == 2
    while eng.step():
        pass
    assert r1 != r2
    # all request pages released (registered prefix pages persist)
    assert len(eng.pool._free) >= free_before - 2


def test_q8_tp_engine_matches_single_device():
    """TP int8 paged engine vs single-device int8 paged engine:
    token-identical. The pools shard over kv heads and the per-row
    scales ride the same axis, so sharding must not change any
    quantization decision."""
    config, specs, params = _small_model()
    prompts = [[1, 2, 3, 4], list(range(5, 5 + 11))]
    want = _paged(config, specs, params, "int8").run(
        prompts, max_new_tokens=6, window=3)
    got = serving.TPPagedContinuousBatchEngine(
        "llama", config, specs, params, tp=2, slots=2, n_pages=24,
        page_size=PS, backend="xla", cache_dtype="int8",
    ).run(prompts, max_new_tokens=6, window=3)
    assert sorted(got) == sorted(want)
    for rid in want:
        assert got[rid] == want[rid], rid


def test_q8_dense_decode_kernel_matches_mirror():
    """Dense-cache q8 kernel (ops/decode_attn.dense_decode_attention_q8)
    vs the same numpy mirror style as the paged test: quantize the rope'd
    current row, patch the TOKEN-major cache, attend over the dequantized
    prefix. Codes (B, S, Hkv*hd); scale sidecar (B, Hkv8, S) head-major."""
    from squeezellm_tpu.ops import decode_attn

    rng = np.random.default_rng(7)
    B, H, Hkv, hd, S = 2, 4, 2, 64, 96
    g = H // Hkv
    KV = Hkv * hd
    q = rng.standard_normal((B, H, hd)).astype(np.float32)
    kn = rng.standard_normal((B, Hkv, hd)).astype(np.float32)
    vn = rng.standard_normal((B, Hkv, hd)).astype(np.float32)
    # history rows quantized per (token, head); token-major codes + the
    # (B, Hkv8, S) sidecar (kv-head rows padded to the 8-sublane tile)
    hkv8 = decode_attn.q8_sidecar_shape(Hkv, S)[0]

    def build(x):  # x (B, S, Hkv, hd) f32
        codes, sc = _quant_np(x)                       # sc (B, S, Hkv, 1)
        side = np.zeros((B, hkv8, S), np.float32)
        side[:, :Hkv] = np.transpose(sc[..., 0], (0, 2, 1))
        return codes.reshape(B, S, KV), side, codes, sc

    ck, sk, ck4, sk4 = build(rng.standard_normal((B, S, Hkv, hd)))
    cv, sv, cv4, sv4 = build(rng.standard_normal((B, S, Hkv, hd)))
    lengths = np.asarray([40, 0], np.int32)  # slot 1 inactive

    rcos, rsin = _rope_cs(np.maximum(lengths - 1, 0), hd)
    out, ck2, cv2, sk2, sv2 = decode_attn.dense_decode_attention_q8(
        jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn),
        jnp.asarray(ck), jnp.asarray(cv),
        jnp.asarray(sk), jnp.asarray(sv),
        jnp.asarray(lengths),
        rope_cos=rcos, rope_sin=rsin,
        interpret=True)
    out, ck2, cv2 = np.asarray(out), np.asarray(ck2), np.asarray(cv2)
    sk2, sv2 = np.asarray(sk2), np.asarray(sv2)

    # inactive slot: no output, no write
    assert np.abs(out[1]).max() == 0.0
    np.testing.assert_array_equal(ck2[1], ck[1])
    np.testing.assert_array_equal(sk2[1], sk[1])

    b, n = 0, 40
    last = n - 1
    knq, kns = _quant_np(_rope_np(kn[b], np.full(Hkv, last)))
    vnq, vns = _quant_np(vn[b])
    ck_m, sk_m = ck.copy(), sk.copy()
    cv_m, sv_m = cv.copy(), sv.copy()
    ck_m[b, last] = knq.reshape(KV)
    cv_m[b, last] = vnq.reshape(KV)
    sk_m[b, :Hkv, last] = kns[:, 0]
    sv_m[b, :Hkv, last] = vns[:, 0]
    # v (no rope): shared quantize math -> bit-exact
    np.testing.assert_array_equal(cv2[b], cv_m[b])
    np.testing.assert_array_equal(sv2[b], sv_m[b])
    # k: untouched rows exact; the rope'd row tolerates 1 ulp (see the
    # paged q8 decode test for why)
    keep = np.arange(S) != last
    np.testing.assert_array_equal(ck2[b][keep], ck[b][keep])
    np.testing.assert_array_equal(sk2[b][:, keep], sk[b][:, keep])
    np.testing.assert_allclose(sk2[b][:Hkv, last], kns[:, 0], rtol=3e-7)
    assert np.abs(ck2[b][last].astype(np.int32)
                  - knq.reshape(KV).astype(np.int32)).max() <= 1

    rows_k = (ck_m[b, :n].reshape(n, Hkv, hd).astype(np.float32)
              * np.transpose(sk_m[b, :Hkv, :n])[:, :, None])
    rows_v = (cv_m[b, :n].reshape(n, Hkv, hd).astype(np.float32)
              * np.transpose(sv_m[b, :Hkv, :n])[:, :, None])
    qr = _rope_np(q[b], np.full(H, last))
    for hh in range(H):
        kvh = hh // g
        lg = rows_k[:, kvh].astype(np.float64) @ qr[hh] / np.sqrt(hd)
        w = np.exp(lg - lg.max())
        w /= w.sum()
        want = w @ rows_v[:, kvh].astype(np.float64)
        np.testing.assert_allclose(out[0, hh], want, rtol=2e-5, atol=2e-5)


def test_q8_dense_engine_generate_tokens_close():
    """engine.Engine with cache_dtype='int8' (XLA decode path: quantize
    at insert + dequant at read) completes and tracks the f32-cache
    engine on a tiny model."""
    from squeezellm_tpu import engine as engine_mod

    config, specs, params = _small_model()
    prompt = np.asarray([[1, 2, 3, 4, 5]], np.int32)
    ef = engine_mod.Engine("llama", config, specs, params, backend="xla")
    e8 = engine_mod.Engine("llama", config, specs, params, backend="xla",
                           cache_dtype="int8")
    # int8 cache token axis rounds to 128 (scale-group lanes)
    from squeezellm_tpu.ops import decode_attn as da

    c8 = e8.new_cache(1, 40)
    assert c8[0]["k"].dtype == jnp.int8 and c8[0]["k"].shape[1] == 128
    assert c8[0]["ks"].shape == (1,) + da.q8_sidecar_shape(
        config.n_kv_heads, 128)
    tf = ef.generate(prompt, 8)[0, 5:]
    t8 = e8.generate(prompt, 8)[0, 5:]
    agree = np.mean(np.asarray(tf) == np.asarray(t8))
    assert agree >= 0.5, (tf, t8)


def test_q8_dense_serving_engine_completes():
    """Dense-slot continuous batching over an int8 cache: multi-slot run
    completes with the right token counts and tracks the f32 engine."""
    config, specs, params = _small_model()

    def run(cd):
        eng = serving.ContinuousBatchEngine(
            "llama", config, specs, params, slots=2, backend="xla",
            cache_dtype=cd)
        return eng.run([[1, 2, 3], list(range(5, 5 + 9)), [11, 13]],
                       max_new_tokens=5)

    rf, r8 = run(jnp.float32), run("int8")
    assert sorted(r8) == sorted(rf)
    for rid in r8:
        assert len(r8[rid]) == 5
        agree = np.mean(np.asarray(r8[rid]) == np.asarray(rf[rid]))
        assert agree >= 0.4, (rid, r8[rid], rf[rid])


def test_q8_model_logits_within_quant_tolerance():
    """decode_step with int8 pools vs f32 pools holding the same
    history: logits agree to quantization tolerance (the pools start
    from the same dequantized history, so the only divergence is the
    current-token write + read quantization)."""
    from squeezellm_tpu.models import registry as registry_mod

    config, specs, params = _small_model()
    mod = registry_mod.get_model_module("llama")
    rng = np.random.default_rng(3)
    Hkv, hd, ps = config.n_kv_heads, config.head_dim, PS
    P, maxp = 8, 4
    hist_k = rng.standard_normal((P, Hkv, ps, hd)).astype(np.float32) * 0.3
    hist_v = rng.standard_normal((P, Hkv, ps, hd)).astype(np.float32) * 0.3

    pt = jnp.asarray(np.arange(maxp, dtype=np.int32)[None], jnp.int32)
    pos = jnp.asarray([11], jnp.int32)
    tok = jnp.asarray([[7]], jnp.int32)

    def run(q8: bool):
        caches = []
        for _ in range(config.n_layers):
            qk, sk = _quant_np(hist_k)
            qv, sv = _quant_np(hist_v)
            if q8:
                c = {"pk": jnp.asarray(_flatp(qk)),
                     "pv": jnp.asarray(_flatp(qv)),
                     "sk": pool_pack_scales(jnp.asarray(sk)),
                     "sv": pool_pack_scales(jnp.asarray(sv))}
            else:
                c = {"pk": jnp.asarray(_flatp(qk.astype(np.float32) * sk)),
                     "pv": jnp.asarray(_flatp(qv.astype(np.float32) * sv))}
            caches.append(dict(c, pt=pt))
        logits, _ = mod.decode_step(config, specs, params, tok, pos, caches,
                                    backend="xla")
        return np.asarray(logits[0, -1], np.float64)

    lf, l8 = run(False), run(True)
    # same history; only the current token's KV quantizes differently
    span = lf.max() - lf.min() + 1e-9
    assert np.abs(l8 - lf).max() / span < 0.05, np.abs(l8 - lf).max()
