"""Paged decode attention kernel vs a dense numpy oracle (interpret)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from squeezellm_tpu.ops import paged_attn


def _flat(pool):
    """Head-major test pool (P, Hkv, ps, hd) -> token-major (P, ps, Hkv*hd)
    kernel layout."""
    P, Hkv, ps, hd = pool.shape
    return np.ascontiguousarray(
        pool.transpose(0, 2, 1, 3).reshape(P, ps, Hkv * hd))


def _hm(pool, Hkv):
    """Token-major (P, ps, Hkv*hd) kernel pool -> head-major test view."""
    pool = np.asarray(pool)
    P, ps, KV = pool.shape
    hd = KV // Hkv
    return pool.reshape(P, ps, Hkv, hd).transpose(0, 2, 1, 3)



def _oracle(q, k_all, v_all, lengths):
    """Dense reference: per slot, softmax attention over its first
    lengths[b] positions. q (B,H,hd); k/v (B,Hkv,S,hd)."""
    B, H, hd = q.shape
    Hkv = k_all.shape[1]
    g = H // Hkv
    out = np.zeros((B, H, hd), np.float32)
    for b in range(B):
        n = int(lengths[b])
        if n == 0:
            continue
        for h in range(H):
            kh = h // g
            k = k_all[b, kh, :n].astype(np.float64)
            v = v_all[b, kh, :n].astype(np.float64)
            logits = (k @ q[b, h].astype(np.float64)) / np.sqrt(hd)
            p = np.exp(logits - logits.max())
            p /= p.sum()
            out[b, h] = (p @ v).astype(np.float32)
    return out


@pytest.mark.parametrize("g,ps", [(1, 128), (4, 128), (2, 64)])
def test_paged_attention_matches_dense(g, ps):
    rng = np.random.default_rng(0)
    B, Hkv, hd, P, maxp = 3, 2, 128, 16, 4
    H = g * Hkv
    lengths = np.asarray([1, ps + 5, 2 * ps], np.int32)  # 1 to multi-page

    # assign distinct pages per slot
    page_tables = np.full((B, maxp), 0, np.int32)
    pid = 1
    for b in range(B):
        for p in range(maxp):
            page_tables[b, p] = pid
            pid += 1

    pool_k = rng.standard_normal((P, Hkv, ps, hd)).astype(np.float32)
    pool_v = rng.standard_normal((P, Hkv, ps, hd)).astype(np.float32)
    q = rng.standard_normal((B, H, hd)).astype(np.float32)
    k_new = rng.standard_normal((B, Hkv, hd)).astype(np.float32)
    v_new = rng.standard_normal((B, Hkv, hd)).astype(np.float32)

    out, pk2, pv2 = paged_attn.paged_decode_attention(
        jnp.asarray(q), jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(_flat(pool_k)), jnp.asarray(_flat(pool_v)),
        jnp.asarray(page_tables), jnp.asarray(lengths),
        page_size=ps, interpret=True,
    )
    pk2, pv2 = _hm(pk2, Hkv), _hm(pv2, Hkv)

    # the kernel must have written k_new/v_new at each slot's last position
    for b in range(B):
        n = int(lengths[b])
        pidx = page_tables[b, (n - 1) // ps]
        off = (n - 1) % ps
        np.testing.assert_allclose(pk2[pidx, :, off], k_new[b], rtol=1e-6)
        np.testing.assert_allclose(pv2[pidx, :, off], v_new[b], rtol=1e-6)

    # dense gather of each slot's pages (post-write) for the oracle
    S = maxp * ps
    k_all = np.zeros((B, Hkv, S, hd), np.float32)
    v_all = np.zeros((B, Hkv, S, hd), np.float32)
    for b in range(B):
        for p in range(maxp):
            k_all[b, :, p * ps:(p + 1) * ps] = pk2[page_tables[b, p]]
            v_all[b, :, p * ps:(p + 1) * ps] = pv2[page_tables[b, p]]
    want = _oracle(q, k_all, v_all, lengths)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-5, atol=2e-5)


def test_inactive_slot_zero_length():
    rng = np.random.default_rng(1)
    B, Hkv, g, hd, ps, P, maxp = 2, 2, 2, 128, 128, 4, 2
    H = g * Hkv
    lengths = np.asarray([0, 3], np.int32)
    page_tables = np.asarray([[0, 0], [1, 2]], np.int32)
    pool_k = rng.standard_normal((P, Hkv, ps, hd)).astype(np.float32)
    pool_v = rng.standard_normal((P, Hkv, ps, hd)).astype(np.float32)
    q = rng.standard_normal((B, H, hd)).astype(np.float32)
    kn = rng.standard_normal((B, Hkv, hd)).astype(np.float32)
    vn = rng.standard_normal((B, Hkv, hd)).astype(np.float32)
    out, pk2, _ = paged_attn.paged_decode_attention(
        jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn),
        jnp.asarray(_flat(pool_k)), jnp.asarray(_flat(pool_v)),
        jnp.asarray(page_tables), jnp.asarray(lengths),
        page_size=ps, interpret=True,
    )
    # inactive slot: finite output (0/eps), no write into page 0
    assert np.isfinite(np.asarray(out)[0]).all()
    np.testing.assert_allclose(_hm(pk2, Hkv)[0], pool_k[0])


def test_paged_attention_rope_parity():
    """rope operands: kernel(pre-rope q/k + cos/sin rows) ==
    kernel(host-rope'd q/k, no rope) — write AND attention
    (models/common.py rope convention)."""
    from squeezellm_tpu.models import common

    rng = np.random.default_rng(3)
    B, Hkv, hd, P, maxp, ps, g = 3, 2, 64, 8, 2, 32, 2
    H = g * Hkv
    lengths = np.asarray([1, ps + 5, 0], np.int32)
    page_tables = np.arange(B * maxp, dtype=np.int32).reshape(B, maxp) + 1
    page_tables[2] = 0  # inactive slot
    pool_k = rng.standard_normal((P, Hkv, ps, hd)).astype(np.float32)
    pool_v = rng.standard_normal((P, Hkv, ps, hd)).astype(np.float32)
    q = rng.standard_normal((B, H, hd)).astype(np.float32)
    k_new = rng.standard_normal((B, Hkv, hd)).astype(np.float32)
    v_new = rng.standard_normal((B, Hkv, hd)).astype(np.float32)

    pos = np.maximum(lengths - 1, 0)
    cos, sin = common.rope_cos_sin(jnp.asarray(pos), hd, 10000.0)
    out_r, pk_r, pv_r = paged_attn.paged_decode_attention(
        jnp.asarray(q), jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(_flat(pool_k)), jnp.asarray(_flat(pool_v)),
        jnp.asarray(page_tables), jnp.asarray(lengths),
        page_size=ps, rope_cos=cos, rope_sin=sin, interpret=True,
    )

    qr = common.apply_rope(jnp.asarray(q)[:, :, None, :],
                           cos[:, None, :], sin[:, None, :])[:, :, 0, :]
    kr = common.apply_rope(jnp.asarray(k_new)[:, :, None, :],
                           cos[:, None, :], sin[:, None, :])[:, :, 0, :]
    out_x, pk_x, pv_x = paged_attn.paged_decode_attention(
        qr, kr, jnp.asarray(v_new),
        jnp.asarray(_flat(pool_k)), jnp.asarray(_flat(pool_v)),
        jnp.asarray(page_tables), jnp.asarray(lengths),
        page_size=ps, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_x),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pk_r), np.asarray(pk_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pv_r), np.asarray(pv_x),
                               rtol=0, atol=0)


def test_paged_verify_window_matches_oracle():
    """W-token verify kernel: writes all window rows through the page
    table (across a page boundary) and computes causal attention for
    every window position; inactive slots untouched."""
    rng = np.random.default_rng(4)
    B, Hkv, hd, P, maxp, ps, g, W = 3, 2, 64, 10, 3, 32, 2, 4
    H = g * Hkv
    # slot 0 window crosses a page boundary (start 30, W 4); slot 1 fresh
    # at 0; slot 2 inactive
    start = np.asarray([30, 0, -1], np.int32)
    page_tables = np.zeros((B, maxp), np.int32)
    page_tables[0] = [1, 2, 3]
    page_tables[1] = [4, 5, 6]
    pool_k = rng.standard_normal((P, Hkv, ps, hd)).astype(np.float32)
    pool_v = rng.standard_normal((P, Hkv, ps, hd)).astype(np.float32)
    q = rng.standard_normal((B, H, W, hd)).astype(np.float32)
    k_new = rng.standard_normal((B, Hkv, W, hd)).astype(np.float32)
    v_new = rng.standard_normal((B, Hkv, W, hd)).astype(np.float32)

    out, pk2, pv2 = paged_attn.paged_verify_attention(
        jnp.asarray(q), jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(_flat(pool_k)), jnp.asarray(_flat(pool_v)),
        jnp.asarray(page_tables), jnp.asarray(start),
        page_size=ps, interpret=True,
    )
    out = np.asarray(out)
    pk2, pv2 = _hm(pk2, Hkv), _hm(pv2, Hkv)

    # inactive slot wrote nothing, emitted zeros
    np.testing.assert_array_equal(pk2[page_tables[2]], pool_k[page_tables[2]])
    assert np.abs(out[2]).max() == 0.0

    for b in range(2):
        # window rows landed at start..start+W-1 through the page table
        for w in range(W):
            posw = start[b] + w
            pid, off = page_tables[b, posw // ps], posw % ps
            np.testing.assert_allclose(pk2[pid, :, off], k_new[b, :, w],
                                       rtol=1e-6)
            np.testing.assert_allclose(pv2[pid, :, off], v_new[b, :, w],
                                       rtol=1e-6)
        # causal attention over prefix + window (post-write pool contents)
        S = maxp * ps
        k_all = np.zeros((Hkv, S, hd)); v_all = np.zeros((Hkv, S, hd))
        for p in range(maxp):
            k_all[:, p * ps:(p + 1) * ps] = pk2[page_tables[b, p]]
            v_all[:, p * ps:(p + 1) * ps] = pv2[page_tables[b, p]]
        for h in range(H):
            kh = h // g
            for w in range(W):
                n = start[b] + w + 1
                lg = (k_all[kh, :n] @ q[b, h, w]) / np.sqrt(hd)
                pr = np.exp(lg - lg.max()); pr /= pr.sum()
                np.testing.assert_allclose(
                    out[b, h, w], pr @ v_all[kh, :n], rtol=3e-5, atol=3e-5,
                    err_msg=f"b={b} h={h} w={w}")


def test_paged_verify_window_rope_parity():
    """rope operands: verify kernel rotates each window row by its own
    cos/sin row — must match host-side apply_rope at positions start+w."""
    from squeezellm_tpu.models import common

    rng = np.random.default_rng(5)
    B, Hkv, hd, P, maxp, ps, g, W = 2, 2, 64, 8, 2, 32, 2, 3
    H = g * Hkv
    start = np.asarray([13, 0], np.int32)
    page_tables = np.arange(B * maxp, dtype=np.int32).reshape(B, maxp) + 1
    pool_k = rng.standard_normal((P, Hkv, ps, hd)).astype(np.float32)
    pool_v = rng.standard_normal((P, Hkv, ps, hd)).astype(np.float32)
    q = rng.standard_normal((B, H, W, hd)).astype(np.float32)
    k_new = rng.standard_normal((B, Hkv, W, hd)).astype(np.float32)
    v_new = rng.standard_normal((B, Hkv, W, hd)).astype(np.float32)

    positions = start[:, None] + np.arange(W)  # (B, W)
    cos, sin = common.rope_cos_sin(jnp.asarray(positions), hd, 10000.0)
    out_r, pk_r, pv_r = paged_attn.paged_verify_attention(
        jnp.asarray(q), jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(_flat(pool_k)), jnp.asarray(_flat(pool_v)),
        jnp.asarray(page_tables), jnp.asarray(start),
        page_size=ps, rope_cos=cos, rope_sin=sin, interpret=True,
    )
    qr = common.apply_rope(jnp.asarray(q), cos, sin)
    kr = common.apply_rope(jnp.asarray(k_new), cos, sin)
    out_x, pk_x, pv_x = paged_attn.paged_verify_attention(
        qr, kr, jnp.asarray(v_new),
        jnp.asarray(_flat(pool_k)), jnp.asarray(_flat(pool_v)),
        jnp.asarray(page_tables), jnp.asarray(start),
        page_size=ps, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_x),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pk_r), np.asarray(pk_x),
                               rtol=1e-5, atol=1e-5)


def test_paged_attention_sliding_window():
    """sliding_window: decode + verify kernels mask positions below the
    window and skip whole pages; parity vs the dense masked oracle."""
    from squeezellm_tpu.models import common

    rng = np.random.default_rng(6)
    B, Hkv, hd, P, maxp, ps, g, win = 2, 2, 64, 10, 4, 16, 2, 24
    H = g * Hkv
    lengths = np.asarray([61, 9], np.int32)  # 61 > win: pages 0-1 skipped
    page_tables = np.arange(B * maxp, dtype=np.int32).reshape(B, maxp) + 1
    pool_k = rng.standard_normal((P, Hkv, ps, hd)).astype(np.float32)
    pool_v = rng.standard_normal((P, Hkv, ps, hd)).astype(np.float32)
    q = rng.standard_normal((B, H, hd)).astype(np.float32)
    k_new = rng.standard_normal((B, Hkv, hd)).astype(np.float32)
    v_new = rng.standard_normal((B, Hkv, hd)).astype(np.float32)

    out, pk2, pv2 = paged_attn.paged_decode_attention(
        jnp.asarray(q), jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(_flat(pool_k)), jnp.asarray(_flat(pool_v)),
        jnp.asarray(page_tables), jnp.asarray(lengths),
        page_size=ps, sliding_window=win, interpret=True,
    )
    out = np.asarray(out)
    pk2, pv2 = _hm(pk2, Hkv), _hm(pv2, Hkv)
    S = maxp * ps
    for b in range(B):
        n = int(lengths[b])
        lo = max(0, n - win)
        k_all = np.zeros((Hkv, S, hd)); v_all = np.zeros((Hkv, S, hd))
        for p in range(maxp):
            k_all[:, p * ps:(p + 1) * ps] = pk2[page_tables[b, p]]
            v_all[:, p * ps:(p + 1) * ps] = pv2[page_tables[b, p]]
        for h in range(H):
            kh = h // g
            lg = (k_all[kh, lo:n] @ q[b, h]) / np.sqrt(hd)
            pr = np.exp(lg - lg.max()); pr /= pr.sum()
            np.testing.assert_allclose(out[b, h], pr @ v_all[kh, lo:n],
                                       rtol=3e-5, atol=3e-5,
                                       err_msg=f"b={b} h={h}")

    # verify window with sliding window: per-row mask
    W = 3
    start = np.asarray([58, 2], np.int32)
    qw = rng.standard_normal((B, H, W, hd)).astype(np.float32)
    knw = rng.standard_normal((B, Hkv, W, hd)).astype(np.float32)
    vnw = rng.standard_normal((B, Hkv, W, hd)).astype(np.float32)
    outw, pk3, pv3 = paged_attn.paged_verify_attention(
        jnp.asarray(qw), jnp.asarray(knw), jnp.asarray(vnw),
        jnp.asarray(_flat(pool_k)), jnp.asarray(_flat(pool_v)),
        jnp.asarray(page_tables), jnp.asarray(start),
        page_size=ps, sliding_window=win, interpret=True,
    )
    outw = np.asarray(outw)
    pk3, pv3 = _hm(pk3, Hkv), _hm(pv3, Hkv)
    for b in range(B):
        k_all = np.zeros((Hkv, S, hd)); v_all = np.zeros((Hkv, S, hd))
        for p in range(maxp):
            k_all[:, p * ps:(p + 1) * ps] = pk3[page_tables[b, p]]
            v_all[:, p * ps:(p + 1) * ps] = pv3[page_tables[b, p]]
        for h in range(H):
            kh = h // g
            for w in range(W):
                qp = int(start[b]) + w
                lo = max(0, qp + 1 - win)
                lg = (k_all[kh, lo:qp + 1] @ qw[b, h, w]) / np.sqrt(hd)
                pr = np.exp(lg - lg.max()); pr /= pr.sum()
                np.testing.assert_allclose(
                    outw[b, h, w], pr @ v_all[kh, lo:qp + 1],
                    rtol=3e-5, atol=3e-5, err_msg=f"b={b} h={h} w={w}")
