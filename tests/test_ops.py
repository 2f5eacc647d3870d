import numpy as np
import pytest

import jax
import jax.numpy as jnp

from squeezellm_tpu import formats
from squeezellm_tpu.ops import quant_linear, xla_ops


def _random_quantized(rng, out_f, in_f, bits):
    lut = np.sort(rng.normal(size=(out_f, 2**bits)).astype(np.float32), axis=1)
    codes = rng.integers(0, 2**bits, size=(in_f, out_f), dtype=np.uint8)
    qweight = formats.pack_codes(codes, bits)
    w_dense = formats.dequant_np(codes, lut)  # (in, out)
    return lut, codes, qweight, w_dense


@pytest.mark.parametrize("bits", [3, 4])
@pytest.mark.smoke
def test_xla_dequantize_matches_numpy(bits):
    rng = np.random.default_rng(0)
    lut, codes, qweight, w_dense = _random_quantized(rng, 48, 80, bits)
    w = xla_ops.dequantize(jnp.asarray(qweight), jnp.asarray(lut), bits, 80)
    np.testing.assert_allclose(np.asarray(w), w_dense, rtol=0, atol=0)


@pytest.mark.parametrize("bits", [3, 4])
@pytest.mark.parametrize("batch", [1, 5])
@pytest.mark.smoke
def test_xla_lut_matmul(bits, batch):
    rng = np.random.default_rng(1)
    lut, codes, qweight, w_dense = _random_quantized(rng, 48, 80, bits)
    x = rng.normal(size=(batch, 80)).astype(np.float32)
    y = xla_ops.lut_matmul(jnp.asarray(x), jnp.asarray(qweight), jnp.asarray(lut), bits)
    np.testing.assert_allclose(np.asarray(y), x @ w_dense, rtol=1e-5, atol=1e-5)


@pytest.mark.smoke
def test_sparse_matmul_matches_dense():
    rng = np.random.default_rng(2)
    out_f, in_f = 40, 64
    dense = np.zeros((out_f, in_f), dtype=np.float32)
    mask = rng.random((out_f, in_f)) < 0.05
    dense[mask] = rng.normal(size=mask.sum()).astype(np.float32)
    coo = formats.SparseCOO.from_dense(dense, pad_multiple=128)
    x = rng.normal(size=(3, in_f)).astype(np.float32)
    y = xla_ops.sparse_matmul(
        jnp.asarray(x),
        jnp.asarray(coo.rows),
        jnp.asarray(coo.cols),
        jnp.asarray(coo.vals),
        out_f,
    )
    np.testing.assert_allclose(np.asarray(y), x @ dense.T, rtol=1e-5, atol=1e-5)


@pytest.mark.smoke
def test_hybrid_matmul_additive():
    rng = np.random.default_rng(3)
    in_f, out_f, topx = 32, 24, 5
    tw = rng.normal(size=(in_f, topx)).astype(np.float32)
    idx = np.array([3, 7, 11, 20, 23], dtype=np.int32)
    x = rng.normal(size=(2, in_f)).astype(np.float32)
    y = xla_ops.hybrid_matmul(jnp.asarray(x), jnp.asarray(tw), jnp.asarray(idx), out_f)
    expected = np.zeros((2, out_f), dtype=np.float32)
    expected[:, idx] += x @ tw
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("bits", [3, 4])
@pytest.mark.smoke
def test_pallas_interpret_matches_xla(bits):
    from squeezellm_tpu.ops import pallas_ops

    rng = np.random.default_rng(4)
    out_f, in_f = 384, 320
    lut, codes, qweight, w_dense = _random_quantized(rng, out_f, in_f, bits)
    x = rng.normal(size=(4, in_f)).astype(np.float32)
    y_ref = x @ w_dense
    y = pallas_ops.lut_matmul(
        jnp.asarray(x), jnp.asarray(qweight), jnp.asarray(lut), bits,
        b_blk=8, w_blk=16, o_blk=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("batch", [1, 3, 8])
@pytest.mark.parametrize("shape", [(320, 384), (384, 200)])
def test_pallas_lut_matmul_t_interpret(batch, shape):
    """Transposed wide-table lane-gather GEMV path (4-bit decode)."""
    from squeezellm_tpu.ops import pallas_ops

    rng = np.random.default_rng(6)
    in_f, out_f = shape
    bits = 4
    lut, codes, qweight, w_dense = _random_quantized(rng, out_f, in_f, bits)
    x = rng.normal(size=(batch, in_f)).astype(np.float32)
    y = pallas_ops.lut_matmul_t(
        jnp.asarray(x),
        jnp.asarray(np.ascontiguousarray(qweight.T)),
        jnp.asarray(pallas_ops.wide_lut(lut, bits)),
        bits, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(y), x @ w_dense, rtol=1e-4, atol=1e-4)


def test_wide_lut_wrap_identity():
    """tab[o, s & 127] == lut[o, s & (2**bits - 1)] for arbitrary garbage
    bits above the code — the invariant the mod-128 hardware wrap relies on."""
    from squeezellm_tpu.ops import pallas_ops

    rng = np.random.default_rng(7)
    lut = rng.normal(size=(16, 16)).astype(np.float32)
    tab = pallas_ops.wide_lut(lut, 4)
    s = rng.integers(-(2**31), 2**31 - 1, size=(16, 64), dtype=np.int64)
    got = tab[np.arange(16)[:, None], s & 127]
    want = lut[np.arange(16)[:, None], s & 15]
    np.testing.assert_array_equal(got, want)


def test_pallas_interpret_unaligned_shapes():
    from squeezellm_tpu.ops import pallas_ops

    rng = np.random.default_rng(5)
    out_f, in_f, bits = 200, 130, 3  # 130 = 13 words of 10 codes
    lut, codes, qweight, w_dense = _random_quantized(rng, out_f, in_f, bits)
    x = rng.normal(size=(3, in_f)).astype(np.float32)
    y = pallas_ops.lut_matmul(
        jnp.asarray(x), jnp.asarray(qweight), jnp.asarray(lut), bits,
        b_blk=8, w_blk=8, o_blk=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(y), x @ w_dense, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("bits", [3, 4])
@pytest.mark.parametrize("sparse", [False, True])
@pytest.mark.smoke
def test_quant_linear_end_to_end(bits, sparse):
    """pack_linear + quant_linear_apply reconstructs x @ W^T including the
    zero-correction identity at outlier slots (quant.py:117-123 semantics)."""
    rng = np.random.default_rng(6)
    out_f, in_f = 40, 64
    w_orig = rng.normal(size=(out_f, in_f)).astype(np.float32)

    outliers = None
    w_dense_part = w_orig
    if sparse:
        mask = rng.random((out_f, in_f)) < 0.05
        outliers = np.where(mask, w_orig, 0.0).astype(np.float32)
        w_dense_part = np.where(mask, 0.0, w_orig)

    # Simple per-channel "codebook": uniform quantiles as centroids.
    lut = np.quantile(
        w_dense_part, np.linspace(0, 1, 2**bits), axis=1
    ).T.astype(np.float32)
    bias = rng.normal(size=(out_f,)).astype(np.float32)

    spec, params = quant_linear.pack_linear(
        w_dense_part, lut, bias=bias, outliers=outliers, bits=bits,
        nnz_pad_multiple=128,
    )
    params = jax.tree.map(jnp.asarray, params)

    x = rng.normal(size=(2, in_f)).astype(np.float32)
    y = quant_linear.quant_linear_apply(spec, params, jnp.asarray(x), backend="xla")

    # Expected: dense dequant of w_dense_part + exact outliers + bias.
    codes = formats.assign_codes(w_dense_part, lut)
    deq = np.take_along_axis(lut, codes.astype(np.int64), axis=1)
    if sparse:
        # at outlier slots the dense path contributes centroid-nearest-zero,
        # and the sparse val was stored as (w - that) => sum is w exactly.
        expected_w = np.where(mask, w_orig, deq)
    else:
        expected_w = deq
    expected = x @ expected_w.T + bias
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-4, atol=1e-4)


def test_make_random_params_shapes():
    spec = quant_linear.QuantLinearSpec(
        bits=4, in_features=64, out_features=32, has_bias=True, nnz_pad=128, topx=4
    )
    params = quant_linear.make_random_params(jax.random.PRNGKey(0), spec)
    assert params["qweight"].shape == (8, 32)
    assert params["lut"].shape == (32, 16)
    assert params["sp_vals"].shape == (128,)
    assert params["topx_weights"].shape == (64, 4)
    y = quant_linear.quant_linear_apply(
        spec, params, jnp.ones((2, 64), jnp.float32), backend="xla"
    )
    assert y.shape == (2, 32)
    assert np.isfinite(np.asarray(y)).all()


def test_hybrid_matmul_batch_policy_in_hlo():
    """topX placement policy (measured v5e, scripts/topx_probe.py round 5):
    at GEMV/serving batch a <=topX-element scatter beats every one-hot
    variant by ~0.45 ms/step (the in-graph compare forces a per-dispatch
    scalar-memory copy of the s32 indices); at eval-stride batch the
    scatter's near-serial row loop loses (~298 us at b=2048) and the
    one-hot MXU placement matmul must be used. Pin both sides."""
    import jax

    from squeezellm_tpu.ops.quant_linear import (
        QuantLinearSpec, make_random_params, quant_linear_apply,
    )
    from squeezellm_tpu.ops import spmv

    rng = np.random.default_rng(0)
    o, i = 256, 384
    spec = QuantLinearSpec(bits=4, in_features=i, out_features=o, topx=10,
                           nnz_pad=64)
    params = make_random_params(jax.random.PRNGKey(0), spec)
    spec, params = spmv.attach_plan(
        spec, {k: np.asarray(v) for k, v in params.items()})
    params = jax.tree.map(jnp.asarray, params)
    x1 = jnp.asarray(rng.standard_normal((1, i)).astype(np.float32))
    hlo1 = jax.jit(
        lambda p, a: quant_linear_apply(spec, p, a, backend="pallas")
    ).lower(params, x1).as_text()
    assert "scatter" in hlo1  # decode: scatter placement

    from squeezellm_tpu.ops import xla_ops

    xb = jnp.asarray(rng.standard_normal((2048, i)).astype(np.float32))
    hlo_b = jax.jit(
        lambda w, idx, a: xla_ops.hybrid_matmul(a, w, idx, o)
    ).lower(params["topx_weights"], params["topx_indices"], xb).as_text()
    # big batch: one-hot matmul placement, no per-row scatter
    assert "scatter" not in hlo_b


@pytest.mark.parametrize("bits", [3, 4])
@pytest.mark.parametrize("mode", ["gather", "bf16"])
def test_pallas_bigbatch_dequant_dense_path(bits, mode):
    """The large-batch dequant-to-scratch path must match the fused path
    (force it with big_batch=8 on a small problem, interpret mode)."""
    from squeezellm_tpu.ops import pallas_ops

    rng = np.random.default_rng(7)
    out_f, in_f = 384, 320
    lut, codes, qweight, w_dense = _random_quantized(rng, out_f, in_f, bits)
    x = rng.normal(size=(16, in_f)).astype(np.float32)
    y_big = pallas_ops.lut_matmul(
        jnp.asarray(x), jnp.asarray(qweight), jnp.asarray(lut), bits,
        interpret=True, mode=mode, big_batch=8,
    )
    y_fused = pallas_ops.lut_matmul(
        jnp.asarray(x), jnp.asarray(qweight), jnp.asarray(lut), bits,
        interpret=True, mode=mode, big_batch=10**9,
    )
    np.testing.assert_allclose(np.asarray(y_big), np.asarray(y_fused),
                               rtol=2e-5, atol=2e-5)
    if mode == "bf16":
        # bf16 semantics: compare against bf16-rounded operands
        xr = np.asarray(jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32))
        wr = np.asarray(jnp.asarray(w_dense).astype(jnp.bfloat16)
                        .astype(jnp.float32))
        want = xr @ wr
        np.testing.assert_allclose(np.asarray(y_big), want,
                                   atol=3e-2 * np.abs(want).max())
    else:
        np.testing.assert_allclose(np.asarray(y_big), x @ w_dense,
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("bits", [3, 4])
@pytest.mark.parametrize("batch", [1, 4])
def test_fused_sparse_gemv_parity(bits, batch):
    """GEMV calls with per-o-block plans fold the sparse sidecar INTO the
    lut kernel (spmv.build_block_plans); numerics must match the dense +
    sparse oracle. out_f spans a full 1024 block plus a partial one."""
    from squeezellm_tpu.ops import pallas_ops, spmv

    rng = np.random.default_rng(3)
    out_f, in_f = 1408, 384
    lut, codes, qweight, w_dense = _random_quantized(rng, out_f, in_f, bits)
    nnz = 700
    rows = rng.integers(0, out_f, nnz).astype(np.int32)
    cols = rng.integers(0, in_f, nnz).astype(np.int32)
    vals = rng.normal(size=nnz).astype(np.float32)
    bmeta, bvals, ih = spmv.build_block_plans(rows, cols, vals, out_f, in_f)
    assert bmeta.shape[0] == 2  # 1024 + partial 384

    x = rng.normal(size=(batch, in_f)).astype(np.float32)
    y = pallas_ops.lut_matmul(
        jnp.asarray(x), jnp.asarray(qweight), jnp.asarray(lut), bits,
        interpret=True, sgb_meta=jnp.asarray(bmeta),
        sgb_vals=jnp.asarray(bvals), sgb_ih=ih,
    )
    sp = np.zeros((in_f, out_f), np.float32)
    np.add.at(sp, (cols, rows), vals)  # duplicate entries accumulate
    want = x @ (w_dense + sp)
    np.testing.assert_allclose(np.asarray(y), want, rtol=2e-4, atol=2e-4)


def test_quant_linear_apply_fused_sparse_matches_xla():
    """attach_plan attaches BOTH plan formats; the pallas decode path
    (fused) and the xla path (scatter) must agree, and batch sizes above 8
    (separate gather_spmv kernel) must agree with the fused GEMV result."""
    from squeezellm_tpu.ops import spmv

    rng = np.random.default_rng(5)
    o, i = 1280, 256
    spec = quant_linear.QuantLinearSpec(bits=4, in_features=i,
                                        out_features=o, nnz_pad=512)
    params = quant_linear.make_random_params(jax.random.PRNGKey(2), spec)
    spec, params = spmv.attach_plan(
        spec, {k: np.asarray(v) for k, v in params.items()})
    assert spec.sgb_rows > 0 and "sgb_meta" in params
    params = jax.tree.map(jnp.asarray, params)
    x1 = jnp.asarray(rng.standard_normal((2, i)).astype(np.float32))
    y_pallas = quant_linear.quant_linear_apply(spec, params, x1,
                                               backend="pallas")
    y_xla = quant_linear.quant_linear_apply(spec, params, x1, backend="xla")
    np.testing.assert_allclose(np.asarray(y_pallas), np.asarray(y_xla),
                               rtol=2e-4, atol=2e-4)
    # batch 12: separate gather_spmv kernel path, same numerics
    x12 = jnp.concatenate([x1] * 6, axis=0)
    y12 = quant_linear.quant_linear_apply(spec, params, x12,
                                          backend="pallas")
    np.testing.assert_allclose(np.asarray(y12[:2]), np.asarray(y_pallas),
                               rtol=2e-4, atol=2e-4)
