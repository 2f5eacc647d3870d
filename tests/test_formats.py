import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from squeezellm_tpu import formats


@pytest.mark.parametrize("bits", [2, 3, 4, 8])
def test_pack_unpack_roundtrip(bits):
    rng = np.random.default_rng(0)
    in_f, out_f = 96, 64
    codes = rng.integers(0, 2**bits, size=(in_f, out_f), dtype=np.uint8)
    packed = formats.pack_codes(codes, bits)
    assert packed.dtype == np.int32
    assert packed.shape == (formats.n_words(in_f, bits), out_f)
    out = formats.unpack_codes(packed, bits, in_f)
    np.testing.assert_array_equal(out, codes)


@pytest.mark.parametrize("bits", [3, 4])
def test_pack_unpack_unaligned_in(bits):
    rng = np.random.default_rng(1)
    in_f = 37  # not a multiple of codes-per-word
    codes = rng.integers(0, 2**bits, size=(in_f, 8), dtype=np.uint8)
    packed = formats.pack_codes(codes, bits)
    out = formats.unpack_codes(packed, bits, in_f)
    np.testing.assert_array_equal(out, codes)


@pytest.mark.parametrize("bits", [3, 4])
def test_jnp_unpack_matches_numpy(bits):
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    in_f, out_f = 64, 32
    codes = rng.integers(0, 2**bits, size=(in_f, out_f), dtype=np.uint8)
    packed = formats.pack_codes(codes, bits)
    out = formats.unpack_codes_jnp(jnp.asarray(packed), bits, in_f)
    np.testing.assert_array_equal(np.asarray(out), codes)


@pytest.mark.parametrize("bits", [3, 4])
def test_reference_layout_roundtrip(bits):
    rng = np.random.default_rng(3)
    in_f, out_f = 128, 16
    codes = rng.integers(0, 2**bits, size=(in_f, out_f), dtype=np.uint8)
    packed = formats.pack_codes_ref(codes, bits)
    assert packed.shape == (in_f // 32 * bits, out_f)
    out = formats.unpack_codes_ref(packed, bits, in_f)
    np.testing.assert_array_equal(out, codes)


def test_reference_3bit_layout_against_literal_packer():
    """Pin the 3-bit reference layout with an independent, literal
    transcription of the packing loop structure (quant.py:185-203)."""
    rng = np.random.default_rng(4)
    in_f, out_f = 64, 4
    codes = rng.integers(0, 8, size=(in_f, out_f), dtype=np.uint32)

    qweight = np.zeros((in_f // 32 * 3, out_f), dtype=np.uint32)
    i = 0
    row = 0
    while row < qweight.shape[0]:
        for j in range(i, i + 10):
            qweight[row] |= codes[j] << (3 * (j - i))
        i += 10
        qweight[row] |= codes[i] << 30
        row += 1
        qweight[row] |= (codes[i] >> 2) & 1
        i += 1
        for j in range(i, i + 10):
            qweight[row] |= codes[j] << (3 * (j - i) + 1)
        i += 10
        qweight[row] |= codes[i] << 31
        row += 1
        qweight[row] |= (codes[i] >> 1) & 0x3
        i += 1
        for j in range(i, i + 10):
            qweight[row] |= codes[j] << (3 * (j - i) + 2)
        i += 10
        row += 1

    expected = qweight.view(np.int32)
    got = formats.pack_codes_ref(codes.astype(np.uint8), 3)
    np.testing.assert_array_equal(got, expected)
    np.testing.assert_array_equal(
        formats.unpack_codes_ref(expected, 3, in_f), codes.astype(np.uint8)
    )


def test_convert_ref_qweight():
    rng = np.random.default_rng(5)
    in_f, out_f = 64, 8
    codes = rng.integers(0, 8, size=(in_f, out_f), dtype=np.uint8)
    ref = formats.pack_codes_ref(codes, 3)
    ours = formats.convert_ref_qweight(ref, 3, in_f)
    np.testing.assert_array_equal(formats.unpack_codes(ours, 3, in_f), codes)


def test_dequant_and_assign():
    rng = np.random.default_rng(6)
    out_f, in_f, K = 8, 16, 16
    lut = np.sort(rng.normal(size=(out_f, K)).astype(np.float32), axis=1)
    codes_oi = rng.integers(0, K, size=(out_f, in_f), dtype=np.uint8)
    w = np.take_along_axis(lut, codes_oi.astype(np.int64), axis=1)
    # assign_codes recovers codes that dequantize to the same values
    codes2 = formats.assign_codes(w, lut)
    w2 = np.take_along_axis(lut, codes2.astype(np.int64), axis=1)
    np.testing.assert_allclose(w2, w, rtol=0, atol=0)
    # dequant_np on (in, out) codes
    deq = formats.dequant_np(codes_oi.T, lut)
    np.testing.assert_allclose(deq, w.T)


def test_sparse_coo_roundtrip_and_csr():
    rng = np.random.default_rng(7)
    out_f, in_f = 32, 48
    dense = np.zeros((out_f, in_f), dtype=np.float32)
    mask = rng.random((out_f, in_f)) < 0.02
    dense[mask] = rng.normal(size=mask.sum()).astype(np.float32)
    coo = formats.SparseCOO.from_dense(dense, pad_multiple=64)
    assert coo.nnz == mask.sum()
    assert len(coo.vals) % 64 == 0
    np.testing.assert_allclose(coo.to_dense(), dense)
    # rows sorted (CSR order)
    assert np.all(np.diff(coo.rows[: coo.nnz]) >= 0)

    # CSR round trip
    crow = np.zeros(out_f + 1, dtype=np.int64)
    np.cumsum((dense != 0).sum(1), out=crow[1:])
    cols = np.concatenate([np.nonzero(dense[r])[0] for r in range(out_f)])
    vals = np.concatenate([dense[r, dense[r] != 0] for r in range(out_f)])
    coo2 = formats.SparseCOO.from_csr(crow, cols, vals, in_f, pad_multiple=64)
    np.testing.assert_allclose(coo2.to_dense(), dense)


def test_nearest_to_zero():
    lut = np.array([-2.0, -0.1, 0.3, 1.5], dtype=np.float32)
    assert formats.nearest_to_zero(lut) == np.float32(-0.1)
