"""Two-hop-gather SpMV: offline planner + Pallas kernel (interpret) +
quant_linear integration (replaces the round-1 butterfly tests)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from squeezellm_tpu.ops import pallas_ops, spmv
from squeezellm_tpu.ops.quant_linear import pack_linear, quant_linear_apply


@pytest.mark.parametrize("o,i,frac", [(300, 500, 0.0045), (128, 128, 0.02),
                                      (64, 64, 0.3), (1000, 260, 0.001),
                                      (4096, 11008, 0.0045)])
def test_plan_numpy_oracle(o, i, frac):
    rng = np.random.default_rng(0)
    nnz = max(1, int(o * i * frac))
    r = rng.integers(0, o, nnz)
    c = rng.integers(0, i, nnz)
    v = rng.standard_normal(nnz).astype(np.float32)
    plan = spmv.build_plan(r, c, v, o, i)
    x = rng.standard_normal(i).astype(np.float32)
    dense = np.zeros((o, i), np.float32)
    np.add.at(dense, (r, c), v)
    np.testing.assert_allclose(spmv.reference_apply(plan, x), dense @ x,
                               rtol=1e-4, atol=1e-5)


@pytest.mark.smoke
def test_plan_duplicate_and_shared_source_entries():
    """Duplicate (r, c) pairs and many entries sharing one source column
    exercise the read-sharing path (impossible for the old butterfly)."""
    rng = np.random.default_rng(3)
    o, i = 256, 512
    r = np.concatenate([rng.integers(0, o, 200), np.arange(100)])
    c = np.concatenate([rng.integers(0, i, 200), np.full(100, 7)])
    v = rng.standard_normal(len(r)).astype(np.float32)
    plan = spmv.build_plan(r, c, v, o, i)
    x = rng.standard_normal(i).astype(np.float32)
    dense = np.zeros((o, i), np.float32)
    np.add.at(dense, (r, c), v)
    np.testing.assert_allclose(spmv.reference_apply(plan, x), dense @ x,
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("batch", [None, 3])
@pytest.mark.smoke
def test_kernel_interpret_matches_dense(batch):
    rng = np.random.default_rng(1)
    o, i, nnz = 4096, 1024, 18874
    r = rng.integers(0, o, nnz)
    c = rng.integers(0, i, nnz)
    v = rng.standard_normal(nnz).astype(np.float32)
    plan = spmv.build_plan(r, c, v, o, i)
    x = rng.standard_normal(i if batch is None else (batch, i)).astype(np.float32)
    y = pallas_ops.gather_spmv(
        jnp.asarray(x), jnp.asarray(plan.meta), jnp.asarray(plan.vals),
        oh=plan.oh, ih=plan.ih, out_features=o, interpret=True,
    )
    dense = np.zeros((o, i), np.float32)
    np.add.at(dense, (r, c), v)
    np.testing.assert_allclose(np.asarray(y), x @ dense.T, rtol=1e-4,
                               atol=1e-5)


@pytest.mark.smoke
def test_quant_linear_spmv_path_matches_xla():
    """pack_linear(build_spmv) + pallas backend == xla COO path."""
    rng = np.random.default_rng(2)
    o, i = 256, 384
    w = rng.standard_normal((o, i)).astype(np.float32) * 0.1
    lut = np.sort(rng.standard_normal((o, 16)).astype(np.float32) * 0.1, axis=1)
    outliers = np.zeros((o, i), np.float32)
    mask = rng.random((o, i)) < 0.01
    outliers[mask] = rng.standard_normal(mask.sum()).astype(np.float32)
    w[mask] = 0.0

    spec, params = pack_linear(w, lut, bits=4, outliers=outliers,
                               nnz_pad_multiple=64, build_spmv=True)
    assert spec.sg_rows > 0
    jp = jax.tree.map(jnp.asarray, params)
    x = jnp.asarray(rng.standard_normal((1, 1, i)).astype(np.float32))
    y_xla = quant_linear_apply(spec, jp, x, backend="xla")
    y_sg = quant_linear_apply(spec, jp, x, backend="pallas")
    np.testing.assert_allclose(np.asarray(y_sg), np.asarray(y_xla),
                               rtol=1e-4, atol=1e-5)


def test_prepare_model_attaches_plans():
    from squeezellm_tpu.models import llama
    from squeezellm_tpu.quantize import pipeline

    config = llama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        n_layers=2, n_heads=4, n_kv_heads=4, max_seq=32,
    )
    dense = llama.random_dense_params(config, jax.random.PRNGKey(0))
    grads = [
        {n: np.random.default_rng(li).random(
            np.asarray(lp[n]["w"]).shape).astype(np.float32)
         for n in llama.MODULE_NAMES}
        for li, lp in enumerate(dense["layers"])
    ]
    specs, params = pipeline.quantize_model(
        "llama", config, dense, bits=4, gradients_per_layer=grads,
        sensitivity=0.02, nnz_pad_multiple=16, build_spmv=False,
    )
    q0 = specs["layers"][0]["q"].quant
    assert q0.nnz_pad > 0 and q0.sg_rows == 0
    specs2, params2 = spmv.prepare_model(
        specs, params, llama.MODULE_NAMES, processes=1
    )
    q0b = specs2["layers"][0]["q"].quant
    assert q0b.sg_rows > 0
    assert "sg_meta" in params2["layers"][0]["q"]
    # decode equivalence xla vs pallas(spmv) on the whole model
    from squeezellm_tpu.models import common

    jp = jax.tree.map(jnp.asarray, params2)
    cache = common.init_kv_cache(1, config.max_seq, config.n_layers,
                                 config.n_kv_heads, config.head_dim)
    tok = jnp.asarray([[3]], jnp.int32)
    pos = jnp.asarray(0, jnp.int32)
    y1, _ = llama.decode_step(config, specs2, jp, tok, pos, cache, backend="xla")
    y2, _ = llama.decode_step(config, specs2, jp, tok, pos, cache,
                              backend="pallas")
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), rtol=2e-3,
                               atol=2e-4)


@pytest.mark.parametrize("mode", ["pallas", "pallas-bf16"])
def test_bigbatch_sparse_folded_into_scratch(mode):
    """Large-batch pallas path folds the COO sidecar into the dequant
    scratch — must equal the xla path (dense + separate sparse matmul)."""
    from squeezellm_tpu.ops import pallas_ops

    rng = np.random.default_rng(9)
    o, i = 256, 320
    w = rng.standard_normal((o, i)).astype(np.float32) * 0.1
    lut = np.sort(rng.standard_normal((o, 16)).astype(np.float32) * 0.1, axis=1)
    outliers = np.zeros((o, i), np.float32)
    mask = rng.random((o, i)) < 0.02
    outliers[mask] = rng.standard_normal(mask.sum()).astype(np.float32)
    w[mask] = 0.0
    spec, params = pack_linear(w, lut, bits=4, outliers=outliers,
                               nnz_pad_multiple=64, build_spmv=True)
    jp = jax.tree.map(jnp.asarray, params)
    big = pallas_ops.BIG_BATCH
    x = jnp.asarray(rng.standard_normal((big, i)).astype(np.float32))
    y_xla = quant_linear_apply(spec, jp, x, backend="xla")
    y_pl = quant_linear_apply(spec, jp, x, backend=mode)
    if mode == "pallas":
        np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_xla),
                                   rtol=2e-4, atol=2e-4)
    else:
        err = np.abs(np.asarray(y_pl) - np.asarray(y_xla)).max()
        assert err < 3e-2 * np.abs(np.asarray(y_xla)).max()


def test_native_planner_matches_oracle():
    from squeezellm_tpu import _native

    if not _native.available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(11)
    for (o, i, frac) in ((300, 500, 0.0045), (1000, 260, 0.01),
                         (4096, 11008, 0.0045)):
        nnz = max(1, int(o * i * frac))
        r = rng.integers(0, o, nnz)
        c = rng.integers(0, i, nnz)
        v = rng.standard_normal(nnz).astype(np.float32)
        plan = spmv.build_plan(r, c, v, o, i, method="native")
        x = rng.standard_normal(i).astype(np.float32)
        dense = np.zeros((o, i), np.float32)
        np.add.at(dense, (r, c), v)
        np.testing.assert_allclose(spmv.reference_apply(plan, x), dense @ x,
                                   rtol=1e-4, atol=1e-5)
        # fill comparable to (or better than) the numpy greedy
        plan_np = spmv.build_plan(r, c, v, o, i, method="numpy")
        assert plan.n_rows <= plan_np.n_rows * 1.5


@pytest.mark.parametrize("method", ["numpy", "native"])
def test_planner_fuzz(method):
    """Property fuzz over shapes/densities: every plan must reproduce the
    dense SpMV through the oracle, for both planner backends."""
    from squeezellm_tpu import _native

    if method == "native" and not _native.available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(123)
    for trial in range(12):
        o = int(rng.integers(1, 40)) * int(rng.choice([1, 17, 128]))
        i = int(rng.integers(1, 40)) * int(rng.choice([1, 13, 128]))
        o, i = max(o, 2), max(i, 2)
        if i > 32768 or o > 65536:
            continue
        nnz = int(rng.integers(1, max(2, min(o * i // 2, 5000))))
        r = rng.integers(0, o, nnz)
        c = rng.integers(0, i, nnz)
        v = rng.standard_normal(nnz).astype(np.float32)
        v[rng.random(nnz) < 0.1] = 0.0  # dead entries
        plan = spmv.build_plan(r, c, v, o, i, method=method)
        x = rng.standard_normal(i).astype(np.float32)
        dense = np.zeros((o, i), np.float32)
        np.add.at(dense, (r, c), v)
        np.testing.assert_allclose(
            spmv.reference_apply(plan, x), dense @ x, rtol=1e-4, atol=1e-4,
            err_msg=f"trial {trial}: o={o} i={i} nnz={nnz}")


def test_grouped_plan_matches_dense_oracle():
    """build_plan_grouped (round 5): per-chunk group-homogeneous plans —
    reference_apply and the classic-kernel fallback (grouped meta is
    classic-valid) must match the dense oracle; every chunk must be
    homogeneous (validated inside the builder); row growth stays bounded.
    The grouped KERNEL itself is hardware-only (scripts/tpu_verify.py)."""
    import jax.numpy as jnp

    from squeezellm_tpu.ops import pallas_ops

    rng = np.random.default_rng(3)
    o, i = 1000, 1300
    nnz = int(o * i * 0.01)
    r = rng.integers(0, o, nnz).astype(np.int32)
    c = rng.integers(0, i, nnz).astype(np.int32)
    v = rng.standard_normal(nnz).astype(np.float32)
    p = spmv.build_plan_grouped(r, c, v, o, i)
    pc = spmv.build_plan(r, c, v, o, i)
    assert p.groups is not None and p.groups.shape == (p.n_rows // 8,)
    assert p.n_rows <= 2 * pc.n_rows  # bounded fragmentation

    dense = np.zeros((o, i), np.float32)
    np.add.at(dense, (r, c), v)
    x = rng.standard_normal((2, i)).astype(np.float32)
    want = x @ dense.T
    got = np.stack([spmv.reference_apply(p, x[b]) for b in range(2)])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # interpret mode falls back to the classic kernel on the grouped meta
    y = np.asarray(pallas_ops.gather_spmv(
        jnp.asarray(x), jnp.asarray(p.meta), jnp.asarray(p.vals),
        oh=p.oh, ih=p.ih, out_features=o, interpret=True,
        groups=jnp.asarray(p.groups)))
    np.testing.assert_allclose(y, want, rtol=1e-5, atol=1e-5)
