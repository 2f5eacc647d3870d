"""End-to-end quantization: dense model params -> quantized (specs, params).

The in-memory equivalent of the reference 4-step offline pipeline
(quantization/README.md:17-89: chunk -> outlier config -> nuq k-means ->
pack), collapsed into one resumable pass per layer:

  per layer, per module:
    1. (optional) extract outliers: sensitivity top-s% by grad^2 and/or
       |w| >= IQR threshold                      [outliers.py]
    2. fit per-output-channel weighted k-means codebook on the zeroed dense
       weight                                     [kmeans.py]
    3. pack codes + LUT + zero-corrected sparse COO [ops.pack_linear]
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from squeezellm_tpu.models import registry
from squeezellm_tpu.models.common import LinearSpec
from squeezellm_tpu.ops.quant_linear import pack_linear
from squeezellm_tpu.quantize import kmeans as kmeans_mod
from squeezellm_tpu.quantize import outliers as outliers_mod


def quantize_layer(
    weights: Dict[str, np.ndarray],
    gradients: Optional[Dict[str, np.ndarray]],
    bits: int,
    sensitivity: float = 0.0,
    outlier_thresholds: Optional[Dict[str, float]] = None,
    biases: Optional[Dict[str, np.ndarray]] = None,
    method: str = "auto",
    nnz_pad_multiple: int = 512,
    seed: int = 0,
    build_spmv: bool = True,
    structured: bool = False,
) -> Dict[str, Tuple[Any, Dict[str, np.ndarray]]]:
    """Quantize one decoder layer's modules.

    structured (bits=4 only): fit additive codebooks
    ``lut[c] = A[c&7] + (c>>3)*d`` (kmeans.fit_structured_luts) — 9
    DOF/channel instead of 16, dequantizing at ~4 instead of ~6 VPU
    ops/weight on v5e (ops/pallas_ops._dequant_plane_struct). The
    fidelity delta is gated in tests/test_quantize.py.

    Returns {module_name: (QuantLinearSpec, params dict)}.
    """
    include_sparse = sensitivity > 0 or outlier_thresholds is not None
    weights = {n: np.asarray(w, dtype=np.float32).copy() for n, w in weights.items()}
    outlier_mats = None
    if include_sparse:
        outlier_mats = outliers_mod.remove_outliers(
            weights,
            sensitivity=sensitivity,
            outlier_config=outlier_thresholds,
            gradients=gradients,
        )
    out = {}
    for name, w in weights.items():
        g = None if gradients is None else np.asarray(gradients[name], np.float32)
        if structured and bits == 4:
            lut, labels = kmeans_mod.fit_structured_luts(w, g, seed=seed)
        else:
            lut, labels = kmeans_mod.fit_module_luts(w, g, bits,
                                                     method=method, seed=seed)
        spec, params = pack_linear(
            w, lut, labels=labels,
            bias=None if biases is None else biases.get(name),
            outliers=None if outlier_mats is None else outlier_mats[name],
            bits=bits, nnz_pad_multiple=nnz_pad_multiple,
            build_spmv=build_spmv,
        )
        out[name] = (spec, params)
    return out


def quantize_model(
    model_type: str,
    config,
    dense_params,
    bits: int,
    gradients_per_layer=None,
    sensitivity: float = 0.0,
    outlier_config: Optional[list] = None,
    method: str = "auto",
    nnz_pad_multiple: int = 512,
    verbose: bool = False,
    build_spmv: bool = True,
    quantize_lm_head: bool = False,
    structured: bool = False,
):
    """Quantize a dense params pytree into (specs, params).

    Embeddings and norms stay dense; lm_head stays dense BY DEFAULT (the
    reference skips it, llama.py:172-174) — quantize_lm_head=True is a
    TPU-side opt-in extension (no sensitivity/outliers; saves ~200 MB of
    bf16 head reads per decode step at 7B, a numerics deviation from the
    reference).

    gradients_per_layer: optional list of {module: (out,in) grad^2 arrays}.
    outlier_config: optional list of per-layer {module: threshold}.
    """
    mod = registry.get_model_module(model_type)
    module_names = registry.get_module_names(model_type)
    dense_specs = mod.dense_specs(config)

    spec_layers = []
    param_layers = []
    for li, layer_p in enumerate(dense_params["layers"]):
        weights = {n: np.asarray(layer_p[n]["w"]) for n in module_names}
        biases = {
            n: np.asarray(layer_p[n]["b"])
            for n in module_names
            if isinstance(layer_p[n], dict) and "b" in layer_p[n]
        }
        grads = None if gradients_per_layer is None else gradients_per_layer[li]
        thresholds = None if outlier_config is None else outlier_config[li]
        q = quantize_layer(
            weights, grads, bits,
            sensitivity=sensitivity,
            outlier_thresholds=thresholds,
            biases=biases or None,
            method=method,
            nnz_pad_multiple=nnz_pad_multiple,
            build_spmv=build_spmv,
            structured=structured,
        )
        spec_d = dict(dense_specs["layers"][li])
        param_d = {k: v for k, v in layer_p.items() if k not in module_names}
        for name, (qspec, qparams) in q.items():
            spec_d[name] = LinearSpec(
                in_features=qspec.in_features,
                out_features=qspec.out_features,
                has_bias=qspec.has_bias,
                quant=qspec,
            )
            param_d[name] = qparams
        spec_layers.append(spec_d)
        param_layers.append(param_d)
        if verbose:
            print(f"quantized layer {li + 1}/{len(dense_params['layers'])}")

    lm_head_spec = dense_specs["lm_head"]
    params = {k: v for k, v in dense_params.items() if k != "layers"}
    if quantize_lm_head:
        w = np.asarray(dense_params["lm_head"]["w"], np.float32)
        if structured and bits == 4:
            lut, labels = kmeans_mod.fit_structured_luts(w, None, seed=0)
        else:
            lut, labels = kmeans_mod.fit_module_luts(w, None, bits,
                                                     method=method, seed=0)
        qspec, qparams = pack_linear(w, lut, labels=labels, bits=bits)
        lm_head_spec = LinearSpec(
            in_features=qspec.in_features, out_features=qspec.out_features,
            quant=qspec,
        )
        params["lm_head"] = qparams
        if verbose:
            print("quantized lm_head")
    specs = {"layers": tuple(spec_layers), "lm_head": lm_head_spec}
    params["layers"] = param_layers
    return specs, params
