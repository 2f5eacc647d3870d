"""Staged offline quantization workflow with per-layer resume.

Disk-artifact parity with the reference's 4-step pipeline
(quantization/README.md:17-89):

  step 2  chunk           HF ckpt -> chunks/layer_{i}.npz  {module: W}
                          (= chunk_models.py; also used for grad^2 ckpts)
  step 3  outlier-config  chunks -> outlier_config.json (IQR rule,
                          = generate_outlier_config.py)
  step 4  nuq             chunks (+grad chunks) -> nuq/lut_{i}.npz
                          (+ nuq/outliers_{i}.npz COO) — per-output-channel
                          weighted k-means; resumes by skipping existing
                          files (= nuq.py:131-133)
  step 5  pack            HF ckpt + nuq artifacts -> quantized checkpoint
                          dir (= pack.py, but emitting the manifest format
                          of checkpoint.py instead of sentinel state-dict
                          keys)

The one-shot pipeline.quantize_model covers the same math in memory; these
stages exist for big models where each step is a separate (restartable) job.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from squeezellm_tpu.models import registry
from squeezellm_tpu.quantize import kmeans as kmeans_mod
from squeezellm_tpu.quantize import outlier_config as oc_mod
from squeezellm_tpu.quantize import outliers as outliers_mod


def chunk_model(model_dir: str, out_dir: str, verbose: bool = False) -> int:
    """Split an HF checkpoint into per-layer module-weight npz chunks.

    Works for both model weights and grad^2 checkpoints shaped like them
    (quantization/README.md:17-20)."""
    from squeezellm_tpu.utils import hf

    model_type, config, _, params = hf.load_dense_model(model_dir)
    module_names = registry.get_module_names(model_type)
    os.makedirs(out_dir, exist_ok=True)
    for li, layer in enumerate(params["layers"]):
        path = os.path.join(out_dir, f"layer_{li}.npz")
        if os.path.exists(path):
            if verbose:
                print(f"skip existing {path}")
            continue
        np.savez(path, **{n: np.asarray(layer[n]["w"]) for n in module_names})
        if verbose:
            print(f"wrote {path}")
    meta = {"model_type": model_type, "n_layers": config.n_layers,
            "model_dir": os.path.abspath(model_dir)}
    with open(os.path.join(out_dir, "chunks.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return config.n_layers


def _iter_chunks(chunks_dir: str):
    with open(os.path.join(chunks_dir, "chunks.json")) as f:
        meta = json.load(f)
    for li in range(meta["n_layers"]):
        yield li, dict(np.load(os.path.join(chunks_dir, f"layer_{li}.npz")))


def make_outlier_config(chunks_dir: str, threshold_range: float,
                        out_json: str, verbose: bool = False) -> dict:
    cfg = oc_mod.make_outlier_config(
        (layer for _, layer in _iter_chunks(chunks_dir)),
        threshold_range, verbose=verbose,
    )
    with open(out_json, "w") as f:
        json.dump(cfg, f, indent=2)
    return cfg


def nuq(
    chunks_dir: str,
    out_dir: str,
    bits: int,
    gradient_chunks_dir: Optional[str] = None,
    sensitivity: float = 0.0,
    outlier_config_json: Optional[str] = None,
    method: str = "auto",
    seed: int = 0,
    verbose: bool = False,
) -> None:
    """Per-layer k-means LUTs (+ outlier extraction), resumable."""
    os.makedirs(out_dir, exist_ok=True)
    thresholds = None
    if outlier_config_json:
        with open(outlier_config_json) as f:
            thresholds = json.load(f)["outlier_config"]

    for li, weights in _iter_chunks(chunks_dir):
        lut_path = os.path.join(out_dir, f"lut_{li}.npz")
        if os.path.exists(lut_path):
            if verbose:
                print(f"skip layer {li} (exists)")
            continue
        grads = None
        if gradient_chunks_dir:
            grads = dict(np.load(
                os.path.join(gradient_chunks_dir, f"layer_{li}.npz")
            ))
        weights = {n: w.astype(np.float32).copy() for n, w in weights.items()}
        include_sparse = sensitivity > 0 or thresholds is not None
        outlier_mats = None
        if include_sparse:
            outlier_mats = outliers_mod.remove_outliers(
                weights, sensitivity=sensitivity,
                outlier_config=None if thresholds is None else thresholds[li],
                gradients=grads,
            )
        lut_arrays = {}
        for name, w in weights.items():
            g = None if grads is None else grads[name].astype(np.float32)
            lut, labels = kmeans_mod.fit_module_luts(
                w, g, bits, method=method, seed=seed
            )
            lut_arrays[f"{name}.lut"] = lut
            lut_arrays[f"{name}.labels"] = labels
        np.savez(lut_path, **lut_arrays)
        if outlier_mats is not None:
            coo = {}
            for name, m in outlier_mats.items():
                r, c = np.nonzero(m)
                coo[f"{name}.rows"] = r.astype(np.int32)
                coo[f"{name}.cols"] = c.astype(np.int32)
                coo[f"{name}.vals"] = m[r, c].astype(np.float32)
            np.savez(os.path.join(out_dir, f"outliers_{li}.npz"), **coo)
        if verbose:
            print(f"layer {li} done")


def pack(
    model_dir: str,
    nuq_dir: str,
    bits: int,
    output: str,
    nnz_pad_multiple: int = 512,
    build_spmv: bool = True,
    verbose: bool = False,
) -> None:
    """Collate per-layer LUT/outlier artifacts into a quantized checkpoint."""
    from squeezellm_tpu import checkpoint
    from squeezellm_tpu.models.common import LinearSpec
    from squeezellm_tpu.ops.quant_linear import pack_linear
    from squeezellm_tpu.utils import hf

    model_type, config, dense_specs, params = hf.load_dense_model(model_dir)
    module_names = registry.get_module_names(model_type)

    spec_layers = []
    new_layers = []
    for li, layer_p in enumerate(params["layers"]):
        lut_arrays = dict(np.load(os.path.join(nuq_dir, f"lut_{li}.npz")))
        opath = os.path.join(nuq_dir, f"outliers_{li}.npz")
        coo = dict(np.load(opath)) if os.path.exists(opath) else {}
        spec_d = dict(dense_specs["layers"][li])
        param_d = {k: v for k, v in layer_p.items() if k not in module_names}
        for name in module_names:
            w = np.asarray(layer_p[name]["w"], np.float32).copy()
            outliers = None
            if f"{name}.rows" in coo:
                outliers = np.zeros_like(w)
                r, c, v = (coo[f"{name}.rows"], coo[f"{name}.cols"],
                           coo[f"{name}.vals"])
                outliers[r, c] = v
                w[r, c] = 0.0  # dense weight is zeroed at outlier slots
            bias = layer_p[name].get("b") if isinstance(layer_p[name], dict) else None
            qspec, qparams = pack_linear(
                w, lut_arrays[f"{name}.lut"],
                labels=lut_arrays[f"{name}.labels"],
                bias=None if bias is None else np.asarray(bias),
                outliers=outliers, bits=bits,
                nnz_pad_multiple=nnz_pad_multiple,
                build_spmv=build_spmv,
            )
            spec_d[name] = LinearSpec(
                in_features=qspec.in_features, out_features=qspec.out_features,
                has_bias=qspec.has_bias, quant=qspec,
            )
            param_d[name] = qparams
        spec_layers.append(spec_d)
        new_layers.append(param_d)
        if verbose:
            print(f"packed layer {li + 1}/{config.n_layers}")

    specs = {"layers": tuple(spec_layers), "lm_head": dense_specs["lm_head"]}
    out_params = {k: np.asarray(v) if not isinstance(v, dict) else v
                  for k, v in params.items() if k != "layers"}
    out_params["layers"] = new_layers
    checkpoint.save_quantized(output, model_type, config, specs, out_params)
