"""IQR-rule outlier threshold config generator.

Reimplements the reference's generate_outlier_config.py:37-78: per
layer x module, threshold = max(|q1 - r*IQR|, |q3 + r*IQR|) (symmetric);
emits {outlier_threshold: measured global %, outlier_config: [per-layer
{module: thres}]}.
"""

from __future__ import annotations

from typing import Dict, Iterable, List

import numpy as np


def module_threshold(weight: np.ndarray, threshold_range: float) -> float:
    w = np.asarray(weight)
    q1 = np.quantile(w, 0.25)
    q3 = np.quantile(w, 0.75)
    lo = q1 - threshold_range * (q3 - q1)
    hi = q3 + threshold_range * (q3 - q1)
    return float(max(abs(lo), abs(hi)))


def make_outlier_config(
    layers: Iterable[Dict[str, np.ndarray]],
    threshold_range: float,
    verbose: bool = False,
) -> dict:
    """layers: iterable of {module_name: (out, in) weight} dicts."""
    total_params = 0
    total_outliers = 0
    per_layer: List[Dict[str, float]] = []
    for li, layer in enumerate(layers):
        layer_json = {}
        for name, w in layer.items():
            w = np.asarray(w)
            thres = module_threshold(w, threshold_range)
            n_out = int((np.abs(w) > thres).sum())
            total_params += w.size
            total_outliers += n_out
            if verbose:
                print(f"{li} {name} % outlier: {n_out / w.size * 100:.3f}%")
            layer_json[name] = thres
        per_layer.append(layer_json)
    pct = round(total_outliers / max(total_params, 1) * 100, 2)
    return {"outlier_threshold": pct, "outlier_config": per_layer}
