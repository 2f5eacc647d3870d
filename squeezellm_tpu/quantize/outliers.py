"""Outlier extraction: sensitivity-based and threshold-based.

Numpy reimplementation of the reference semantics
(reference squeezellm/outliers.py:4-111):

  * sensitivity: per module, the top `s`% of weights ranked by grad^2 are
    moved to the sparse sidecar (threshold = k-th largest gradient value,
    extracted where grad > threshold).
  * threshold: weights with |w| >= thres move out.
  * both passes can stack; remaining dense weights are zeroed at extracted
    slots.

Operates on {module_name: (out, in) array} dicts; returns the outlier
matrices and mutates the weight dict to the zeroed dense parts.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def remove_outliers_by_sensitivity(
    weights: Dict[str, np.ndarray],
    gradients: Dict[str, np.ndarray],
    sensitivity: float,
    verbose: bool = False,
):
    """Extract the top `sensitivity`% weights by grad^2 per module."""
    outliers = {}
    tot_out = 0
    tot_all = 0
    for name in list(weights):
        w = np.asarray(weights[name], dtype=np.float32)
        g = np.asarray(gradients[name], dtype=np.float32)
        num = int(g.size * sensitivity / 100)
        if num <= 0:
            outliers[name] = np.zeros_like(w)
            continue
        # threshold = num-th largest gradient value; extract strictly above
        # (reference topk(...).values[-1]; t = gweight > thres)
        thres = np.partition(g.reshape(-1), -num)[-num]
        t = g > thres
        outliers[name] = np.where(t, w, 0.0).astype(np.float32)
        weights[name] = np.where(t, 0.0, w).astype(np.float32)
        tot_out += int(t.sum())
        tot_all += t.size
    if verbose and tot_all:
        print(f"p outlier (sensitivity): {tot_out / tot_all * 100:.4f}%")
    return outliers


def remove_outliers_by_threshold(
    weights: Dict[str, np.ndarray],
    outlier_config: Dict[str, float],
    outliers: Optional[Dict[str, np.ndarray]] = None,
    verbose: bool = False,
):
    """Extract weights with |w| >= per-module threshold; accumulates into
    `outliers` if given (stacked after the sensitivity pass)."""
    if outliers is None:
        outliers = {n: np.zeros_like(np.asarray(weights[n], np.float32)) for n in weights}
    tot_out = 0
    tot_all = 0
    for name in list(weights):
        thres = float(outlier_config[name])
        w = np.asarray(weights[name], dtype=np.float32)
        t = np.abs(w) >= thres
        outliers[name] = outliers[name] + np.where(t, w, 0.0).astype(np.float32)
        weights[name] = np.where(t, 0.0, w).astype(np.float32)
        tot_out += int(t.sum())
        tot_all += t.size
    if verbose and tot_all:
        print(f"p outlier (threshold): {tot_out / tot_all * 100:.4f}%")
    return outliers


def remove_outliers(
    weights: Dict[str, np.ndarray],
    sensitivity: float = 0.0,
    outlier_config: Optional[Dict[str, float]] = None,
    gradients: Optional[Dict[str, np.ndarray]] = None,
    verbose: bool = False,
):
    """Orchestration matching reference remove_outliers (outliers.py:78-111)."""
    assert outlier_config is not None or sensitivity != 0
    if sensitivity != 0:
        assert gradients is not None
        outliers = remove_outliers_by_sensitivity(
            weights, gradients, sensitivity, verbose
        )
    else:
        outliers = None
    if outlier_config is not None:
        outliers = remove_outliers_by_threshold(
            weights, outlier_config, outliers, verbose
        )
    return outliers
