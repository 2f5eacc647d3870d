"""Fisher-information (grad^2) computation for sensitivity-weighted k-means.

The reference treats this as an EXTERNAL step: "compute gradients using
SqueezeLLM-gradients" (reference quantization/README.md:17-20), a separate
torch repo producing a checkpoint of squared gradients shaped like the
model. Here it is a first-class, JAX-native stage: backprop the causal-LM
loss through the functional model over seeded calibration samples and
accumulate the squared weight gradients — the diagonal empirical Fisher
used as the k-means sample weight (nuq.py:163-176).

For models that don't fit a full backward pass in device memory, use
remat=True (jax.checkpoint over layers) and/or smaller sample batches.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

import jax
import jax.numpy as jnp

from squeezellm_tpu.models import registry


def compute_fisher(
    model_type: str,
    config,
    dense_params,
    calib_tokens: np.ndarray,
    batch_size: int = 1,
    remat: bool = True,
    dtype=jnp.float32,
    verbose: bool = False,
) -> List[Dict[str, np.ndarray]]:
    """Accumulate grad^2 of the causal-LM loss over calibration samples.

    calib_tokens: (nsamples, seqlen) int32 (the seeded random windows from
    data.get_loaders, matching the reference's calibration protocol).

    Returns one {module_name: (out, in) float32 grad^2} dict per layer —
    the `gradients_per_layer` input of pipeline.quantize_model.
    """
    mod = registry.get_model_module(model_type)
    module_names = registry.get_module_names(model_type)
    specs = mod.dense_specs(config)

    # differentiate w.r.t. the quantizable module weights only
    def split(params):
        diff = [
            {n: layer[n]["w"] for n in module_names}
            for layer in params["layers"]
        ]
        return diff

    def merge(params, diff):
        layers = []
        for layer, d in zip(params["layers"], diff):
            nl = dict(layer)
            for n in module_names:
                nl[n] = {**layer[n], "w": d[n]}
            layers.append(nl)
        return {**params, "layers": layers}

    def fwd(p, tokens):
        return mod.forward(config, specs, p, tokens, backend="xla", dtype=dtype)

    if remat:
        fwd = jax.checkpoint(fwd)

    def loss_fn(diff, params, tokens):
        p = merge(params, diff)
        logits = fwd(p, tokens)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        tgt = tokens[:, 1:]
        ll = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        return -jnp.mean(ll)

    @jax.jit
    def step(diff, params, tokens, acc):
        g = jax.grad(loss_fn)(diff, params, tokens)
        return jax.tree.map(lambda a, gi: a + gi.astype(jnp.float32) ** 2,
                            acc, g)

    diff = split(dense_params)
    acc = jax.tree.map(lambda w: jnp.zeros(w.shape, jnp.float32), diff)
    tokens = np.asarray(calib_tokens, np.int32)
    n = tokens.shape[0]
    for i in range(0, n, batch_size):
        batch = jnp.asarray(tokens[i : i + batch_size])
        acc = step(diff, dense_params, batch, acc)
        if verbose:
            print(f"fisher: sample {min(i + batch_size, n)}/{n}")
    return [
        {n: np.asarray(acc[li][n]) for n in module_names}
        for li in range(len(acc))
    ]


def save_gradient_chunks(grads: List[Dict[str, np.ndarray]], out_dir: str,
                         model_type: str, model_dir: str = "") -> None:
    """Write grad^2 as chunk files consumable by staged.nuq
    (--gradient-chunks) — same artifact shape as staged.chunk_model."""
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    for li, g in enumerate(grads):
        np.savez(os.path.join(out_dir, f"layer_{li}.npz"), **g)
    with open(os.path.join(out_dir, "chunks.json"), "w") as f:
        json.dump({"model_type": model_type, "n_layers": len(grads),
                   "model_dir": model_dir}, f, indent=2)
