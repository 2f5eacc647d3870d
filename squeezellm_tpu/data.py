"""Dataset loaders for calibration and perplexity evaluation.

Mirrors the reference's seeded sampling protocol (reference
squeezellm/datautils.py): wikitext2/ptb/c4 loaders tokenize the raw corpus
and draw `nsamples` random seqlen-windows with `random.seed(seed)`.

This environment has zero egress, so HF `datasets` downloads only work from
a warm cache; two offline sources are added:
  * ``synthetic``: deterministic random tokens (tests/benchmarks),
  * a path to a ``.npy`` int token array (pre-tokenized corpus).
"""

from __future__ import annotations

import random
from typing import Optional

import numpy as np


def set_seed(seed: int) -> None:
    np.random.seed(seed)
    random.seed(seed)


def _sample_windows(token_ids: np.ndarray, nsamples: int, seed: int,
                    seqlen: int) -> np.ndarray:
    """Reference sampling: random.seed(seed); nsamples windows of seqlen
    (datautils.py:26-34). Returns (nsamples, seqlen)."""
    rnd = random.Random(seed)
    n = token_ids.shape[-1]
    out = np.empty((nsamples, seqlen), dtype=np.int32)
    for s in range(nsamples):
        i = rnd.randint(0, n - seqlen - 1)
        out[s] = token_ids[..., i : i + seqlen]
    return out


def synthetic_tokens(vocab_size: int, n_tokens: int, seed: int = 0) -> np.ndarray:
    """Deterministic pseudo-corpus: (1, n_tokens) int32."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, vocab_size, size=(1, n_tokens), dtype=np.int32)


def _tokenize_corpus(name: str, split: str, tokenizer) -> np.ndarray:
    """Load + tokenize a supported HF dataset (requires warm cache offline)."""
    from datasets import load_dataset  # lazy; optional dependency path

    if name == "wikitext2":
        data = load_dataset("wikitext", "wikitext-2-raw-v1", split=split)
        text = "\n\n".join(data["text"])
    elif name == "ptb":
        data = load_dataset(
            "ptb_text_only", "penn_treebank",
            split="validation" if split == "test" else split,
        )
        text = "\n\n".join(data["sentence"])
    elif name == "c4":
        files = {
            "train": "en/c4-train.00000-of-01024.json.gz",
            "validation": "en/c4-validation.00000-of-00008.json.gz",
        }
        key = "train" if split == "train" else "validation"
        data = load_dataset("allenai/c4", data_files={key: files[key]}, split=key)
        text = " ".join(data[:1100]["text"])
    else:
        raise ValueError(f"unknown dataset {name!r}")
    enc = tokenizer(text, return_tensors="np")
    return np.asarray(enc["input_ids"], dtype=np.int32)


def get_loaders(
    name: str,
    nsamples: int = 128,
    seed: int = 0,
    seqlen: int = 2048,
    tokenizer=None,
    vocab_size: int = 32000,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (calibration (nsamples, seqlen) int32, eval tokens (1, N) int32).

    `name` may be: 'synthetic', a `.npy` path, or wikitext2/ptb/c4.
    """
    if name == "synthetic":
        corpus = synthetic_tokens(vocab_size, max(seqlen * (nsamples + 8), 4 * seqlen), seed)
        return _sample_windows(corpus, nsamples, seed, seqlen), corpus
    # reference accepts ptb_new / c4_new aliases (datautils.py:219-226);
    # the "_new" loaders differ only in split/window bookkeeping, which the
    # stride-based evaluator here already normalizes
    if name.endswith("_new"):
        name = name[: -len("_new")]
    if name.endswith(".npy"):
        corpus = np.load(name).reshape(1, -1).astype(np.int32)
        return _sample_windows(corpus, nsamples, seed, seqlen), corpus
    if tokenizer is None:
        raise ValueError(f"dataset {name!r} needs a tokenizer")
    train = _tokenize_corpus(name, "train", tokenizer)
    test = _tokenize_corpus(name, "test", tokenizer)
    return _sample_windows(train, nsamples, seed, seqlen), test
