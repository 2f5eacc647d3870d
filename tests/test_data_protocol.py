"""Eval-protocol fidelity: data.get_* must produce token-identical tensors
to a literal transcription of the reference loaders
(reference squeezellm/datautils.py) given the same tokenizer.

The reference logic is re-transcribed HERE (tests only) as the oracle —
the same pattern as tests/test_formats.py's literal reference packer. HF
`datasets` is stubbed so the tests run offline."""

import random
import sys
import types

import numpy as np
import pytest

from squeezellm_tpu import data as data_mod


class StubTokenizer:
    """Deterministic word-ish tokenizer: whitespace split, hashed ids.
    Multi-token words (by length) exercise window arithmetic."""

    def __call__(self, text, return_tensors=None):
        ids = []
        for w in text.split(" "):
            n = 1 + (len(w) % 3)
            for k in range(n):
                ids.append((hash((w, k)) % 997) + 3)
        if not ids:
            ids = [0]
        arr = np.asarray([ids], dtype=np.int64)
        return {"input_ids": arr}


def _mk_docs(rng, n, lo, hi):
    words = ["tok%d" % i for i in range(50)]
    return [" ".join(rng.choice(words) for _ in range(rng.randint(lo, hi)))
            for _ in range(n)]


@pytest.fixture()
def stub_datasets(monkeypatch):
    rng = random.Random(7)
    corpora = {
        ("wikitext", "train"): {"text": _mk_docs(rng, 40, 5, 30)},
        ("wikitext", "test"): {"text": _mk_docs(rng, 20, 5, 30)},
        ("ptb", "train"): {"sentence": _mk_docs(rng, 40, 5, 25)},
        ("ptb", "validation"): {"sentence": _mk_docs(rng, 15, 5, 25)},
        ("ptb", "test"): {"sentence": _mk_docs(rng, 15, 5, 25)},
        ("c4", "train"): {"text": _mk_docs(rng, 60, 10, 80)},
        ("c4", "validation"): {"text": _mk_docs(rng, 60, 10, 80)},
    }

    def load_dataset(name, *args, **kwargs):
        split = kwargs.get("split") or (args[-1] if args else None)
        if "wikitext" in name:
            key = ("wikitext", split)
        elif "ptb" in name:
            key = ("ptb", split)
        else:
            key = ("c4", split)
        return corpora[key]

    mod = types.ModuleType("datasets")
    mod.load_dataset = load_dataset
    monkeypatch.setitem(sys.modules, "datasets", mod)
    return corpora


# ---- literal reference transcriptions (datautils.py) ----


def _ref_sample(trainenc, nsamples, seed, seqlen):
    random.seed(seed)
    out = []
    for _ in range(nsamples):
        i = random.randint(0, trainenc.shape[1] - seqlen - 1)
        out.append(trainenc[:, i : i + seqlen])
    return np.concatenate(out, axis=0)


def _ref_wikitext2(nsamples, seed, seqlen, tok, corpora):
    trainenc = tok("\n\n".join(corpora[("wikitext", "train")]["text"]),
                   return_tensors="pt")["input_ids"]
    testenc = tok("\n\n".join(corpora[("wikitext", "test")]["text"]),
                  return_tensors="pt")["input_ids"]
    return _ref_sample(trainenc, nsamples, seed, seqlen), testenc


def _ref_ptb(nsamples, seed, seqlen, tok, corpora):
    trainenc = tok("\n\n".join(corpora[("ptb", "train")]["sentence"]),
                   return_tensors="pt")["input_ids"]
    testenc = tok("\n\n".join(corpora[("ptb", "validation")]["sentence"]),
                  return_tensors="pt")["input_ids"]
    return _ref_sample(trainenc, nsamples, seed, seqlen), testenc


def _ref_ptb_new(nsamples, seed, seqlen, tok, corpora):
    trainenc = tok(" ".join(corpora[("ptb", "train")]["sentence"]),
                   return_tensors="pt")["input_ids"]
    testenc = tok(" ".join(corpora[("ptb", "test")]["sentence"]),
                  return_tensors="pt")["input_ids"]
    return _ref_sample(trainenc, nsamples, seed, seqlen), testenc


def _ref_c4(nsamples, seed, seqlen, tok, corpora):
    traindata = corpora[("c4", "train")]["text"]
    valdata = corpora[("c4", "validation")]["text"]
    random.seed(seed)
    trainloader = []
    for _ in range(nsamples):
        while True:
            i = random.randint(0, len(traindata) - 1)
            trainenc = tok(traindata[i], return_tensors="pt")["input_ids"]
            if trainenc.shape[1] >= seqlen:
                break
        i = random.randint(0, trainenc.shape[1] - seqlen - 1)
        trainloader.append(trainenc[:, i : i + seqlen])
    random.seed(0)
    valenc = []
    for _ in range(256):
        while True:
            i = random.randint(0, len(valdata) - 1)
            tmp = tok(valdata[i], return_tensors="pt")["input_ids"]
            if tmp.shape[1] >= seqlen:
                break
        i = random.randint(0, tmp.shape[1] - seqlen - 1)
        valenc.append(tmp[:, i : i + seqlen])
    return (np.concatenate(trainloader, axis=0),
            np.concatenate(valenc, axis=1))


def _ref_c4_new(nsamples, seed, seqlen, tok, corpora):
    traindata = corpora[("c4", "train")]["text"]
    valdata = corpora[("c4", "validation")]["text"]
    random.seed(seed)
    trainloader = []
    for _ in range(nsamples):
        while True:
            i = random.randint(0, len(traindata) - 1)
            trainenc = tok(traindata[i], return_tensors="pt")["input_ids"]
            if trainenc.shape[1] >= seqlen:
                break
        i = random.randint(0, trainenc.shape[1] - seqlen - 1)
        trainloader.append(trainenc[:, i : i + seqlen])
    valenc = tok(" ".join(valdata[:1100]), return_tensors="pt")["input_ids"]
    return np.concatenate(trainloader, axis=0), valenc[:, : 256 * seqlen]


_REF = {
    "wikitext2": _ref_wikitext2,
    "ptb": _ref_ptb,
    "ptb_new": _ref_ptb_new,
    "c4": _ref_c4,
    "c4_new": _ref_c4_new,
}


@pytest.mark.parametrize("name", ["wikitext2", "ptb", "ptb_new", "c4",
                                  "c4_new"])
def test_token_identical_to_reference(name, stub_datasets):
    tok = StubTokenizer()
    nsamples, seed, seqlen = 5, 3, 16
    calib, ev = data_mod.get_loaders(name, nsamples=nsamples, seed=seed,
                                     seqlen=seqlen, tokenizer=tok)
    rcalib, rev = _REF[name](nsamples, seed, seqlen, tok, stub_datasets)
    np.testing.assert_array_equal(calib, np.asarray(rcalib))
    np.testing.assert_array_equal(ev.reshape(1, -1),
                                  np.asarray(rev).reshape(1, -1))


def test_ptb_new_differs_from_ptb(stub_datasets):
    """The round-1 bug: ptb_new aliased to ptb scored the wrong corpus."""
    tok = StubTokenizer()
    _, ev = data_mod.get_loaders("ptb", nsamples=2, seed=0, seqlen=8,
                                 tokenizer=tok)
    _, ev_new = data_mod.get_loaders("ptb_new", nsamples=2, seed=0, seqlen=8,
                                     tokenizer=tok)
    assert ev.shape != ev_new.shape or not np.array_equal(ev, ev_new)
