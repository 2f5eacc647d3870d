"""From-scratch XGen tokenizer vs a tiktoken oracle.

tiktoken is importable offline when given explicit ranks, so the oracle is
the reference's own construction (tokenization_xgen.py:28-104 transcribed
here over a synthetic base vocabulary) wrapped in a real tiktoken.Encoding.
Our implementation must produce identical ids with no tiktoken dependency.
"""

import numpy as np
import pytest

tiktoken = pytest.importorskip("tiktoken")

from squeezellm_tpu.utils import xgen_tokenizer as xt  # noqa: E402

_GPT2_PAT = (
    r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+|"""
    r""" ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
)


def _base_ranks():
    """Synthetic GPT-2-shaped base: all single bytes + some merges."""
    ranks = {bytes([b]): b for b in range(256)}
    idx = 256
    for tok in (b"th", b"he", b"the", b" t", b" th", b" the", b"in", b"ing",
                b"  ", b"er", b"ll", b"hello", b" w", b" wo", b"or", b"ld"):
        ranks[tok] = idx
        idx += 1
    return ranks


def _reference_xgen_encoding(base_ranks, pad_token=None):
    """Literal transcription of reference tiktoken_tokenizer
    (tokenization_xgen.py:28-104), applied to the synthetic base."""
    whitespaces = [" " * n for n in reversed(range(2, 32))]
    tabs = ["\t" * n for n in reversed(range(2, 10))]
    bpe_ranks = dict(base_ranks)
    base_specials = {"<|endoftext|>": len(base_ranks)}
    idx = len(base_ranks) + 1
    for wsp in whitespaces:
        bpe_ranks[bytes(wsp, "ascii")] = idx
        idx += 1
    for t in tabs:
        bpe_ranks[bytes(t, "ascii")] = idx
        idx += 1
    special_tokens = {}
    for sp in xt._FIM_TOKENS:
        special_tokens[sp] = idx
        idx += 1
    if pad_token and pad_token not in special_tokens:
        special_tokens[pad_token] = idx
        idx += 1
    return tiktoken.Encoding(
        name="xgen-test",
        pat_str=_GPT2_PAT,
        mergeable_ranks=bpe_ranks,
        special_tokens={**base_specials, **special_tokens},
    )


TEXTS = [
    "hello world",
    "the theremin sings in the hall",
    "indented:\n        code block\n\t\tand tabs\t\t\t",
    "lots      of     spaces",
    " " * 31 + "x" + " " * 40,
    "unicode: café — 日本語!",
    "numbers 12345 and punct!!! 'll 've",
    "",
]


@pytest.mark.parametrize("i", range(len(TEXTS)))
def test_encode_matches_tiktoken_oracle(i):
    base = _base_ranks()
    enc = _reference_xgen_encoding(base)
    ours = xt.XgenTokenizer(base)
    text = TEXTS[i]
    np.testing.assert_array_equal(ours.encode(text),
                                  enc.encode_ordinary(text))


def test_special_tokens_and_roundtrip():
    base = _base_ranks()
    enc = _reference_xgen_encoding(base, pad_token="<pad>")
    ours = xt.XgenTokenizer(base, pad_token="<pad>")
    text = "<fim_prefix>hello<fim_suffix> world<fim_middle>the<|endoftext|>"
    want = enc.encode(text, allowed_special="all")
    got = ours.encode(text)
    np.testing.assert_array_equal(got, want)
    assert ours.decode(got) == text
    assert ours.pad_token_id == enc._special_tokens["<pad>"]
    assert ours.eos_token_id == enc._special_tokens["<|endoftext|>"]


def test_hf_shaped_call_and_eos():
    ours = xt.XgenTokenizer(_base_ranks(), add_eos_token=True)
    out = ours("the the")
    assert out["input_ids"].shape[0] == 1
    assert out["input_ids"][0, -1] == ours.eos_token_id


def test_asset_loading_gpt2_format(tmp_path):
    """encoder.json round-trip through the byte<->unicode map."""
    import json

    base = _base_ranks()
    b2u = xt._bytes_to_unicode()
    encoder = {"".join(b2u[b] for b in tok): idx for tok, idx in base.items()}
    encoder["<|endoftext|>"] = len(base)
    (tmp_path / "encoder.json").write_text(json.dumps(encoder))
    (tmp_path / "vocab.bpe").write_text("#version: 0.2\n")
    tok = xt.XgenTokenizer.from_assets(str(tmp_path))
    ref = xt.XgenTokenizer(base)
    assert tok.encode("hello world  ") == ref.encode("hello world  ")


def test_asset_loading_tiktoken_format(tmp_path):
    import base64

    base = _base_ranks()
    lines = [base64.b64encode(t).decode() + " " + str(r)
             for t, r in base.items()]
    (tmp_path / "gpt2.tiktoken").write_text("\n".join(lines))
    tok = xt.XgenTokenizer.from_assets(str(tmp_path))
    ref = xt.XgenTokenizer(base)
    assert tok.encode("the  theremin\t\t") == ref.encode("the  theremin\t\t")
