"""End-to-end CLI coverage on a tiny model (CPU, synthetic data)."""

import json

import numpy as np
import pytest

import jax

from squeezellm_tpu import checkpoint, cli
from squeezellm_tpu.models import llama
from squeezellm_tpu.quantize import pipeline


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    config = llama.LlamaConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        n_layers=2, n_heads=4, n_kv_heads=4, max_seq=64,
    )
    dense = llama.random_dense_params(config, jax.random.PRNGKey(0))
    specs, params = pipeline.quantize_model("llama", config, dense, bits=4)
    d = str(tmp_path_factory.mktemp("ckpt"))
    checkpoint.save_quantized(d, "llama", config, specs, params)
    return d


def test_cli_eval(ckpt_dir, capsys):
    cli.main(["eval", ckpt_dir, "--dataset", "synthetic", "--seqlen", "32",
              "--nsamples-eval", "2", "--backend", "xla"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ppl"] > 0 and np.isfinite(out["ppl"])


def test_cli_benchmark_check(ckpt_dir, capsys):
    cli.main(["benchmark", ckpt_dir, "--dataset", "synthetic",
              "--seqlen", "32", "--tokens", "6", "--check",
              "--backend", "xla", "--fuse"])
    out = json.loads(capsys.readouterr().out.strip())
    assert out["tokens_per_s"] > 0
    assert np.isfinite(out["check_ppl"])
    assert out["achieved_gb_s"] > 0


def test_cli_generate(ckpt_dir, capsys):
    cli.main(["generate", ckpt_dir, "--prompt-tokens", "1,2,3",
              "--max-new-tokens", "4", "--backend", "xla"])
    out = json.loads(capsys.readouterr().out.strip())
    assert len(out["tokens"]) == 3 + 4


def test_cli_serve_bench(ckpt_dir, capsys):
    cli.main(["serve-bench", ckpt_dir, "--slots", "2", "--requests", "3",
              "--max-new-tokens", "3", "--seqlen", "64", "--backend", "xla"])
    out = json.loads(capsys.readouterr().out.strip())
    assert out["total_tokens"] == 9
    assert out["throughput_tok_s"] > 0


def test_cli_serve_bench_paged(ckpt_dir, capsys):
    cli.main(["serve-bench", ckpt_dir, "--slots", "2", "--requests", "3",
              "--max-new-tokens", "3", "--seqlen", "64", "--backend", "xla",
              "--paged", "--page-size", "8"])
    out = json.loads(capsys.readouterr().out.strip())
    assert out["total_tokens"] == 9
    assert out["throughput_tok_s"] > 0


def test_cli_generate_draft_model(ckpt_dir, tmp_path, capsys):
    """Two-model speculative decoding through the CLI: same tokens as the
    plain greedy run, plus acceptance stats."""
    config = llama.LlamaConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        n_layers=1, n_heads=4, n_kv_heads=4, max_seq=64,
    )
    dense = llama.random_dense_params(config, jax.random.PRNGKey(5))
    specs, params = pipeline.quantize_model("llama", config, dense, bits=3)
    d = str(tmp_path / "draft")
    checkpoint.save_quantized(d, "llama", config, specs, params)

    cli.main(["generate", ckpt_dir, "--prompt-tokens", "1,2,3",
              "--max-new-tokens", "6", "--backend", "xla"])
    want = json.loads(capsys.readouterr().out.strip())["tokens"]
    cli.main(["generate", ckpt_dir, "--prompt-tokens", "1,2,3",
              "--max-new-tokens", "6", "--backend", "xla",
              "--draft-model", d, "--draft-len", "3"])
    out = json.loads(capsys.readouterr().out.strip())
    assert out["tokens"] == want
    assert out["spec_stats"]["windows"] >= 1


def test_cli_generate_draft_layers(ckpt_dir, capsys):
    """Early-exit (truncated-layer) draft speculation: greedy-exact vs the
    plain run, no second checkpoint needed."""
    cli.main(["generate", ckpt_dir, "--prompt-tokens", "1,2,3",
              "--max-new-tokens", "6", "--backend", "xla"])
    want = json.loads(capsys.readouterr().out.strip())["tokens"]
    cli.main(["generate", ckpt_dir, "--prompt-tokens", "1,2,3",
              "--max-new-tokens", "6", "--backend", "xla",
              "--draft-layers", "1", "--draft-len", "3"])
    out = json.loads(capsys.readouterr().out.strip())
    assert out["tokens"] == want
    assert out["spec_stats"]["windows"] >= 1


def test_cli_serve_bench_kv_int8(ckpt_dir, capsys):
    cli.main(["serve-bench", ckpt_dir, "--slots", "2", "--requests", "3",
              "--max-new-tokens", "3", "--seqlen", "64", "--backend", "xla",
              "--paged", "--page-size", "8", "--kv-dtype", "int8"])
    out = json.loads(capsys.readouterr().out.strip())
    assert out["total_tokens"] == 9
    assert out["throughput_tok_s"] > 0


def test_cli_kv_int8_dense_single_device(ckpt_dir, capsys):
    # dense single-device engines grew int8 KV support; the run must work
    cli.main(["serve-bench", ckpt_dir, "--slots", "2", "--requests", "1",
              "--max-new-tokens", "2", "--seqlen", "64",
              "--backend", "xla", "--kv-dtype", "int8"])
    out = json.loads(capsys.readouterr().out.strip())
    assert out["total_tokens"] == 2


def test_cli_kv_int8_rejects_tp_dense(ckpt_dir):
    import pytest

    # TP dense cache paths are bf16/f32 only; int8 KV needs --paged under TP
    with pytest.raises(SystemExit):
        cli.main(["serve-bench", ckpt_dir, "--slots", "2", "--requests", "1",
                  "--max-new-tokens", "2", "--seqlen", "64", "--tp", "2",
                  "--backend", "xla", "--kv-dtype", "int8"])
