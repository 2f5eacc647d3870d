"""HTTP serving front-end: completions, sampling, streaming, health."""

import http.client
import json
import threading

import pytest

import jax
import jax.numpy as jnp

from squeezellm_tpu import server as server_mod
from squeezellm_tpu import serving
from squeezellm_tpu.models import llama
from squeezellm_tpu.quantize import pipeline


@pytest.fixture(scope="module")
def httpd():
    config = llama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        n_layers=2, n_heads=4, n_kv_heads=2, max_seq=64,
    )
    dense = llama.random_dense_params(config, jax.random.PRNGKey(0))
    specs, params = pipeline.quantize_model("llama", config, dense, bits=4)
    params = jax.tree.map(jnp.asarray, params)
    eng = serving.ContinuousBatchEngine("llama", config, specs, params,
                                        slots=2, backend="xla", seed=7)
    srv = server_mod.serve(eng, host="127.0.0.1", port=0, window=4)
    yield srv
    srv.serving_loop.shutdown()
    srv.shutdown()


def _post(srv, path, body):
    conn = http.client.HTTPConnection("127.0.0.1", srv.server_port, timeout=120)
    conn.request("POST", path, json.dumps(body),
                 {"Content-Type": "application/json"})
    r = conn.getresponse()
    data = r.read()
    conn.close()
    return r.status, data


def test_health(httpd):
    conn = http.client.HTTPConnection("127.0.0.1", httpd.server_port,
                                      timeout=30)
    conn.request("GET", "/health")
    r = conn.getresponse()
    out = json.loads(r.read())
    conn.close()
    assert r.status == 200 and out["status"] == "ok"
    assert out["free_slots"] == 2


def test_completion_greedy(httpd):
    status, data = _post(httpd, "/v1/completions",
                         {"prompt_tokens": [1, 2, 3], "max_tokens": 5})
    out = json.loads(data)
    assert status == 200
    assert len(out["tokens"]) == 5
    assert out["finish_reason"] == "length"
    # greedy is deterministic: same request -> same tokens
    _, data2 = _post(httpd, "/v1/completions",
                     {"prompt_tokens": [1, 2, 3], "max_tokens": 5})
    assert json.loads(data2)["tokens"] == out["tokens"]


def test_completion_sampled_and_stop(httpd):
    status, data = _post(httpd, "/v1/completions",
                         {"prompt_tokens": [4, 5], "max_tokens": 6,
                          "temperature": 0.9, "top_k": 20, "top_p": 0.9})
    out = json.loads(data)
    assert status == 200 and len(out["tokens"]) == 6
    # stop token (greedy, so the continuation is reproducible): truncates
    # at its first occurrence and reports 'stop'
    _, data = _post(httpd, "/v1/completions",
                    {"prompt_tokens": [4, 5], "max_tokens": 6})
    full = json.loads(data)["tokens"]
    stop = full[1]
    status, data = _post(httpd, "/v1/completions",
                         {"prompt_tokens": [4, 5], "max_tokens": 6,
                          "stop": [stop]})
    out2 = json.loads(data)
    cut = full.index(stop) + 1
    assert out2["tokens"] == full[:cut]
    assert out2["finish_reason"] == "stop"


def test_streaming_chunks(httpd):
    conn = http.client.HTTPConnection("127.0.0.1", httpd.server_port,
                                      timeout=120)
    conn.request("POST", "/v1/completions",
                 json.dumps({"prompt_tokens": [9, 8, 7], "max_tokens": 7,
                             "stream": True}),
                 {"Content-Type": "application/json"})
    r = conn.getresponse()
    assert r.getheader("Content-Type") == "text/event-stream"
    body = r.read().decode()
    conn.close()
    events = [ln[6:] for ln in body.splitlines()
              if ln.startswith("data: ")]
    assert events[-1] == "[DONE]"
    toks = []
    for e in events[:-1]:
        toks.extend(json.loads(e)["tokens"])
    assert len(toks) == 7
    # streamed tokens == non-streamed greedy tokens
    _, data = _post(httpd, "/v1/completions",
                    {"prompt_tokens": [9, 8, 7], "max_tokens": 7})
    assert toks == json.loads(data)["tokens"]


def test_concurrent_requests(httpd):
    results = {}

    def go(i):
        _, data = _post(httpd, "/v1/completions",
                        {"prompt_tokens": [i, i + 1], "max_tokens": 4})
        results[i] = json.loads(data)["tokens"]

    ts = [threading.Thread(target=go, args=(i,)) for i in range(5)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=300)
    assert len(results) == 5
    for toks in results.values():
        assert len(toks) == 4


def test_bad_request(httpd):
    status, data = _post(httpd, "/v1/completions", {"max_tokens": 4})
    assert status == 400
    status, _ = _post(httpd, "/v1/completions",
                      {"prompt_tokens": [1] * 70, "max_tokens": 4})
    assert status in (400, 429)  # prompt exceeds max_seq


@pytest.mark.medium
def test_speculative_paged_server_matches_greedy():
    """HTTP loop takes step_spec_window when the engine is speculative;
    results must equal the plain engine's greedy output."""
    config = llama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        n_layers=2, n_heads=4, n_kv_heads=2, max_seq=96,
    )
    dense = llama.random_dense_params(config, jax.random.PRNGKey(0))
    specs, params = pipeline.quantize_model("llama", config, dense, bits=4)
    params = jax.tree.map(jnp.asarray, params)

    plain = serving.PagedContinuousBatchEngine(
        "llama", config, specs, params, slots=2, n_pages=24, page_size=16,
        backend="xla")
    want = plain.run([[1, 2, 3, 4, 5]], max_new_tokens=8, window=4)
    (want_toks,) = want.values()

    eng = serving.PagedContinuousBatchEngine(
        "llama", config, specs, params, slots=2, n_pages=24, page_size=16,
        backend="xla", speculative=(3, 2))
    srv = server_mod.serve(eng, host="127.0.0.1", port=0, window=4)
    try:
        status, data = _post(srv, "/v1/completions",
                             {"prompt_tokens": [1, 2, 3, 4, 5],
                              "max_tokens": 8})
        out = json.loads(data)
        assert status == 200
        assert out["tokens"] == [int(t) for t in want_toks]
    finally:
        srv.serving_loop.shutdown()
        srv.shutdown()


def test_engine_failure_fails_requests_and_health():
    """A fatal engine exception must not hang clients: in-flight and
    queued requests get 503-style errors, /health reports failed, and
    new submissions are rejected."""
    config = llama.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        n_layers=2, n_heads=4, n_kv_heads=2, max_seq=64,
    )
    dense = llama.random_dense_params(config, jax.random.PRNGKey(0))
    specs, params = pipeline.quantize_model("llama", config, dense, bits=4)
    params = jax.tree.map(jnp.asarray, params)
    eng = serving.ContinuousBatchEngine("llama", config, specs, params,
                                        slots=2, backend="xla")

    calls = {"n": 0}
    orig = eng.step_window

    def boom(window):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("synthetic device loss")
        return orig(window)

    eng.step_window = boom
    srv = server_mod.serve(eng, host="127.0.0.1", port=0, window=4)
    try:
        status, data = _post(srv, "/v1/completions",
                             {"prompt_tokens": [1, 2, 3], "max_tokens": 12})
        out = json.loads(data)
        assert status == 503 and "engine failed" in out["error"], out

        conn = http.client.HTTPConnection("127.0.0.1", srv.server_port,
                                          timeout=30)
        conn.request("GET", "/health")
        r = conn.getresponse()
        health = json.loads(r.read())
        conn.close()
        assert r.status == 503 and health["status"] == "failed"

        status2, data2 = _post(srv, "/v1/completions",
                               {"prompt_tokens": [5], "max_tokens": 2})
        assert status2 == 503, data2
    finally:
        srv.serving_loop.shutdown()
        srv.shutdown()
