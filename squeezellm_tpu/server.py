"""HTTP serving front-end over the continuous-batching engines.

A minimal OpenAI-completions-shaped server (stdlib-only, zero deps):

  POST /v1/completions
      {"prompt_tokens": [1,2,3], "max_tokens": 32,
       "temperature": 0.8, "top_k": 40, "top_p": 0.95,
       "stop": [2], "stream": false}
    -> {"id": ..., "tokens": [...], "finish_reason": "length"|"stop"}
    With "stream": true the response is server-sent events, one
    `data: {"tokens": [...]}` chunk per decode window, terminated by
    `data: [DONE]`.
  GET /health
    -> {"status": "ok", "free_slots": N, "served": M}

Threading model: ALL JAX work stays on one engine thread (admission,
decode windows, result fan-out); HTTP handler threads only exchange
plain Python objects through queues. The engine thread batches whatever
requests are in flight — HTTP concurrency maps directly onto continuous-
batching slots.

The reference has no serving layer at all (batch-1 generate-and-exit,
reference llama.py:226-249); this is the deployment surface a production
TPU framework needs.
"""

from __future__ import annotations

import json
import queue
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional

from squeezellm_tpu.sampling import SamplingParams


class _Pending:
    __slots__ = ("tokens", "max_tokens", "sampling", "stop", "stream",
                 "out", "rid")

    def __init__(self, tokens, max_tokens, sampling, stop, stream):
        self.tokens = tokens
        self.max_tokens = max_tokens
        self.sampling = sampling
        self.stop = stop
        self.stream = stream
        self.rid: Optional[int] = None
        self.out: "queue.Queue[Dict[str, Any]]" = queue.Queue()


class ServingLoop:
    """Engine thread: admits queued requests into slots, steps decode
    windows, fans results out to per-request queues."""

    def __init__(self, engine, window: int = 8, poll_s: float = 0.002):
        self.engine = engine
        self.window = window
        self.poll_s = poll_s
        self.pending: "queue.Queue[_Pending]" = queue.Queue()
        self.cancels: "queue.Queue[_Pending]" = queue.Queue()
        self.served = 0
        self.failed: Optional[str] = None  # fatal engine error, if any
        self._live: Dict[int, _Pending] = {}
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def start(self):
        self._thread.start()
        return self

    def shutdown(self):
        self._stop.set()
        self._thread.join(timeout=30)

    def submit(self, req: _Pending) -> None:
        self.pending.put(req)

    def request_cancel(self, req: _Pending) -> None:
        """Thread-safe: the engine thread applies the cancel (engine state
        is only ever touched from that thread)."""
        self.cancels.put(req)

    def _admit(self) -> None:
        while self.engine.free_slots():
            try:
                req = self.pending.get_nowait()
            except queue.Empty:
                return
            try:
                rid = self.engine.add_request(
                    req.tokens, req.max_tokens, sampling=req.sampling,
                    stop_tokens=req.stop)
            except (ValueError, RuntimeError) as e:
                req.out.put({"error": str(e)})
                continue
            req.rid = rid
            self._live[rid] = req

    def _drain_cancels(self) -> None:
        while True:
            try:
                req = self.cancels.get_nowait()
            except queue.Empty:
                return
            if req.rid is not None and req.rid in self._live:
                self.engine.cancel(req.rid)
                del self._live[req.rid]

    def _run(self) -> None:
        try:
            self._run_inner()
        except Exception as e:  # fatal engine error (OOM, device loss, bug)
            # fail FAST but never silently: every in-flight and queued
            # request gets an error response instead of hanging forever,
            # /health reports the failure, and new submissions are
            # rejected (engine state may be corrupt — no blind restart)
            self.failed = f"{type(e).__name__}: {e}"
            for req in list(self._live.values()):
                req.out.put({"error": f"engine failed: {self.failed}"})
            self._live.clear()
            while True:
                try:
                    req = self.pending.get_nowait()
                except queue.Empty:
                    break
                req.out.put({"error": f"engine failed: {self.failed}"})

    def _run_inner(self) -> None:
        while not self._stop.is_set():
            self._drain_cancels()
            self._admit()
            if not self._live:
                try:
                    req = self.pending.get(timeout=self.poll_s)
                    self.pending.put(req)
                except queue.Empty:
                    continue
                continue
            if (getattr(self.engine, "speculative", None)
                    and not bool((self.engine._temp > 0).any())):
                # slot-batched prompt-lookup speculation (greedy-exact);
                # falls back to plain windows while any slot samples
                res = self.engine.step_spec_window()
            else:
                res = (self.engine.step_window(self.window)
                       if self.window > 1 else self.engine.step())
            for rid, r in res.items():
                req = self._live.get(rid)
                if req is None:
                    continue
                req.out.put({"new_tokens": r["new_tokens"],
                             "done": r["done"],
                             "tokens": r.get("tokens")})
                if r["done"]:
                    del self._live[rid]
                    self.served += 1


def make_handler(loop: ServingLoop):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, obj: Dict[str, Any]) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                if loop.failed:
                    self._json(503, {"status": "failed",
                                     "error": loop.failed,
                                     "served": loop.served})
                else:
                    self._json(200, {"status": "ok",
                                     "free_slots": loop.engine.free_slots(),
                                     "served": loop.served})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/v1/completions":
                self._json(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                tokens = req["prompt_tokens"]
                sp = None
                if float(req.get("temperature", 0.0)) > 0.0:
                    sp = SamplingParams(
                        temperature=float(req["temperature"]),
                        top_k=int(req.get("top_k", 0)),
                        top_p=float(req.get("top_p", 1.0)))
                p = _Pending(tokens,
                             int(req.get("max_tokens", 16)),
                             sp,
                             tuple(req.get("stop", ())),
                             bool(req.get("stream", False)))
            except (KeyError, ValueError, TypeError, json.JSONDecodeError) as e:
                self._json(400, {"error": f"bad request: {e}"})
                return
            if loop.failed:
                # the engine thread is dead; nothing would ever drain this
                self._json(503, {"error": f"engine failed: {loop.failed}"})
                return
            loop.submit(p)
            rid = uuid.uuid4().hex[:12]
            if not p.stream:
                toks = []
                while True:
                    msg = p.out.get()
                    if "error" in msg:
                        code = (503 if "engine failed" in msg["error"]
                                else 429 if "slot" in msg["error"] else 400)
                        self._json(code, msg)
                        return
                    toks.extend(msg["new_tokens"])
                    if msg["done"]:
                        break
                finish = ("stop" if p.stop and toks and toks[-1] in p.stop
                          else "length")
                self._json(200, {"id": rid, "tokens": toks,
                                 "finish_reason": finish})
                return
            # server-sent events: one chunk per decode window
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def chunk(data: str):
                payload = f"data: {data}\n\n".encode()
                self.wfile.write(f"{len(payload):x}\r\n".encode())
                self.wfile.write(payload + b"\r\n")

            try:
                while True:
                    msg = p.out.get()
                    if "error" in msg:
                        chunk(json.dumps(msg))
                        break
                    chunk(json.dumps({"id": rid,
                                      "tokens": msg["new_tokens"]}))
                    if msg["done"]:
                        break
                chunk("[DONE]")
                self.wfile.write(b"0\r\n\r\n")
            except (BrokenPipeError, ConnectionResetError, OSError):
                # client went away mid-stream: free the slot
                loop.request_cancel(p)

    return Handler


def serve(engine, host: str = "127.0.0.1", port: int = 8000,
          window: int = 8) -> ThreadingHTTPServer:
    """Start the loop + HTTP server (non-blocking; returns the server).
    Call .shutdown() on the returned server and loop to stop."""
    loop = ServingLoop(engine, window=window).start()
    httpd = ThreadingHTTPServer((host, port), make_handler(loop))
    httpd.serving_loop = loop  # for shutdown/tests
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd
