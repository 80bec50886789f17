"""Production HTTP serving surface (stdlib, no fastapi dependency).

Carries over the serving capabilities the reference fork sketches in its
FastAPI scaffold (reference production_deployment_system.py: REST synthesis,
health, rate limiting, caching) as a real working server on the TPU model:

  POST /synthesize   {"text": ..., "task": "custom_voice"|"voice_design"|
                      "voice_clone", "speaker": ..., "language": ...,
                      "instruct": ..., "ref_audio_b64": ..., "ref_text": ...,
                      sampling knobs...}
                     -> {"audio_b64": <wav>, "sample_rate": sr, "metrics": {...}}
  POST /synthesize_batch  {"requests": [ ... ]}
  GET  /health       -> {"status": "ok", ...}
  GET  /metrics      -> rolling server metrics (RTF, latency percentiles)

Requests serialize through a worker lock (the TPU is a single shared
resource); batching happens inside /synthesize_batch.
"""

from __future__ import annotations

import base64
import io
import json
import ssl as ssl_mod
import threading
import time
import wave
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional

import numpy as np


def _wav_bytes(wav: np.ndarray, sr: int) -> bytes:
    buf = io.BytesIO()
    pcm = (np.clip(wav, -1, 1) * 32767.0).astype("<i2")
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


class ServerMetrics:
    def __init__(self):
        self.lock = threading.Lock()
        self.requests = 0
        self.errors = 0
        self.latencies: list[float] = []
        self.audio_seconds = 0.0
        self.started = time.time()

    def record(self, latency: float, audio_s: float, error: bool = False):
        with self.lock:
            self.requests += 1
            if error:
                self.errors += 1
            else:
                self.latencies.append(latency)
                self.audio_seconds += audio_s
            if len(self.latencies) > 1000:
                self.latencies = self.latencies[-1000:]

    def snapshot(self) -> dict:
        with self.lock:
            lat = sorted(self.latencies)
            pct = lambda p: (lat[int(p * (len(lat) - 1))] if lat else None)
            busy = sum(lat)
            up = time.time() - self.started
            return {
                "requests": self.requests,
                "errors": self.errors,
                "latency_p50_s": pct(0.5),
                "latency_p95_s": pct(0.95),
                "audio_seconds": round(self.audio_seconds, 2),
                "uptime_s": round(up, 1),
                "throughput_audio_s_per_s": round(self.audio_seconds / busy, 2)
                if busy else None,
            }


class TTSServer:
    def __init__(self, model, default_kwargs: Optional[Dict[str, Any]] = None):
        self.model = model
        self.default_kwargs = default_kwargs or {}
        self.metrics = ServerMetrics()
        self.worker_lock = threading.Lock()

    # ---------------------------------------------------------------- tasks

    def synthesize(self, req: Dict[str, Any]) -> Dict[str, Any]:
        t0 = time.perf_counter()
        task = req.get("task", "custom_voice")
        kwargs = dict(self.default_kwargs)
        for k in ("do_sample", "top_k", "top_p", "temperature",
                  "repetition_penalty", "max_new_tokens", "seed"):
            if k in req:
                kwargs[k] = req[k]
        texts = req["text"]
        language = req.get("language", "auto")

        with self.worker_lock:
            if task == "custom_voice":
                wavs, sr = self.model.generate_custom_voice(
                    texts, speaker=req["speaker"], language=language,
                    instruct=req.get("instruct"), **kwargs)
            elif task == "voice_design":
                wavs, sr = self.model.generate_voice_design(
                    texts, instruct=req["instruct"], language=language, **kwargs)
            elif task == "voice_clone":
                ref = req.get("ref_audio_b64")
                wavs, sr = self.model.generate_voice_clone(
                    texts, language=language,
                    ref_audio=ref, ref_text=req.get("ref_text"),
                    x_vector_only_mode=req.get("x_vector_only_mode", False),
                    **kwargs)
            else:
                raise ValueError(f"unknown task {task}")

        dt = time.perf_counter() - t0
        audio_s = sum(len(w) for w in wavs) / sr
        self.metrics.record(dt, audio_s)
        payload = [base64.b64encode(_wav_bytes(w, sr)).decode() for w in wavs]
        return {
            "audio_b64": payload[0] if not isinstance(texts, list) else payload,
            "sample_rate": sr,
            "metrics": {"latency_s": round(dt, 4),
                        "audio_s": round(audio_s, 3),
                        "rtf": round(audio_s / dt, 3) if dt else None},
        }

    def handle(self, path: str, body: Optional[dict]) -> tuple[int, dict]:
        try:
            if path == "/health":
                return 200, {"status": "ok",
                             "model_type": self.model.tts_model_type,
                             "model_size": self.model.tts_model_size}
            if path == "/metrics":
                return 200, self.metrics.snapshot()
            if path == "/synthesize":
                return 200, self.synthesize(body)
            if path == "/synthesize_batch":
                return 200, {"results": [self.synthesize(r)
                                         for r in body["requests"]]}
            return 404, {"error": f"unknown path {path}"}
        except Exception as e:  # noqa: BLE001 — surface as API error
            self.metrics.record(0.0, 0.0, error=True)
            return 400, {"error": str(e)}


def serve(model, host: str = "127.0.0.1", port: int = 8000,
          default_kwargs: Optional[dict] = None, ssl_certfile=None,
          ssl_keyfile=None, block: bool = True):
    app = TTSServer(model, default_kwargs)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _reply(self, code: int, payload: dict):
            data = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            code, payload = app.handle(self.path, None)
            self._reply(code, payload)

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            try:
                body = json.loads(self.rfile.read(n) or b"{}")
            except json.JSONDecodeError:
                self._reply(400, {"error": "invalid json"})
                return
            code, payload = app.handle(self.path, body)
            self._reply(code, payload)

    httpd = ThreadingHTTPServer((host, port), Handler)
    if ssl_certfile:
        ctx = ssl_mod.SSLContext(ssl_mod.PROTOCOL_TLS_SERVER)
        ctx.load_cert_chain(ssl_certfile, ssl_keyfile)
        httpd.socket = ctx.wrap_socket(httpd.socket, server_side=True)
    if block:
        print(f"serving on {host}:{port}")
        httpd.serve_forever()
    return httpd, app
