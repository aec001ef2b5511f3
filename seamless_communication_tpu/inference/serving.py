"""Production serving: dynamic request batching over a Translator.

The reference ships no server (inference is CLI/offline; ggml's unity.cpp is an
interactive console). For TPU deployment the economics are different — a single
chip amortizes weights over many concurrent streams, and XLA executables are
shape-bucketed — so the framework provides a first-class serving layer:

- ``DynamicBatcher``: collects requests for up to ``max_wait_ms`` or
  ``max_batch``, groups them by (task, tgt_lang, src_lang), and runs one
  batched ``Translator.predict`` per group. Shape bucketing inside the
  Translator/generator keeps the executable cache small.
- ``serve``: a stdlib ThreadingHTTPServer exposing
    POST /v1/translate   {"task","tgt_lang","src_lang"?,"text"? ,"audio_b64"?}
                         -> {"text", "audio_b64"?, "sample_rate"?}
    GET  /healthz        -> {"status":"ok"}
  Audio is 16-bit WAV, base64 in both directions.

One worker thread owns the device (a TPU chip is single-process anyway); HTTP
threads only enqueue and wait on their request's event.
"""

from __future__ import annotations

import base64
import io
import json
import logging
import queue
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional

import numpy as np

logger = logging.getLogger("seamless_serve")


@dataclass
class _Request:
    task: str
    tgt_lang: str
    src_lang: Optional[str]
    payload: Any                      # waveform np.ndarray or text str
    done: threading.Event = field(default_factory=threading.Event)
    result: Optional[dict] = None
    error: Optional[str] = None

    @property
    def group_key(self):
        return (self.task, self.tgt_lang, self.src_lang)


class DynamicBatcher:
    """Collect requests into per-(task, tgt_lang, src_lang) batches and run
    them through the Translator on a single worker thread."""

    def __init__(self, translator, *, max_batch: int = 8, max_wait_ms: int = 30):
        self.translator = translator
        self.max_batch = max_batch
        self.max_wait_ms = max_wait_ms
        self._q: "queue.Queue[_Request]" = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, req: _Request, timeout: float = 300.0) -> _Request:
        self._q.put(req)
        if not req.done.wait(timeout):
            req.error = "timeout"
        return req

    def close(self) -> None:
        self._stop.set()
        self._q.put(None)  # wake the worker
        self._worker.join(timeout=5)

    # ------------------------------------------------------------------

    def _collect(self) -> List[_Request]:
        first = self._q.get()
        if first is None:
            return []
        batch = [first]
        deadline = time.monotonic() + self.max_wait_ms / 1000.0
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                break
            batch.append(nxt)
        return batch

    def _run(self) -> None:
        while not self._stop.is_set():
            batch = self._collect()
            if not batch:
                continue
            groups: Dict[tuple, List[_Request]] = {}
            for r in batch:
                groups.setdefault(r.group_key, []).append(r)
            for (task, tgt_lang, src_lang), reqs in groups.items():
                try:
                    texts, speech = self.translator.predict(
                        [r.payload for r in reqs], task, tgt_lang,
                        src_lang=src_lang)
                    for i, r in enumerate(reqs):
                        out = {"text": str(texts[i])}
                        if speech is not None:
                            out["waveform"] = np.asarray(speech.audio_wavs[i])
                            out["sample_rate"] = speech.sample_rate
                        r.result = out
                except Exception as e:  # report, don't kill the worker
                    logger.exception("batch failed")
                    for r in reqs:
                        r.error = f"{type(e).__name__}: {e}"
                finally:
                    for r in reqs:
                        r.done.set()


def _wav_bytes(waveform: np.ndarray, sample_rate: int) -> bytes:
    import wave
    buf = io.BytesIO()
    pcm = (np.clip(np.asarray(waveform, np.float32), -1.0, 1.0)
           * 32767.0).astype("<i2")
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def _decode_wav_b64(b64: str) -> np.ndarray:
    from seamless_communication_tpu.audio.wav import resample
    from seamless_communication_tpu.native import wav_decode_native

    data = base64.b64decode(b64)
    decoded = wav_decode_native(data)
    if decoded is None:
        import wave
        with wave.open(io.BytesIO(data), "rb") as w:
            rate = w.getframerate()
            n = w.getnframes()
            raw = np.frombuffer(w.readframes(n), "<i2").astype(np.float32)
            wav = (raw / 32768.0).reshape(n, -1).mean(axis=1)
    else:
        wav, rate = decoded
    return resample(wav, rate, 16000)


def make_handler(batcher: DynamicBatcher):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            logger.debug(fmt, *args)

        def _json(self, code: int, obj: dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                return self._json(200, {"status": "ok"})
            return self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/v1/translate":
                return self._json(404, {"error": "not found"})
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req_json = json.loads(self.rfile.read(length) or b"{}")
                task = req_json["task"]
                tgt_lang = req_json["tgt_lang"]
            except (KeyError, ValueError, json.JSONDecodeError) as e:
                return self._json(400, {"error": f"bad request: {e}"})
            src_lang = req_json.get("src_lang")
            if "audio_b64" in req_json:
                try:
                    payload = _decode_wav_b64(req_json["audio_b64"])
                except Exception as e:
                    return self._json(400, {"error": f"bad audio: {e}"})
            elif "text" in req_json:
                payload = req_json["text"]
                if src_lang is None:
                    return self._json(400,
                                      {"error": "src_lang required for text"})
            else:
                return self._json(400, {"error": "need text or audio_b64"})
            r = batcher.submit(_Request(task, tgt_lang, src_lang, payload))
            if r.error:
                return self._json(500, {"error": r.error})
            out = {"text": r.result["text"]}
            if "waveform" in r.result:
                out["audio_b64"] = base64.b64encode(
                    _wav_bytes(r.result["waveform"],
                               r.result["sample_rate"])).decode()
                out["sample_rate"] = r.result["sample_rate"]
            return self._json(200, out)

    return Handler


def serve(translator, *, host: str = "127.0.0.1", port: int = 8008,
          max_batch: int = 8, max_wait_ms: int = 30) -> ThreadingHTTPServer:
    """Start the HTTP server (returns it; call .shutdown() to stop)."""
    batcher = DynamicBatcher(translator, max_batch=max_batch,
                             max_wait_ms=max_wait_ms)
    server = ThreadingHTTPServer((host, port), make_handler(batcher))
    server.batcher = batcher
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    logger.info("serving on %s:%d (max_batch=%d, max_wait=%dms)",
                host, port, max_batch, max_wait_ms)
    return server
