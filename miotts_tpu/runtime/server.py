"""HTTP serving front-end over the continuous batcher.

The reference deliberately disables llama.cpp's server (`CMakeLists.txt:12`)
and serves nothing; this framework's north star is production serving, so
this module provides the missing piece: a threaded HTTP server where each
request is admitted into the shared ContinuousBatcher and its audio streams
back as it is committed.

Endpoints:
  GET  /health            -> {"status": "ok", "pending": N}
  GET  /voices            -> {"voices": [names]}
  POST /synthesize        body {"text": ..., "voice": name?,
                                "temperature"?, "max_tokens"?, "seed"?,
                                "format": "wav" | "pcm"}
       -> audio/wav (buffered) or chunked s16le PCM stream

Stdlib-only (http.server); one scheduler thread drives batcher.step() while
handler threads block on per-request chunk queues.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..audio.wav import f32_to_s16
from .batching import ContinuousBatcher
from .engine import Options, TTSEngine, VoiceModel


class TTSServer:
    def __init__(self, engine: TTSEngine, voices: dict[str, VoiceModel],
                 n_slots: int = 8, default_voice: str | None = None,
                 request_timeout_sec: float | None = None):
        self.engine = engine
        self.voices = voices
        self.default_voice = default_voice or next(iter(voices), None)
        self.batcher = ContinuousBatcher(engine, n_slots=n_slots)
        # per-request chunk-queue capacity (~24 s of audio at the default
        # 4096-sample chunks); a client further behind than this is dead
        self.queue_cap = 256
        # wall-clock budget per request; exceeded -> cancelled at the next
        # scheduler callback (None = unlimited)
        self.request_timeout_sec = request_timeout_sec
        self.draining = False
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._scheduler, daemon=True)

    def start_scheduler(self):
        self._thread.start()

    def stop(self):
        self._stop.set()

    def shutdown(self, drain_timeout_sec: float = 30.0) -> bool:
        """Graceful shutdown: refuse new requests (503), keep stepping until
        every in-flight request finishes (or the drain budget runs out),
        then stop the scheduler.  Returns True when fully drained."""
        self.draining = True
        deadline = time.monotonic() + drain_timeout_sec
        while self.batcher.pending and time.monotonic() < deadline:
            time.sleep(0.01)
        drained = self.batcher.pending == 0
        self._stop.set()
        return drained

    def _scheduler(self):
        while not self._stop.is_set():
            with self._lock:
                pending = self.batcher.pending
                if pending:
                    self.batcher.step()
            if not pending:
                time.sleep(0.005)

    def submit(self, text: str, voice_name: str | None,
               options: Options) -> "_StreamHandle":
        """Submit a request; returns a handle whose queue yields
        (samples|None, is_last)."""
        if self.draining:
            raise RuntimeError("server is shutting down")
        vname = voice_name or self.default_voice
        if vname not in self.voices:
            raise KeyError(f"unknown voice '{vname}'")
        h = _StreamHandle(self.queue_cap)
        if self.request_timeout_sec is not None:
            h.deadline = time.monotonic() + self.request_timeout_sec

        # The callback runs on the scheduler thread under self._lock, so it
        # must NEVER block: a dead or hopelessly slow client (queue full =
        # ~24 s of audio backlog) cancels its own request by returning
        # False instead of stalling every other stream.
        def cb(samples, sr, is_last):
            if h.deadline is not None and time.monotonic() > h.deadline:
                h.timed_out = True
                h.abandoned = True
            if h.abandoned:
                return False
            try:
                h.q.put_nowait(
                    (None if samples is None else np.asarray(samples), is_last))
            except queue.Full:
                h.abandoned = True
                return False
            # only a DELIVERED final counts (a dropped one would leave the
            # handler blocked on the queue forever)
            if is_last:
                h.final_sent = True
            return True

        def on_finish(req):
            # a request may finish without a delivered final callback (zero
            # speech codes, cancellation, queue-full on the last chunk);
            # ALWAYS release the waiting handler — evicting stale audio
            # chunks if the queue is full (the request is over either way)
            if not h.final_sent:
                h.final_sent = True
                while True:
                    try:
                        h.q.put_nowait((None, True))
                        break
                    except queue.Full:
                        try:
                            h.q.get_nowait()
                        except queue.Empty:
                            continue
        with self._lock:
            self.batcher.submit(text, self.voices[vname], cb, options,
                                on_finish=on_finish)
        return h


class _StreamHandle:
    """Per-request bridge between the scheduler thread and a handler thread."""

    def __init__(self, maxsize: int = 256):
        self.q: queue.Queue = queue.Queue(maxsize=maxsize)
        self.abandoned = False   # handler died / stopped draining
        self.final_sent = False
        self.timed_out = False
        self.deadline: float | None = None   # monotonic cancel-after


def _make_handler(server: TTSServer):
    engine = server.engine

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet
            pass

        def _json(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                return self._json(200, {"status": "ok",
                                        "pending": server.batcher.pending,
                                        "sample_rate": engine.sample_rate})
            if self.path == "/voices":
                return self._json(200, {"voices": sorted(server.voices)})
            if self.path == "/stats":
                # serving observability: the batched path's analogue of the
                # reference's stream_bench.* metric lines
                st = dict(server.batcher.stage)
                st.update(pending=server.batcher.pending,
                          active_slots=int(np.sum(server.batcher.active)),
                          n_slots=server.batcher.n_slots)
                return self._json(200, st)
            return self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/synthesize":
                return self._json(404, {"error": "not found"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                if not isinstance(req, dict):
                    raise TypeError("body must be a JSON object")
                text = str(req["text"])
                options = Options(
                    temperature=float(req.get("temperature", -1.0)),
                    max_tokens=int(req.get("max_tokens", -1)),
                    seed=int(req.get("seed", -1)),
                )
            except (KeyError, TypeError, ValueError,
                    json.JSONDecodeError) as e:
                return self._json(400, {"error": f"bad request: {e}"})

            fmt = req.get("format", "wav")
            try:
                handle = server.submit(text, req.get("voice"), options)
            except KeyError as e:
                return self._json(400, {"error": str(e)})
            except RuntimeError as e:
                # graceful shutdown: refuse new work, let in-flight drain
                return self._json(503, {"error": str(e)})
            chunks_q = handle.q

            def next_chunk():
                """Queue get bounded by the request deadline (+grace for the
                cancel round-trip through the scheduler)."""
                if handle.deadline is None:
                    return chunks_q.get()
                budget = max(0.05, handle.deadline + 5.0 - time.monotonic())
                try:
                    return chunks_q.get(timeout=budget)
                except queue.Empty:
                    handle.timed_out = True
                    handle.abandoned = True
                    return None, True

            sr = engine.sample_rate
            if fmt == "pcm":
                # chunked streaming of s16le PCM as audio is committed; a
                # client disconnect abandons the handle so the scheduler's
                # next callback cancels the request instead of decoding on
                try:
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     f"audio/L16;rate={sr};channels=1")
                    self.send_header("Transfer-Encoding", "chunked")
                    self.end_headers()
                    while True:
                        samples, is_last = next_chunk()
                        if samples is not None and len(samples):
                            pcm = f32_to_s16(samples).astype(
                                "<i2").tobytes()
                            self.wfile.write(f"{len(pcm):X}\r\n".encode())
                            self.wfile.write(pcm + b"\r\n")
                        if is_last:
                            break
                    self.wfile.write(b"0\r\n\r\n")
                finally:
                    handle.abandoned = True
                return

            # buffered WAV
            parts = []
            try:
                while True:
                    samples, is_last = next_chunk()
                    if samples is not None:
                        parts.append(samples)
                    if is_last:
                        break
            finally:
                handle.abandoned = True
            if handle.timed_out and not parts:
                return self._json(504, {"error": "request timed out"})
            audio = np.concatenate(parts) if parts else np.zeros(0, np.float32)
            import io
            import struct
            pcm = f32_to_s16(audio).astype("<i2").tobytes()
            hdr = struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(pcm),
                              b"WAVE", b"fmt ", 16, 1, 1, sr, sr * 2, 2, 16,
                              b"data", len(pcm))
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(44 + len(pcm)))
            self.end_headers()
            self.wfile.write(hdr + pcm)

    return Handler


def serve(engine: TTSEngine, voices: dict[str, VoiceModel],
          host: str = "127.0.0.1", port: int = 8080, n_slots: int = 8,
          request_timeout_sec: float | None = None):
    """Run the TTS HTTP server (blocking).  On interrupt, drains in-flight
    requests (new ones get 503) before stopping the scheduler."""
    srv = TTSServer(engine, voices, n_slots=n_slots,
                    request_timeout_sec=request_timeout_sec)
    # precompile the batched serving executables BEFORE the listener opens
    # so the first admission wave serves at steady-state latency
    srv.batcher.warmup()
    srv.start_scheduler()
    httpd = ThreadingHTTPServer((host, port), _make_handler(srv))
    print(f"miotts serving on http://{host}:{port} "
          f"(slots={n_slots}, voices={sorted(voices)})", flush=True)
    try:
        httpd.serve_forever()
    finally:
        srv.shutdown()
