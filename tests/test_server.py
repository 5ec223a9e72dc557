"""HTTP serving tests: health, voices, buffered WAV, streamed PCM."""

import http.client
import json
import socket
import threading
import time

import numpy as np
import pytest

from miotts_tpu.gguf import write_voice_embedding
from miotts_tpu.models.synthetic import write_synthetic_codec, write_synthetic_llm
from miotts_tpu.runtime.engine import EngineConfig, TTSEngine, VoiceModel
from miotts_tpu.runtime.server import TTSServer, _make_handler
from http.server import ThreadingHTTPServer


@pytest.fixture(scope="module")
def engine_and_voice(tmp_path_factory):
    d = tmp_path_factory.mktemp("srv")
    codec_path = str(d / "codec.gguf")
    llm_path = str(d / "llm.gguf")
    ccfg = write_synthetic_codec(codec_path, n_codes=64, seed=3)
    write_synthetic_llm(llm_path, seed=5, n_speech=64)
    emb_path = str(d / "jp_female.emb.gguf")
    rng = np.random.default_rng(11)
    write_voice_embedding(emb_path, rng.standard_normal(ccfg.adaln_dim) * 0.3)
    engine = TTSEngine(EngineConfig(
        model_path=llm_path, codec_path=codec_path,
        max_tokens=50, llm_dtype="float32",
        prompt_bucket=32, code_bucket=16))
    return engine, VoiceModel(emb_path)


@pytest.fixture(scope="module")
def server(engine_and_voice):
    engine, voice = engine_and_voice
    srv = TTSServer(engine, {"jp_female": voice}, n_slots=2)
    srv.start_scheduler()

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    httpd = ThreadingHTTPServer(("127.0.0.1", port), _make_handler(srv))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield port
    httpd.shutdown()
    srv.stop()


def _conn(port):
    return http.client.HTTPConnection("127.0.0.1", port, timeout=120)


def test_health_and_voices(server):
    c = _conn(server)
    c.request("GET", "/health")
    r = c.getresponse()
    assert r.status == 200
    body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["sample_rate"] == 44100

    c.request("GET", "/voices")
    r = c.getresponse()
    assert json.loads(r.read())["voices"] == ["jp_female"]


def test_synthesize_wav(server):
    c = _conn(server)
    payload = json.dumps({"text": "hello server", "max_tokens": 30,
                          "temperature": 1.0})
    c.request("POST", "/synthesize", body=payload,
              headers={"Content-Type": "application/json"})
    r = c.getresponse()
    assert r.status == 200
    assert r.getheader("Content-Type") == "audio/wav"
    data = r.read()
    assert data[:4] == b"RIFF"
    # body length consistent with header
    assert len(data) >= 44


def test_synthesize_pcm_stream(server):
    c = _conn(server)
    payload = json.dumps({"text": "stream me", "max_tokens": 30,
                          "temperature": 1.0, "format": "pcm"})
    c.request("POST", "/synthesize", body=payload,
              headers={"Content-Type": "application/json"})
    r = c.getresponse()
    assert r.status == 200
    assert "audio/L16" in r.getheader("Content-Type")
    data = r.read()  # http.client de-chunks
    assert len(data) % 2 == 0  # whole s16 samples


def test_unknown_voice(server):
    c = _conn(server)
    c.request("POST", "/synthesize",
              body=json.dumps({"text": "x", "voice": "nope"}),
              headers={"Content-Type": "application/json"})
    r = c.getresponse()
    assert r.status == 400
    r.read()


def test_concurrent_requests(server):
    results = []

    def one(i):
        c = _conn(server)
        c.request("POST", "/synthesize",
                  body=json.dumps({"text": f"req {i}", "max_tokens": 25,
                                   "temperature": 1.0}),
                  headers={"Content-Type": "application/json"})
        r = c.getresponse()
        results.append((r.status, len(r.read())))

    threads = [threading.Thread(target=one, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert len(results) == 4
    assert all(s == 200 for s, _ in results)


def test_stats_endpoint(server):
    c = _conn(server)
    c.request("GET", "/stats")
    r = c.getresponse()
    assert r.status == 200
    body = json.loads(r.read())
    for key in ("chunks", "decodes", "prefills", "llm_wait_sec",
                "codec_sync_sec", "pending", "active_slots", "n_slots"):
        assert key in body


def test_bad_request_non_object(server):
    c = _conn(server)
    c.request("POST", "/synthesize", body=json.dumps([1, 2]),
              headers={"Content-Type": "application/json"})
    r = c.getresponse()
    assert r.status == 400
    assert "bad request" in json.loads(r.read())["error"]


def _start_http(srv):
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    httpd = ThreadingHTTPServer(("127.0.0.1", port), _make_handler(srv))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd, port


def test_saturation_with_slow_readers(engine_and_voice):
    """4x n_slots concurrent HTTP requests, half of them slow readers that
    stop draining after the first bytes: the slow ones must be cancelled
    (queue-full path), the fast ones must complete 200, and the server must
    end healthy with zero pending work."""
    engine, voice = engine_and_voice
    srv = TTSServer(engine, {"v": voice}, n_slots=2)
    srv.queue_cap = 2   # slow readers fall behind after ~2 chunks
    srv.start_scheduler()
    httpd, port = _start_http(srv)
    results = []
    lock = threading.Lock()

    def fast(i):
        c = _conn(port)
        c.request("POST", "/synthesize",
                  body=json.dumps({"text": f"fast {i}", "max_tokens": 20,
                                   "temperature": 1.0, "seed": i}),
                  headers={"Content-Type": "application/json"})
        r = c.getresponse()
        data = r.read()
        with lock:
            results.append(("fast", r.status, len(data)))

    def slow(i):
        # raw socket so we can genuinely stop reading mid-response
        s = socket.create_connection(("127.0.0.1", port), timeout=120)
        body = json.dumps({"text": f"slow {i}", "max_tokens": 20,
                           "temperature": 1.0, "seed": 100 + i,
                           "format": "pcm",
                           "chunk_samples": 256}).encode()
        s.sendall(b"POST /synthesize HTTP/1.1\r\nHost: x\r\n"
                  b"Content-Type: application/json\r\n"
                  b"Content-Length: " + str(len(body)).encode()
                  + b"\r\n\r\n" + body)
        s.recv(64)          # headers trickle in; then stop reading entirely
        time.sleep(3.0)     # scheduler keeps running; our queue fills
        s.close()
        with lock:
            results.append(("slow", None, 0))

    threads = ([threading.Thread(target=fast, args=(i,)) for i in range(4)]
               + [threading.Thread(target=slow, args=(i,)) for i in range(4)])
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=240)
    assert not any(t.is_alive() for t in threads), "handler thread leaked"
    assert len(results) == 8
    assert all(s == 200 for kind, s, _ in results if kind == "fast")
    # the batcher must fully drain (cancelled slots freed)
    deadline = time.time() + 60
    while srv.batcher.pending and time.time() < deadline:
        time.sleep(0.05)
    assert srv.batcher.pending == 0
    c = _conn(port)
    c.request("GET", "/health")
    assert c.getresponse().status == 200
    httpd.shutdown()
    srv.stop()


def test_graceful_shutdown_drains(engine_and_voice):
    """shutdown(): in-flight requests finish with 200, new requests get
    503, and the batcher is empty afterwards."""
    engine, voice = engine_and_voice
    srv = TTSServer(engine, {"v": voice}, n_slots=2)
    srv.start_scheduler()
    httpd, port = _start_http(srv)
    inflight = []

    def one(i):
        c = _conn(port)
        c.request("POST", "/synthesize",
                  body=json.dumps({"text": f"drain {i}", "max_tokens": 25,
                                   "temperature": 1.0, "seed": i}),
                  headers={"Content-Type": "application/json"})
        r = c.getresponse()
        inflight.append((r.status, len(r.read())))

    threads = [threading.Thread(target=one, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    # wait until ALL THREE requests reached the batcher before draining —
    # shutting down after only the first arrives would 503 the others
    # (that rejection path has its own test below)
    deadline = time.time() + 60
    while srv.batcher._next_id < 3 and time.time() < deadline:
        time.sleep(0.01)
    drained = srv.shutdown(drain_timeout_sec=120)
    assert drained
    for t in threads:
        t.join(timeout=120)
    assert len(inflight) == 3 and all(s == 200 for s, _ in inflight)
    # post-shutdown request refused with 503
    c = _conn(port)
    c.request("POST", "/synthesize",
              body=json.dumps({"text": "too late"}),
              headers={"Content-Type": "application/json"})
    r = c.getresponse()
    assert r.status == 503
    r.read()
    httpd.shutdown()


def test_request_timeout(engine_and_voice):
    """A request exceeding request_timeout_sec is cancelled by the
    scheduler and the client gets 504 (no audio committed yet) — the slot
    is freed for other work."""
    engine, voice = engine_and_voice
    srv = TTSServer(engine, {"v": voice}, n_slots=2,
                    request_timeout_sec=0.0)  # expires immediately
    srv.start_scheduler()
    httpd, port = _start_http(srv)
    c = _conn(port)
    c.request("POST", "/synthesize",
              body=json.dumps({"text": "never fast enough",
                               "max_tokens": 40, "temperature": 1.0}),
              headers={"Content-Type": "application/json"})
    r = c.getresponse()
    body = r.read()
    # either nothing was committed before the deadline (504) or the first
    # commit raced ahead of expiry (200 partial) — both must free the slot
    assert r.status in (200, 504)
    deadline = time.time() + 60
    while srv.batcher.pending and time.time() < deadline:
        time.sleep(0.05)
    assert srv.batcher.pending == 0
    httpd.shutdown()
    srv.stop()


def test_slow_client_cancels_not_deadlocks(engine_and_voice):
    """A handler that stops draining must NOT stall the scheduler: once its
    chunk queue fills, the callback returns False and the batcher cancels
    the request (the pre-fix behavior blocked in queue.put forever)."""
    from miotts_tpu.runtime.engine import Options

    engine, voice = engine_and_voice
    srv = TTSServer(engine, {"v": voice}, n_slots=2)
    srv.queue_cap = 2   # pretend the client fell ~2 chunks behind
    h = srv.submit("a slow client request", None,
                   Options(max_tokens=40, temperature=1.0))
    for _ in range(200):       # drive the scheduler inline (no thread)
        if not srv.batcher.pending:
            break
        srv.batcher.step()
    assert srv.batcher.pending == 0          # request finished (cancelled)
    assert h.abandoned                        # and it was the queue-full path
