"""Playback pipeline tests: bounded queue semantics + end-to-end sink."""

import io

import numpy as np

from miotts_tpu.runtime.playback import BoundedSampleQueue, stream_to_sink


def test_queue_fifo_and_underrun():
    q = BoundedSampleQueue(1000)
    q.push(np.arange(5, dtype=np.float32))
    q.push(np.arange(5, 8, dtype=np.float32))
    out = q.pop(6)
    np.testing.assert_array_equal(out, [0, 1, 2, 3, 4, 5])
    # underrun: remaining 2 samples + zero fill
    out = q.pop(5)
    np.testing.assert_array_equal(out, [6, 7, 0, 0, 0])


def test_queue_backpressure_blocks_until_closed():
    import threading
    q = BoundedSampleQueue(10)
    q.push(np.zeros(10, np.float32))
    result = {}

    def producer():
        result["pushed"] = q.push(np.zeros(5, np.float32))

    t = threading.Thread(target=producer)
    t.start()
    t.join(timeout=0.2)
    assert t.is_alive()          # blocked on full queue
    q.pop(6)                     # make room
    t.join(timeout=2)
    assert not t.is_alive() and result["pushed"]
    q.close()
    assert q.push(np.zeros(1, np.float32)) is False


def test_stream_to_sink_end_to_end(tmp_path, rng):
    from miotts_tpu.gguf import write_voice_embedding
    from miotts_tpu.models.synthetic import write_synthetic_codec
    from miotts_tpu.runtime.engine import EngineConfig, Options, TTSEngine, VoiceModel
    from miotts_tpu.text import format_speech_tokens

    codec_path = str(tmp_path / "codec.gguf")
    cfg = write_synthetic_codec(codec_path, n_codes=64, seed=3)
    emb_path = str(tmp_path / "v.emb.gguf")
    write_voice_embedding(emb_path, rng.standard_normal(cfg.adaln_dim) * 0.3)

    eng = TTSEngine(EngineConfig(codec_path=codec_path, code_bucket=16))
    voice = VoiceModel(emb_path)
    text = format_speech_tokens(rng.integers(0, 64, 6))

    buf = io.BytesIO()
    ok = stream_to_sink(eng, voice, text, out=buf,
                        options=Options(skip_llm=True), chunk_samples=2048)
    assert ok
    pcm = np.frombuffer(buf.getvalue(), dtype="<i2")
    assert len(pcm) == 6 * eng.samples_per_token
