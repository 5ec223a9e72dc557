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


def test_paced_sink_underrun_and_clock():
    """Paced (device-clock) consumption end-to-end: a producer that lags
    behind realtime forces underruns which the sink zero-fills mid-stream
    (stream-to-device.cpp:169-177 semantics), and consumption advances at
    roughly the sample-rate clock, not as fast as the producer can push."""
    import threading
    import time

    from miotts_tpu.runtime.playback import PCMSink

    sr = 8000
    block = 400                       # 50 ms device period
    q = BoundedSampleQueue(sr * 10)
    buf = io.BytesIO()
    sink = PCMSink(q, buf, sr, block=block, pace_realtime=True)

    # producer: 3 bursts of 0.1 s of ones, separated by 0.25 s gaps — the
    # paced consumer (zero-fill on partial reads) must hit gaps of silence
    def produce():
        for _ in range(3):
            q.push(np.ones(sr // 10, np.float32))
            time.sleep(0.25)

    t0 = time.perf_counter()
    prod = threading.Thread(target=produce)
    prod.start()
    sink.start()
    prod.join(timeout=5)
    q.drain_wait()
    wall = time.perf_counter() - t0
    sink.stop()
    q.close()

    pcm = np.frombuffer(buf.getvalue(), dtype="<i2").astype(np.float32)
    ones = int((np.abs(pcm) > 16000).sum())
    # every produced sample eventually went out
    assert ones == 3 * (sr // 10)
    # underrun: zero-filled silence BETWEEN bursts (not only trailing)
    nz = np.nonzero(np.abs(pcm) > 16000)[0]
    span = nz[-1] - nz[0] + 1
    assert span > ones, "no mid-stream zero-fill gaps found"
    # the paced clock: consuming ~0.8 s of timeline takes >= ~0.45 s wall
    # (an unpaced sink would finish in milliseconds)
    assert wall >= 0.45
    # consumed counter includes the zero-filled device periods
    assert sink.consumed >= len(pcm) - block


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


def test_audio_device_sink_plays_via_subprocess(tmp_path):
    """AudioDeviceSink pipes exactly the produced PCM into the player
    process (stream-to-device.cpp:238-299 counterpart); a stand-in player
    copies stdin to a file so we can assert byte-exact delivery."""
    import sys
    import time

    from miotts_tpu.audio.wav import f32_to_s16
    from miotts_tpu.runtime.playback import AudioDeviceSink

    sink_file = str(tmp_path / "consumed.pcm")
    player = [sys.executable, "-c",
              "import sys, shutil; shutil.copyfileobj("
              f"sys.stdin.buffer, open({sink_file!r}, 'wb'))"]
    q = BoundedSampleQueue(100_000)
    sink = AudioDeviceSink(q, 44100, block=1024, player_cmd=player)
    sink.start()
    rng = np.random.default_rng(0)
    samples = (rng.standard_normal(5000) * 0.2).astype(np.float32)
    q.push(samples)
    q.drain_wait()
    time.sleep(0.1)
    sink.stop()
    q.close()
    got = np.fromfile(sink_file, dtype="<i2")
    np.testing.assert_array_equal(got, f32_to_s16(samples).astype("<i2"))


def test_stream_device_fallback_without_player(tmp_path, rng, monkeypatch, capsys):
    """device=True without any installed player degrades to the paced null
    sink: the stream completes and --dump-fed-wav still captures."""
    from miotts_tpu.gguf import write_voice_embedding
    from miotts_tpu.models.synthetic import write_synthetic_codec
    from miotts_tpu.runtime import playback
    from miotts_tpu.runtime.engine import EngineConfig, Options, TTSEngine, VoiceModel
    from miotts_tpu.text import format_speech_tokens

    codec_path = str(tmp_path / "codec.gguf")
    cfg = write_synthetic_codec(codec_path, n_codes=64, seed=3)
    emb_path = str(tmp_path / "v.emb.gguf")
    write_voice_embedding(emb_path, rng.standard_normal(cfg.adaln_dim) * 0.3)
    monkeypatch.setattr(playback, "find_audio_player", lambda sr: None)

    eng = TTSEngine(EngineConfig(codec_path=codec_path, code_bucket=16))
    voice = VoiceModel(emb_path)
    text = format_speech_tokens(rng.integers(0, 64, 6))
    fed_path = str(tmp_path / "fed.wav")
    ok = stream_to_sink(eng, voice, text, options=Options(skip_llm=True),
                        chunk_samples=2048, device=True, dump_fed_path=fed_path)
    assert ok
    assert "falling back" in capsys.readouterr().err
    from miotts_tpu.audio.wav import wav_read
    fed, sr = wav_read(fed_path)
    assert sr == eng.sample_rate
    # paced null sink consumed the whole stream (possibly + zero-fill)
    assert len(fed) >= 6 * eng.samples_per_token
