"""End-to-end engine tests: offline synth, skip-llm replay, streaming policy,
stream-vs-offline equivalence (the reference's stream-compare contract)."""

import numpy as np
import pytest

from miotts_tpu.audio.wav import wav_read, wav_write
from miotts_tpu.gguf import write_voice_embedding
from miotts_tpu.models.synthetic import (
    write_synthetic_codec, write_synthetic_llm,
)
from miotts_tpu.runtime.engine import EngineConfig, Options, TTSEngine, VoiceModel
from miotts_tpu.runtime.profile import StreamProfile
from miotts_tpu.text import format_speech_tokens


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    d = tmp_path_factory.mktemp("models")
    codec_path = str(d / "codec.gguf")
    llm_path = str(d / "llm.gguf")
    codec_cfg = write_synthetic_codec(codec_path, n_codes=64, seed=3)
    write_synthetic_llm(llm_path, seed=5, n_speech=64)
    emb_path = str(d / "voice.emb.gguf")
    rng = np.random.default_rng(11)
    write_voice_embedding(emb_path, rng.standard_normal(codec_cfg.adaln_dim) * 0.3)
    eng = TTSEngine(EngineConfig(
        model_path=llm_path, codec_path=codec_path,
        max_tokens=80, llm_dtype="float32",
        prompt_bucket=32, code_bucket=16,
    ))
    voice = VoiceModel(emb_path)
    return eng, voice


def test_skip_llm_offline(engine, rng):
    eng, voice = engine
    codes = rng.integers(0, 64, 10)
    text = format_speech_tokens(codes)
    audio = eng.synthesize(voice, text, Options(skip_llm=True))
    assert audio.shape == (10 * eng.samples_per_token,)
    assert np.isfinite(audio).all()
    # offline applies x0.95 peak normalization (test-to-speech.cpp:232-243)
    assert abs(float(np.max(np.abs(audio))) - 0.95) < 1e-3


def test_skip_llm_bucketing_invariance(engine, rng):
    """Different code counts land in different buckets; each must produce
    exactly T * samples_per_token samples."""
    eng, voice = engine
    for T in (3, 16, 17):
        codes = rng.integers(0, 64, T)
        audio = eng.synthesize(voice, format_speech_tokens(codes),
                               Options(skip_llm=True, apply_peak_normalization=False))
        assert audio.shape == (T * eng.samples_per_token,)


def test_llm_generation_produces_codes(engine):
    eng, voice = engine
    ids = eng.generate_tokens("hello", Options(max_tokens=40))
    assert len(ids) <= 40
    text = eng.generate_token_text("hello", Options(max_tokens=40))
    assert isinstance(text, str)


def test_generation_deterministic_with_seed(engine):
    eng, _ = engine
    a = eng.generate_tokens("hello world", Options(max_tokens=30, seed=42))
    b = eng.generate_tokens("hello world", Options(max_tokens=30, seed=42))
    assert a == b
    c = eng.generate_tokens("hello world", Options(max_tokens=30, seed=7))
    # different seed usually differs (random weights -> near-uniform logits)
    assert isinstance(c, list)


def test_stream_skip_llm_matches_offline(engine, rng):
    """Streaming --skip-llm path: concatenated chunks == offline decode with
    peak-norm off (stream-compare contract,
    `/root/reference/examples/stream-compare.cpp:210-247`)."""
    eng, voice = engine
    codes = rng.integers(0, 64, 12)
    text = format_speech_tokens(codes)
    offline = eng.synthesize(voice, text,
                             Options(skip_llm=True, apply_peak_normalization=False))

    chunks = []
    flags = []

    def cb(samples, sr, is_last):
        assert sr == eng.sample_rate
        if samples is not None:
            chunks.append(samples.copy())
        flags.append(is_last)
        return True

    ok = eng.synthesize_stream(voice, text, cb, chunk_samples=4096,
                               options=Options(skip_llm=True))
    assert ok
    assert flags[-1] is True
    streamed = np.concatenate(chunks)
    assert streamed.shape == offline.shape
    # single emit -> no crossfade blending; must be identical
    np.testing.assert_allclose(streamed, offline, atol=1e-6)


def test_stream_llm_policy(engine):
    """Full streaming run: holdback commit policy emits monotonically
    growing, contiguous audio; profile counters populate."""
    eng, voice = engine
    profile = StreamProfile()
    chunks = []

    def cb(samples, sr, is_last):
        if samples is not None:
            chunks.append(samples)
        return True

    ok = eng.synthesize_stream(voice, "say something", cb,
                               options=Options(max_tokens=80, temperature=1.0),
                               profile=profile)
    assert ok
    assert profile.llm_tokens > 0
    assert profile.total_sec > 0
    if chunks:  # random model may emit few/no speech tokens before im_end
        total = sum(len(c) for c in chunks)
        assert profile.emitted_samples == total
        assert profile.decode_calls >= 1
        if not eng.config.fused_streaming:
            # fused steps (incl. the device-side final flush) fold codec
            # time into llm_sec (see EngineConfig.fused_streaming)
            assert profile.codec_sec > 0 and profile.istft_sec > 0
        assert profile.first_audio_sec >= 0


def test_attribute_stages_restores_split(engine):
    """Fused streaming folds codec+iSTFT time into llm_sec;
    attribute_stages() must restore a nonzero device-measured split while
    preserving the stage sum (the reference's per-stage contract,
    stream-benchmark.cpp:163-166)."""
    eng, voice = engine
    assert eng.config.fused_streaming
    profile = StreamProfile()

    def cb(samples, sr, is_last):
        return True

    ok = eng.synthesize_stream(voice, "attribute the stages", cb,
                               options=Options(max_tokens=80, temperature=1.0),
                               profile=profile)
    assert ok
    if not profile.decode_bucket_codes:
        pytest.skip("random model emitted no decodable codes")
    before = profile.llm_sec + profile.codec_sec + profile.istft_sec
    out = eng.attribute_stages(profile, reps=2)
    assert out is profile and profile.stages_calibrated
    assert profile.codec_sec > 0 and profile.istft_sec > 0
    assert profile.llm_sec >= 0
    after = profile.llm_sec + profile.codec_sec + profile.istft_sec
    assert after == pytest.approx(before, rel=1e-6)
    # idempotent: a second call must not double-move time
    eng.attribute_stages(profile, reps=2)
    assert profile.llm_sec + profile.codec_sec + profile.istft_sec == \
        pytest.approx(before, rel=1e-6)


def test_stream_callback_abort(engine, rng):
    """Callback returning False aborts synthesis (the reference's only
    cancellation mechanism, test-to-speech.cpp:405-409)."""
    eng, voice = engine
    codes = rng.integers(0, 64, 30)
    calls = []

    def cb(samples, sr, is_last):
        calls.append(1)
        return False

    ok = eng.synthesize_stream(voice, format_speech_tokens(codes), cb,
                               chunk_samples=1024, options=Options(skip_llm=True))
    assert not ok
    assert len(calls) == 1


def test_wav_roundtrip(tmp_path, rng):
    x = (rng.standard_normal(1000) * 0.1).astype(np.float32)
    p = str(tmp_path / "t.wav")
    wav_write(p, x, 44100)
    y, sr = wav_read(p)
    assert sr == 44100
    np.testing.assert_allclose(y, x, atol=1.0 / 32767)


def test_analyze_audio_smoke(rng):
    from miotts_tpu.audio.analyze import analyze_audio
    sr = 44100
    t = np.arange(sr) / sr
    # AM-modulated tone ~ speech-ish statistics
    x = 0.3 * np.sin(2 * np.pi * 220 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
    rep = analyze_audio(x, sr)
    assert rep["rms"] > 0.01
    assert 100 < rep["spectral_centroid_hz"] < 2000
    assert rep["clipped_pct"] == 0.0
    silent = analyze_audio(np.zeros(sr), sr)
    assert "mostly silent" in silent["issues"]


def test_engine_quantized_kv(tmp_path, rng):
    """Engine runs end-to-end with the int8 KV cache enabled."""
    from miotts_tpu.gguf import write_voice_embedding
    from miotts_tpu.models.synthetic import write_synthetic_codec, write_synthetic_llm

    codec_path = str(tmp_path / "codec.gguf")
    llm_path = str(tmp_path / "llm.gguf")
    ccfg = write_synthetic_codec(codec_path, n_codes=64, seed=3)
    write_synthetic_llm(llm_path, seed=5, n_speech=64)
    emb_path = str(tmp_path / "v.emb.gguf")
    write_voice_embedding(emb_path, rng.standard_normal(ccfg.adaln_dim) * 0.3)

    eng = TTSEngine(EngineConfig(model_path=llm_path, codec_path=codec_path,
                                 max_tokens=30, llm_dtype="float32",
                                 prompt_bucket=32, code_bucket=16,
                                 quantized_kv=True))
    a = eng.generate_tokens("int8 kv", Options(max_tokens=25, seed=42))
    b = eng.generate_tokens("int8 kv", Options(max_tokens=25, seed=42))
    assert a == b


def test_spectral_distance_metric(rng):
    from miotts_tpu.audio.metrics import (
        best_lag_rmse, log_spectral_distance, waveform_errors,
    )
    sr = 44100
    t = np.arange(sr) / sr
    a = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    # identical -> ~0 LSD; different freq -> clearly larger
    assert log_spectral_distance(a, a) < 1e-6
    b = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    assert log_spectral_distance(a, b) > 5.0
    e = waveform_errors(a, a)
    assert e["rmse"] == 0.0 and e["n"] == len(a)
    # shifted copy recovered EXACTLY by the all-lag search, including lags
    # that aren't multiples of any stride (reference searches every lag)
    rng_n = np.random.default_rng(3)
    noise = rng_n.standard_normal(len(a)).astype(np.float32) * 0.1
    for shift in (256, 7, -133):
        lag, r = best_lag_rmse(np.roll(noise, shift), noise, max_lag=512)
        assert lag == shift
        assert r < 0.2  # roll wraparound noise only
