"""Streaming commit-policy tests with a scripted token stream.

Drives synthesize_stream with a monkeypatched token generator so the
commit-holdback / min-step / crossfade policy (test-to-speech.cpp:499-571)
is exercised deterministically over many emits, independent of the random
synthetic LLM.
"""

import numpy as np
import pytest

from miotts_tpu.gguf import write_voice_embedding
from miotts_tpu.models.synthetic import write_synthetic_codec, write_synthetic_llm
from miotts_tpu.runtime.engine import EngineConfig, Options, TTSEngine, VoiceModel
from miotts_tpu.runtime.profile import StreamProfile


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    d = tmp_path_factory.mktemp("spmodels")
    codec_path = str(d / "codec.gguf")
    llm_path = str(d / "llm.gguf")
    ccfg = write_synthetic_codec(codec_path, n_codes=64, seed=3)
    write_synthetic_llm(llm_path, seed=5, n_speech=64)
    emb_path = str(d / "voice.emb.gguf")
    rng = np.random.default_rng(11)
    write_voice_embedding(emb_path, rng.standard_normal(ccfg.adaln_dim) * 0.3)
    eng = TTSEngine(EngineConfig(
        model_path=llm_path, codec_path=codec_path, llm_dtype="float32",
        prompt_bucket=32, code_bucket=16))
    return eng, VoiceModel(emb_path)


def _scripted(eng, codes, interval=20):
    """Monkeypatch generate_tokens to feed speech tokens for `codes`."""
    eng.config.fused_streaming = False  # scripted feed drives the unfused path
    # speech token id for code c: find via the code table
    table = eng.code_table
    id_for_code = {int(c): i for i, c in enumerate(table) if c >= 0}

    def fake_generate(text, options, on_token=None, profile=None):
        ids = []
        for n, c in enumerate(codes, start=1):
            tid = id_for_code[int(c)]
            ids.append(tid)
            if on_token is not None and not on_token(tid, n):
                break
        return ids

    eng.generate_tokens = fake_generate


def test_multi_emit_policy(engine, rng):
    """121 codes with interval-20 checks: emits happen when
    len(codes)-32 >= committed+24; samples stay contiguous; total equals
    codes * samples_per_token."""
    eng, voice = engine
    orig = eng.generate_tokens
    try:
        codes = rng.integers(0, 64, 121)
        _scripted(eng, codes)
        chunks = []
        finals = []

        def cb(samples, sr, is_last):
            if samples is not None:
                chunks.append(samples.copy())
            finals.append(is_last)
            return True

        profile = StreamProfile()
        ok = eng.synthesize_stream(voice, "ignored", cb,
                                   chunk_samples=4096,
                                   options=Options(max_tokens=500),
                                   profile=profile)
        assert ok
        assert finals[-1] is True
        total = np.concatenate(chunks)
        assert total.shape == (121 * eng.samples_per_token,)
        # multiple emits occurred (121 codes, holdback 32, min step 24):
        # commits at 60->28, 80->48(+20<24 skip), 100->68, 120->88, final->121
        assert profile.decode_calls >= 3
        # streamed output approximates the offline decode away from the
        # crossfaded emit boundaries
        from miotts_tpu.text import format_speech_tokens
        offline = eng.synthesize(voice, format_speech_tokens(codes),
                                 Options(skip_llm=True,
                                         apply_peak_normalization=False))
        diff = np.abs(total - offline)
        # overall RMSE small (crossfade blends ~30ms windows per emit)
        rmse = float(np.sqrt(np.mean(diff ** 2)))
        scale = float(np.sqrt(np.mean(offline ** 2))) + 1e-9
        assert rmse / scale < 0.5
    finally:
        eng.generate_tokens = orig


def test_emit_thresholds(engine, rng):
    """No emission before holdback+min_step codes accumulate; exactly one
    final flush for short sequences."""
    eng, voice = engine
    orig = eng.generate_tokens
    try:
        codes = rng.integers(0, 64, 40)  # 40 - 32 holdback = 8 < 24 min step
        _scripted(eng, codes)
        events = []

        def cb(samples, sr, is_last):
            events.append((0 if samples is None else len(samples), is_last))
            return True

        profile = StreamProfile()
        ok = eng.synthesize_stream(voice, "ignored", cb,
                                   options=Options(max_tokens=500),
                                   profile=profile)
        assert ok
        # all audio arrived in the final flush (one decode call)
        assert profile.decode_calls == 1
        total = sum(n for n, _ in events)
        assert total == 40 * eng.samples_per_token
    finally:
        eng.generate_tokens = orig


def test_fused_matches_unfused_streaming(engine):
    """The fused single-executable streaming path must produce the same
    chunks as the unfused path at the same seed."""
    eng, voice = engine
    from miotts_tpu.runtime.engine import Options

    def run(fused):
        eng.config.fused_streaming = fused
        chunks = []

        def cb(samples, sr, is_last):
            if samples is not None:
                chunks.append(samples.copy())
            return True

        ok = eng.synthesize_stream(voice, "fused parity", cb,
                                   options=Options(max_tokens=120,
                                                   temperature=1.0, seed=42))
        assert ok or not chunks
        return np.concatenate(chunks) if chunks else np.zeros(0, np.float32)

    try:
        a = run(False)
        b = run(True)
    finally:
        eng.config.fused_streaming = True
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=1e-4)
