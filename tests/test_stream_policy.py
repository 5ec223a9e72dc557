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
    """First-commit policy: with the default first_commit_codes=8, 40 codes
    (target 8) emit one early chunk + the final flush; with the
    reference-uniform cadence (first_commit == min_commit) nothing emits
    before holdback+min_step and all audio arrives in the final flush."""
    eng, voice = engine
    orig = eng.generate_tokens
    orig_fc = eng._first_commit
    try:
        codes = rng.integers(0, 64, 40)  # 40 - 32 holdback = 8
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
        # default: early first commit (8 >= first_commit_codes) + final
        assert profile.decode_calls == 2
        total = sum(n for n, _ in events)
        assert total == 40 * eng.samples_per_token

        # reference-uniform cadence: single final flush
        eng._first_commit = eng.config.min_commit_step_codes
        events.clear()
        profile = StreamProfile()
        ok = eng.synthesize_stream(voice, "ignored", cb,
                                   options=Options(max_tokens=500),
                                   profile=profile)
        assert ok
        assert profile.decode_calls == 1
        assert sum(n for n, _ in events) == 40 * eng.samples_per_token
    finally:
        eng.generate_tokens = orig
        eng._first_commit = orig_fc


def test_windowed_streaming_unfused(engine, rng):
    """Sliding-window re-decode (stream_window_codes > 0): same commit
    schedule and sample counts as the full-prefix re-decode; bit-identical
    when the window covers the whole prefix; bounded drift (GroupNorm stats
    window only — attention is relative-RoPE, convs shift-invariant) when it
    doesn't; and strictly less decode work."""
    eng, voice = engine
    orig = eng.generate_tokens
    orig_w = eng.config.stream_window_codes
    try:
        codes = rng.integers(0, 64, 121)

        def run(window):
            _scripted(eng, codes)
            eng.config.stream_window_codes = window
            chunks = []

            def cb(samples, sr, is_last):
                if samples is not None:
                    chunks.append(samples.copy())
                return True

            profile = StreamProfile()
            ok = eng.synthesize_stream(voice, "ignored", cb,
                                       options=Options(max_tokens=500),
                                       profile=profile)
            assert ok
            return np.concatenate(chunks), profile

        full, pf = run(0)
        same, _ = run(1000)        # window >= prefix -> identical decodes
        win, pw = run(48)
        np.testing.assert_allclose(same, full, atol=1e-6)
        assert win.shape == full.shape
        assert pw.decode_calls == pf.decode_calls
        assert pw.decoded_codes < pf.decoded_codes
        rmse = float(np.sqrt(np.mean((win - full) ** 2)))
        scale = float(np.sqrt(np.mean(full ** 2))) + 1e-9
        assert rmse / scale < 0.3
    finally:
        eng.generate_tokens = orig
        eng.config.stream_window_codes = orig_w


def test_fused_windowed_streaming(engine):
    """Fused sliding-window streaming: one fixed-size device buffer serves
    the whole stream (the buffer slides past committed codes); emit schedule
    and total sample count match the fused full re-decode, with bounded
    drift."""
    eng, voice = engine
    cfgE = eng.config
    saved = (cfgE.stream_window_codes, cfgE.holdback_codes,
             cfgE.min_commit_step_codes, cfgE.stream_check_interval,
             cfgE.fused_streaming)

    def run(window):
        cfgE.fused_streaming = True
        cfgE.stream_window_codes = window
        # small policy constants so the window actually slides within a
        # tiny-model test budget
        cfgE.holdback_codes = 8
        cfgE.min_commit_step_codes = 6
        cfgE.stream_check_interval = 10
        chunks = []

        def cb(samples, sr, is_last):
            if samples is not None:
                chunks.append(samples.copy())
            return True

        profile = StreamProfile()
        # seed 1 runs the full 400-token budget and yields ~77 codes with
        # this synthetic LLM — enough for the 64-slot window buffer to slide
        ok = eng.synthesize_stream(voice, "fused window parity", cb,
                                   options=Options(max_tokens=400,
                                                   temperature=1.0, seed=1),
                                   profile=profile)
        assert ok or not chunks
        return (np.concatenate(chunks) if chunks else
                np.zeros(0, np.float32)), profile

    try:
        a, pa = run(0)
        b, pb = run(20)
    finally:
        (cfgE.stream_window_codes, cfgE.holdback_codes,
         cfgE.min_commit_step_codes, cfgE.stream_check_interval,
         cfgE.fused_streaming) = saved
    assert a.shape == b.shape
    assert pa.decode_calls == pb.decode_calls
    assert pa.decode_calls >= 2          # multiple emits happened
    assert pb.decoded_codes < pa.decoded_codes   # windowed did less work
    if a.size:
        rmse = float(np.sqrt(np.mean((a - b) ** 2)))
        scale = float(np.sqrt(np.mean(a ** 2))) + 1e-9
        assert rmse / scale < 0.3


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


def test_dispatch_pipeline_depth_parity(engine):
    """The depth-k dispatch pipeline (chunk k+1 dispatched before chunk k's
    results are read) must be invisible: identical audio and emit schedule
    at every depth, including through full-mode bucket-growth points
    (code_bucket=16 forces several _grow_buf rebuckets within 150 tokens)."""
    eng, voice = engine
    saved = (eng.config.fused_streaming, eng.config.stream_pipeline_depth)

    def run(depth):
        eng.config.fused_streaming = True
        eng.config.stream_pipeline_depth = depth
        chunks = []

        def cb(samples, sr, is_last):
            if samples is not None:
                chunks.append(samples.copy())
            return True

        profile = StreamProfile()
        ok = eng.synthesize_stream(voice, "pipeline depth parity", cb,
                                   options=Options(max_tokens=150,
                                                   temperature=1.0, seed=7),
                                   profile=profile)
        assert ok or not chunks
        return (np.concatenate(chunks) if chunks else
                np.zeros(0, np.float32)), profile

    try:
        a, pa = run(1)
        b, pb = run(2)
        c, pc = run(4)
    finally:
        eng.config.fused_streaming, eng.config.stream_pipeline_depth = saved
    assert pa.decode_calls == pb.decode_calls == pc.decode_calls
    assert pa.emitted_samples == pb.emitted_samples == pc.emitted_samples
    np.testing.assert_allclose(a, b, atol=1e-5)
    np.testing.assert_allclose(a, c, atol=1e-5)


def test_dispatch_pipeline_abort(engine):
    """Callback abort with steps still in flight: the stream stops after the
    aborting emit, in-flight step outputs are discarded unprocessed, and no
    further callbacks fire (reference semantics, test-to-speech.cpp:405-409)."""
    eng, voice = engine
    saved = (eng.config.fused_streaming, eng.config.stream_pipeline_depth)
    calls = []

    def cb(samples, sr, is_last):
        calls.append(samples.shape[0] if samples is not None else 0)
        return False

    try:
        eng.config.fused_streaming = True
        eng.config.stream_pipeline_depth = 3
        ok = eng.synthesize_stream(voice, "pipeline abort", cb,
                                   options=Options(max_tokens=200,
                                                   temperature=1.0, seed=7))
    finally:
        eng.config.fused_streaming, eng.config.stream_pipeline_depth = saved
    assert not ok
    assert len(calls) == 1


def test_pipelined_codec_streaming(engine, rng):
    """pipeline_codec (+ codec on a second device): sample-exact parity with
    the synchronous unfused path — same decodes in the same order, only the
    materialization is deferred one check interval."""
    import jax
    eng, voice = engine
    orig = eng.generate_tokens
    saved = eng.config.pipeline_codec
    codec_params0 = eng.codec_params
    try:
        codes = rng.integers(0, 64, 121)

        def run(pipeline):
            _scripted(eng, codes)
            eng.config.pipeline_codec = pipeline
            if pipeline:
                eng.codec_params = jax.device_put(codec_params0,
                                                  jax.devices()[1])
            chunks = []

            def cb(samples, sr, is_last):
                if samples is not None:
                    chunks.append(samples.copy())
                return True

            profile = StreamProfile()
            ok = eng.synthesize_stream(voice, "ignored", cb,
                                       options=Options(max_tokens=500),
                                       profile=profile)
            assert ok
            return np.concatenate(chunks), profile

        a, pa = run(False)
        b, pb = run(True)
        assert pb.decode_calls == pa.decode_calls
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-6)
    finally:
        eng.generate_tokens = orig
        eng.config.pipeline_codec = saved
        eng.codec_params = codec_params0
