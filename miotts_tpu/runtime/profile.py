"""Per-stage synthesis profiling.

Same observability contract as the reference's `StreamProfile`
(`/root/reference/src/test-to-speech.h:28-38`) so the benchmark harness can
emit identical `stream_bench.*` metric names
(`/root/reference/examples/stream-benchmark.cpp:148-167`).
"""

from __future__ import annotations

import contextlib
from dataclasses import dataclass, field


@contextlib.contextmanager
def device_trace(trace_dir: str | None):
    """jax.profiler trace capture around a synthesis run (SURVEY.md §5:
    the reference only has wall-clock spans; on TPU we add real device
    timelines).  View with TensorBoard or xprof.  No-op when trace_dir is
    falsy."""
    if not trace_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class StreamProfile:
    total_sec: float = 0.0
    llm_sec: float = 0.0
    codec_sec: float = 0.0
    istft_sec: float = 0.0
    callback_sec: float = 0.0
    llm_tokens: int = 0
    decode_calls: int = 0
    decoded_codes: int = 0
    emitted_samples: int = 0
    # TPU-native extensions (not in the reference)
    prefill_sec: float = 0.0
    first_audio_sec: float = -1.0   # time-to-first-audio (p50 target metric)
    # Fused streaming folds the codec+iSTFT execution into the single
    # fused-step program, so host timers alone cannot split the stages.
    # The engine records the codec bucket length of every decode call here;
    # TTSEngine.attribute_stages() then times the standalone codec/iSTFT
    # executables at those buckets ON DEVICE and rewrites
    # codec_sec/istft_sec/llm_sec so the reference's stage contract
    # (stream-benchmark.cpp:163-166) holds in the default configuration.
    decode_bucket_codes: list = field(default_factory=list)
    stages_calibrated: bool = False
    # False when a stage's device measurement read 0.0 even after the
    # escalated retry (persistently loaded host): the codec/istft split is
    # then untrusted and consumers should say so instead of reporting a
    # stage as free.
    stages_trusted: bool = True

    def as_metrics(self, audio_sec: float) -> dict:
        """stream_bench.* key/value lines (stream-benchmark.cpp:148-167)."""
        total = max(self.total_sec, 1e-12)
        m = {
            "stream_bench.total_sec": self.total_sec,
            "stream_bench.audio_sec": audio_sec,
            "stream_bench.rtf": self.total_sec / audio_sec if audio_sec > 0 else float("inf"),
            "stream_bench.x_realtime": audio_sec / total,
            "stream_bench.llm_tokens": self.llm_tokens,
            "stream_bench.decode_calls": self.decode_calls,
            "stream_bench.decoded_codes": self.decoded_codes,
            "stream_bench.emitted_samples": self.emitted_samples,
            "stream_bench.stage.llm_sec": self.llm_sec,
            "stream_bench.stage.codec_sec": self.codec_sec,
            "stream_bench.stage.istft_sec": self.istft_sec,
            "stream_bench.stage.callback_sec": self.callback_sec,
        }
        if self.first_audio_sec >= 0:
            m["stream_bench.first_audio_sec"] = self.first_audio_sec
        if self.prefill_sec > 0:
            m["stream_bench.stage.prefill_sec"] = self.prefill_sec
        return m
