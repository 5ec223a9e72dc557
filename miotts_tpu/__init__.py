"""miotts_tpu — a TPU-native text-to-speech framework (MioTTS pipeline).

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
espresso3389/MioTTS-llama.cpp: GGUF quantized-model loading, causal-LM speech
token generation, the MioCodec acoustic decoder, and a fused iSTFT vocoder —
text in, 44.1 kHz PCM out, with offline and streaming (commit-holdback +
crossfade) modes, sharded over TPU meshes via pjit.

Layout:
  gguf/      GGUF container + quantization block codecs (host)
  ops/       Pallas TPU kernels + XLA compute ops (quantized matmul, attention,
             iSTFT, sampling)
  models/    MioCodec decoder and the causal-LM family, weight loading
  text/      normalizer, BPE tokenizer, speech-token bridge, prompt template
  runtime/   synthesis engine (offline + streaming), profiling
  parallel/  mesh / sharding / multi-host helpers
  audio/     WAV I/O and waveform health analysis
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy top-level conveniences (importing the runtime pulls in jax; keep
    # `import miotts_tpu` light for tools that only need gguf/text).
    if name in ("TTSEngine", "EngineConfig", "Options", "VoiceModel"):
        from .runtime import engine as _e
        return getattr(_e, name)
    if name == "ContinuousBatcher":
        from .runtime.batching import ContinuousBatcher
        return ContinuousBatcher
    raise AttributeError(name)
