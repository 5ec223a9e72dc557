#!/usr/bin/env python3
"""Stream-vs-offline fidelity measured ON the chip (VERDICT r3 item 3).

The reference's stream-compare contract (`examples/stream-compare.cpp:
100-156,258-275`) is CPU-tested in tests/; this bench puts the measured
numbers from real hardware into the record, in the two configurations that
matter:

  float  - the single-stream engine at its float-exact defaults: generate
           token text once, decode offline vs streamed (peak-norm off both
           sides), compare.  This is the literal reference contract — and
           like the reference's own --skip-llm replay, all codes are known
           up front, so every emit's full re-decode matches offline
           exactly (expect ~0).
  serve  - the round-3 BATCHED serving defaults (i16 wire + pipelined
           codec): one seeded request through a ContinuousBatcher; its
           emitted audio vs an offline float decode of its own codes.
           This measures TRUE stream-vs-offline divergence: mid-stream
           commits emit PREFIX-decode content, and the codec's stacked
           local attention has a receptive field (~6 layers x 65-window)
           far beyond the 32-code holdback, so prefix != full decode BY
           DESIGN (the reference's policy has the identical property —
           that is why its stream-compare tool measures rather than
           asserts).  Tiny for a trained codec; large for random
           synthetic weights (emissions after the final flush DO match at
           the 1-LSB i16 bound — localized round 4).
  wire   - serve-path i16 (default) vs serve-path float transfers at the
           same seed: codes and emission schedule are identical, so the
           difference isolates the i16 wire format end-to-end on hardware
           (the documented <= 1 LSB bound, free of codec-locality terms).

Metrics are computed in the 16-bit-PCM sink domain (both signals clipped to
[-1, 1] first): every sink clamps exactly like the reference's WAV writer
(`wav-writer.cpp:39-42`), so the clamp is not a stream-vs-offline delta --
and the SYNTHETIC codec's unnormalized audio exceeds +-1 (real checkpoints
do not), which would otherwise drown the i16 quantization term in shared
clipping error.

Prints compare.<config>.* metric lines (stderr) and ONE JSON line (stdout).

Usage: python benchmarks/bench_compare.py
Env: MIOTTS_BENCH_MODEL, MIOTTS_BENCH_TOKENS (default 128).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def metrics(offline: np.ndarray, streamed: np.ndarray) -> dict:
    from miotts_tpu.audio.metrics import (best_lag_rmse, log_spectral_distance,
                                          waveform_errors)
    out = {"offline_samples": len(offline), "stream_samples": len(streamed)}
    offline = np.clip(offline, -1.0, 1.0)
    streamed = np.clip(streamed, -1.0, 1.0)
    if min(len(offline), len(streamed)) == 0:
        return out
    e = waveform_errors(offline, streamed)
    out.update(mae=e["mae"], rmse=e["rmse"], max_abs=e["max_abs"],
               lsd_db=log_spectral_distance(offline, streamed))
    lag, r = best_lag_rmse(offline, streamed)
    out.update(best_lag_samples=int(lag), best_lag_rmse=r)
    return out


def show(tag: str, m: dict) -> None:
    for k, v in m.items():
        v = f"{v:.8f}" if isinstance(v, float) else v
        print(f"compare.{tag}.{k}={v}", file=sys.stderr, flush=True)


def main() -> int:
    max_tokens = int(os.environ.get("MIOTTS_BENCH_TOKENS", "128"))
    # Real-checkpoint mode (day-1 battery, VERDICT r4 item 8b): explicit
    # model paths override the synthetic bench models, so the serve-config
    # rmse (receptive-field-dominated on random weights) is remeasured on
    # trained weights the moment they are reachable.
    if os.environ.get("MIOTTS_COMPARE_LLM"):
        llm_path = os.environ["MIOTTS_COMPARE_LLM"]
        codec_path = os.environ["MIOTTS_COMPARE_CODEC"]
        emb_path = os.environ["MIOTTS_COMPARE_EMB"]
    else:
        from bench import ensure_models
        llm_path, codec_path, emb_path = ensure_models()

    from miotts_tpu.runtime.batching import ContinuousBatcher
    from miotts_tpu.runtime.engine import (EngineConfig, Options, TTSEngine,
                                           VoiceModel)

    # Holdback sweep knob (VERDICT r4 item 4): raise the serve-path commit
    # holdback past the codec's ~192-code receptive field (6 stacked
    # window-65 attentions) to test the receptive-field attribution of the
    # serve-config rmse — if right, serve-rmse collapses to the wire bound
    # once holdback clears the field.  Codes are seed-determined and
    # holdback-independent, so sweep points compare the same utterance.
    holdback = int(os.environ.get("MIOTTS_HOLDBACK", "32"))
    engine = TTSEngine(EngineConfig(
        model_path=llm_path, codec_path=codec_path,
        max_tokens=max_tokens, temperature=0.8, seed=42,
        holdback_codes=holdback))
    voice = VoiceModel(emb_path)
    t0 = time.perf_counter()
    engine.warmup(max_codes=max_tokens, prompt_len=80)
    print(f"bench_compare: warmup {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    result = {"metric": "compare.rmse", "unit": "abs_sample_err",
              "model": os.environ.get("MIOTTS_BENCH_MODEL", "0.1b-q8_0"),
              "holdback": holdback}

    # --- float: the reference's single-stream contract -------------------
    text = "fidelity comparison utterance for the streaming pipeline"
    token_text = engine.generate_token_text(text, Options(seed=42))
    opts = Options(skip_llm=True, apply_peak_normalization=False)
    offline = engine.synthesize(voice, token_text, opts)
    chunks = []
    engine.synthesize_stream(
        voice, token_text,
        lambda s, sr, last: (chunks.append(s) or True) if s is not None else True,
        options=opts)
    streamed = np.concatenate(chunks) if chunks else np.zeros(0, np.float32)
    m = metrics(offline, streamed)
    show("float", m)
    result["float"] = {k: round(v, 8) if isinstance(v, float) else v
                       for k, v in m.items()}

    # --- serve: batched path at round-3 serving defaults -----------------
    def serve_once():
        captured = {}
        schunks = []

        def cb(s, sr, is_last):
            if s is not None:
                schunks.append(s)
            return True

        batcher = ContinuousBatcher(engine, n_slots=2, chunk_steps=20)
        batcher.submit(text, voice, cb,
                       Options(max_tokens=max_tokens, seed=42),
                       on_finish=lambda r: captured.setdefault(
                           "codes", list(r.codes)))
        batcher.run_until_done(max_iters=2000)
        stream = (np.concatenate(schunks) if schunks
                  else np.zeros(0, np.float32))
        return stream, captured.get("codes", []), [len(s) for s in schunks]

    served, codes, chunk_lens = serve_once()
    offline2 = engine.decode_codes(codes, voice,
                                   apply_peak_normalization=False)
    m2 = metrics(offline2, served)
    show("serve", m2)
    result["serve"] = {k: round(v, 8) if isinstance(v, float) else v
                       for k, v in m2.items()}

    # --- wire: i16 vs float transfers, identical seed/schedule -----------
    engine.config.i16_transfer = False
    served_f, codes_f, _ = serve_once()
    engine.config.i16_transfer = None   # restore the tri-state default
    if codes_f == codes:
        m3 = metrics(served_f, served)
        # Out-of-range synthetic audio exposes an order-of-operations
        # nonlinearity: the i16 path clips ON DEVICE before the host
        # crossfade, the float path crossfades unclipped values (clip
        # happens at the sink).  Real audio is in-range, where both
        # orders coincide and the bound is 1 LSB.  Mask BOTH effects to
        # recover that bound on synthetic audio: exclude out-of-range
        # samples AND crossfade spans (the first ~30 ms of the chunk that
        # follows each partial chunk — partial = emission end, so the
        # next chunk opens an emission and blends the held tail).
        n = min(len(served), len(served_f))
        a, b = served[:n], served_f[:n]
        mask = np.abs(b) <= 0.999
        xfade = min(engine.sample_rate * 3 // 100, 4096)
        pos, boundary = 0, True   # the very first chunk has an empty tail
        for cl in chunk_lens:
            if boundary:
                mask[pos:pos + xfade] = False
            boundary = cl < 4096
            pos += cl
        if mask.any():
            d = np.abs(np.clip(a[mask], -1, 1) - np.clip(b[mask], -1, 1))
            m3["in_range_max_abs"] = float(d.max())
            m3["in_range_rmse"] = float(np.sqrt((d ** 2).mean()))
            m3["masked_pct"] = float(100.0 * (~mask).mean())
        show("wire", m3)
        result["wire"] = {k: round(v, 8) if isinstance(v, float) else v
                          for k, v in m3.items()}
    else:  # pragma: no cover - seeded codes must match
        print("bench_compare: wire config produced different codes?!",
              file=sys.stderr, flush=True)

    result["value"] = result.get("wire", {}).get("max_abs", -1.0)
    result["vs_baseline"] = result["float"].get("rmse", -1.0)
    print(json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
