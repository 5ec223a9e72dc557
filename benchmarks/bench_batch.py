#!/usr/bin/env python3
"""Continuous-batching serving benchmark: N concurrent streams, one chip.

Measures the north-star serving shape (BASELINE.json config 5 scaled to the
available hardware): aggregate audio-seconds per wall-second and per-stream
realtime ratios across concurrent utterances multiplexed through the batched
decode loop.

Usage: python benchmarks/bench_batch.py [n_streams] [max_tokens]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def main() -> int:
    n_streams = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    max_tokens = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    # slots default to one per stream (measured: slot scaling is near-free
    # up to 64 on one v5e — weight reads amortize; 96 is past the knee)
    n_slots = min(n_streams, int(os.environ.get("MIOTTS_BENCH_SLOTS", "64")))

    from bench import ensure_models  # reuse the cached synthetic models
    llm_path, codec_path, emb_path = ensure_models()

    from miotts_tpu.runtime.batching import ContinuousBatcher
    from miotts_tpu.runtime.engine import EngineConfig, Options, TTSEngine, VoiceModel

    def tri(name):
        """unset -> None (EngineConfig auto default), '1' -> True, else False."""
        v = os.environ.get(name)
        return None if v is None or v == "" else v == "1"

    engine = TTSEngine(EngineConfig(
        model_path=llm_path, codec_path=codec_path, max_tokens=max_tokens,
        codec_fast=os.environ.get("MIOTTS_BENCH_CODEC_FAST", "") == "1",
        i16_transfer=tri("MIOTTS_BENCH_I16"),
        pipeline_codec=tri("MIOTTS_BENCH_PIPE"),
        first_commit_codes=int(os.environ.get("MIOTTS_FIRST_COMMIT", "8"))))
    voice = VoiceModel(emb_path)
    print(f"bench_batch: warming up (slots={n_slots})...", file=sys.stderr, flush=True)
    engine.warmup(max_codes=max_tokens, prompt_len=80)

    qkv = os.environ.get("MIOTTS_BENCH_QKV", "") == "1"

    def run_once(tag: str):
        batcher = ContinuousBatcher(engine, n_slots=n_slots, chunk_steps=20,
                                    quantized_kv=qkv)
        stats = {}

        def make_cb(i):
            stats[i] = {"samples": 0, "done_at": None, "first_at": None}

            def cb(samples, sr, is_last):
                if samples is not None:
                    if stats[i]["first_at"] is None:
                        stats[i]["first_at"] = time.perf_counter()
                    stats[i]["samples"] += len(samples)
                if is_last:
                    stats[i]["done_at"] = time.perf_counter()
                return True
            return cb

        t0 = time.perf_counter()
        for i in range(n_streams):
            batcher.submit(f"concurrent utterance number {i} for serving",
                           voice, make_cb(i),
                           Options(max_tokens=max_tokens, temperature=0.8,
                                   seed=100 + i))
        batcher.run_until_done(max_iters=5000)
        wall = time.perf_counter() - t0
        total_audio = sum(s["samples"] for s in stats.values()) / engine.sample_rate
        agg = total_audio / wall if wall > 0 else 0.0
        per_stream = agg / n_streams
        ttfas = sorted(s["first_at"] - t0 for s in stats.values()
                       if s["first_at"] is not None)
        ttfa_p50 = ttfas[len(ttfas) // 2] if ttfas else -1.0
        print(f"bench_batch[{tag}]: streams={n_streams} wall={wall:.2f}s "
              f"audio={total_audio:.2f}s aggregate={agg:.2f}x "
              f"per_stream={per_stream:.2f}x ttfa_p50={ttfa_p50:.2f}s",
              file=sys.stderr, flush=True)
        st = batcher.stage
        acc = sum(v for k, v in st.items() if k.endswith("_sec"))
        print("bench_batch[%s]: stages " % tag
              + " ".join(f"{k}={v:.2f}" if k.endswith("_sec") else f"{k}={v}"
                         for k, v in st.items())
              + f" other={wall - acc:.2f}", file=sys.stderr, flush=True)
        return wall, total_audio, agg, per_stream, ttfa_p50

    run_once("warm")                    # absorbs first-execution stalls
    # several timed reps (cheap once warm: ~3 s each at 64 streams) so
    # serving A/Bs clear the documented +-15% run-to-run noise; the
    # artifact carries the MEDIAN rep
    reps = max(1, int(os.environ.get("MIOTTS_BENCH_REPS", "3")))
    results = [run_once(f"timed{i}") for i in range(reps)]
    results.sort(key=lambda r: r[2])
    wall, total_audio, agg, per_stream, ttfa_p50 = results[len(results) // 2]
    ttfa_med = sorted(r[4] for r in results)[len(results) // 2]

    print(json.dumps({
        "metric": "batch_bench.aggregate_x_realtime",
        "value": round(agg, 4),
        "unit": f"audio_sec/wall_sec@{n_streams}streams",
        "vs_baseline": round(per_stream, 4),
        "ttfa_p50_sec": round(ttfa_med, 4),
        "reps": reps,
        "agg_all": [round(r[2], 2) for r in results],
        "ttfa_all": [round(r[4], 3) for r in results],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
