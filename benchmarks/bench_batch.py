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

    def dma_probe(mb: int = 16) -> float:
        """Relay-health marker (VERDICT r3 item 7): device->host bandwidth in
        MB/s, measured the trustworthy way on this relay (fetch, not
        block_until_ready — CLAUDE.md).  Healthy sessions measure ~66 MB/s;
        a rep recorded alongside a much lower probe is relay-limited, not
        framework-limited."""
        import jax.numpy as jnp
        buf = jnp.ones((mb * 1024 * 1024 // 4,), jnp.float32)
        np.asarray(buf)  # materialize + first-fetch warm
        best = float("inf")
        for i in range(3):
            # a FRESH array per rep: jax.Array caches its fetched numpy
            # value, so re-fetching `buf` would time a host-memory copy
            # (measured 5.5 TB/s — round-4 base_r4 log) instead of the link
            b2 = buf * (1.0 + i)
            t0 = time.perf_counter()
            np.asarray(b2)
            best = min(best, time.perf_counter() - t0)
        return mb / best

    def run_once(tag: str):
        batcher = ContinuousBatcher(
            engine, n_slots=n_slots, chunk_steps=20, quantized_kv=qkv,
            admit_wave=int(os.environ.get("MIOTTS_ADMIT_WAVE", "0")))
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
        print(f"bench_batch[{tag}]: t={time.strftime('%H:%M:%S')} "
              f"streams={n_streams} wall={wall:.2f}s "
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
    dma = dma_probe()
    print(f"bench_batch: dma_probe={dma:.1f} MB/s", file=sys.stderr, flush=True)
    # several timed reps (cheap once warm: ~3 s each at 64 streams) so
    # serving A/Bs clear the documented +-15% run-to-run noise; the
    # artifact carries the MEDIAN rep
    reps = max(1, int(os.environ.get("MIOTTS_BENCH_REPS", "3")))
    results = [run_once(f"timed{i}") for i in range(reps)]

    def median():
        rs = sorted(results, key=lambda r: r[2])
        return rs[len(rs) // 2]

    # retry-on-low (VERDICT r3 item 7, re-gated per ADVICE r4): when the
    # median lands below a known internal reference for this config
    # (MIOTTS_BENCH_MIN_AGG, set by the orchestrator for the flagship), the
    # run MAY have caught a bad relay window.  A value-gated retry alone
    # resamples away only low-tail variance and biases the headline upward,
    # so retries additionally require the re-probed LINK to actually be
    # degraded (< MIOTTS_BENCH_DMA_FLOOR MB/s; healthy ~66): a low median
    # on a healthy link is a real result and is kept.  The pre-retry
    # unconditioned median always ships in the artifact
    # (agg_median_initial), with every rep in agg_all.
    med_initial = median()[2]
    min_agg = float(os.environ.get("MIOTTS_BENCH_MIN_AGG", "0"))
    dma_floor = float(os.environ.get("MIOTTS_BENCH_DMA_FLOOR", "55"))
    dma_all = [round(dma, 1)]
    extra = 0
    while min_agg > 0 and median()[2] < min_agg and extra < reps:
        d = dma_probe()
        dma_all.append(round(d, 1))
        if d >= dma_floor:
            print(f"bench_batch: median {median()[2]:.1f}x < {min_agg:.1f}x "
                  f"but link healthy ({d:.1f} MB/s >= {dma_floor:.0f}) — "
                  f"keeping the measured result", file=sys.stderr, flush=True)
            break
        print(f"bench_batch: median {median()[2]:.1f}x < {min_agg:.1f}x "
              f"reference on a degraded link ({d:.1f} MB/s) — extra rep "
              f"{extra + 1}", file=sys.stderr, flush=True)
        results.append(run_once(f"retry{extra}"))
        extra += 1

    wall, total_audio, agg, per_stream, ttfa_p50 = median()
    ttfa_med = sorted(r[4] for r in results)[len(results) // 2]

    print(json.dumps({
        "metric": "batch_bench.aggregate_x_realtime",
        "value": round(agg, 4),
        "unit": f"audio_sec/wall_sec@{n_streams}streams",
        "vs_baseline": round(per_stream, 4),
        "ttfa_p50_sec": round(ttfa_med, 4),
        "reps": len(results),
        "agg_all": [round(r[2], 2) for r in results],
        "agg_median_initial": round(med_initial, 4),
        "ttfa_all": [round(r[4], 3) for r in results],
        "dma_MBps": round(dma, 1),
        "dma_all": dma_all,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
