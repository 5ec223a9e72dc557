#!/usr/bin/env python3
"""Speculative-decoding mechanics bench: draft-propose / target-verify on
the real chip.

With synthetic weights the draft/target AGREEMENT is meaningless (random
models), so this bench separates what is honestly measurable here from
what needs real checkpoints:
  * measurable: the plain decode rate, the spec round time (k draft steps
    + one M=k+1 target verify + acceptance), and therefore the full
    speedup CURVE tok_s(alpha) = (E_tokens(alpha)) / T_round as a function
    of the acceptance rate alpha — plus the measured (synthetic-agreement)
    acceptance as a lower-bound sanity point.
  * needs real checkpoints: where MioTTS-0.1B-drafting-2.6B actually lands
    on that curve (speech-token streams are highly regular, so published
    spec-decode acceptance for in-family drafts is typically 0.6-0.9).

The measured synthetic acceptance is additionally depressed by the chip's
M=1-vs-M>1 matmul precision asymmetry (RESULTS.md round-4 note): random
weights make near-tie argmaxes dense, so ~1%-scale logit differences
between the draft's M=1 path and the verify's M=k+1 path flip often.

Usage: python benchmarks/bench_spec.py [max_tokens]
Env: MIOTTS_BENCH_MODEL (target, default 2.6b-q4_k), MIOTTS_SPEC_DRAFT
(default 0.1b-q8_0), MIOTTS_SPEC_K (default 6).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("MIOTTS_BENCH_MODEL", "2.6b-q4_k")

import numpy as np


def main() -> int:
    max_tokens = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    draft_name = os.environ.get("MIOTTS_SPEC_DRAFT", "0.1b-q8_0")
    k_spec = int(os.environ.get("MIOTTS_SPEC_K", "6"))

    import bench as benchmod
    llm_path, codec_path, emb_path = benchmod.ensure_models()
    draft_path, _, _ = benchmod.ensure_models(draft_name)

    from miotts_tpu.runtime.engine import EngineConfig, Options, TTSEngine

    def timed_decode(engine, tag, reps=3):
        """Best-of-N greedy generation; returns (tok_s, llm_sec, n_tokens,
        stats).  Greedy so plain and spec walk the same token path."""
        from miotts_tpu.runtime.profile import StreamProfile
        opts = Options(max_tokens=max_tokens, temperature=0.0, seed=42)
        best = None
        for i in range(reps):
            p = StreamProfile()
            t0 = time.perf_counter()
            toks = engine.generate_tokens(
                "speculative benchmark utterance", opts, profile=p)
            wall = time.perf_counter() - t0
            rate = len(toks) / p.llm_sec if p.llm_sec > 0 else 0.0
            print(f"bench_spec[{tag}{i}]: {len(toks)} tok in {wall:.2f}s "
                  f"(llm {p.llm_sec:.2f}s, {rate:.1f} tok/s)",
                  file=sys.stderr, flush=True)
            if best is None or rate > best[0]:
                best = (rate, p.llm_sec, len(toks),
                        dict(engine._spec_stats or {}))
        return best

    print(f"bench_spec: target={os.environ['MIOTTS_BENCH_MODEL']} "
          f"draft={draft_name} k={k_spec}", file=sys.stderr, flush=True)

    plain = TTSEngine(EngineConfig(model_path=llm_path,
                                   codec_path=codec_path,
                                   max_tokens=max_tokens))
    timed_decode(plain, "plain-warm", reps=1)
    plain_rate, _, _, _ = timed_decode(plain, "plain")
    del plain

    spec = TTSEngine(EngineConfig(model_path=llm_path, codec_path=codec_path,
                                  draft_model_path=draft_path,
                                  spec_tokens=k_spec,
                                  max_tokens=max_tokens))
    timed_decode(spec, "spec-warm", reps=1)
    spec_rate, llm_sec, n_tok, st = timed_decode(spec, "spec")

    rounds = max(1, st.get("rounds", 1))
    t_round = llm_sec / rounds
    accept = st.get("accepted", 0) / max(1, st.get("drafted", 1))
    # tokens per round at per-position acceptance alpha:
    # E = sum_{i=1..k} alpha^i (accepted prefix) + 1 (corrective/bonus)
    curve = {}
    for alpha in (0.5, 0.7, 0.9, 1.0):
        e_tok = sum(alpha ** i for i in range(1, k_spec + 1)) + 1.0
        curve[f"tok_s@a{alpha}"] = round(e_tok / t_round, 1)

    print(f"bench_spec: plain {plain_rate:.1f} tok/s | spec {spec_rate:.1f} "
          f"tok/s at measured accept={accept:.3f} (synthetic agreement) | "
          f"round {t_round * 1e3:.1f} ms -> {curve}",
          file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": "spec_bench.decode_tok_s",
        "value": round(spec_rate, 1),
        "unit": f"tok/s@k{k_spec}",
        "vs_baseline": round(spec_rate / plain_rate, 3) if plain_rate else 0,
        "plain_tok_s": round(plain_rate, 1),
        "accept_rate_synthetic": round(accept, 4),
        "round_ms": round(t_round * 1e3, 2),
        "curve": curve,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
