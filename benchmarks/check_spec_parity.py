#!/usr/bin/env python3
"""Greedy spec-vs-plain token parity ON THE REAL TPU.

CPU parity is token-exact (tests/test_spec_decode.py); on TPU the M=1
decode GEMV historically computed its f32 dot at effectively-bf16 MXU
precision while the M=k+1 verify got the exact multi-pass f32 emulation,
so near-tie argmaxes could flip between paths (RESULTS.md round 4) and
strict greedy parity only held on CPU.  MIOTTS_GEMV_M8=1 routes M=1
through the same 8-row M-tile — with it, this check is expected to report
EXACT parity on hardware (VERDICT r4 item 5).

Run twice (with/without MIOTTS_GEMV_M8) via benchmarks/matrix_r5b.sh.

Usage: python benchmarks/check_spec_parity.py [max_tokens]
Env: MIOTTS_BENCH_MODEL (target), MIOTTS_BENCH_DRAFT (default 0.1b-q8_0),
     MIOTTS_GEMV_M8, MIOTTS_SPEC_K.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("MIOTTS_BENCH_MODEL", "0.4b-q4_k")


def main() -> int:
    max_tokens = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    from bench import ensure_models
    llm_path, codec_path, emb_path = ensure_models()
    draft = os.environ.get("MIOTTS_BENCH_DRAFT", "0.1b-q8_0")
    draft_path = ensure_models(draft)[0]

    from miotts_tpu.runtime.engine import EngineConfig, Options, TTSEngine

    text = "greedy speculative parity check on hardware"
    opts = Options(max_tokens=max_tokens, temperature=0.0, seed=42)

    plain = TTSEngine(EngineConfig(model_path=llm_path,
                                   codec_path=codec_path))
    want = plain.generate_tokens(text, opts)
    del plain

    spec = TTSEngine(EngineConfig(
        model_path=llm_path, codec_path=codec_path,
        draft_model_path=draft_path,
        spec_tokens=int(os.environ.get("MIOTTS_SPEC_K", "6"))))
    got = spec.generate_tokens(text, opts)
    st = spec._spec_stats

    first_div = next((i for i, (a, b) in enumerate(zip(want, got))
                      if a != b), -1)
    exact = want == got
    print(json.dumps({
        "metric": "spec_parity.greedy_exact",
        "value": 1.0 if exact else 0.0,
        "unit": "bool",
        "vs_baseline": 1.0,
        "model": os.environ.get("MIOTTS_BENCH_MODEL"),
        "gemv_m8": os.environ.get("MIOTTS_GEMV_M8", ""),
        "n_plain": len(want), "n_spec": len(got),
        "first_divergence": first_div,
        "acceptance": round(st["accepted"] / max(1, st["drafted"]), 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
