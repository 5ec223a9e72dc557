#!/usr/bin/env bash
# Round-3 measurement queue (VERDICT r2 items 2/4/6/7), priority-ordered:
# flagship-artifact validation first (default config, multi-rep), then the
# decode-kernel A/Bs, then the remaining single-stream ladder holes.
# Resumable (.done protocol, benchmarks/run_matrix_lib.sh); ONE TPU process
# at a time.  Defaults as of round 3: pack4 ON, serving i16+pipelined codec
# AUTO-ON (EngineConfig tri-state), bench_batch median-of-3 timed reps.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-benchmarks/matrix_r3}"
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

. benchmarks/run_matrix_lib.sh

# 1) flagship default config (what BENCH_r03 will record): 64x2.6B, no env
#    pins — packed weights, auto i16+pipe, first_commit=8
run batch_2.6b_64_default_r3 MIOTTS_BENCH_MODEL=2.6b-q4_k -- \
    python benchmarks/bench_batch.py 64 96

# 2) first-commit A/B at the flagship shape with median-of-5 reps
#    (VERDICT weak-6: the r2 A/B was inside noise; settle it)
run batch_2.6b_64_fc8_r5 MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_BENCH_REPS=5 \
    MIOTTS_FIRST_COMMIT=8 -- python benchmarks/bench_batch.py 64 96
run batch_2.6b_64_fc0_r5 MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_BENCH_REPS=5 \
    MIOTTS_FIRST_COMMIT=0 -- python benchmarks/bench_batch.py 64 96

# 3) decode-kernel A/B in the full model (kernel bench: groupdot LOST —
#    5.1 vs 4.0 ms/token — so the candidates are the split-x packed kernel
#    and bf16 scales, matrix_r3/qmat_r3.log)
run decode_2.6b_r3_base MIOTTS_BENCH_MODEL=2.6b-q4_k -- \
    python benchmarks/bench_decode.py 16 64 256
run decode_2.6b_r3_split MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_PACK4_SPLIT=1 -- \
    python benchmarks/bench_decode.py 16 64 256
run decode_2.6b_r3_split_sbf16 MIOTTS_BENCH_MODEL=2.6b-q4_k \
    MIOTTS_PACK4_SPLIT=1 MIOTTS_SCALE_BF16=1 -- \
    python benchmarks/bench_decode.py 16 64 256
run decode_2.6b_r3_sbf16 MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_SCALE_BF16=1 -- \
    python benchmarks/bench_decode.py 16 64 256
run decode_2.6b_r3_bf16dot MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_QDOT_BF16=1 -- \
    python benchmarks/bench_decode.py 16 64 256

# 4) 2.6B single stream with the winning decode config (fill in env after
#    phase 3 reads out; default-config run is the artifact candidate)
run single_2.6b_r3 MIOTTS_BENCH_MODEL=2.6b-q4_k -- python bench.py

# 5) remaining ladder holes (VERDICT item 6) + post-pack4 refresh
run single_0.6b_r3 MIOTTS_BENCH_MODEL=0.6b-q8_0 -- python bench.py
run single_1.7b_q6k_r3 MIOTTS_BENCH_MODEL=1.7b-q6_k -- python bench.py
run single_0.4b_r3 MIOTTS_BENCH_MODEL=0.4b-q4_k -- python bench.py
run single_1.2b_r3 MIOTTS_BENCH_MODEL=1.2b-q6_k -- python bench.py
run single_0.4b_512_full_r3 MIOTTS_BENCH_MODEL=0.4b-q4_k \
    MIOTTS_BENCH_TOKENS=512 -- python bench.py
run single_0.4b_512_win128_r3 MIOTTS_BENCH_MODEL=0.4b-q4_k \
    MIOTTS_BENCH_TOKENS=512 MIOTTS_STREAM_WINDOW=128 -- python bench.py

echo "done -> $OUT"
