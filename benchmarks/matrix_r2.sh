#!/usr/bin/env bash
# Round-2 serving measurement matrix — the round-1 "pending" list
# (VERDICT.md item 3) plus a cold-start probe (item 5).
# NEVER run two of these concurrently (single tunneled chip, CLAUDE.md).
# Usage: bash benchmarks/matrix_r2.sh [out_dir]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-benchmarks/matrix_r2}"
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

. benchmarks/run_matrix_lib.sh   # after the cd above: repo root

# Cold-start probe (VERDICT item 5): two fresh processes back to back at
# 0.1B with per-executable warmup timing; the second run measures what the
# persistent compile cache actually saves on this relay.
run coldstart_a MIOTTS_BENCH_MODEL=0.1b-q8_0 MIOTTS_WARMUP_VERBOSE=1 \
    JAX_LOG_COMPILES=1 JAX_EXPLAIN_CACHE_MISSES=1 -- python bench.py
run coldstart_b MIOTTS_BENCH_MODEL=0.1b-q8_0 MIOTTS_WARMUP_VERBOSE=1 \
    JAX_LOG_COMPILES=1 JAX_EXPLAIN_CACHE_MISSES=1 -- python bench.py

# single-stream ladder holes (0.6b lost to a relay stall; 1.7b never ran)
run single_0.6b-q8_0 MIOTTS_BENCH_MODEL=0.6b-q8_0 -- python bench.py
run single_1.7b-q6_k MIOTTS_BENCH_MODEL=1.7b-q6_k -- python bench.py

# batched serving: i16 transfers / pipelined codec at 64 streams on the
# current (attn-bucket) code; batch-row refreshes
run batch_2.6b_64_i16 MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_BENCH_I16=1 -- \
    python benchmarks/bench_batch.py 64 96
run batch_2.6b_64_i16_pipe MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_BENCH_I16=1 \
    MIOTTS_BENCH_PIPE=1 -- python benchmarks/bench_batch.py 64 96
run batch_0.1b_16 MIOTTS_BENCH_MODEL=0.1b-q8_0 -- \
    python benchmarks/bench_batch.py 16 96
run batch_1.2b_16 MIOTTS_BENCH_MODEL=1.2b-q6_k -- \
    python benchmarks/bench_batch.py 16 96

echo "done -> $OUT"
