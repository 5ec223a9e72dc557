#!/usr/bin/env bash
# Round-4 measurement queue, phase 3: serving-chunk slot scaling (the
# decisive T_step(B) attribution — the real executable, sampling included),
# sampling-cost isolation, then the speculative-decoding k sweep.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-benchmarks/matrix_r4}"
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

. benchmarks/run_matrix_lib.sh

# the real serving chunk at 64/96/128 slots (+ int8-KV variant)
run chunk_2.6b MIOTTS_BENCH_MODEL=2.6b-q4_k -- \
    python benchmarks/bench_chunk.py 512 256
run chunk_2.6b_qkv MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_BENCH_QKV=1 -- \
    python benchmarks/bench_chunk.py 512 256

# sampling cost vs batch (bench_step's surgery is argmax-only — the real
# chunk pays B x V threefry gumbels per step; rbg = hardware RNG control)
run sample_threefry MIOTTS_DUMMY=0 -- python benchmarks/bench_sample.py
run sample_rbg JAX_DEFAULT_PRNG_IMPL=rbg -- python benchmarks/bench_sample.py

# speculative-decoding k sweep + 1.7B
run spec_2.6b_k4 MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_SPEC_K=4 -- \
    python benchmarks/bench_spec.py 128
run spec_2.6b_k8 MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_SPEC_K=8 -- \
    python benchmarks/bench_spec.py 128
run spec_1.7b_k6 MIOTTS_BENCH_MODEL=1.7b-q6_k MIOTTS_SPEC_K=6 -- \
    python benchmarks/bench_spec.py 128

echo "phase3 done -> $OUT"
