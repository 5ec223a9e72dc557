#!/usr/bin/env bash
# Round-4 measurement queue, phase 3: speculative-decoding k sweep + 1.7B
# (the flagship k=6 point runs in matrix_r4b.sh phase 5).
set -u
cd "$(dirname "$0")/.."
OUT="${1:-benchmarks/matrix_r4}"
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

. benchmarks/run_matrix_lib.sh

run spec_2.6b_k4 MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_SPEC_K=4 -- \
    python benchmarks/bench_spec.py 128
run spec_2.6b_k8 MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_SPEC_K=8 -- \
    python benchmarks/bench_spec.py 128
run spec_1.7b_k6 MIOTTS_BENCH_MODEL=1.7b-q6_k MIOTTS_SPEC_K=6 -- \
    python benchmarks/bench_spec.py 128

# sampling cost vs batch (bench_step's surgery is argmax-only — the real
# chunk pays B x V threefry gumbels per step; rbg = hardware RNG control)
run sample_threefry MIOTTS_DUMMY=0 -- python benchmarks/bench_sample.py
run sample_rbg JAX_DEFAULT_PRNG_IMPL=rbg -- python benchmarks/bench_sample.py
echo "phase3 done -> $OUT"
