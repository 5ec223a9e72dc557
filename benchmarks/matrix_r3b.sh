#!/usr/bin/env bash
# Round-3 stretch queue (run AFTER matrix_r3.sh): beyond-parity serving
# scale on one chip — higher stream counts at the landed defaults, int8-KV
# with the pipelined codec, and a 128-slot density probe.  KV at 128 slots:
# 32L x 8 kvh x 80 hd x ~640 ctx x 2B x 2 x 128 ~= 3.3 GB on a 16 GB chip.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-benchmarks/matrix_r3}"
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

. benchmarks/run_matrix_lib.sh

run batch_2.6b_96 MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_BENCH_SLOTS=96 -- \
    python benchmarks/bench_batch.py 96 96
run batch_2.6b_128 MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_BENCH_SLOTS=128 -- \
    python benchmarks/bench_batch.py 128 96
run batch_2.6b_64_qkv_pipe MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_BENCH_QKV=1 -- \
    python benchmarks/bench_batch.py 64 96
run batch_0.1b_64 MIOTTS_BENCH_MODEL=0.1b-q8_0 -- \
    python benchmarks/bench_batch.py 64 96
run batch_1.2b_64 MIOTTS_BENCH_MODEL=1.2b-q6_k -- \
    python benchmarks/bench_batch.py 64 96

echo "done -> $OUT"
