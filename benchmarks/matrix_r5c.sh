#!/usr/bin/env bash
# Round-5 measurement queue, phase 3 (run AFTER matrix_r5b.sh): serving
# A/Bs at 96/128 slots for the round-5 attention levers (VERDICT r4
# item 2 "Done=" re-measurement) + the promised healthy-session int8-KV
# re-judge.  Same-session back-to-back ordering; TTFA per-rep spread is
# the relay-robust signal, aggregates carry the dma probe.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-benchmarks/matrix_r5}"
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export MIOTTS_BENCH_MODEL=2.6b-q4_k

. benchmarks/run_matrix_lib.sh

# 96 slots: base, int8-KV (healthy re-judge), best attention lever
run batch_96_base_r5 MIOTTS_BENCH_SLOTS=96 -- \
    python benchmarks/bench_batch.py 96 96
run batch_96_qkv_r5 MIOTTS_BENCH_SLOTS=96 MIOTTS_BENCH_QKV=1 -- \
    python benchmarks/bench_batch.py 96 96
run batch_96_bkern_qkv_r5 MIOTTS_BENCH_SLOTS=96 MIOTTS_BENCH_QKV=1 \
    MIOTTS_ATTN_BKERNEL=1 -- python benchmarks/bench_batch.py 96 96
run batch_96_nocat_r5 MIOTTS_BENCH_SLOTS=96 MIOTTS_ATTN_NOCAT=1 -- \
    python benchmarks/bench_batch.py 96 96

# 128 slots: the per-stream >=1x target shape
run batch_128_base_r5 MIOTTS_BENCH_SLOTS=128 -- \
    python benchmarks/bench_batch.py 128 96
run batch_128_qkv_r5 MIOTTS_BENCH_SLOTS=128 MIOTTS_BENCH_QKV=1 -- \
    python benchmarks/bench_batch.py 128 96
run batch_128_bkern_qkv_r5 MIOTTS_BENCH_SLOTS=128 MIOTTS_BENCH_QKV=1 \
    MIOTTS_ATTN_BKERNEL=1 -- python benchmarks/bench_batch.py 128 96

echo "phase3 done -> $OUT"
