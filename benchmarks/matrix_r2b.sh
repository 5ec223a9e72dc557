#!/usr/bin/env bash
# Round-2 measurement matrix, phase 2: the remaining round-1 "pending"
# items (int8-KV serving, 512-token window rerun) plus round-2 A/Bs
# (first-commit TTFA at 64 streams).  Same resumable .done protocol as
# matrix_r2.sh.  NEVER run concurrently with another TPU bench.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-benchmarks/matrix_r2}"
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

. benchmarks/run_matrix_lib.sh   # after the cd above: repo root

# retry: 1.7B single-stream (phase-1 run lost to a >1h relay stall)
run single_1.7b-q6_k_r MIOTTS_BENCH_MODEL=1.7b-q6_k -- python bench.py

# TTFA A/B at the flagship shape: first_commit_codes=8 (default) vs the
# reference-uniform cadence (MIOTTS_FIRST_COMMIT=0 disables).
run batch_2.6b_64_fc8 MIOTTS_BENCH_MODEL=2.6b-q4_k -- \
    python benchmarks/bench_batch.py 64 96
run batch_2.6b_64_fc_off MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_FIRST_COMMIT=0 -- \
    python benchmarks/bench_batch.py 64 96

# int8 KV at 64 slots (pending since r1)
run batch_2.6b_64_qkv MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_BENCH_QKV=1 -- \
    python benchmarks/bench_batch.py 64 96

# bf16 group scales at 64 slots (+5% on single-stream in r1; serving A/B)
run batch_2.6b_64_sbf16 MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_SCALE_BF16=1 -- \
    python benchmarks/bench_batch.py 64 96

# i16+pipe rerun with the first-commit-sync fix (phase-1 pipe run deferred
# the first commit by a whole check interval -> ttfa 1.32 s)
run batch_2.6b_64_i16_pipe2 MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_BENCH_I16=1 \
    MIOTTS_BENCH_PIPE=1 -- python benchmarks/bench_batch.py 64 96

# decode-loop health at 2.6B: plain vs int8-KV vs bf16-scales vs both
run decode_2.6b MIOTTS_BENCH_MODEL=2.6b-q4_k -- \
    python benchmarks/bench_decode.py 16 64 256
run decode_2.6b_qkv MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_BENCH_QKV=1 -- \
    python benchmarks/bench_decode.py 16 64 256
run decode_2.6b_sbf16 MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_SCALE_BF16=1 -- \
    python benchmarks/bench_decode.py 16 64 256
run decode_2.6b_both MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_SCALE_BF16=1 \
    MIOTTS_BENCH_QKV=1 -- python benchmarks/bench_decode.py 16 64 256

# 512-token window rerun under chunk-buffered decode (pending since r1)
run single_0.4b_512_full MIOTTS_BENCH_MODEL=0.4b-q4_k MIOTTS_BENCH_TOKENS=512 -- \
    python bench.py
run single_0.4b_512_win128 MIOTTS_BENCH_MODEL=0.4b-q4_k MIOTTS_BENCH_TOKENS=512 \
    MIOTTS_STREAM_WINDOW=128 -- python bench.py

echo "done -> $OUT"
