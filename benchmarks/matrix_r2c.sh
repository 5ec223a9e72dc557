#!/usr/bin/env bash
# Round-2 measurement queue, phase 3: prioritized remainder of the
# r2/r2b matrices for a fresh session (empty compile + model caches).
# Ordered so the highest-value numbers land first if the relay stalls
# eat the wall clock.  Same resumable .done protocol (run_matrix_lib.sh).
# NEVER run concurrently with another TPU bench (single tunneled chip).
set -u
cd "$(dirname "$0")/.."
OUT="${1:-benchmarks/matrix_r2}"
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

. benchmarks/run_matrix_lib.sh

# 1) The exact invocation the driver runs at round end: default bench.py
#    (flagship 64-stream 2.6B subprocess + 0.1B single-stream).  Validates
#    the refactored bench path and yields the first_commit=8 flagship
#    numbers (TTFA A/B side A).  Long timeout: flagship subprocess alone
#    is capped at 3300 s inside bench.py.
TMO=7200 run bench_default -- python bench.py

# 2) Decode-loop health A/Bs at 2.6B (VERDICT item 4): plain vs int8-KV
#    vs bf16-scales vs both.  bench_decode isolates marginal ms/token.
run decode_2.6b MIOTTS_BENCH_MODEL=2.6b-q4_k -- \
    python benchmarks/bench_decode.py 16 64 256
run decode_2.6b_qkv MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_BENCH_QKV=1 -- \
    python benchmarks/bench_decode.py 16 64 256
run decode_2.6b_sbf16 MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_SCALE_BF16=1 -- \
    python benchmarks/bench_decode.py 16 64 256
run decode_2.6b_both MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_SCALE_BF16=1 \
    MIOTTS_BENCH_QKV=1 -- python benchmarks/bench_decode.py 16 64 256

# 3) TTFA A/B side B: reference-uniform cadence (first-commit disabled).
run batch_2.6b_64_fc_off MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_FIRST_COMMIT=0 -- \
    python benchmarks/bench_batch.py 64 96

# 4) Serving A/Bs at 64 slots: int8 KV, bf16 scales, i16+pipelined codec.
run batch_2.6b_64_qkv MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_BENCH_QKV=1 -- \
    python benchmarks/bench_batch.py 64 96
run batch_2.6b_64_sbf16 MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_SCALE_BF16=1 -- \
    python benchmarks/bench_batch.py 64 96
run batch_2.6b_64_i16_pipe2 MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_BENCH_I16=1 \
    MIOTTS_BENCH_PIPE=1 -- python benchmarks/bench_batch.py 64 96

# 5) Single-stream ladder holes.
run single_0.6b-q8_0 MIOTTS_BENCH_MODEL=0.6b-q8_0 -- python bench.py
run single_1.7b-q6_k MIOTTS_BENCH_MODEL=1.7b-q6_k -- python bench.py

# 6) 512-token window rerun under chunk-buffered decode.
run single_0.4b_512_full MIOTTS_BENCH_MODEL=0.4b-q4_k MIOTTS_BENCH_TOKENS=512 -- \
    python bench.py
run single_0.4b_512_win128 MIOTTS_BENCH_MODEL=0.4b-q4_k MIOTTS_BENCH_TOKENS=512 \
    MIOTTS_STREAM_WINDOW=128 -- python bench.py

# 7) Batch-row refreshes at small/mid sizes.
run batch_0.1b_16 MIOTTS_BENCH_MODEL=0.1b-q8_0 -- \
    python benchmarks/bench_batch.py 16 96
run batch_1.2b_16 MIOTTS_BENCH_MODEL=1.2b-q6_k -- \
    python benchmarks/bench_batch.py 16 96

echo "done -> $OUT"
