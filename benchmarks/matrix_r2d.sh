#!/usr/bin/env bash
# Round-2 measurement queue, phase 4: inserts the scale-after-dot GEMV
# kernel A/B (ops/qmat.py _qdot_group_pallas) ahead of the remaining
# phase-3 entries, which follow in the original priority order.  Shares
# benchmarks/matrix_r2 and its .done markers with matrix_r2c.sh, so
# already-measured entries are skipped.  NEVER run two TPU benches at once.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-benchmarks/matrix_r2}"
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

. benchmarks/run_matrix_lib.sh

# 0) Kernel-level A/B: is the M=1 GEMV VPU-bound on the dequant multiply?
run qmat_variants -- python benchmarks/bench_qmat.py 128
# Decode-loop A/B with the group kernel live in the full model
run decode_2.6b_groupdot MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_QDOT_GROUPDOT=1 -- \
    python benchmarks/bench_decode.py 16 64 256
run decode_2.6b_groupdot_sbf16 MIOTTS_BENCH_MODEL=2.6b-q4_k \
    MIOTTS_QDOT_GROUPDOT=1 MIOTTS_SCALE_BF16=1 -- \
    python benchmarks/bench_decode.py 16 64 256
# Single-stream flagship effect
run single_2.6b_groupdot MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_QDOT_GROUPDOT=1 \
    MIOTTS_SCALE_BF16=1 -- python bench.py

# 1) Remaining phase-3 entries, original priority order
run decode_2.6b_both MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_SCALE_BF16=1 \
    MIOTTS_BENCH_QKV=1 -- python benchmarks/bench_decode.py 16 64 256
run batch_2.6b_64_fc_off MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_FIRST_COMMIT=0 -- \
    python benchmarks/bench_batch.py 64 96
run batch_2.6b_64_qkv MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_BENCH_QKV=1 -- \
    python benchmarks/bench_batch.py 64 96
run batch_2.6b_64_sbf16 MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_SCALE_BF16=1 -- \
    python benchmarks/bench_batch.py 64 96
run batch_2.6b_64_i16_pipe2 MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_BENCH_I16=1 \
    MIOTTS_BENCH_PIPE=1 -- python benchmarks/bench_batch.py 64 96
run single_0.6b-q8_0 MIOTTS_BENCH_MODEL=0.6b-q8_0 -- python bench.py
run single_1.7b-q6_k MIOTTS_BENCH_MODEL=1.7b-q6_k -- python bench.py
run single_0.4b_512_full MIOTTS_BENCH_MODEL=0.4b-q4_k MIOTTS_BENCH_TOKENS=512 -- \
    python bench.py
run single_0.4b_512_win128 MIOTTS_BENCH_MODEL=0.4b-q4_k MIOTTS_BENCH_TOKENS=512 \
    MIOTTS_STREAM_WINDOW=128 -- python bench.py
run batch_0.1b_16 MIOTTS_BENCH_MODEL=0.1b-q8_0 -- \
    python benchmarks/bench_batch.py 16 96
run batch_1.2b_16 MIOTTS_BENCH_MODEL=1.2b-q6_k -- \
    python benchmarks/bench_batch.py 16 96

echo "done -> $OUT"
