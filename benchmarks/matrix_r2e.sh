#!/usr/bin/env bash
# Round-2 measurement queue, phase 5: pack4 re-evaluation.  bench_qmat
# (matrix_r2/qmat_variants.log) shows the nibble-packed kernel now BEATS
# the unpacked one at M=1 (3.97 vs 5.11 ms/token @2.6B kernel time, and
# the decode loop is ~96% kernel time), reversing the round-1 "net
# slower" verdict measured on the older kernel.  Validate in the full
# model, plus the fixed groupdot kernel and the remaining serving A/Bs.
# Shares benchmarks/matrix_r2 .done markers.  One TPU process at a time.
set -u
# NOTE (post-flip): pack4 became DEFAULT-ON at commit 97275d8, which makes
# MIOTTS_PACK4=1 a silent no-op below — every entry in this queue that ran
# after the flip (timestamps >= 2026-08-21 00:30) measured the PACKED
# default path, including batch_2.6b_64_i16_pipe2 (94.9x) and
# batch_2.6b_64_pack4 (80.7x): those two differ by MIOTTS_BENCH_PIPE, not
# by packing.  Future unpacked baselines must set MIOTTS_NO_PACK4=1.
cd "$(dirname "$0")/.."
OUT="${1:-benchmarks/matrix_r2}"
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

. benchmarks/run_matrix_lib.sh

# 1) pack4 in the decode loop (the VERDICT item-4 headline)
run decode_2.6b_pack4 MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_PACK4=1 -- \
    python benchmarks/bench_decode.py 16 64 256
run decode_2.6b_pack4_sbf16 MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_PACK4=1 \
    MIOTTS_SCALE_BF16=1 -- python benchmarks/bench_decode.py 16 64 256

# 2) 2.6B single-stream with the winning decode config
run single_2.6b_pack4_sbf16 MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_PACK4=1 \
    MIOTTS_SCALE_BF16=1 -- python bench.py

# 3) fixed groupdot kernel (arithmetic indicator, no i1 vectors)
run decode_2.6b_groupdot MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_QDOT_GROUPDOT=1 -- \
    python benchmarks/bench_decode.py 16 64 256

# 4) serving A/Bs: transfer/pipeline lever, then pack4 at 64 slots
run batch_2.6b_64_i16_pipe2 MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_BENCH_I16=1 \
    MIOTTS_BENCH_PIPE=1 -- python benchmarks/bench_batch.py 64 96
run batch_2.6b_64_pack4 MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_PACK4=1 \
    MIOTTS_BENCH_I16=1 -- python benchmarks/bench_batch.py 64 96
run batch_2.6b_64_qkv MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_BENCH_QKV=1 -- \
    python benchmarks/bench_batch.py 64 96

# 5) remaining ladder holes
run single_0.6b-q8_0 MIOTTS_BENCH_MODEL=0.6b-q8_0 -- python bench.py
run single_1.7b-q6_k MIOTTS_BENCH_MODEL=1.7b-q6_k -- python bench.py
run single_0.4b_512_full MIOTTS_BENCH_MODEL=0.4b-q4_k MIOTTS_BENCH_TOKENS=512 -- \
    python bench.py
run single_0.4b_512_win128 MIOTTS_BENCH_MODEL=0.4b-q4_k MIOTTS_BENCH_TOKENS=512 \
    MIOTTS_STREAM_WINDOW=128 -- python bench.py

echo "done -> $OUT"
