#!/usr/bin/env bash
# Round-4 measurement queue, phase 2 (run AFTER matrix_r4.sh's W8A8 ABAB):
# VERDICT r3 items 3/4/5 —
#   1) the thrice-stalled 1.2B single-stream row, FIRST (relay flakiness);
#   2) bench_step slot-scaling attribution at 64/96/128 (the per-stream
#      serving collapse at 128 slots is unattributed: T_step grows
#      26 -> 38 -> ~54 ms/step for 64/96/128 per the aggregate numbers);
#   3) serving A/Bs at 96 slots: same-session baseline, int8 KV, and
#      staggered sub-wave admission (admit_wave=16);
#   4) on-chip stream-vs-offline fidelity at 0.1B and 2.6B;
#   5) 512-token long-utterance ladder at 1.7B and 2.6B (full re-decode)
#      + window-128 re-judge at the large end.
# Resumable (.done protocol); ONE TPU process at a time.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-benchmarks/matrix_r4}"
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

. benchmarks/run_matrix_lib.sh

# 1) the 1.2B ladder hole (VERDICT r3 weak-3) — schedule first
run single_1.2b_r4 MIOTTS_BENCH_MODEL=1.2b-q6_k -- python bench.py

# 2) slot-scaling attribution (serving ctx: attn bucket 256)
run step_2.6b_b64 MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_BENCH_BATCH=64 \
    MIOTTS_BENCH_CTX=256 -- python benchmarks/bench_step.py 64
run step_2.6b_b96 MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_BENCH_BATCH=96 \
    MIOTTS_BENCH_CTX=256 -- python benchmarks/bench_step.py 64
run step_2.6b_b128 MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_BENCH_BATCH=128 \
    MIOTTS_BENCH_CTX=256 -- python benchmarks/bench_step.py 64

# 3) 96-slot serving A/Bs (same-session ordering; r3 96-slot baseline was
#    a different session)
run batch_2.6b_96_base_r4 MIOTTS_BENCH_MODEL=2.6b-q4_k \
    MIOTTS_BENCH_SLOTS=96 -- python benchmarks/bench_batch.py 96 96
run batch_2.6b_96_qkv_r4 MIOTTS_BENCH_MODEL=2.6b-q4_k \
    MIOTTS_BENCH_SLOTS=96 MIOTTS_BENCH_QKV=1 -- \
    python benchmarks/bench_batch.py 96 96
run batch_2.6b_96_wave16_r4 MIOTTS_BENCH_MODEL=2.6b-q4_k \
    MIOTTS_BENCH_SLOTS=96 MIOTTS_ADMIT_WAVE=16 -- \
    python benchmarks/bench_batch.py 96 96

# 4) on-chip fidelity (VERDICT r3 item 3)
run compare_0.1b_r4 MIOTTS_BENCH_MODEL=0.1b-q8_0 -- \
    python benchmarks/bench_compare.py
run compare_2.6b_r4 MIOTTS_BENCH_MODEL=2.6b-q4_k -- \
    python benchmarks/bench_compare.py

# 5) long-utterance ladder points (VERDICT r3 item 4)
run single_1.7b_512_r4 MIOTTS_BENCH_MODEL=1.7b-q6_k \
    MIOTTS_BENCH_TOKENS=512 -- python bench.py
run single_2.6b_512_r4 MIOTTS_BENCH_MODEL=2.6b-q4_k \
    MIOTTS_BENCH_TOKENS=512 -- python bench.py
run single_2.6b_512_win128_r4 MIOTTS_BENCH_MODEL=2.6b-q4_k \
    MIOTTS_BENCH_TOKENS=512 MIOTTS_STREAM_WINDOW=128 -- python bench.py

echo "done -> $OUT"

# 6) codec slot-scaling (stage data: codec_sync grows fastest with slots —
#    1.05 -> 2.0 -> 2.8 s at 64/96/128; attribute compute vs transfer)
run codec_b64 MIOTTS_BENCH_MODEL=2.6b-q4_k -- \
    python benchmarks/bench_codec.py 64 96
run codec_b96 MIOTTS_BENCH_MODEL=2.6b-q4_k -- \
    python benchmarks/bench_codec.py 96 96
run codec_b128 MIOTTS_BENCH_MODEL=2.6b-q4_k -- \
    python benchmarks/bench_codec.py 128 96
