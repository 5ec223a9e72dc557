#!/usr/bin/env bash
# Round-4 measurement queue, phase 2 (run AFTER matrix_r4.sh's W8A8 ABAB):
# VERDICT r3 items 3/4/5 + round-4 spec-decode mechanics, priority-ordered
# so an early round end cuts the least important tail.  Resumable (.done
# protocol); ONE TPU process at a time.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-benchmarks/matrix_r4}"
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

. benchmarks/run_matrix_lib.sh

# 1) the 1.2B ladder hole (VERDICT r3 weak-3) — schedule first
run single_1.2b_r4 MIOTTS_BENCH_MODEL=1.2b-q6_k -- python bench.py

# 2) batched-LLM slot-scaling attribution (serving attn bucket 256; the
#    per-stream serving collapse 1.53x/1.06x/0.74x at 64/96/128 slots is
#    unattributed)
run step_2.6b_b64 MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_BENCH_BATCH=64 \
    MIOTTS_BENCH_CTX=256 -- python benchmarks/bench_step.py 64
run step_2.6b_b96 MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_BENCH_BATCH=96 \
    MIOTTS_BENCH_CTX=256 -- python benchmarks/bench_step.py 64
run step_2.6b_b128 MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_BENCH_BATCH=128 \
    MIOTTS_BENCH_CTX=256 -- python benchmarks/bench_step.py 64

# 3) codec slot-scaling (stage data: codec_sync grows fastest with slots —
#    1.05 -> 2.0 -> 2.8 s at 64/96/128; attribute compute vs transfer)
run codec_b64 MIOTTS_BENCH_MODEL=2.6b-q4_k -- \
    python benchmarks/bench_codec.py 64 96
run codec_b96 MIOTTS_BENCH_MODEL=2.6b-q4_k -- \
    python benchmarks/bench_codec.py 96 96
run codec_b128 MIOTTS_BENCH_MODEL=2.6b-q4_k -- \
    python benchmarks/bench_codec.py 128 96

# 4) 96-slot serving A/Bs (same-session ordering; r3 96-slot baseline was
#    a different session)
run batch_2.6b_96_base_r4 MIOTTS_BENCH_MODEL=2.6b-q4_k \
    MIOTTS_BENCH_SLOTS=96 -- python benchmarks/bench_batch.py 96 96
run batch_2.6b_96_qkv_r4 MIOTTS_BENCH_MODEL=2.6b-q4_k \
    MIOTTS_BENCH_SLOTS=96 MIOTTS_BENCH_QKV=1 -- \
    python benchmarks/bench_batch.py 96 96
run batch_2.6b_96_wave16_r4 MIOTTS_BENCH_MODEL=2.6b-q4_k \
    MIOTTS_BENCH_SLOTS=96 MIOTTS_ADMIT_WAVE=16 -- \
    python benchmarks/bench_batch.py 96 96

# 5) speculative-decoding mechanics at the flagship model (the k sweep and
#    1.7B live in matrix_r4c.sh)
run spec_2.6b_k6 MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_SPEC_K=6 -- \
    python benchmarks/bench_spec.py 128

# 6) on-chip fidelity (VERDICT r3 item 3)
run compare_0.1b_r4 MIOTTS_BENCH_MODEL=0.1b-q8_0 -- \
    python benchmarks/bench_compare.py
run compare_2.6b_r4 MIOTTS_BENCH_MODEL=2.6b-q4_k -- \
    python benchmarks/bench_compare.py

# 7) long-utterance ladder points (VERDICT r3 item 4) — slowest, last
run single_1.7b_512_r4 MIOTTS_BENCH_MODEL=1.7b-q6_k \
    MIOTTS_BENCH_TOKENS=512 -- python bench.py
run single_2.6b_512_r4 MIOTTS_BENCH_MODEL=2.6b-q4_k \
    MIOTTS_BENCH_TOKENS=512 -- python bench.py
run single_2.6b_512_win128_r4 MIOTTS_BENCH_MODEL=2.6b-q4_k \
    MIOTTS_BENCH_TOKENS=512 MIOTTS_STREAM_WINDOW=128 -- python bench.py

echo "phase2 done -> $OUT"
