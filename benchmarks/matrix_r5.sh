#!/usr/bin/env bash
# Round-5 measurement queue, phase 1 (VERDICT r4 items 4 + 6) — entries
# that need NO default-affecting code changes, so they run while round-5
# code work proceeds.  Priority order: the 1.2B ladder hole FIRST (five
# failed attempts across rounds — beat the relay's flaky window), then the
# in-session 2.6B@512 window-vs-full pair (the r4 hand-skipped re-judge),
# then the 2.6B wire fidelity row (missing from r4), then the serve-rmse
# holdback sweep at 0.1B/512 tokens (receptive-field attribution test).
# Resumable (.done protocol); ONE TPU process at a time.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-benchmarks/matrix_r5}"
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

. benchmarks/run_matrix_lib.sh

# 1) the 1.2B ladder hole (VERDICT r4 weak-5 / next-6): FIRST
run single_1.2b_r5 MIOTTS_BENCH_MODEL=1.2b-q6_k -- python bench.py

# 2) 2.6B@512 window-vs-full re-judgement, back-to-back same session
#    (r4 skipped-for-time; r3's 0.4B verdict was window LOSES at 512)
run single_2.6b_512_full_r5 MIOTTS_BENCH_MODEL=2.6b-q4_k \
    MIOTTS_BENCH_TOKENS=512 -- python bench.py
run single_2.6b_512_win128_r5 MIOTTS_BENCH_MODEL=2.6b-q4_k \
    MIOTTS_BENCH_TOKENS=512 MIOTTS_STREAM_WINDOW=128 -- python bench.py

# 3) the 2.6B wire fidelity row (VERDICT r4 weak-3: wire only ever
#    measured at 0.1B; r4's 2.6B log predates the wire config)
run compare_2.6b_r5 MIOTTS_BENCH_MODEL=2.6b-q4_k -- \
    python benchmarks/bench_compare.py

# 4) serve-rmse holdback sweep at 0.1B, 512 tokens (codes are
#    holdback-independent at fixed seed, so points share the utterance;
#    the receptive-field hypothesis predicts collapse past ~192 codes)
for H in 32 96 160 224 288; do
  run compare_0.1b_hb${H}_r5 MIOTTS_BENCH_MODEL=0.1b-q8_0 \
      MIOTTS_BENCH_TOKENS=512 MIOTTS_HOLDBACK=$H -- \
      python benchmarks/bench_compare.py
done

echo "phase1 done -> $OUT"
