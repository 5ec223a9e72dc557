#!/usr/bin/env bash
# Round-5 RESCUE queue (session restart wiped .jax_cache and the
# matrix_r5 logs).  Deadline-aware: every entry's timeout is clamped to
# the global deadline so the queue is guaranteed dead before the
# driver's end-of-round bench window (CLAUDE.md: round-2's orphan queue
# contaminated round-3 measurements — never again).
#
# Priority = value-per-compile-hour with the SCOREBOARD first:
#   1. warm the driver's exact bench.py executables (flagship 64-stream
#      2.6b serving, 0.1b single-stream, 0.1b fidelity@96) — a cold
#      flagship inside the driver's ~3600 s window records garbage;
#   2. the round-5 spec-e2e pipelined follow-ups (the measured ~3 ms/tok
#      wrapper floor is the thing rounds 5's dp2+pipe levers attack);
#   3. serving A/Bs for the round-5 attention levers (int8-KV + nocat);
#   4. the 1.2B ladder hole (attempt 8).
set -u
cd "$(dirname "$0")/.."
OUT="${1:-benchmarks/matrix_r5}"
DEADLINE_S="${2:-2700}"
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
DEADLINE=$(( $(date +%s) + DEADLINE_S ))

run() {  # run <name> <env...> -- <cmd...>
    local name="$1"; shift
    local envs=()
    while [ "$1" != "--" ]; do envs+=("$1"); shift; done
    shift
    if [ -s "$OUT/$name.done" ]; then echo "=== $name (cached)"; return; fi
    local rem=$(( DEADLINE - $(date +%s) ))
    if [ "$rem" -lt 300 ]; then echo "=== $name SKIPPED (deadline)"; return; fi
    echo "=== $name (t-${rem}s $(date +%H:%M:%S)) ==="
    env "${envs[@]}" timeout -k 30 "$rem" "$@" >"$OUT/$name.log" 2>&1
    local rc=$?
    echo "--- $name: rc=$rc $(tail -1 "$OUT/$name.log")"
    [ $rc -eq 0 ] && echo ok >"$OUT/$name.done"
}

# 1) scoreboard warm (exact driver configs)
run batch_64_warm_r5 MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_BENCH_MIN_AGG=88 -- \
    python benchmarks/bench_batch.py 64 96
run single_0.1b_warm_r5 MIOTTS_BENCH_MODEL=0.1b-q8_0 -- python bench.py
run fidelity_0.1b_96_r5 MIOTTS_BENCH_MODEL=0.1b-q8_0 MIOTTS_BENCH_TOKENS=96 -- \
    python benchmarks/bench_compare.py

# 2) spec e2e with round-5 wrapper levers (dp2 pipelining is default in
#    the spec loop now; pipe adds deferred codec materialization)
run spec_e2e_2.6b_p0.9_pipe MIOTTS_BENCH_MODEL=2.6b-q4_k \
    MIOTTS_BENCH_DRAFT=0.1b-q8_0 MIOTTS_SPEC_K=6 \
    MIOTTS_SPEC_FORCE_ACCEPT=0.9 MIOTTS_BENCH_PIPE=1 -- python bench.py
run spec_e2e_2.6b_p0.7_pipe MIOTTS_BENCH_MODEL=2.6b-q4_k \
    MIOTTS_BENCH_DRAFT=0.1b-q8_0 MIOTTS_SPEC_K=6 \
    MIOTTS_SPEC_FORCE_ACCEPT=0.7 MIOTTS_BENCH_PIPE=1 -- python bench.py

# 3) serving A/Bs for the attention levers (same-session pairs)
run batch_96_base_r5 MIOTTS_BENCH_MODEL=2.6b-q4_k -- \
    python benchmarks/bench_batch.py 96 96
run batch_96_qkv_nocat_r5 MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_BENCH_QKV=1 \
    MIOTTS_ATTN_NOCAT=1 -- python benchmarks/bench_batch.py 96 96
run batch_128_base_r5 MIOTTS_BENCH_MODEL=2.6b-q4_k -- \
    python benchmarks/bench_batch.py 128 96
run batch_128_qkv_nocat_r5 MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_BENCH_QKV=1 \
    MIOTTS_ATTN_NOCAT=1 -- python benchmarks/bench_batch.py 128 96

# 4) the 1.2B ladder hole (attempt 8)
run single_1.2b_r5 MIOTTS_BENCH_MODEL=1.2b-q6_k -- python bench.py

echo "rescue queue complete ($(date +%H:%M:%S))"
