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

run() {
    local name="$1"; shift
    local envs=()
    while [ "$1" != "--" ]; do envs+=("$1"); shift; done
    shift
    if [ -s "$OUT/$name.done" ]; then echo "=== $name (cached)"; return; fi
    echo "=== $name ==="
    env "${envs[@]}" timeout 3600 "$@" >"$OUT/$name.log" 2>&1
    local rc=$?
    echo "--- $name: rc=$rc $(tail -1 "$OUT/$name.log")"
    [ $rc -eq 0 ] && echo ok >"$OUT/$name.done"
}

# TTFA A/B at the flagship shape: first_commit_codes=8 (default) vs the
# reference-uniform cadence (MIOTTS_FIRST_COMMIT=0 disables).
run batch_2.6b_64_fc8 MIOTTS_BENCH_MODEL=2.6b-q4_k -- \
    python benchmarks/bench_batch.py 64 96
run batch_2.6b_64_fc_off MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_FIRST_COMMIT=0 -- \
    python benchmarks/bench_batch.py 64 96

# int8 KV at 64 slots (pending since r1)
run batch_2.6b_64_qkv MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_BENCH_QKV=1 -- \
    python benchmarks/bench_batch.py 64 96

# 512-token window rerun under chunk-buffered decode (pending since r1)
run single_0.4b_512_full MIOTTS_BENCH_MODEL=0.4b-q4_k MIOTTS_BENCH_TOKENS=512 -- \
    python bench.py
run single_0.4b_512_win128 MIOTTS_BENCH_MODEL=0.4b-q4_k MIOTTS_BENCH_TOKENS=512 \
    MIOTTS_STREAM_WINDOW=128 -- python bench.py

echo "done -> $OUT"
