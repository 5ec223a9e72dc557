#!/usr/bin/env bash
# Remaining pending measurements from RESULTS.md (round-1 relay-outage list).
# Sequential — NEVER run concurrently with another TPU bench (CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
OUT="${1:-benchmarks/matrix_r1c}"
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

run() {
    local name="$1"; shift
    local envs=()
    while [ "$1" != "--" ]; do envs+=("$1"); shift; done
    shift
    echo "=== $name ==="
    env "${envs[@]}" timeout 2400 "$@" >"$OUT/$name.log" 2>&1
    echo "--- $name: $(tail -1 "$OUT/$name.log")"
}

# int8-quantized KV at the north-star serving shape
run batch_2.6b_64_qkv MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_BENCH_QKV=1 \
    MIOTTS_BENCH_I16=1 -- python benchmarks/bench_batch.py 64 96
# 512-token sliding-window rerun under the chunk-buffered decode
run window_0.4b_512 MIOTTS_BENCH_MODEL=0.4b-q4_k MIOTTS_BENCH_TOKENS=512 \
    MIOTTS_STREAM_WINDOW=128 -- python bench.py
# single-stream ladder fill-in
run single_0.6b MIOTTS_BENCH_MODEL=0.6b-q8_0 -- python bench.py
run single_1.7b MIOTTS_BENCH_MODEL=1.7b-q6_k -- python bench.py
# batch-row refresh on the chunk-buffered path
run batch_0.1b_16 MIOTTS_BENCH_MODEL=0.1b-q8_0 MIOTTS_BENCH_I16=1 -- \
    python benchmarks/bench_batch.py 16 96
run batch_1.2b_16 MIOTTS_BENCH_MODEL=1.2b-q6_k MIOTTS_BENCH_I16=1 -- \
    python benchmarks/bench_batch.py 16 96
echo "done -> $OUT"
