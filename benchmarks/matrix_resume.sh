#!/usr/bin/env bash
# Resume of run_matrix.sh after the verify interruption (same out dir).
set -u
cd "$(dirname "$0")/.."
OUT="${1:-benchmarks/matrix_0819b}"
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

run() {
    local name="$1"; shift
    local envs=()
    while [ "$1" != "--" ]; do envs+=("$1"); shift; done
    shift
    echo "=== $name ==="
    env "${envs[@]}" timeout 3600 "$@" >"$OUT/$name.log" 2>&1
    echo "--- $name: $(tail -1 "$OUT/$name.log")"
}

for m in 0.6b-q8_0 1.2b-q6_k 1.7b-q6_k 2.6b-q4_k; do
    run "single_$m" MIOTTS_BENCH_MODEL=$m -- python bench.py
done
run batch_2.6b_64 MIOTTS_BENCH_MODEL=2.6b-q4_k -- \
    python benchmarks/bench_batch.py 64 96
run batch_2.6b_64_i16 MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_BENCH_I16=1 -- \
    python benchmarks/bench_batch.py 64 96
run batch_2.6b_64_i16_pipe MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_BENCH_I16=1 \
    MIOTTS_BENCH_PIPE=1 -- python benchmarks/bench_batch.py 64 96
run batch_0.1b_16 MIOTTS_BENCH_MODEL=0.1b-q8_0 -- \
    python benchmarks/bench_batch.py 16 96
run batch_1.2b_16 MIOTTS_BENCH_MODEL=1.2b-q6_k -- \
    python benchmarks/bench_batch.py 16 96
run batch_2.6b_64_qkv MIOTTS_BENCH_MODEL=2.6b-q4_k MIOTTS_BENCH_QKV=1 \
    MIOTTS_BENCH_I16=1 -- python benchmarks/bench_batch.py 64 96
run window_0.4b_512 MIOTTS_BENCH_MODEL=0.4b-q4_k MIOTTS_BENCH_TOKENS=512 \
    MIOTTS_STREAM_WINDOW=128 -- python bench.py
echo "done -> $OUT"
