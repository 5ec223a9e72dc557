#!/bin/bash
# Round-4 measurement queue, phase 1: W8A8 full-model decode ABAB at 2.6B.
#
# bench_decode's scan-internal marginal fit is the trusted decode metric
# (+-0.2% across processes, RESULTS.md round-3 meta-finding); ABAB
# alternation cancels relay drift.  One TPU process at a time.
set -u
cd "$(dirname "$0")/.."
OUT=benchmarks/matrix_r4
mkdir -p "$OUT"
export MIOTTS_BENCH_MODEL=2.6b-q4_k
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

run() { # tag, env...
  local tag=$1; shift
  local log="$OUT/decode_${tag}.log"
  if [ -f "$log.done" ]; then echo "skip $tag (done)"; return; fi
  echo "=== $tag ($(date +%H:%M:%S)) ==="
  env "$@" timeout 2400 python benchmarks/bench_decode.py 16 64 256 \
    > "$log" 2>&1
  local rc=$?
  echo "rc=$rc" >> "$log"
  [ $rc -eq 0 ] && touch "$log.done"
  grep -E "marginal|floor|rc=" "$log" | tail -3
}

run base_a  MIOTTS_DUMMY=0
run w8a8_a  MIOTTS_QDOT_GEMV=w8a8
run base_b  MIOTTS_DUMMY=0
run w8a8_b  MIOTTS_QDOT_GEMV=w8a8
echo "ABAB complete ($(date +%H:%M:%S))"
