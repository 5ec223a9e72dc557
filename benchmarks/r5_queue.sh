#!/usr/bin/env bash
# Round-5 master queue: phases 1 -> 2 -> 3, resumable (.done protocol).
cd "$(dirname "$0")/.."
bash benchmarks/matrix_r5.sh
bash benchmarks/matrix_r5b.sh
bash benchmarks/matrix_r5c.sh
echo "r5 queue complete ($(date +%H:%M:%S))"
