#!/bin/bash
# Run the full TPU measurement batch (driver-style) once the tunnel is alive.
# Usage: bash tools/tpu_bench_all.sh [outfile]
set -u
OUT=${1:-BENCH_TPU_BATCH.jsonl}
cd "$(dirname "$0")/.."
echo "== $(date -u) tunnel probe" | tee -a "$OUT.log"
timeout 240 python -c "import jax; jax.devices()" || { echo "tunnel down"; exit 3; }
run() { echo "== $*" | tee -a "$OUT.log"; timeout 1800 "$@" 2>>"$OUT.log" | tail -1 | tee -a "$OUT"; }
run python bench.py
run env SUITE_BACKEND=tpu SUITE_MAXC=6 SUITE_SETTLE=150 python bench_suite.py mixer
run env SUITE_BACKEND=tpu SUITE_NSC_ENGINE=partner python bench_suite.py mixer_pencil
run env SUITE_BACKEND=tpu SUITE_NSC_ENGINE=pallas python bench_suite.py mixer_pencil
run env SUITE_BACKEND=tpu python bench_suite.py sph
run env SUITE_BACKEND=tpu python bench_suite.py mbs
run env SUITE_BACKEND=tpu python bench_suite.py crm
echo "== done $(date -u)" | tee -a "$OUT.log"
