#!/bin/bash
# Sequential TPU jobs for the round (single-process TPU: strictly one at a
# time). Run from the repo root when the axon tunnel is up:
#   bash tools/chip_jobs.sh [outdir]
# Each step appends to $OUT/<job>.log; summary at the end.
set -u
OUT=${1:-/tmp/chip_jobs}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 5400 "$@" >"$OUT/$name.log" 2>&1
  echo "--- $name exit=$? tail:"
  tail -5 "$OUT/$name.log"
}

run bench        python bench.py
run rtiming      python -m tools.rasterizer_timing --ablate
run parity512    python -m tools.golden_parity_512
run feasibility  python -m tools.release_feasibility --steps 3
run feasbf16     python -m tools.release_feasibility --steps 3 --bf16
run cascade      python -m gaussiananything_tpu.cli.sample --release --full \
                   --mesh --num 2 --out /tmp/cascade_jobs
run cascadebf16  python -m gaussiananything_tpu.cli.sample --release --full \
                   --mesh --bf16 --num 2 --out /tmp/cascade_jobs_bf16

echo "=== done; logs in $OUT ==="
