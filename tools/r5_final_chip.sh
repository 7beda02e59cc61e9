#!/bin/bash
# Round-5 end-of-round chip session, back-to-back (run AFTER the FM run
# frees the chip): DMA-variant A/B + parity gate, prepare-phase
# decomposition, fused-path cascade re-measure, final bench.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r5_final

echo "=== 1. v4 sweep incl. DMA variant (pass/fail gated) ==="
timeout 2400 python -m tools.v4_sweep 2>&1 | grep -v WARNING \
    | tee /tmp/r5_final/sweep.log

echo "=== 2. prepare-phase decomposition ==="
timeout 1800 python -m tools.v4_probe ABCEFD 2>&1 | grep -v WARNING \
    | tee /tmp/r5_final/probe.log

echo "=== 3. full release cascade on the fused decode path ==="
timeout 3000 python -m gaussiananything_tpu.cli.sample --release --full \
    --mesh --num 2 --out /tmp/r5_final/samples 2>&1 | grep -v WARNING \
    | tail -30 | tee /tmp/r5_final/cascade.log

echo "=== 4. final bench ==="
timeout 900 python bench.py 2>&1 | grep -v WARNING \
    | tee /tmp/r5_final/bench.log
echo "=== r5 final chip session done ==="
