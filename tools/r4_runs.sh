#!/bin/bash
# Round-4 evidence runs (VERDICT items 4 + 5), strictly serialized on the
# one chip. Usage: bash tools/r4_runs.sh [vae|fm|all]
set -u
cd "$(dirname "$0")/.."
WHAT=${1:-all}

if [ "$WHAT" = vae ] || [ "$WHAT" = all ]; then
  echo "=== export fixed 128^2 dataset (80 instances) ==="
  timeout 1800 python -c "
from gaussiananything_tpu.data.gbuffer import export_synthetic_dataset
export_synthetic_dataset('/tmp/ga_ds128', n_instances=80, n_views=16,
                         res=128, n_splats=2048, seed=7)
print('exported')"

  echo "=== VAE quality-convergence run (vae-small, fixed dataset, holdout 8) ==="
  timeout 9000 python -m gaussiananything_tpu.cli.train_vae \
    --preset vae-small --data-dir /tmp/ga_ds128 --holdout 8 \
    --steps 4000 --batch 4 --eval-every 250 --save-every 2000 \
    --logdir artifacts/vae_convergence_r4
fi

if [ "$WHAT" = fm ] || [ "$WHAT" = all ]; then
  echo "=== extract 128 release-shape latents (stage-1) ==="
  timeout 2400 python -m gaussiananything_tpu.cli.extract_latents \
    --preset stage1 --out /tmp/ga_lat --num 128

  echo "=== FM release-batch feasibility (DiT-L, batch 256 = 8 x 32, frozen cond) ==="
  timeout 3600 python -m tools.fm_feasibility --batch 256 --accum 8 --steps 5

  echo "=== FM release-batch run (300 steps on extracted latents) ==="
  timeout 9000 python -m gaussiananything_tpu.cli.train_flow \
    --preset stage1 --latent-dir /tmp/ga_lat --steps 300 --batch 256 \
    --accum 8 --freeze-cond --eval-every 100 --save-every 300 \
    --logdir artifacts/fm_release_r4
fi
echo "=== r4 runs done ==="
