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

  echo "=== VAE quality-convergence run (release-density splats, holdout 8) ==="
  # vae-small's 1536 splats are ~3 px/splat at 128² — with the faithful
  # sub-pixel scale init the renders stay dot clouds at short horizons.
  # This config matches the release px/splat ratio (768 anchors x8 = 6144).
  python - <<'PYEOF'
from gaussiananything_tpu.config import preset, VAEModelConfig
c = preset('vae-small')
c.vae = VAEModelConfig(latent_num=768, z_channels=8, encoder_width=192,
                       decoder_width=256, decoder_depth=4, decoder_heads=4,
                       up_factors=(8,), up_depths=(1,))
c.optim.lr = 1e-3; c.optim.warmup_steps = 100; c.optim.total_steps = 3000
c.name = 'vae-conv-r4-dense'
open('/tmp/vae_conv_cfg2.json','w').write(c.to_json())
PYEOF
  timeout 10800 python -m gaussiananything_tpu.cli.train_vae \
    --config /tmp/vae_conv_cfg2.json --data-dir /tmp/ga_ds128 --holdout 8 \
    --batch 4 --eval-every 250 --save-every 1000 \
    --logdir artifacts/vae_convergence_r4
fi

if [ "$WHAT" = fm ] || [ "$WHAT" = all ]; then
  echo "=== extract 128 release-shape latents (stage-1) ==="
  timeout 2400 python -m gaussiananything_tpu.cli.extract_latents \
    --preset stage1 --out /tmp/ga_lat --num 128

  echo "=== FM release-batch feasibility (DiT-L, batch 256 = 16 x 16, frozen cond) ==="
  # microbatch 32 (accum 8) OOMs: un-remat'd conditioner activations
  timeout 3600 python -m tools.fm_feasibility --batch 256 --accum 16 --steps 3

  echo "=== FM release-batch run (300 steps on extracted latents) ==="
  timeout 9000 python -m gaussiananything_tpu.cli.train_flow \
    --preset stage1 --latent-dir /tmp/ga_lat --steps 300 --batch 256 \
    --accum 16 --freeze-cond --eval-every 150 --save-every 300 \
    --logdir artifacts/fm_release_r4
fi
echo "=== r4 runs done ==="
