#!/bin/bash
# Round-5 evidence runs (VERDICT r4 items 3 + 4), strictly serialized on
# the one chip. Usage: bash tools/r5_runs.sh [vae|vae_ablate|fm_extract|fm|all]
set -u
cd "$(dirname "$0")/.."
WHAT=${1:-all}

make_cfg() {  # $1 = name, $2 = scale_bias
  python - "$1" "$2" <<'PYEOF'
import sys
from gaussiananything_tpu.config import preset, VAEModelConfig
name, sb = sys.argv[1], float(sys.argv[2])
c = preset('vae-small')
# release splat density at 128²: 768 anchors × 8 = 6144 splats (~2.7
# px/splat, matching the release 512²/73,728 ratio)
c.vae = VAEModelConfig(latent_num=768, z_channels=8, encoder_width=192,
                       decoder_width=256, decoder_depth=4, decoder_heads=4,
                       up_factors=(8,), up_depths=(1,), scale_bias=sb)
c.optim.lr = 1e-3; c.optim.warmup_steps = 100; c.optim.total_steps = 3000
c.name = name
open(f'/tmp/{name}.json', 'w').write(c.to_json())
print('wrote', f'/tmp/{name}.json')
PYEOF
}

if [ "$WHAT" = vae ] || [ "$WHAT" = vae_ablate ] || [ "$WHAT" = all ]; then
  if [ ! -f /tmp/ga_ds128/00000.npz ] && [ -z "$(ls /tmp/ga_ds128/*.npz 2>/dev/null)" ]; then
    echo "=== export fixed 128^2 dataset (80 instances) ==="
    timeout 1800 python -c "
from gaussiananything_tpu.data.gbuffer import export_synthetic_dataset
export_synthetic_dataset('/tmp/ga_ds128', n_instances=80, n_views=16,
                         res=128, n_splats=2048, seed=7)
print('exported')"
  fi
fi

if [ "$WHAT" = vae ] || [ "$WHAT" = all ]; then
  echo "=== VAE quality-convergence run (dense splats, faithful -2.5 scale init) ==="
  make_cfg vae-conv-r5-dense -2.5
  timeout 14400 python -m gaussiananything_tpu.cli.train_vae \
    --config /tmp/vae-conv-r5-dense.json --data-dir /tmp/ga_ds128 --holdout 8 \
    --batch 4 --eval-every 250 --save-every 1500 \
    --logdir artifacts/vae_convergence_r5
fi

if [ "$WHAT" = vae_ablate ]; then
  echo "=== VAE convergence ABLATION: pixel-scale init (scale_bias +1.33) ==="
  make_cfg vae-conv-r5-pxinit 1.33
  timeout 14400 python -m gaussiananything_tpu.cli.train_vae \
    --config /tmp/vae-conv-r5-pxinit.json --data-dir /tmp/ga_ds128 --holdout 8 \
    --batch 4 --eval-every 250 --save-every 1500 \
    --logdir artifacts/vae_convergence_r5_pxinit
fi

if [ "$WHAT" = fm_extract ] || [ "$WHAT" = all ]; then
  echo "=== extract 512 release-shape latents (stage-1) ==="
  timeout 7200 python -m gaussiananything_tpu.cli.extract_latents \
    --preset stage1 --out /tmp/ga_lat512 --num 512
fi

if [ "$WHAT" = fm ] || [ "$WHAT" = all ]; then
  echo "=== FM release run: past warmup (1600 steps, batch 256, microbatch 16) ==="
  # microbatch 32 still OOMs on a remat temp inside the DiT even with the
  # conditioner hoisted (r5 feasibility) — accum 16 remains the recipe
  timeout 28800 python -m gaussiananything_tpu.cli.train_flow \
    --preset stage1 --latent-dir /tmp/ga_lat512 --steps 1600 --batch 256 \
    --accum 16 --freeze-cond --eval-every 400 --save-every 400 \
    --logdir artifacts/fm_release_r5
fi
echo "=== r5 runs done ==="
