"""Release-scale VAE training-step feasibility on one chip (VERDICT item 6).

Full "vae" preset (latent 768 -> 73,728 splats), 512^2 4-LoD supervision
ladder, rand_coarse_lod on (1 random coarse + finest supervised per step),
rasterizer chunk remat on. Mirrors the reference's release recipe
`shell_scripts/release/train/stage-1-vae3d/vae3d-adv-512.sh:24-33`
(512^2, 8 supervised views, bf16 AMP on 8xA100) at single-chip batch.

Prints params, compile+first-step time, steady-state step time, and HBM
stats. Run serialized with any other TPU use:

    python -m tools.release_feasibility [--views 4] [--steps 5]
"""
from __future__ import annotations

import sys
import time


def main():
    import jax
    import jax.numpy as jnp

    from gaussiananything_tpu.config import preset
    from gaussiananything_tpu.data.synthetic import make_batch
    from gaussiananything_tpu.models.vae import PointVAE
    from gaussiananything_tpu.train.state import (TrainState,
                                                  TrainStateConfig,
                                                  make_optimizer)
    from gaussiananything_tpu.train.vae_trainer import (VAELossConfig,
                                                        make_train_step)

    views = int(sys.argv[sys.argv.index("--views") + 1]) \
        if "--views" in sys.argv else 4
    n = int(sys.argv[sys.argv.index("--steps") + 1]) \
        if "--steps" in sys.argv else 5

    cfg = preset("vae")
    if "--bf16" in sys.argv:
        cfg.vae.compute_dtype = "bfloat16"
        print("compute_dtype: bfloat16", flush=True)
    model = PointVAE.from_config(cfg.vae)

    batch = make_batch(seed=0, batch=1, n_views_in=4, n_views_sup=views,
                       res=512, n_pts=4096, n_splats=4096)
    batch.pop("gt_gaussians", None)

    rng = jax.random.PRNGKey(0)
    params = model.init(rng, batch["images_in"][:1], batch["pcd"][:1], rng)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"params: {n_params/1e6:.1f}M  device: {jax.devices()[0]}",
          flush=True)

    loss_cfg = VAELossConfig(lod_resolutions=(128, 256, 384, 512),
                             rand_coarse_lod=True)
    tx_cfg = TrainStateConfig(lr=1e-4, warmup_steps=10)
    step_fn = make_train_step(model, loss_cfg, tx_cfg, donate=True)
    state = TrainState.create(params, make_optimizer(tx_cfg))

    t0 = time.perf_counter()
    state, logs = step_fn(state, batch, rng)
    jax.block_until_ready(logs["total"])
    print(f"compile+step1: {time.perf_counter()-t0:.1f}s "
          f"loss={float(logs['total']):.4f}", flush=True)

    t0 = time.perf_counter()
    for i in range(n):
        state, logs = step_fn(state, batch, jax.random.fold_in(rng, i))
    jax.block_until_ready(logs["total"])
    dt = (time.perf_counter() - t0) / n
    print(f"steady step: {dt*1e3:.0f} ms ({1/dt:.2f} steps/s), "
          f"loss={float(logs['total']):.4f}", flush=True)

    ms = jax.local_devices()[0].memory_stats()
    if ms:
        print({k: round(v / 2**30, 2) for k, v in ms.items()
               if "bytes" in k and v > 0}, flush=True)


if __name__ == "__main__":
    main()
