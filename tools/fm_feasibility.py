"""Release-batch flow-matching training feasibility on one chip
(VERDICT r3 item 4, measurement half).

DiT-L (24×1024, 768 point tokens) + frozen ViT-L-class image conditioner,
GLOBAL batch 256 via gradient accumulation — the reference's release recipe
`shell_scripts/release/train/stage-2-diffusion/i23d-pcd-gen.sh` (batch 256,
`nsr/lsgm/flow_matching_trainer.py:491-572` microbatch loop). Prints
params, compile time, steady step time and HBM stats.

    python -m tools.fm_feasibility [--accum 8] [--batch 256] [--stage 1]
           [--train-cond]
"""
from __future__ import annotations

import sys
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gaussiananything_tpu.diffusion.transport import create_transport
    from gaussiananything_tpu.models.conditioner import ImageConditioner
    from gaussiananything_tpu.models.dit import stage1_dit, stage2_dit
    from gaussiananything_tpu.train.fm_trainer import (FMConfig,
                                                       make_fm_train_step)
    from gaussiananything_tpu.train.state import (TrainState,
                                                  TrainStateConfig,
                                                  make_optimizer)

    def arg(name, default, cast=int):
        return cast(sys.argv[sys.argv.index(name) + 1]) \
            if name in sys.argv else default

    B = arg("--batch", 256)
    accum = arg("--accum", 8)
    stage = arg("--stage", 1)
    n = arg("--steps", 5)
    train_cond = "--train-cond" in sys.argv

    K, in_ch = 768, (3 if stage == 1 else 10)
    mk = stage1_dit if stage == 1 else stage2_dit
    # remat per block: release-batch microbatches don't fit otherwise
    dit = mk("L", cond_dim=1024, vector_dim=1024, remat=True)
    cond = ImageConditioner(width=1024, depth=24, heads=16, img_size=224,
                            ucg_rate=0.1)

    rng = jax.random.PRNGKey(0)
    rng_np = np.random.default_rng(0)
    imgs = jnp.asarray(rng_np.uniform(size=(B, 3, 224, 224)), jnp.float32)
    latent = jnp.asarray(rng_np.normal(size=(B, K, in_ch)), jnp.float32)
    batch = {"latent": latent, "cond": imgs}
    if stage == 2:
        batch["xyz"] = jnp.asarray(rng_np.normal(size=(B, K, 3)),
                                   jnp.float32)

    cp = cond.init(rng, imgs[:1])
    c0 = cond.apply(cp, imgs[:1])
    init_kw = {"xyz": batch["xyz"][:1]} if stage == 2 else {}
    dp = dit.init(rng, latent[:1], jnp.zeros((1,)), c0.crossattn, c0.vector,
                  **init_kw)
    nd = sum(x.size for x in jax.tree.leaves(dp))
    nc = sum(x.size for x in jax.tree.leaves(cp))
    print(f"DiT params: {nd/1e6:.1f}M  cond params: {nc/1e6:.1f}M "
          f"(trained: {train_cond})  batch {B} = {accum} x {B//accum}",
          flush=True)

    tx_cfg = TrainStateConfig(lr=1e-4, warmup_steps=10)
    step_fn = make_fm_train_step(dit, cond, create_transport("gvp"),
                                 FMConfig(stage=stage), tx_cfg,
                                 train_conditioner=train_cond, accum=accum,
                                 donate=True)
    import optax
    state = TrainState.create(dp, make_optimizer(tx_cfg))
    cstate = TrainState.create(
        cp, make_optimizer(tx_cfg) if train_cond else optax.identity())

    t0 = time.perf_counter()
    state, cstate, logs = step_fn(state, cstate, batch, rng)
    jax.block_until_ready(logs["fm_loss"])
    print(f"compile+step1: {time.perf_counter()-t0:.1f}s "
          f"fm_loss={float(logs['fm_loss']):.4f}", flush=True)

    t0 = time.perf_counter()
    for i in range(n):
        state, cstate, logs = step_fn(state, cstate, batch,
                                      jax.random.fold_in(rng, i))
    jax.block_until_ready(logs["fm_loss"])
    dt = (time.perf_counter() - t0) / n
    print(f"steady step: {dt*1e3:.0f} ms ({1/dt:.2f} steps/s; "
          f"{B/dt:.0f} samples/s), fm_loss={float(logs['fm_loss']):.4f}",
          flush=True)

    ms = jax.local_devices()[0].memory_stats()
    if ms:
        print({k: round(v / 2**30, 2) for k, v in ms.items()
               if "bytes" in k and v > 0}, flush=True)


if __name__ == "__main__":
    main()
