"""VAE training entry point.

Replaces `torchrun scripts/vit_triplane_train.py` + the 200-flag shell
(`shell_scripts/release/train/stage-1-vae3d/vae3d-adv-512.sh`):

    python -m gaussiananything_tpu.cli.train_vae --preset vae-small \
        --steps 200 --logdir logs/vae

No torchrun / NCCL: the jitted step is compiled over the device mesh; run the
same command on every host for multi-host.
"""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="vae-small")
    p.add_argument("--config", default=None, help="RunConfig json path")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--logdir", default=None)
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--adv", action="store_true", help="enable PatchGAN")
    p.add_argument("--adv-start", type=int, default=0,
                   help="generator-side adversarial delay steps")
    p.add_argument("--lpips-npz", default=None,
                   help="converted VGG-LPIPS params (param_io npz); "
                        "default: random-pyramid perceptual fallback")
    p.add_argument("--resume", default=None)
    p.add_argument("--load-submodule", default=None, metavar="NAME=CKPT",
                   help="selective warm start: graft one top-level "
                        "submodule (e.g. encoder=/path/to/ckpt) from a "
                        "checkpoint (reference load_submodule_name)")
    p.add_argument("--eval-every", type=int, default=500)
    p.add_argument("--save-every", type=int, default=1000)
    p.add_argument("--platform", default=None, help="cpu to force CPU")
    p.add_argument("--data-dir", default=None,
                   help="packed gbuffer npz dataset (data/gbuffer.py); "
                        "per-step procedural scenes otherwise")
    p.add_argument("--canonicalize", action="store_true",
                   help="frame-0-as-canonical pose/pcd rebase per chunk "
                        "(reference frame_0_as_canonical)")
    p.add_argument("--holdout", type=int, default=0,
                   help="with --data-dir: reserve the LAST N instances as "
                        "a FIXED held-out eval split (never trained on); "
                        "--eval-every then reports PSNR/SSIM on the same "
                        "held-out batch every time (eval_novelview_loop "
                        "cadence, nsr/train_nv_util.py:2693)")
    args = p.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from gaussiananything_tpu.config import RunConfig, preset
    from gaussiananything_tpu.data.synthetic import make_batch
    from gaussiananything_tpu.models.vae import PointVAE
    from gaussiananything_tpu.parallel.mesh import (make_mesh, replicate,
                                                    shard_batch)
    from gaussiananything_tpu.train.logging import MetricLogger
    from gaussiananything_tpu.train.losses import PatchDiscriminator
    from gaussiananything_tpu.train.state import (TrainState,
                                                  TrainStateConfig,
                                                  make_optimizer,
                                                  restore_checkpoint,
                                                  save_checkpoint)
    from gaussiananything_tpu.train.vae_trainer import (VAELossConfig,
                                                        make_disc_step,
                                                        make_train_step)

    cfg = (RunConfig.from_json(open(args.config).read()) if args.config
           else preset(args.preset))
    if args.steps:
        cfg.optim.total_steps = args.steps
    if args.batch:
        cfg.optim.batch_size = args.batch
    logdir = args.logdir or os.path.join(cfg.logdir, cfg.name)
    logger = MetricLogger(logdir)
    with open(os.path.join(logdir, "args.json"), "w") as f:
        f.write(cfg.to_json())

    model = PointVAE.from_config(cfg.vae)

    eval_batch_fixed = None
    if args.data_dir:
        import glob as _glob

        from gaussiananything_tpu.data.gbuffer import MultiViewDataset
        files = sorted(_glob.glob(os.path.join(args.data_dir, "*.npz")))
        assert len(files) > args.holdout, (len(files), args.holdout)
        split = len(files) - args.holdout
        train_ds = MultiViewDataset(
            args.data_dir, files=files[:split],
            n_views_in=cfg.data.n_views_in, n_views_sup=cfg.data.n_views_sup,
            n_points=cfg.data.n_points, resolution=cfg.data.resolution,
            seed=cfg.seed, canonicalize=args.canonicalize)
        print(f"dataset: {split} train / {args.holdout} held-out instances")

        def data_iter(seed0: int):
            for b in train_ds.iterator(cfg.optim.batch_size):
                b.pop("caption", None)
                yield b

        if args.holdout:
            # the SAME held-out batch every eval → a clean PSNR/SSIM
            # trajectory (instances never seen by the optimiser)
            eval_ds = MultiViewDataset(
                args.data_dir, files=files[split:],
                n_views_in=cfg.data.n_views_in,
                n_views_sup=cfg.data.n_views_sup,
                n_points=cfg.data.n_points, resolution=cfg.data.resolution,
                seed=12345, canonicalize=args.canonicalize)
            eval_batch_fixed = eval_ds.batch(min(args.holdout, 4))
            eval_batch_fixed.pop("caption", None)
    else:
        def data_iter(seed0: int):
            s = seed0
            while True:
                b = make_batch(seed=s, batch=cfg.optim.batch_size,
                               n_views_in=cfg.data.n_views_in,
                               n_views_sup=cfg.data.n_views_sup,
                               res=cfg.data.resolution,
                               n_pts=cfg.data.n_points,
                               n_splats=max(512, cfg.data.n_points))
                b.pop("gt_gaussians", None)
                yield b
                s += 1

    rng = jax.random.PRNGKey(cfg.seed)
    it = data_iter(cfg.seed)
    batch0 = next(it)
    batch0.pop("tanfov")
    params = jax.jit(model.init)(rng, batch0["images_in"][:1],
                                 batch0["pcd"][:1], rng)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"VAE params: {n_params/1e6:.2f}M; devices: {jax.devices()}")

    import math
    dp = cfg.mesh_data or math.gcd(cfg.optim.batch_size, jax.device_count()
                                   // cfg.mesh_tile)
    mesh = make_mesh(data=dp, tile=cfg.mesh_tile,
                     devices=jax.devices()[: dp * cfg.mesh_tile])
    params = replicate(mesh, params)

    loss_cfg = VAELossConfig(
        lod_resolutions=cfg.render.lod_resolutions,
        adv_weight=0.05 if args.adv else 0.0,
        adv_start_step=args.adv_start)
    lpips_params = None
    if args.lpips_npz:
        from gaussiananything_tpu.utils.param_io import load_params_npz
        lpips_params = load_params_npz(args.lpips_npz)
        print(f"loaded VGG-LPIPS weights from {args.lpips_npz}")
    tx_cfg = TrainStateConfig(lr=cfg.optim.lr,
                              weight_decay=cfg.optim.weight_decay,
                              grad_clip=cfg.optim.grad_clip,
                              ema_decay=cfg.optim.ema_decay,
                              extra_ema_decays=cfg.optim.extra_ema_decays,
                              warmup_steps=cfg.optim.warmup_steps,
                              lr_mults=cfg.optim.lr_mults)
    disc = PatchDiscriminator() if args.adv else None
    step_fn = make_train_step(model, loss_cfg, tx_cfg, donate=True,
                              disc_model=disc,
                              lpips_params=lpips_params)
    tx = make_optimizer(tx_cfg)
    state = TrainState.create(params, tx,
                              extra_ema_decays=cfg.optim.extra_ema_decays)
    if args.resume:
        state = restore_checkpoint(args.resume, state)
        print(f"resumed from {args.resume} at step {int(state.step)}")
    if args.load_submodule:
        from gaussiananything_tpu.train.state import load_submodule
        name, _, ckpt = args.load_submodule.partition("=")
        state = load_submodule(ckpt, state, name)
        print(f"grafted submodule {name!r} from {ckpt}")

    dstate = None
    dstep_fn = None
    if args.adv:
        dp = disc.init(rng, jnp.zeros(
            (1, 3, loss_cfg.lod_resolutions[-1],
             loss_cfg.lod_resolutions[-1])))
        dstate = TrainState.create(replicate(mesh, dp), tx)
        dstep_fn = make_disc_step(model, disc, loss_cfg, tx_cfg,
                                  donate=True)
        # discriminator checkpoint parity (`nsr/train_nv_util.py:1637-1692`)
        if args.resume and os.path.isdir(args.resume + "_disc"):
            dstate = restore_checkpoint(args.resume + "_disc", dstate)
            print(f"resumed discriminator at step {int(dstate.step)}")

    import time
    t0 = time.time()
    step0 = int(state.step)        # resume-aware steps_per_s numerator
    for i in range(int(state.step), cfg.optim.total_steps):
        batch = next(it)
        # each batch's OWN tanfov (heterogeneous-intrinsics datasets render
        # with the right FOV); batch0's tanfov only seeded model.init
        batch_tanfov = batch.pop("tanfov")
        sharded = shard_batch(mesh, batch)
        sharded["tanfov"] = batch_tanfov
        step_rng = jax.random.fold_in(rng, i)
        with logger.profile("g_step"):
            if args.adv:
                state, logs = step_fn(state, sharded, step_rng,
                                      dstate.params)
            else:
                state, logs = step_fn(state, sharded, step_rng)
        if args.adv and i % 2 == 1:     # alternate d-steps (`:2933-2948`)
            with logger.profile("d_step"):
                dstate, dlogs = dstep_fn(dstate, state.params, sharded,
                                         step_rng)
            logger.logkv_mean("d_loss", float(dlogs["d_loss"]))
        for k, v in logs.items():
            logger.logkv_mean(k, float(v))
        if (i + 1) % args.eval_every == 0:
            from gaussiananything_tpu.train.evaluation import eval_novelview
            eval_batch = (dict(eval_batch_fixed)
                          if eval_batch_fixed is not None else next(it))
            m = eval_novelview(model, state.ema_params, eval_batch,
                               step_rng, loss_cfg.lod_resolutions,
                               out_dir=os.path.join(logdir, "eval"),
                               step=i + 1)
            for k, v in m.items():
                logger.logkv(k, v)
            logger.dumpkvs(i + 1)      # persist eval rows at eval cadence
        if ((i + 1) % 20 == 0 or i == 0) \
                and (i + 1) % args.eval_every != 0:
            logger.logkv("steps_per_s",
                         (i + 1 - step0) / max(time.time() - t0, 1e-9))
            logger.dumpkvs(i + 1)
        if (i + 1) % args.save_every == 0:
            save_checkpoint(os.path.join(logdir, "ckpt"), state)
            if dstate is not None:
                save_checkpoint(os.path.join(logdir, "ckpt_disc"), dstate)
    save_checkpoint(os.path.join(logdir, "ckpt"), state)
    if dstate is not None:
        save_checkpoint(os.path.join(logdir, "ckpt_disc"), dstate)
    print("done")


if __name__ == "__main__":
    main()
