"""Flow-matching (diffusion) training entry point.

Replaces `scripts/vit_triplane_sit_train.py` + the release shells
(`shell_scripts/release/train/stage-2-diffusion/*.sh`). Trains on
pre-extracted latents (`--latent-dir` from cli.extract_latents) or, for the
synthetic demo, derives latents from GT objects on the fly.

    python -m gaussiananything_tpu.cli.train_flow --preset demo-e2e \
        --stage 1 --steps 200
"""
from __future__ import annotations

import argparse
import glob
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="demo-e2e")
    p.add_argument("--config", default=None)
    p.add_argument("--stage", type=int, default=1)
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--logdir", default=None)
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--latent-dir", default=None,
                   help="npz latents from extract_latents")
    p.add_argument("--cond", default=None, choices=["image", "text"],
                   help="override cfg.dit.cond — 'text' trains the t23d "
                        "towers from the latent npzs' caption field "
                        "(`datasets/g_buffer_objaverse.py:3771` role)")
    p.add_argument("--bpe", action="store_true",
                   help="CLIP BPE token ids for text conditioning "
                        "(tokenizer parity with released t23d towers); "
                        "byte ids otherwise")
    p.add_argument("--platform", default=None)
    p.add_argument("--accum", type=int, default=1,
                   help="gradient-accumulation microbatches per step "
                        "(reference microbatch loop; memory knob)")
    p.add_argument("--save-every", type=int, default=1000)
    p.add_argument("--freeze-cond", action="store_true",
                   help="freeze the conditioner (the reference trains "
                        "with frozen DINOv2/CLIP towers; use --cond-ckpt)")
    p.add_argument("--cond-ckpt", default=None,
                   help="initial conditioner weights (npz from "
                        "cli.import_release, e.g. dinov2)")
    p.add_argument("--dit-ckpt", default=None,
                   help="warm-start DiT weights (npz or orbax)")
    p.add_argument("--resume", default=None,
                   help="checkpoint dir prefix (the --logdir/ckpt written "
                        "by save-every): restores DiT + conditioner "
                        "states incl. step/opt/EMA and continues")
    p.add_argument("--eval-every", type=int, default=0,
                   help="sample with EMA weights every N steps and export "
                        "artifacts + geometry metrics (eval_cldm role, "
                        "`nsr/lsgm/flow_matching_trainer.py:1011`); 0 = off")
    args = p.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from gaussiananything_tpu.config import RunConfig, compute_dtype, preset
    from gaussiananything_tpu.diffusion.transport import create_transport
    from gaussiananything_tpu.models.conditioner import (ImageConditioner,
                                                         TextConditioner)
    from gaussiananything_tpu.models.dit import stage1_dit, stage2_dit
    from gaussiananything_tpu.parallel.mesh import (make_mesh, replicate,
                                                    shard_batch)
    from gaussiananything_tpu.train.fm_trainer import (FMConfig, XYZ_SCALE,
                                                       make_fm_train_step)
    from gaussiananything_tpu.train.logging import MetricLogger
    from gaussiananything_tpu.train.state import (TrainState,
                                                  TrainStateConfig,
                                                  make_optimizer,
                                                  save_checkpoint)

    cfg = (RunConfig.from_json(open(args.config).read()) if args.config
           else preset(args.preset))
    cfg.dit.stage = args.stage
    if args.cond:
        cfg.dit.cond = args.cond
    if args.steps:
        cfg.optim.total_steps = args.steps
    if args.batch:
        cfg.optim.batch_size = args.batch
    logdir = args.logdir or os.path.join(cfg.logdir,
                                         f"{cfg.name}-flow-s{args.stage}")
    logger = MetricLogger(logdir)
    with open(os.path.join(logdir, "args.json"), "w") as f:
        f.write(cfg.to_json())

    mk = stage1_dit if args.stage == 1 else stage2_dit
    dtype = compute_dtype(cfg.dit.compute_dtype)
    # remat=True: per-block rematerialisation makes release-batch training
    # fit one chip (batch-32 DiT-L backward stores ~62 GB without it)
    dit_kw = dict(size=cfg.dit.size, cond_dim=cfg.dit.cond_width,
                  vector_dim=cfg.dit.cond_width, dtype=dtype, remat=True)
    if args.stage == 2:
        dit_kw["z_channels"] = cfg.vae.z_channels
    dit = mk(**dit_kw)
    if cfg.dit.cond == "image":
        cond = ImageConditioner(width=cfg.dit.cond_width,
                                depth=cfg.dit.cond_depth,
                                heads=cfg.dit.cond_heads,
                                img_size=cfg.dit.cond_img_size,
                                ucg_rate=cfg.dit.ucg_rate, dtype=dtype)
    else:
        cond = TextConditioner(width=cfg.dit.cond_width,
                               depth=cfg.dit.cond_depth,
                               heads=cfg.dit.cond_heads,
                               ucg_rate=cfg.dit.ucg_rate, dtype=dtype)

    in_ch = 3 if args.stage == 1 else cfg.vae.z_channels
    K = cfg.vae.latent_num

    text_cond = cfg.dit.cond == "text"
    if text_cond:
        if args.bpe:
            from gaussiananything_tpu.models.openclip_text import \
                ClipBPETokenizer
            _tok = ClipBPETokenizer()

            def tokenize(caps):
                return jnp.asarray(_tok(caps))
        else:
            from gaussiananything_tpu.models.conditioner import \
                tokenize_bytes

            def tokenize(caps):
                return jnp.asarray(tokenize_bytes(caps))

    # ---------------------------------------------------------------- data
    if args.latent_dir:
        files = sorted(glob.glob(os.path.join(args.latent_dir, "*.npz")))
        assert files, f"no npz latents in {args.latent_dir}"
        arrs = [np.load(f) for f in files]
        # Device-resident dataset cache: extracted latents are small (a few
        # hundred MB for the full release set), so upload ONCE and gather
        # per-step batches on device — per-step host→device image uploads
        # cost seconds through a tunneled chip (~20 MB/s) and would starve
        # the train step.
        lat_all = jnp.asarray(np.stack([a["latent_normalized"]
                                        for a in arrs]))
        xyz_all = jnp.asarray(np.stack([a["query_pcd_xyz"] for a in arrs]))
        caps_all = [str(a.get("caption", "")) for a in arrs]
        # cond images cached as uint8: at 512 latents the fp32 cache
        # (0.31 GB @224², 1.65 GB @518²) tipped the release step over
        # HBM; [0,1] renders quantized to 1/255 are exactly what a real
        # image dataset feeds the conditioner anyway.
        cond_all = (None if text_cond else jnp.asarray(np.clip(np.stack(
            [a["cond"] for a in arrs]) * 255.0, 0, 255).astype(np.uint8)))

        @jax.jit
        def gather_cond(didx):
            return jnp.take(cond_all, didx, axis=0).astype(jnp.float32) / 255.

        def data_iter(rng_np):
            while True:
                idx = rng_np.integers(0, len(arrs), cfg.optim.batch_size)
                didx = jnp.asarray(idx)
                if text_cond:
                    b = {"cond": tokenize([caps_all[i] for i in idx])}
                else:
                    b = {"cond": gather_cond(didx)}
                if args.stage == 1:
                    b["latent"] = jnp.take(xyz_all, didx, 0) / XYZ_SCALE
                else:
                    b["latent"] = jnp.take(lat_all, didx, 0)
                    b["xyz"] = jnp.take(xyz_all, didx, 0)
                yield b
    else:
        # synthetic: stage-1 latent = FPS xyz of procedural objects;
        # cond = a rendered view of the object.
        from gaussiananything_tpu.data.synthetic import (make_object,
                                                         render_scene_views)
        from gaussiananything_tpu.ops.fps import sample_farthest_points
        from gaussiananything_tpu.render import cameras

        from gaussiananything_tpu.data.synthetic import describe_object

        def data_iter(rng_np):
            s = 0
            while True:
                lats, conds, caps = [], [], []
                for b in range(cfg.optim.batch_size):
                    seed = int(rng_np.integers(1 << 30))
                    g = make_object(seed, n=512)
                    anchors, _ = sample_farthest_points(g[None, :, :3], K)
                    lats.append(anchors[0])
                    if text_cond:
                        caps.append(describe_object(seed))
                    else:
                        pose = cameras.generate_input_camera(
                            1.8, [(rng_np.uniform(-30, 60),
                                   rng_np.uniform(0, 360))])
                        v = render_scene_views(g, pose,
                                               cfg.dit.cond_img_size)
                        conds.append(v["image"][0])
                b = {"cond": tokenize(caps) if text_cond
                     else jnp.stack(conds),
                     "latent": jnp.stack(lats) / XYZ_SCALE}
                if args.stage == 2:
                    b["xyz"] = b["latent"] * XYZ_SCALE
                    b["latent"] = jnp.zeros((cfg.optim.batch_size, K, in_ch))
                yield b
                s += 1

    rng = jax.random.PRNGKey(cfg.seed)
    rng_np = np.random.default_rng(cfg.seed)
    it = data_iter(rng_np)
    batch0 = next(it)

    # JITTED init at batch 1: an eager flax init is thousands of tunneled
    # dispatches (ROUND_NOTES r4), and at batch 256 the eager DiT/ViT
    # attention temps alone OOM the chip before training starts (r5).
    one = lambda a: jax.tree.map(lambda x: x[:1], a)        # noqa: E731
    cond_params = jax.jit(cond.init)(rng, one(batch0["cond"]))
    c0 = jax.jit(cond.apply)(cond_params, one(batch0["cond"]))
    init_kw = {"xyz": one(batch0["xyz"])} if args.stage == 2 else {}
    dit_params = jax.jit(dit.init)(rng, one(batch0["latent"]),
                                   jnp.zeros((1,)),
                                   c0.crossattn, c0.vector, **init_kw)

    def _warm(ckpt, params):
        from gaussiananything_tpu.train.state import restore_inference_params
        return restore_inference_params(ckpt, params)

    cond_params = _warm(args.cond_ckpt, cond_params)
    dit_params = _warm(args.dit_ckpt, dit_params)
    n_params = sum(x.size for x in jax.tree.leaves(dit_params))
    print(f"DiT params: {n_params/1e6:.2f}M")

    import math
    dp = cfg.mesh_data or math.gcd(cfg.optim.batch_size, jax.device_count()
                                   // cfg.mesh_tile)
    mesh = make_mesh(data=dp, tile=cfg.mesh_tile,
                     devices=jax.devices()[: dp * cfg.mesh_tile])
    transport = create_transport(cfg.transport.path_type,
                                 cfg.transport.t_sampler)
    fm_cfg = FMConfig(stage=args.stage, cfg_scale=cfg.transport.cfg_scale,
                      num_steps=cfg.transport.num_steps,
                      sampler=cfg.transport.sampler)
    tx_cfg = TrainStateConfig(lr=cfg.optim.lr,
                              warmup_steps=cfg.optim.warmup_steps,
                              grad_clip=cfg.optim.grad_clip,
                              ema_decay=cfg.optim.ema_decay,
                              extra_ema_decays=cfg.optim.extra_ema_decays,
                              lr_mults=cfg.optim.lr_mults)
    step_fn = make_fm_train_step(dit, cond, transport, fm_cfg, tx_cfg,
                                 train_conditioner=not args.freeze_cond,
                                 accum=args.accum, donate=True)
    tx = make_optimizer(tx_cfg)
    state = TrainState.create(replicate(mesh, dit_params), tx,
                              extra_ema_decays=cfg.optim.extra_ema_decays)
    # frozen conditioner → no optimizer moments (2x |params| of dead HBM)
    import optax
    cond_tx = optax.identity() if args.freeze_cond else tx
    cstate = TrainState.create(replicate(mesh, cond_params), cond_tx)
    if args.resume:
        import gc

        from gaussiananything_tpu.train.state import restore_checkpoint

        def abstract(s):
            return jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), s)

        # restore against ABSTRACT templates with the live buffers dropped
        # first: restoring into a second concrete DiT-L state transiently
        # doubles ~13 GB of params/opt/EMA and OOMs the chip
        tpl, ctpl = abstract(state), abstract(cstate)
        has_cond = os.path.isdir(args.resume + "_cond")
        state = cstate = dit_params = cond_params = c0 = None
        gc.collect()
        state = restore_checkpoint(args.resume, tpl)
        assert has_cond, f"{args.resume}_cond missing"
        cstate = restore_checkpoint(args.resume + "_cond", ctpl)
        print(f"resumed from {args.resume} at step {int(state.step)}")

    sampler = None

    def run_eval(step: int):
        """EMA sampling eval: stage-1 exports a .ply + chamfer/F-score vs
        the batch's GT cloud; stage-2 logs latent moments."""
        nonlocal sampler
        if sampler is None:
            from gaussiananything_tpu.train.fm_trainer import make_sampler
            sampler = make_sampler(dit, cond, fm_cfg, latent_shape=(K, in_ch))
        eb = next(it)
        kw = {"xyz": eb["xyz"][:1]} if args.stage == 2 else {}
        out = sampler(state.ema_params, cstate.ema_params, eb["cond"][:1],
                      jax.random.fold_in(rng, 100_000 + step), **kw)
        os.makedirs(os.path.join(logdir, "eval"), exist_ok=True)
        if args.stage == 1:
            from gaussiananything_tpu.render.ply_io import save_pointcloud_ply
            from gaussiananything_tpu.train.evaluation import geometry_metrics
            xyz = np.asarray(out[0]) * XYZ_SCALE
            save_pointcloud_ply(
                os.path.join(logdir, "eval", f"sample_{step}.ply"), xyz)
            gm = geometry_metrics(jnp.asarray(xyz),
                                  eb["latent"][0] * XYZ_SCALE)
            for k, v in gm.items():
                logger.logkv(f"eval_{k}", v)
        else:
            logger.logkv("eval_latent_std", float(jnp.std(out)))
            logger.logkv("eval_latent_absmax", float(jnp.abs(out).max()))

    for i in range(int(state.step), cfg.optim.total_steps):
        batch = shard_batch(mesh, next(it))
        state, cstate, logs = step_fn(state, cstate, batch,
                                      jax.random.fold_in(rng, i))
        for k, v in logs.items():
            logger.logkv_mean(k, float(v))
        if (i + 1) % 20 == 0 or i == 0:
            logger.dumpkvs(i + 1)
        if args.eval_every and (i + 1) % args.eval_every == 0:
            run_eval(i + 1)
        if (i + 1) % args.save_every == 0:
            save_checkpoint(os.path.join(logdir, "ckpt"), state)
            save_checkpoint(os.path.join(logdir, "ckpt_cond"), cstate)
    save_checkpoint(os.path.join(logdir, "ckpt"), state)
    save_checkpoint(os.path.join(logdir, "ckpt_cond"), cstate)
    print("done")


if __name__ == "__main__":
    main()
