"""Cascaded image-to-3D / text-to-3D sampling.

Parity with `scripts/vit_triplane_sit_sample.py` driving
`FlowMatchingEngine_gs.eval_i23d_and_export` (SURVEY.md §3.1-3.2):
  stage-1: image/text → 768×3 point cloud → .ply/.glb
  stage-2: + KL latent → VAE decode → 4-LoD gaussians → turntable renders
           (+ gaussian ply, optional TSDF mesh obj).

    python -m gaussiananything_tpu.cli.sample --preset demo-e2e \
        --stage1-ckpt ... --out samples/
"""
from __future__ import annotations

import argparse
import dataclasses
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="demo-e2e")
    p.add_argument("--release", action="store_true",
                   help="official-checkpoint mode: release-parity models "
                        "(DINOv2@518 conditioner, CLAY-L DiTs, parity VAE); "
                        "pass npz checkpoints from cli.import_release")
    p.add_argument("--stage1-ckpt", default=None)
    p.add_argument("--stage1-cond-ckpt", default=None,
                   help="conditioner weights (--release: imported DINOv2)")
    p.add_argument("--stage2-ckpt", default=None)
    p.add_argument("--stage2-cond-ckpt", default=None)
    p.add_argument("--vae-ckpt", default=None)
    p.add_argument("--out", default="samples")
    p.add_argument("--num", type=int, default=1)
    p.add_argument("--cfg-scale", type=float, default=None)
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--platform", default=None)
    p.add_argument("--mesh", action="store_true", help="TSDF mesh export")
    p.add_argument("--full", action="store_true",
                   help="run the full stage-2 + VAE-decode + render cascade "
                        "even without checkpoints (random init — identical "
                        "compute; used for latency benchmarking)")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 inference: cast DiT/conditioner/VAE params + "
                        "activations to bfloat16 (halves HBM weight traffic "
                        "— the sampling bottleneck at DiT-L size; training "
                        "keeps fp32 master params, this is sampling-only). "
                        "Rasterizer compositing stays fp32.")
    p.add_argument("--image-dir", default=None,
                   help="folder of real conditioning images (i23d)")
    p.add_argument("--text", default=None,
                   help="text prompt (t23d; uses the text conditioner)")
    p.add_argument("--bpe-vocab", default=None,
                   help="open_clip bpe_simple_vocab_16e6.txt.gz path — "
                        "required for tokenizer parity with released t23d "
                        "checkpoints (--release --text)")
    args = p.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from gaussiananything_tpu.config import compute_dtype, preset
    from gaussiananything_tpu.data.synthetic import (make_object,
                                                     render_scene_views)
    from gaussiananything_tpu.models.conditioner import ImageConditioner
    from gaussiananything_tpu.models.dit import stage1_dit, stage2_dit
    from gaussiananything_tpu.models.vae import PointVAE
    from gaussiananything_tpu.render import cameras
    from gaussiananything_tpu.render.ply_io import (save_pointcloud_glb,
                                                    save_pointcloud_ply)
    from gaussiananything_tpu.render.renderer import render_multiview
    from gaussiananything_tpu.train.fm_trainer import (FMConfig, XYZ_SCALE,
                                                       make_sampler)
    from gaussiananything_tpu.train.state import (TrainStateConfig,
                                                  make_optimizer)

    cfg = preset(args.preset)
    if args.release:
        from gaussiananything_tpu.config import release_config
        cfg = release_config(cfg)
    if args.bf16:
        cfg = dataclasses.replace(
            cfg,
            dit=dataclasses.replace(cfg.dit, compute_dtype="bfloat16"),
            vae=dataclasses.replace(cfg.vae, compute_dtype="bfloat16"))
    os.makedirs(args.out, exist_ok=True)
    rng = jax.random.PRNGKey(args.seed)
    tx = make_optimizer(TrainStateConfig())

    dtype = compute_dtype("bfloat16" if args.bf16 else cfg.dit.compute_dtype)

    def _cast(params):
        """Sampling-only bf16 param cast (keeps integer/bool leaves)."""
        if not args.bf16:
            return params
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)
    t23d = args.text is not None
    if args.release:
        # text prompts sample the released t23d towers (DiT-PCD-L, CLIP
        # text context 768), images the i23d ones (CLAY-L, DINOv2 1024)
        from gaussiananything_tpu.models.dit import (stage1_dit_release,
                                                     t23d_stage1_dit_release)
        dit1 = (t23d_stage1_dit_release(dtype=dtype) if t23d
                else stage1_dit_release(dtype=dtype))
    else:
        dit1 = stage1_dit(cfg.dit.size, cond_dim=cfg.dit.cond_width,
                          vector_dim=cfg.dit.cond_width, dtype=dtype)
    if t23d:
        from gaussiananything_tpu.models.conditioner import (
            TextConditioner, tokenize_bytes)
        if args.release:
            # OpenCLIP ViT-L/14 text tower (width 768) + BPE ids
            cond = TextConditioner(width=768, depth=12, heads=12,
                                   backbone="openclip", dtype=dtype)
            if args.bpe_vocab:
                from gaussiananything_tpu.models.openclip_text import \
                    ClipBPETokenizer
                tok = ClipBPETokenizer(args.bpe_vocab)
                cond_img = jnp.asarray(tok([args.text]))
            else:
                print("WARNING: --release --text without --bpe-vocab falls "
                      "back to byte tokens; pass the open_clip "
                      "bpe_simple_vocab_16e6.txt.gz for checkpoint parity",
                      flush=True)
                cond_img = jnp.asarray(tokenize_bytes([args.text]))
        else:
            cond = TextConditioner(width=cfg.dit.cond_width,
                                   depth=cfg.dit.cond_depth,
                                   heads=cfg.dit.cond_heads, dtype=dtype)
            cond_img = jnp.asarray(tokenize_bytes([args.text]))
    else:
        cond = ImageConditioner(width=cfg.dit.cond_width,
                                depth=cfg.dit.cond_depth,
                                heads=cfg.dit.cond_heads,
                                img_size=cfg.dit.cond_img_size,
                                backbone="dinov2" if args.release
                                else "scratch", dtype=dtype)
        if args.image_dir:
            from gaussiananything_tpu.data.real import RealImageDataset
            ds = RealImageDataset(args.image_dir,
                                  img_size=cfg.dit.cond_img_size)
            cond_img = jnp.asarray(ds[0])[None]
        else:
            # demo conditioning: procedural object render
            demo_obj = make_object(7, n=512)
            pose = cameras.generate_input_camera(1.8, [(20, 30)])
            cond_img = render_scene_views(demo_obj, pose,
                                          cfg.dit.cond_img_size)["image"][:1]

    K = cfg.vae.latent_num
    x0 = jnp.zeros((1, K, 3))
    cond_params = cond.init(rng, cond_img)
    c0 = cond.apply(cond_params, cond_img)
    dit1_params = dit1.init(rng, x0, jnp.zeros((1,)), c0.crossattn,
                            c0.vector)

    def _restore(ckpt, params):
        from gaussiananything_tpu.train.state import restore_inference_params
        return restore_inference_params(ckpt, params, tx)

    dit1_params = _cast(_restore(args.stage1_ckpt, dit1_params))
    cond_params = _cast(_restore(args.stage1_cond_ckpt, cond_params))

    fm1 = FMConfig(stage=1,
                   cfg_scale=(args.cfg_scale if args.cfg_scale is not None
                              else cfg.transport.cfg_scale),
                   num_steps=(args.steps if args.steps is not None
                              else cfg.transport.num_steps),
                   sampler=cfg.transport.sampler)
    sampler1 = make_sampler(dit1, cond, fm1, latent_shape=(K, 3))

    import time as _time

    def _mark(label, t0, *sync):
        for x in sync:
            jax.block_until_ready(x)
        t1 = _time.perf_counter()
        print(f"    [t] {label}: {t1 - t0:.2f}s", flush=True)
        return t1

    # ---- stage-2 / VAE construction (once, reused across samples) --------
    run_stage2 = args.stage2_ckpt or args.vae_ckpt or args.full
    if run_stage2:
        if args.release:
            from gaussiananything_tpu.models.dit import (
                stage2_dit_release, t23d_stage2_dit_release)
            dit2 = (t23d_stage2_dit_release(dtype=dtype) if t23d
                    else stage2_dit_release(dtype=dtype))
        else:
            dit2 = stage2_dit(cfg.dit.size, z_channels=cfg.vae.z_channels,
                              cond_dim=cfg.dit.cond_width,
                              vector_dim=cfg.dit.cond_width, dtype=dtype)
        z0 = jnp.zeros((1, K, cfg.vae.z_channels))
        dit2_params = dit2.init(rng, z0, jnp.zeros((1,)), c0.crossattn,
                                c0.vector, jnp.zeros((1, K, 3)))
        dit2_params = _cast(_restore(args.stage2_ckpt, dit2_params))
        cond2_params = (_cast(_restore(args.stage2_cond_ckpt, cond_params))
                        if args.stage2_cond_ckpt else cond_params)
        fm2 = FMConfig(stage=2,
                       cfg_scale=fm1.cfg_scale, num_steps=fm1.num_steps,
                       sampler=cfg.transport.sampler)
        sampler2 = make_sampler(dit2, cond, fm2,
                                latent_shape=(K, cfg.vae.z_channels))

        vae = PointVAE.from_config(dataclasses.replace(cfg.vae,
                                                       latent_num=K))
        if args.release:
            # decode-only path: init template at minimal shapes
            vae_params = vae.init(rng, jnp.zeros((1, 1, 15, 64, 64)),
                                  jnp.zeros((1, K, 3)), rng)
        else:
            from gaussiananything_tpu.data.synthetic import make_batch
            b0 = make_batch(seed=0, batch=1, n_views_in=cfg.data.n_views_in,
                            n_views_sup=1, res=cfg.data.resolution,
                            n_pts=cfg.data.n_points, n_splats=512)
            vae_params = vae.init(rng, b0["images_in"], b0["pcd"], rng)
        vae_params = _cast(_restore(args.vae_ckpt, vae_params))

    for i in range(args.num):
        key = jax.random.fold_in(rng, i)
        t0 = _time.perf_counter()
        xyz_n = sampler1(dit1_params, cond_params, cond_img, key)
        t0 = _mark("stage-1 sample", t0, xyz_n)
        # clip to the scene extent before stage-2 conditioning/export
        # (`flow_matching_trainer.py:2131-2145` clips the stage-1 ply ±0.45)
        xyz = np.clip(np.asarray(xyz_n[0]) * XYZ_SCALE, -0.45, 0.45)
        save_pointcloud_ply(os.path.join(args.out, f"stage1_{i}.ply"), xyz)
        save_pointcloud_glb(os.path.join(args.out, f"stage1_{i}.glb"), xyz)
        print(f"[{i}] stage-1 point cloud: {xyz.shape} "
              f"range {xyz.min():.3f}..{xyz.max():.3f}")

        if run_stage2:
            # release stage-2 conditions on fps-xyz / 0.45 (PCD_Scaler,
            # `sgm/modules/encoders/modules.py:1746-1768`, stage2-*.yaml);
            # our own trained models use world units throughout
            xyz_cond = jnp.asarray(xyz)[None] / (0.45 if args.release
                                                 else 1.0)
            t0 = _time.perf_counter()
            kl = sampler2(dit2_params, cond2_params, cond_img, key,
                          xyz=xyz_cond)
            t0 = _mark("stage-2 sample", t0, kl)

            t0 = _time.perf_counter()
            lods = vae.apply(vae_params, kl, jnp.asarray(xyz)[None],
                             method=vae.decode)
            fin = lods[-1]
            t0 = _mark("VAE cascade decode", t0, fin)
            from gaussiananything_tpu.render.ply_io import save_2dgs_ply
            save_2dgs_ply(os.path.join(args.out, f"gaussians_{i}.ply"),
                          np.asarray(fin[0]))
            # turntable render
            sweep = cameras.uni_mesh_path(8)[:8]
            cam = cameras.pose_to_gs_camera(jnp.asarray(sweep))
            from gaussiananything_tpu.render.renderer import default_impl
            out = render_multiview(
                fin, cam["cam_view"][None], cam["cam_view_proj"][None],
                jnp.broadcast_to(cam["tanfov"][None], (1, 8)),
                jnp.ones((1, 8, 3)), cfg.render.output_size,
                tile=16, max_per_tile=cfg.render.max_per_tile,
                chunk=cfg.render.chunk, tile_group=16,
                impl=default_impl(grad=False))
            t0 = _mark("8-view turntable render", t0, out["image"])
            from PIL import Image
            strip = np.concatenate(
                [np.moveaxis(np.asarray(v), 0, -1)
                 for v in np.asarray(out["image"][0])], axis=1)
            Image.fromarray((np.clip(strip, 0, 1) * 255).astype(np.uint8)
                            ).save(os.path.join(args.out, f"turntable_{i}.png"))
            if args.mesh:
                from gaussiananything_tpu.render.tsdf import \
                    export_mesh_from_gaussians
                t0 = _time.perf_counter()
                # 176³ = reference parity: voxel = radius/160 over the
                # [-0.45, 0.45]³×1.1 aabb (`nsr/lsgm/flow_matching_trainer
                # .py:1338-1343`) ⇒ D = 0.99/(0.9/160) ≈ 176. (256³ also
                # trips an axon-runtime worker fault at 16.7M-element
                # fused ops — see ROUND_NOTES.)
                export_mesh_from_gaussians(
                    os.path.join(args.out, f"mesh_{i}.glb"), fin[0],
                    resolution=176)
                _mark("TSDF fuse + surface nets", t0)
    print("done")


if __name__ == "__main__":
    main()
