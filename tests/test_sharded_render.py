import jax
import jax.numpy as jnp
import numpy as np


class TestShardedRender:
    def test_matches_single_device(self):
        from gaussiananything_tpu.data.synthetic import make_object
        from gaussiananything_tpu.ops import rasterize as rz
        from gaussiananything_tpu.parallel.mesh import make_mesh
        from gaussiananything_tpu.render import cameras
        from gaussiananything_tpu.render.sharded import render_view_sharded

        g = make_object(0, n=512, kind="sphere")
        pose = cameras.generate_input_camera(1.8, [(15, 40)])[0]
        cam = cameras.pose_to_gs_camera(jnp.asarray(pose))
        bg = jnp.ones(3)
        size = 128

        ref = rz.rasterize_tiled(g, cam["cam_view"], cam["cam_view_proj"],
                                 cam["tanfov"], bg, size, size, tile=16,
                                 max_per_tile=512, chunk=128, tile_group=16)

        mesh = make_mesh(data=1, tile=8)
        out = render_view_sharded(mesh, g, cam["cam_view"],
                                  cam["cam_view_proj"], cam["tanfov"], bg,
                                  size, max_per_tile=512, chunk=128)
        for k in ref:
            np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                       atol=2e-4, err_msg=k)

    def test_gradients_allreduced(self):
        from gaussiananything_tpu.data.synthetic import make_object
        from gaussiananything_tpu.ops import rasterize as rz
        from gaussiananything_tpu.parallel.mesh import make_mesh
        from gaussiananything_tpu.render import cameras
        from gaussiananything_tpu.render.sharded import render_view_sharded

        g = make_object(1, n=256)
        pose = cameras.generate_input_camera(1.8, [(0, 0)])[0]
        cam = cameras.pose_to_gs_camera(jnp.asarray(pose))
        bg = jnp.ones(3)
        mesh = make_mesh(data=1, tile=8)

        def loss_sharded(gg):
            out = render_view_sharded(mesh, gg, cam["cam_view"],
                                      cam["cam_view_proj"], cam["tanfov"],
                                      bg, 128, max_per_tile=256, chunk=64)
            return jnp.sum(out["image"] ** 2)

        def loss_ref(gg):
            out = rz.rasterize_tiled(gg, cam["cam_view"],
                                     cam["cam_view_proj"], cam["tanfov"],
                                     bg, 128, 128, tile=16, max_per_tile=256,
                                     chunk=64, tile_group=8)
            return jnp.sum(out["image"] ** 2)

        g_sh = jax.grad(loss_sharded)(g)
        g_rf = jax.grad(loss_ref)(g)
        np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_rf),
                                   rtol=1e-3, atol=1e-4)


class TestTileShardedFullLoss:
    """The REAL `vae_loss_fn` (multi-LoD L1/alpha + perceptual + KL +
    dist/normal + scale/opacity regs) on a data×tile mesh with row-band
    sharded renders must produce the same loss and gradients as the
    unsharded step — only the renderer is manually sharded (shard_map
    inside `render_multiview`); everything else keeps GSPMD global
    semantics. VERDICT r3 item 7; SURVEY.md §5.7 sharding plan."""

    def test_full_loss_step_matches_unsharded(self):
        from gaussiananything_tpu.data.synthetic import make_batch
        from gaussiananything_tpu.models.vae import PointVAE
        from gaussiananything_tpu.parallel.mesh import (make_mesh, replicate,
                                                        shard_batch)
        from gaussiananything_tpu.train.state import (TrainState,
                                                      TrainStateConfig,
                                                      make_optimizer)
        from gaussiananything_tpu.train.vae_trainer import (VAELossConfig,
                                                            make_train_step)

        model = PointVAE(latent_num=16, z_channels=4, encoder_width=64,
                         decoder_width=64, decoder_heads=4, decoder_depth=2,
                         up_factors=(4,), up_depths=(1,))
        batch = make_batch(seed=3, batch=2, n_views_in=2, n_views_sup=2,
                           res=32, n_pts=128, n_splats=256)
        batch.pop("gt_gaussians")
        tanfov = batch.pop("tanfov")
        rng = jax.random.PRNGKey(0)
        params = model.init(rng, batch["images_in"][:1], batch["pcd"][:1],
                            rng)
        cfg = VAELossConfig(lod_resolutions=(32, 32), perceptual_weight=0.5,
                            dist_start_step=0, normal_start_step=0)
        tx_cfg = TrainStateConfig(lr=1e-4, warmup_steps=1)

        # unsharded reference
        batch["tanfov"] = tanfov
        st_ref = TrainState.create(params, make_optimizer(tx_cfg))
        _, logs_ref = make_train_step(model, cfg, tx_cfg)(st_ref, batch, rng)

        # 2×2 data×tile mesh (band = 16 rows of the 32² renders)
        mesh = make_mesh(data=2, tile=2, devices=jax.devices()[:4])
        batch.pop("tanfov")
        sh = shard_batch(mesh, batch)
        sh["tanfov"] = tanfov
        st = TrainState.create(replicate(mesh, params),
                               make_optimizer(tx_cfg))
        step = make_train_step(model, cfg, tx_cfg, mesh=mesh)
        _, logs = step(st, sh, rng)

        np.testing.assert_allclose(float(logs["total"]),
                                   float(logs_ref["total"]),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(float(logs["grad_norm"]),
                                   float(logs_ref["grad_norm"]),
                                   rtol=1e-4, atol=1e-6)
        # the loss stack's pieces agree too (KL, dist, normal, perceptual)
        for k in ("kl", "dist", "normal", "l1_lod1", "lpips_lod1"):
            np.testing.assert_allclose(float(logs[k]), float(logs_ref[k]),
                                       rtol=1e-4, atol=1e-6, err_msg=k)
