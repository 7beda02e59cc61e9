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
