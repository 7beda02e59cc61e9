import jax.numpy as jnp
import numpy as np


class TestTSDF:
    def test_sphere_mesh(self, tmp_path):
        """Fuse an analytic SDF sphere and check the extracted mesh radius."""
        from gaussiananything_tpu.render.tsdf import surface_nets
        D = 48
        bound = 0.495
        lin = (np.arange(D) + 0.5) / D * 2 * bound - bound
        gx, gy, gz = np.meshgrid(lin, lin, lin, indexing="ij")
        r = 0.3
        sdf = np.sqrt(gx**2 + gy**2 + gz**2) - r
        verts, faces, _ = surface_nets(sdf.astype(np.float32))
        assert len(verts) > 100
        assert len(faces) > 100
        rad = np.linalg.norm(verts, axis=1)
        np.testing.assert_allclose(rad.mean(), r, atol=0.02)
        assert faces.max() < len(verts)

    def test_export_glb(self, tmp_path):
        from gaussiananything_tpu.data.synthetic import make_object
        from gaussiananything_tpu.render.tsdf import \
            export_mesh_from_gaussians
        g = make_object(0, n=1024, kind="sphere")
        path = str(tmp_path / "mesh.glb")
        verts, faces = export_mesh_from_gaussians(
            path, g, resolution=48, n_views=4, render_size=96)
        assert len(verts) > 50
        # sphere of radius 0.35
        rad = np.linalg.norm(verts, axis=1)
        assert abs(float(np.median(rad)) - 0.35) < 0.06
        import os
        assert os.path.getsize(path) > 1000

    def test_bilinear_depth_sampling(self):
        """TSDF zero-crossing must track a subpixel-tilted depth plane.

        One camera looks down +z at a depth image linear in u:
        d(u, v) = z0 + k*(u - cx). The implied surface is a tilted plane
        x = (z - z0_adj)/slope-ish; bilinear sampling reproduces the plane
        smoothly, nearest-neighbour quantises it into pixel-wide stair
        steps (mean |error| ~ half a pixel's depth step).
        """
        import jax.numpy as jnp
        from gaussiananything_tpu.render.tsdf import integrate_tsdf

        H = W = 33
        D = 32
        bound = 0.495
        tanfov = 1.0
        # camera at z = -2 looking +z, identity rotation, ROW-vector layout:
        # view = world @ cv with cv = [[R 0],[t 1]]
        cv = jnp.eye(4).at[3, 2].set(2.0)
        z0 = 2.0
        k = 0.004
        u_img = jnp.arange(W, dtype=jnp.float32)[None, :]
        depth = jnp.broadcast_to(z0 + k * (u_img - (W - 1) / 2),
                                 (1, H, W))[None]
        alpha = jnp.ones((1, 1, H, W))
        rgb = jnp.ones((1, 3, H, W)) * 0.5
        tsdf, _ = integrate_tsdf(depth, rgb, alpha, cv[None],
                                 jnp.asarray(tanfov), resolution=D,
                                 bound=bound)
        # analytic signed distance along z for voxel (x, y, z):
        # pixel u = ((x/(z+2))+1)*0.5*W - 0.5 → sdf = d(u) - (z+2)
        lin = (np.arange(D) + 0.5) / D * 2 * bound - bound
        gx, gy, gz = np.meshgrid(lin, lin, lin, indexing="ij")
        zc = gz + 2.0
        u = ((gx / (zc * tanfov)) + 1) * 0.5 * W - 0.5
        d_true = z0 + k * (u - (W - 1) / 2)
        voxel = 2 * bound / D
        trunc = 12.0 * voxel
        sdf_true = np.clip((d_true - zc) / trunc, -1, 1)
        got = np.asarray(tsdf)
        # compare in the in-frustum, unsaturated band around the surface
        m = (np.abs(sdf_true) < 0.9) & (np.abs(u - (W - 1) / 2) < W * 0.3) \
            & (np.abs(gy / (zc * tanfov)) < 0.45)
        assert m.sum() > 500
        err = np.abs(got[m] - sdf_true[m])
        # bilinear: error limited by interpolation of a LINEAR field ≈ 0.
        # nearest-neighbour would give mean err ≈ 0.5px * k / trunc ≈ 0.005
        assert err.mean() < 1.5e-3, err.mean()
