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
