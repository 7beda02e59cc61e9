import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussiananything_tpu.ops.fps import sample_farthest_points
from gaussiananything_tpu.ops.pointcloud import chamfer_distance, sinkhorn_emd


class TestFPS:
    def test_spread(self):
        # FPS of a cube's corners + centre cluster must pick the corners
        corners = np.array(
            [[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)],
            np.float32)
        cluster = np.random.default_rng(0).normal(0, 0.01, (100, 3)).astype(np.float32)
        pts = jnp.asarray(np.concatenate([cluster, corners]))
        sel, idx = sample_farthest_points(pts[None], 9)
        got = set(int(i) for i in np.asarray(idx[0][1:]))
        assert got == set(range(100, 108))

    def test_mask(self):
        pts = jnp.asarray(np.random.default_rng(1).normal(size=(1, 64, 3)))
        mask = jnp.arange(64)[None, :] < 10
        _, idx = sample_farthest_points(pts, 8, mask=mask)
        assert int(np.max(np.asarray(idx))) < 10

    def test_batched_shape(self):
        pts = jnp.zeros((2, 3, 128, 3))
        sel, idx = sample_farthest_points(pts, 16)
        assert sel.shape == (2, 3, 16, 3)
        assert idx.shape == (2, 3, 16)


class TestChamfer:
    def test_zero_on_identical(self):
        pts = jnp.asarray(np.random.default_rng(0).normal(size=(2, 100, 3)))
        d = chamfer_distance(pts, pts)
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)

    def test_known_value(self):
        a = jnp.array([[[0.0, 0, 0], [1, 0, 0]]])
        b = jnp.array([[[0.0, 0, 0], [2, 0, 0]]])
        # a→b: [0, 1]; b→a: [0, 1] → mean each = 0.5, total 1.0
        assert float(chamfer_distance(a, b)[0]) == pytest.approx(1.0)

    def test_grad(self):
        a = jnp.asarray(np.random.default_rng(2).normal(size=(1, 32, 3)))
        b = jnp.asarray(np.random.default_rng(3).normal(size=(1, 32, 3)))
        g = jax.grad(lambda x: chamfer_distance(x, b).sum())(a)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0


class TestSinkhornEMD:
    def test_zero_on_identical(self):
        pts = jnp.asarray(np.random.default_rng(0).normal(size=(1, 64, 3)))
        d = float(sinkhorn_emd(pts, pts)[0])
        assert d < 0.05

    def test_translation_cost(self):
        pts = jnp.asarray(np.random.default_rng(0).normal(size=(1, 64, 3)))
        shifted = pts + jnp.array([1.0, 0, 0])
        d = float(sinkhorn_emd(pts, shifted)[0])
        # optimal transport cost = squared shift = 1.0 (+entropic slack)
        assert d == pytest.approx(1.0, rel=0.15)


class TestPlyIO:
    def test_2dgs_roundtrip(self, tmp_path):
        from gaussiananything_tpu.render.ply_io import (load_2dgs_ply,
                                                        save_2dgs_ply)
        rng = np.random.default_rng(0)
        g = np.concatenate([
            rng.uniform(-0.4, 0.4, (32, 3)),
            rng.uniform(0.05, 0.95, (32, 1)),
            rng.uniform(0.01, 0.1, (32, 2)),
            rng.normal(size=(32, 4)),
            rng.uniform(0.05, 0.95, (32, 3)),
        ], 1).astype(np.float32)
        p = str(tmp_path / "g.ply")
        save_2dgs_ply(p, g)
        g2 = load_2dgs_ply(p)
        np.testing.assert_allclose(g2, g, atol=1e-4)

    def test_pointcloud_roundtrip(self, tmp_path):
        from gaussiananything_tpu.render.ply_io import (load_pointcloud_ply,
                                                        save_pointcloud_ply)
        xyz = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
        rgb = np.random.default_rng(1).uniform(size=(100, 3)).astype(np.float32)
        p = str(tmp_path / "pc.ply")
        save_pointcloud_ply(p, xyz, rgb)
        xyz2, rgb2 = load_pointcloud_ply(p)
        np.testing.assert_allclose(xyz2, xyz, atol=1e-6)
        np.testing.assert_allclose(rgb2, rgb, atol=1e-6)

    def test_glb_valid(self, tmp_path):
        import json
        import struct

        from gaussiananything_tpu.render.ply_io import save_pointcloud_glb
        xyz = np.random.default_rng(0).normal(size=(50, 3)).astype(np.float32)
        rgb = np.random.default_rng(1).uniform(size=(50, 3)).astype(np.float32)
        p = str(tmp_path / "pc.glb")
        save_pointcloud_glb(p, xyz, rgb)
        raw = open(p, "rb").read()
        magic, ver, total = struct.unpack("<III", raw[:12])
        assert magic == 0x46546C67 and ver == 2 and total == len(raw)
        jlen, jtype = struct.unpack("<II", raw[12:20])
        gltf = json.loads(raw[20:20 + jlen])
        assert gltf["accessors"][0]["count"] == 50


class TestRendererWrapper:
    def test_multiview_shapes(self):
        from gaussiananything_tpu.render import cameras
        from gaussiananything_tpu.render.renderer import GaussianRenderer2DGS
        rng = np.random.default_rng(0)
        n = 128
        g = np.concatenate([
            rng.uniform(-0.3, 0.3, (2, n, 3)),
            rng.uniform(0.3, 0.9, (2, n, 1)),
            rng.uniform(0.02, 0.08, (2, n, 2)),
            rng.normal(size=(2, n, 4)),
            rng.uniform(0, 1, (2, n, 3)),
        ], -1).astype(np.float32)
        poses = cameras.generate_input_camera(1.8, [(0, 0), (10, 90)])
        cam = cameras.pose_to_gs_camera(jnp.asarray(poses))
        cam = jax.tree.map(lambda a: jnp.broadcast_to(a, (2,) + a.shape), cam)
        r = GaussianRenderer2DGS(output_size=64, max_per_tile=256, chunk=64,
                                 tile_group=16)
        out = r.render(jnp.asarray(g), cam["cam_view"], cam["cam_view_proj"],
                       cam["cam_pos"], cam["tanfov"][0, 0])
        assert out["image"].shape == (2, 2, 3, 64, 64)
        assert out["alpha"].shape == (2, 2, 1, 64, 64)
        assert out["rend_normal"].shape == (2, 2, 3, 64, 64)
        assert np.isfinite(np.asarray(out["image"])).all()
        # world normals on visible pixels should be ~unit after normalising by alpha
        a = np.asarray(out["alpha"][0, 0, 0])
        nrm = np.asarray(out["rend_normal"][0, 0])
        vis = a > 0.9
        if vis.any():
            lens = np.linalg.norm(nrm[:, vis], axis=0) / a[vis]
            assert (lens < 1.3).all()
