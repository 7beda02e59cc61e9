import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussiananything_tpu.ops import rasterize as rz
from gaussiananything_tpu.ops.gaussians import pack_gaussians, GaussianSplats
from gaussiananything_tpu.render import cameras


def make_camera(elev=0.0, azi=0.0, r=1.8):
    pose = cameras.generate_input_camera(r, [(elev, azi)])[0]
    return cameras.pose_to_gs_camera(jnp.asarray(pose))


def make_splats(n=64, seed=0, scale=0.08):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-0.35, 0.35, (n, 3)).astype(np.float32)
    opacity = rng.uniform(0.3, 0.95, (n, 1)).astype(np.float32)
    scales = rng.uniform(0.02, scale, (n, 2)).astype(np.float32)
    quat = rng.normal(size=(n, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    rgb = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return pack_gaussians(GaussianSplats(
        xyz=jnp.asarray(xyz), opacity=jnp.asarray(opacity),
        scale=jnp.asarray(scales), rotation=jnp.asarray(quat),
        rgb=jnp.asarray(rgb)))


BG = jnp.ones(3, jnp.float32)


class TestAnalytic:
    """Single-splat analytic ground truths."""

    def test_center_hit_color_and_alpha(self):
        # one camera-facing disk at the origin, camera on +x axis looking at it
        cam = make_camera(0, 0)
        # disk normal along x (towards camera): rotation = identity has normal
        # = z column; use quat rotating z->x: 90° about y
        q = np.array([np.cos(np.pi / 4), 0, np.sin(np.pi / 4), 0], np.float32)
        g = pack_gaussians(GaussianSplats(
            xyz=jnp.zeros((1, 3)), opacity=jnp.array([[0.8]]),
            scale=jnp.full((1, 2), 0.1), rotation=jnp.asarray(q)[None],
            rgb=jnp.array([[1.0, 0.0, 0.0]])))
        out = rz.rasterize_naive(g, cam["cam_view"], cam["cam_view_proj"],
                                 cam["tanfov"], 64, 64, BG)
        c = np.asarray(out["image"][32, 32])
        a = float(out["alpha"][32, 32])
        # centre pixel: rho≈0 ⇒ alpha≈opacity; color = a*red + (1-a)*white
        assert a == pytest.approx(0.8, abs=0.01)
        np.testing.assert_allclose(c, [1.0, 0.2, 0.2], atol=0.02)
        # depth ≈ camera distance 1.8
        d = float(out["depth_expected"][32, 32]) / max(a, 1e-6)
        assert d == pytest.approx(1.8, abs=0.01)
        # median crossing: T passes 0.5 at this splat
        assert float(out["depth_median"][32, 32]) == pytest.approx(1.8, abs=0.01)

    def test_gaussian_falloff(self):
        cam = make_camera(0, 0)
        q = np.array([np.cos(np.pi / 4), 0, np.sin(np.pi / 4), 0], np.float32)
        s = 0.2
        g = pack_gaussians(GaussianSplats(
            xyz=jnp.zeros((1, 3)), opacity=jnp.array([[0.9]]),
            scale=jnp.full((1, 2), s), rotation=jnp.asarray(q)[None],
            rgb=jnp.array([[0.0, 1.0, 0.0]])))
        H = 128
        out = rz.rasterize_naive(g, cam["cam_view"], cam["cam_view_proj"],
                                 cam["tanfov"], H, H, BG)
        alpha = np.asarray(out["alpha"])
        # analytic: pixel at image offset dx from centre corresponds to
        # world offset y = dx/ (0.5*H/tanfov) * depth; uv = y/s
        focal_pix = 0.5 * H / float(cam["tanfov"])
        cx = (H - 1) / 2
        for dx in [5, 10, 20]:
            y_world = dx / focal_pix * 1.8
            rho = (y_world / s) ** 2
            expect = 0.9 * np.exp(-0.5 * rho)
            got = alpha[int(round(cx)), int(round(cx + dx))]
            # pixel grid centre offset ±0.5px tolerance
            assert got == pytest.approx(expect, rel=0.15, abs=0.01)

    def test_two_splats_depth_order(self):
        cam = make_camera(0, 0)
        q = np.array([np.cos(np.pi / 4), 0, np.sin(np.pi / 4), 0], np.float32)
        # red in front (closer to camera at +x), blue behind
        g = pack_gaussians(GaussianSplats(
            xyz=jnp.array([[0.2, 0, 0], [-0.2, 0, 0]]),
            opacity=jnp.array([[0.6], [0.9]]),
            scale=jnp.full((2, 2), 0.15),
            rotation=jnp.tile(jnp.asarray(q)[None], (2, 1)),
            rgb=jnp.array([[1.0, 0, 0], [0, 0, 1.0]])))
        out = rz.rasterize_naive(g, cam["cam_view"], cam["cam_view_proj"],
                                 cam["tanfov"], 64, 64, BG)
        c = np.asarray(out["image"][32, 32])
        # front-to-back: 0.6 red + 0.4*0.9 blue + 0.04 white
        expect = 0.6 * np.array([1, 0, 0]) + 0.36 * np.array([0, 0, 1.0]) \
            + 0.04 * np.ones(3)
        np.testing.assert_allclose(c, expect, atol=0.02)
        # feed in the reversed order — depth sort must fix it
        g_rev = g[::-1]
        out2 = rz.rasterize_naive(g_rev, cam["cam_view"], cam["cam_view_proj"],
                                  cam["tanfov"], 64, 64, BG)
        np.testing.assert_allclose(np.asarray(out2["image"][32, 32]), c,
                                   atol=1e-5)

    def test_normal_map_faces_camera(self):
        cam = make_camera(0, 0)
        q = np.array([np.cos(np.pi / 4), 0, np.sin(np.pi / 4), 0], np.float32)
        g = pack_gaussians(GaussianSplats(
            xyz=jnp.zeros((1, 3)), opacity=jnp.array([[0.95]]),
            scale=jnp.full((1, 2), 0.1), rotation=jnp.asarray(q)[None],
            rgb=jnp.full((1, 3), 0.5)))
        out = rz.rasterize_naive(g, cam["cam_view"], cam["cam_view_proj"],
                                 cam["tanfov"], 64, 64, BG)
        n_view = np.array(out["normal_view"][32, 32])
        n_view /= np.linalg.norm(n_view)
        # view space: camera looks down +z ⇒ facing normal ≈ -z
        np.testing.assert_allclose(n_view, [0, 0, -1], atol=1e-3)


class TestTiledVsOracle:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_allclose(self, seed):
        cam = make_camera(20, 45 + 10 * seed)
        g = make_splats(256, seed=seed)
        H = 64
        ref = rz.rasterize_naive(g, cam["cam_view"], cam["cam_view_proj"],
                                 cam["tanfov"], H, H, BG)
        got = rz.rasterize_tiled(g, cam["cam_view"], cam["cam_view_proj"],
                                 cam["tanfov"], BG, H, H, tile=16,
                                 max_per_tile=512, chunk=128, tile_group=16)
        for k in ref:
            np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                       atol=2e-4, err_msg=k)

    def test_background(self):
        cam = make_camera(0, 0)
        g = make_splats(8, scale=0.03)
        bg = jnp.array([0.2, 0.4, 0.6])
        out = rz.rasterize_tiled(g, cam["cam_view"], cam["cam_view_proj"],
                                 cam["tanfov"], bg, 64, 64, tile=16,
                                 max_per_tile=128, chunk=64, tile_group=16)
        corner = np.asarray(out["image"][0, 0])
        np.testing.assert_allclose(corner, [0.2, 0.4, 0.6], atol=1e-3)


class TestGradients:
    def _loss(self, g, cam, renderer):
        if renderer == "naive":
            out = rz.rasterize_naive(g, cam["cam_view"], cam["cam_view_proj"],
                                     cam["tanfov"], 32, 32, BG)
        else:
            out = rz.rasterize_tiled(g, cam["cam_view"], cam["cam_view_proj"],
                                     cam["tanfov"], BG, 32, 32, tile=16,
                                     max_per_tile=128, chunk=64, tile_group=4)
        return (jnp.sum(out["image"] ** 2) + jnp.sum(out["alpha"])
                + 0.1 * jnp.sum(out["dist"])
                + 0.1 * jnp.sum(out["normal_view"]))

    def test_grads_finite_and_match(self):
        cam = make_camera(10, 30)
        g = make_splats(64)
        g_naive = jax.grad(lambda x: self._loss(x, cam, "naive"))(g)
        g_tiled = jax.grad(lambda x: self._loss(x, cam, "tiled"))(g)
        assert np.isfinite(np.asarray(g_naive)).all()
        assert np.isfinite(np.asarray(g_tiled)).all()
        # atol 5e-4: fp32 summation-order noise — the tiled path partitions
        # the depth-sorted splats into different chunks than the oracle.
        np.testing.assert_allclose(np.asarray(g_tiled), np.asarray(g_naive),
                                   rtol=1e-3, atol=5e-4)

    def test_grad_numerical(self):
        # central-difference check on a few coordinates
        cam = make_camera(0, 0)
        g = make_splats(8, scale=0.15)
        f = lambda x: self._loss(x, cam, "naive")  # noqa: E731
        analytic = np.asarray(jax.grad(f)(g))
        rng = np.random.default_rng(0)
        for _ in range(6):
            i = rng.integers(0, g.shape[0])
            j = rng.integers(0, 13)
            # fp32 central differences are noisy (loss ~1e3, cancellation);
            # no single eps is reliable for every coordinate, so require the
            # BEST of three stencil widths to agree — a wrong analytic
            # gradient matches none of them.
            nums = []
            for eps in (3e-4, 1e-3, 3e-3):
                e = jnp.zeros_like(g).at[i, j].set(eps)
                nums.append((float(f(g + e)) - float(f(g - e))) / (2 * eps))
            a = float(analytic[i, j])
            best = min(nums, key=lambda n: abs(n - a))
            assert best == pytest.approx(a, rel=0.05, abs=2e-2), (i, j, nums)


class TestRankPairs:
    def test_rank_pairs_equivalent_to_id_pairs(self):
        """`rank_pairs=True` must produce the SAME per-tile depth-ordered
        segments as the id-pairs co-sort: ids = depth_order[ranks]."""
        from gaussiananything_tpu.data.synthetic import make_object
        from gaussiananything_tpu.ops import rasterize as rz
        from gaussiananything_tpu.render import cameras

        g = make_object(3, n=2048)
        cam = cameras.pose_to_gs_camera(jnp.asarray(
            cameras.generate_input_camera(1.8, [(15, 70)])[0]))
        sp = rz.preprocess_splats(g, cam["cam_view"], cam["cam_view_proj"],
                                  128, 128, cam["tanfov"])
        p1, s1, c1 = rz.build_tile_pairs(sp, 128, 128, 16, 512)
        p2, s2, c2, order = rz.build_tile_pairs(sp, 128, 128, 16, 512,
                                                rank_pairs=True)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
        ids_from_ranks = np.asarray(jnp.take(order, p2))
        p1 = np.asarray(p1)
        for t in range(len(c1)):
            seg = slice(int(s1[t]), int(s1[t]) + int(c1[t]))
            np.testing.assert_array_equal(ids_from_ranks[seg], p1[seg],
                                          err_msg=f"tile {t}")
