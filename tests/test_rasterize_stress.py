"""Stress / degradation-contract tests for the tiled rasterizer.

Covers the cases VERDICT.md flagged untested: per-tile list overflow
(counts > max_per_tile), the 6×6-tile footprint clamp on giant splats,
big-bucket capacity overflow (two-bucket binning), larger-scene
tiled-vs-oracle parity, and the reference allmap channel semantics
(`nsr/gs_surfel.py:121-142`).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussiananything_tpu.ops import rasterize as rz
from gaussiananything_tpu.ops.gaussians import GaussianSplats, pack_gaussians
from gaussiananything_tpu.render import cameras


def make_camera(elev=0.0, azi=0.0, r=1.8):
    pose = cameras.generate_input_camera(r, [(elev, azi)])[0]
    return cameras.pose_to_gs_camera(jnp.asarray(pose))


def make_splats(n=64, seed=0, scale=0.08, spread=0.35):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    opacity = rng.uniform(0.3, 0.95, (n, 1)).astype(np.float32)
    scales = rng.uniform(scale / 4, scale, (n, 2)).astype(np.float32)
    quat = rng.normal(size=(n, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    rgb = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return pack_gaussians(GaussianSplats(
        xyz=jnp.asarray(xyz), opacity=jnp.asarray(opacity),
        scale=jnp.asarray(scales), rotation=jnp.asarray(quat),
        rgb=jnp.asarray(rgb)))


BG = jnp.ones(3, jnp.float32)


def render_tiled(g, cam, H, **kw):
    kw.setdefault("tile", 16)
    kw.setdefault("max_per_tile", 512)
    kw.setdefault("chunk", 128)
    kw.setdefault("tile_group", 16)
    return rz.rasterize_tiled(g, cam["cam_view"], cam["cam_view_proj"],
                              cam["tanfov"], BG, H, H, **kw)


class TestTileOverflow:
    """counts > max_per_tile: the list keeps the NEAREST max_per_tile
    splats (farthest-first drop), so on a single-tile image the overflowed
    render equals the oracle on the nearest-k subset."""

    def _nearest_k(self, g, cam, k):
        sp = rz.preprocess_splats(g, cam["cam_view"], cam["cam_view_proj"],
                                  16, 16, cam["tanfov"])
        z = np.where(np.asarray(sp.valid), np.asarray(sp.center_z), np.inf)
        return g[np.argsort(z)[:k]]

    def test_overflow_drops_farthest_first(self):
        cam = make_camera(5, 30)
        # 128 tiny splats clustered so every one lands in the single tile
        g = make_splats(128, seed=3, scale=0.01, spread=0.02)
        k = 32
        got = render_tiled(g, cam, 16, tile=16, max_per_tile=k, chunk=16,
                           tile_group=1)
        ref = rz.rasterize_naive(self._nearest_k(g, cam, k),
                                 cam["cam_view"], cam["cam_view_proj"],
                                 cam["tanfov"], 16, 16, BG)
        for key in ("image", "alpha", "depth_median"):
            np.testing.assert_allclose(np.asarray(got[key]),
                                       np.asarray(ref[key]),
                                       atol=2e-4, err_msg=key)

    def test_counts_capped(self):
        cam = make_camera(5, 30)
        g = make_splats(128, seed=3, scale=0.01, spread=0.02)
        sp = rz.preprocess_splats(g, cam["cam_view"], cam["cam_view_proj"],
                                  16, 16, cam["tanfov"])
        lists, counts = rz.build_tile_lists(sp, 16, 16, 16, 32)
        assert int(counts.max()) == 32
        assert int((lists[0] >= 0).sum()) == 32


class TestFootprintClamp:
    """A giant splat's 3σ halo is cropped at the global 6×6-tile window:
    inside the window the tiled render matches the oracle rendered with the
    same radius clamp; outside it falls back to background."""

    def _giant(self):
        # one huge camera-facing disk: projected radius far beyond 6 tiles
        q = np.array([np.cos(np.pi / 4), 0, np.sin(np.pi / 4), 0], np.float32)
        return pack_gaussians(GaussianSplats(
            xyz=jnp.zeros((1, 3)), opacity=jnp.array([[0.9]]),
            scale=jnp.full((1, 2), 1.2), rotation=jnp.asarray(q)[None],
            rgb=jnp.array([[1.0, 0.0, 0.0]])))

    def test_clamped_window_matches_oracle_inside(self):
        cam = make_camera(0, 0)
        g = self._giant()
        H, tile = 128, 16
        got = render_tiled(g, cam, H, tile=tile, max_per_tile=64, chunk=32,
                           tile_group=4)
        ref = rz.rasterize_naive(g, cam["cam_view"], cam["cam_view_proj"],
                                 cam["tanfov"], H, H, BG)

        sp = rz.preprocess_splats(g, cam["cam_view"], cam["cam_view_proj"],
                                  H, H, cam["tanfov"])
        cx, cy = [float(v) for v in np.asarray(sp.center_pix)[0]]
        r_clamp = (6 - 1) * tile / 2
        # strictly inside the clamp radius the halo is untouched
        yy, xx = np.mgrid[0:H, 0:H]
        inside = (np.abs(xx - cx) < r_clamp - tile) & \
                 (np.abs(yy - cy) < r_clamp - tile)
        img_g, img_r = np.asarray(got["image"]), np.asarray(ref["image"])
        np.testing.assert_allclose(img_g[inside], img_r[inside], atol=2e-3)
        # well outside the 6×6 window: background (splat cropped)
        outside = (np.abs(xx - cx) > r_clamp + 2 * tile) | \
                  (np.abs(yy - cy) > r_clamp + 2 * tile)
        if outside.any():
            np.testing.assert_allclose(img_g[outside], 1.0, atol=1e-3)

    def test_full_vs_band_crop_identical(self):
        """The clamp is a global constant: a band render must cut the giant
        splat exactly like the full-image render (sharded-render contract)."""
        cam = make_camera(0, 0)
        g = self._giant()
        H, band = 128, 64
        full = render_tiled(g, cam, H, tile=16, max_per_tile=64, chunk=32,
                            tile_group=4)
        top = rz.rasterize_tiled(g, cam["cam_view"], cam["cam_view_proj"],
                                 cam["tanfov"], BG, band, H, tile=16,
                                 max_per_tile=64, chunk=32, tile_group=4,
                                 full_h=H, row0=0)
        bot = rz.rasterize_tiled(g, cam["cam_view"], cam["cam_view_proj"],
                                 cam["tanfov"], BG, band, H, tile=16,
                                 max_per_tile=64, chunk=32, tile_group=4,
                                 full_h=H, row0=band)
        np.testing.assert_allclose(
            np.concatenate([np.asarray(top["image"]),
                            np.asarray(bot["image"])], axis=0),
            np.asarray(full["image"]), atol=2e-4)


class TestBigBucketOverflow:
    """Two-bucket binning: bigs beyond `big_capacity` degrade to their
    top-left 2×2 tile window instead of vanishing."""

    def _two_bigs(self):
        q = np.array([np.cos(np.pi / 4), 0, np.sin(np.pi / 4), 0], np.float32)
        return pack_gaussians(GaussianSplats(
            xyz=jnp.array([[0.0, -0.3, 0.3], [0.0, 0.3, -0.3]]),
            opacity=jnp.full((2, 1), 0.9),
            scale=jnp.full((2, 2), 0.35),
            rotation=jnp.broadcast_to(jnp.asarray(q), (2, 4)),
            rgb=jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])))

    def test_overflow_big_keeps_topleft_window(self):
        cam = make_camera(0, 0)
        g = self._two_bigs()
        H, tile = 128, 16
        sp = rz.preprocess_splats(g, cam["cam_view"], cam["cam_view_proj"],
                                  H, H, cam["tanfov"])
        _, _, c_full = rz.build_tile_pairs(sp, H, H, tile, 512)
        _, _, c_capped = rz.build_tile_pairs(sp, H, H, tile, 512,
                                             big_capacity=1)
        full, capped = int(c_full.sum()), int(c_capped.sum())
        # the nearer big keeps its full window; the second degrades to ≤4
        assert capped < full
        assert capped >= full - (36 - 4)
        # nothing vanishes entirely: both splat ids still appear
        lists, _ = rz.build_tile_lists(sp, H, H, tile, 512)
        pairs, _, counts = rz.build_tile_pairs(sp, H, H, tile, 512,
                                               big_capacity=1)
        live = np.asarray(pairs)[:int(np.asarray(c_capped).sum())]
        assert set(np.unique(live)) == {0, 1}


class TestLargerSceneParity:
    """Tiled vs oracle at 4× the old test scale (256², 2048 splats) with
    mixed footprints and per-tile overflow in the dense centre."""

    def test_allclose_256(self):
        cam = make_camera(15, 60)
        g = make_splats(2048, seed=7, scale=0.05, spread=0.3)
        H = 256
        ref = rz.rasterize_naive(g, cam["cam_view"], cam["cam_view_proj"],
                                 cam["tanfov"], H, H, BG)
        got = render_tiled(g, cam, H, tile=16, max_per_tile=2048, chunk=256,
                           tile_group=16)
        # The compositor has three discrete thresholds (ALPHA_EPS keep,
        # T_EPS early exit, T<0.5 median crossing). The tiled path's fp
        # chunk partitions differ from the oracle's, so at a handful of
        # pixels per frame a threshold flips by one splat, producing an
        # O(ALPHA_EPS)–O(inter-splat depth) jump THERE while every other
        # pixel agrees to fp noise. Contract: ≥99.95% of pixels within
        # 2e-3 AND small mean error — not elementwise allclose.
        for k in ref:
            a, b = np.asarray(got[k]), np.asarray(ref[k])
            frac = np.mean(np.abs(a - b) > 2e-3)
            assert frac < 5e-4, f"{k}: mismatch fraction {frac}"
            mean_err = np.mean(np.abs(a - b))
            assert mean_err < 5e-4, f"{k}: mean abs err {mean_err}"


class TestAllmapContract:
    """Executable mapping of our output dict onto the reference's allmap
    channels (`nsr/gs_surfel.py:121-142`):

      ch0   render_depth_expected = Σ w_i d_i   (premultiplied, NOT /alpha)
      ch1   alpha                 = Σ w_i
      ch2-4 render_normal         = Σ w_i n_i   (view space, premultiplied)
      ch5   render_depth_median   = depth at the first T<0.5 crossing
      ch6   render_dist           = distortion accumulator
    """

    def test_channel_semantics(self):
        cam = make_camera(0, 0)
        # two coaxial camera-facing disks at known depths
        q = np.array([np.cos(np.pi / 4), 0, np.sin(np.pi / 4), 0], np.float32)
        g = pack_gaussians(GaussianSplats(
            xyz=jnp.array([[0.3, 0.0, 0.0], [-0.3, 0.0, 0.0]]),
            opacity=jnp.array([[0.6], [0.9]]),
            scale=jnp.full((2, 2), 0.15),
            rotation=jnp.broadcast_to(jnp.asarray(q), (2, 4)),
            rgb=jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])))
        out = render_tiled(g, cam, 64, tile=16, max_per_tile=64, chunk=32,
                           tile_group=4)
        c = 32
        # camera at x=+1.8 looking down -x: depths 1.5 (front), 2.1 (back)
        a1, a2 = 0.6, 0.9
        w1 = a1
        w2 = (1 - a1) * a2
        alpha = float(out["alpha"][c, c])
        assert alpha == pytest.approx(w1 + w2, abs=0.01)
        # ch0: premultiplied expected depth
        de = float(out["depth_expected"][c, c])
        assert de == pytest.approx(w1 * 1.5 + w2 * 2.1, abs=0.02)
        # ch5: median = depth where transmittance first crosses 0.5
        # T after front = 0.4 < 0.5 ⇒ median is the FRONT depth
        dm = float(out["depth_median"][c, c])
        assert dm == pytest.approx(1.5, abs=0.01)
        # ch2-4: view-space normal, premultiplied by alpha-mass; both disks
        # face the camera ⇒ |normal| ≈ alpha, pointing toward camera (-z view)
        n = np.asarray(out["normal_view"][c, c])
        assert abs(n[2]) == pytest.approx(alpha, abs=0.02)
        # ch6: distortion ≥ 0 and positive when two depths mix
        assert float(out["dist"][c, c]) > 0.0

    def test_median_depth_switches_with_opacity(self):
        cam = make_camera(0, 0)
        q = np.array([np.cos(np.pi / 4), 0, np.sin(np.pi / 4), 0], np.float32)
        # weak front disk: T stays above 0.5 until the back disk
        g = pack_gaussians(GaussianSplats(
            xyz=jnp.array([[0.3, 0.0, 0.0], [-0.3, 0.0, 0.0]]),
            opacity=jnp.array([[0.3], [0.9]]),
            scale=jnp.full((2, 2), 0.15),
            rotation=jnp.broadcast_to(jnp.asarray(q), (2, 4)),
            rgb=jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])))
        out = render_tiled(g, cam, 64, tile=16, max_per_tile=64, chunk=32,
                           tile_group=4)
        assert float(out["depth_median"][32, 32]) == pytest.approx(2.1,
                                                                   abs=0.01)


class TestSortKeyPaths:
    """The packed single-int32 (tile<<17 | rank) sort key and the 2-key
    lexicographic fallback must bin identically (same pairs/starts/counts)
    — the fallback only engages at N > 2^17 or > 16k tiles, so force both
    paths explicitly on a mixed small/big-footprint scene."""

    def test_packed_vs_two_key_identical(self):
        cam = make_camera(10, 40)
        g = make_splats(512, seed=11, scale=0.12, spread=0.3)  # mixed spans
        H, tile = 128, 16
        sp = rz.preprocess_splats(g, cam["cam_view"], cam["cam_view_proj"],
                                  H, H, cam["tanfov"])
        p1, s1, c1 = rz.build_tile_pairs(sp, H, H, tile, 256,
                                         packed_key=True)
        p2, s2, c2 = rz.build_tile_pairs(sp, H, H, tile, 256,
                                         packed_key=False)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
        # compare only live slots (dead tail may hold different sentinels)
        starts, counts = np.asarray(s1), np.asarray(c1)
        for t in range(starts.shape[0]):
            a = np.asarray(p1)[starts[t]:starts[t] + counts[t]]
            b = np.asarray(p2)[starts[t]:starts[t] + counts[t]]
            np.testing.assert_array_equal(a, b)


class TestSaturationEarlyExit:
    """Transmittance flush-to-zero + group-level chunk early exit.

    A depth-stacked wall of near-opaque splats saturates interior pixels
    after a handful of splats; the tiled path then SKIPS the remaining
    chunks of those groups (the CUDA rasterizer's per-pixel `T < 1e-4`
    termination, at group granularity). The skip must be invisible:
    tiled == oracle within the usual parity tolerance, saturated pixels'
    transmittance flushes to exactly zero (image == rgb with NO bg
    residue), and gradients stay finite and path-consistent."""

    def _wall(self, n_layers=24, side=12, op=0.9):
        xs = np.linspace(-0.3, 0.3, side, dtype=np.float32)
        gx, gy = np.meshgrid(xs, xs, indexing="ij")
        layers = []
        rng = np.random.default_rng(3)
        for i in range(n_layers):
            z = -0.2 + 0.4 * i / n_layers
            xyz = np.stack([gx.ravel(), gy.ravel(),
                            np.full(side * side, z, np.float32)], -1)
            xyz[:, :2] += rng.normal(0, 0.01, (side * side, 2))
            layers.append(xyz)
        xyz = np.concatenate(layers).astype(np.float32)
        n = xyz.shape[0]
        return pack_gaussians(GaussianSplats(
            xyz=jnp.asarray(xyz),
            opacity=jnp.full((n, 1), op, jnp.float32),
            scale=jnp.full((n, 2), 0.06, jnp.float32),
            rotation=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (n, 1)),
            rgb=jnp.asarray(
                np.random.default_rng(4).uniform(0.1, 0.9, (n, 3))
                .astype(np.float32))))

    def test_saturated_matches_oracle(self):
        cam = make_camera(0, 0)
        g = self._wall()
        H = 64
        got = render_tiled(g, cam, H, tile=16, max_per_tile=2048, chunk=64,
                           tile_group=4)
        ref = rz.rasterize_naive(g, cam["cam_view"], cam["cam_view_proj"],
                                 cam["tanfov"], H, H, BG, chunk=64,
                                 pixel_block=H * H)
        # the scene actually saturates (otherwise the test is vacuous)
        assert float(jnp.max(got["alpha"])) > 0.9999
        for k in got:
            np.testing.assert_allclose(np.asarray(got[k]),
                                       np.asarray(ref[k]),
                                       atol=2e-4, err_msg=k)

    def test_flush_to_zero_kills_bg_residue(self):
        cam = make_camera(0, 0)
        g = self._wall()
        H = 64
        out = render_tiled(g, cam, H, tile=16, max_per_tile=2048, chunk=64,
                           tile_group=4)
        # saturated pixels: alpha == 1 would only hold with infinite
        # splats; flush means image has NO white-bg leak, so on the most
        # saturated pixel image <= rgb-accumulation max (all rgb < 0.9)
        amax = np.unravel_index(int(jnp.argmax(out["alpha"])),
                                out["alpha"].shape)
        assert float(out["alpha"][amax]) > 0.9999
        # with flush, image == accumulated rgb exactly (bg weight is 0)
        resid = float(jnp.max(out["image"][amax]))
        assert resid < 0.95  # white bg (1.0) would push this to ~1

    def test_grads_finite_and_paths_agree(self):
        cam = make_camera(0, 0)
        g = self._wall(n_layers=10, side=8)
        H = 32

        def loss_tiled(x):
            o = render_tiled(x, cam, H, tile=16, max_per_tile=512,
                             chunk=64, tile_group=2)
            return o["image"].sum() + o["dist"].sum() + o["alpha"].sum()

        def loss_naive(x):
            o = rz.rasterize_naive(x, cam["cam_view"],
                                   cam["cam_view_proj"], cam["tanfov"],
                                   H, H, BG, chunk=64, pixel_block=H * H)
            return o["image"].sum() + o["dist"].sum() + o["alpha"].sum()

        gt = jax.grad(loss_tiled)(g)
        gn = jax.grad(loss_naive)(g)
        assert bool(jnp.isfinite(gt).all()) and bool(jnp.isfinite(gn).all())
        np.testing.assert_allclose(np.asarray(gt), np.asarray(gn),
                                   rtol=1e-3, atol=5e-4)
