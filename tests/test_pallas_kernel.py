"""Pallas rasterizer kernel tests — run on TPU only (Mosaic compile);
on CPU the kernel runs in interpreter mode, which is exercised by a single
small case to keep CI time bounded."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussiananything_tpu.data.synthetic import make_object
from gaussiananything_tpu.ops import rasterize as rz
from gaussiananything_tpu.render import cameras


def setup_scene(n=512, img=64, seed=0):
    g = make_object(seed, n=n, kind="sphere")
    cam = cameras.pose_to_gs_camera(
        jnp.asarray(cameras.generate_input_camera(1.8, [(20, 45)])[0]))
    return g, cam


@pytest.mark.slow
def test_pallas_matches_xla_interpret():
    """Interpreter-mode correctness on a small scene (CPU-runnable)."""
    from gaussiananything_tpu.ops.rasterize_pallas import \
        rasterize_tiled_pallas
    g, cam = setup_scene(n=256, img=32)
    bg = jnp.ones(3)
    ref = rz.rasterize_tiled(g, cam["cam_view"], cam["cam_view_proj"],
                             cam["tanfov"], bg, 32, 32, tile=16,
                             max_per_tile=128, chunk=64, tile_group=4)
    got = rasterize_tiled_pallas(g, cam["cam_view"], cam["cam_view_proj"],
                                 cam["tanfov"], bg, 32, 32, tile=16,
                                 max_per_tile=128, chunk=64)
    for k in ["image", "alpha", "depth_median", "depth_expected",
              "normal_view"]:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   atol=5e-3, err_msg=k)


@pytest.mark.slow
def test_fused_vjp_matches_xla():
    from gaussiananything_tpu.ops.rasterize_pallas import \
        rasterize_tiled_fused
    g, cam = setup_scene(n=128, img=32)
    bg = jnp.ones(3)

    def loss_fused(gg):
        out = rasterize_tiled_fused(gg, cam["cam_view"],
                                    cam["cam_view_proj"], cam["tanfov"], bg,
                                    32, 32, tile=16, max_per_tile=128,
                                    chunk=64, tile_group=4)
        return jnp.sum(out["image"] ** 2) + jnp.sum(out["alpha"])

    def loss_xla(gg):
        out = rz.rasterize_tiled(gg, cam["cam_view"], cam["cam_view_proj"],
                                 cam["tanfov"], bg, 32, 32, tile=16,
                                 max_per_tile=128, chunk=64, tile_group=4)
        return jnp.sum(out["image"] ** 2) + jnp.sum(out["alpha"])

    g1 = jax.grad(loss_fused)(g)
    g2 = jax.grad(loss_xla)(g)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3,
                               atol=1e-4)


@pytest.mark.slow
def test_grouped_kernel_matches_xla_interpret():
    """Count-sorted grouped kernel (v2) vs XLA path, interpreter mode."""
    from gaussiananything_tpu.ops.rasterize_pallas import \
        rasterize_tiled_pallas_grouped
    g, cam = setup_scene(n=512, img=64)
    bg = jnp.ones(3)
    ref = rz.rasterize_tiled(g, cam["cam_view"], cam["cam_view_proj"],
                             cam["tanfov"], bg, 64, 64, tile=8,
                             max_per_tile=256, chunk=64, tile_group=16)
    got = rasterize_tiled_pallas_grouped(
        g, cam["cam_view"], cam["cam_view_proj"], cam["tanfov"], bg, 64,
        64, tile=8, max_per_tile=256, chunk=64, group=16)
    for k in ["image", "alpha", "depth_median", "depth_expected",
              "normal_view"]:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   atol=5e-3, err_msg=k)


@pytest.mark.slow
def test_v3_kernel_matches_xla_interpret():
    from gaussiananything_tpu.ops.rasterize_pallas import \
        rasterize_tiled_pallas_v3
    g, cam = setup_scene(n=512, img=64)
    bg = jnp.ones(3)
    ref = rz.rasterize_tiled(g, cam["cam_view"], cam["cam_view_proj"],
                             cam["tanfov"], bg, 64, 64, tile=8,
                             max_per_tile=256, chunk=64, tile_group=16)
    got = rasterize_tiled_pallas_v3(
        g, cam["cam_view"], cam["cam_view_proj"], cam["tanfov"], bg, 64,
        64, tile=8, max_per_tile=256, chunk=64, group=8)
    for k in ["image", "alpha", "depth_median"]:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   atol=5e-3, err_msg=k)


def test_v4_matches_xla_interpret():
    """v4 packed-step kernel vs the XLA path, interpreter mode, all
    channels; includes a big-splat scene to exercise the 6x6 bucket."""
    from gaussiananything_tpu.ops.rasterize_pallas import rasterize_tiled_v4
    for seed, n in ((0, 512), (3, 1024)):
        g, cam = setup_scene(n=n, img=64, seed=seed)
        bg = jnp.ones(3)
        ref = rz.rasterize_tiled(g, cam["cam_view"], cam["cam_view_proj"],
                                 cam["tanfov"], bg, 64, 64, tile=16,
                                 max_per_tile=256, chunk=64, tile_group=4)
        got = rasterize_tiled_v4(g, cam["cam_view"], cam["cam_view_proj"],
                                 cam["tanfov"], bg, 64, 64, tile=16,
                                 max_per_tile=256, chunk=64, group=4,
                                 steps_per_group=4.0)
        for k in ref:
            np.testing.assert_allclose(np.asarray(got[k]),
                                       np.asarray(ref[k]),
                                       atol=2e-5, rtol=1e-4, err_msg=k)


def test_v4_step_budget_degrades_gracefully():
    """Starved step budget must keep every tile initialised (no garbage
    pixels) and only drop the DEEPEST tiles' tails."""
    from gaussiananything_tpu.ops.rasterize_pallas import rasterize_tiled_v4
    g, cam = setup_scene(n=1024, img=64, seed=1)
    bg = jnp.ones(3)
    ref = rz.rasterize_tiled(g, cam["cam_view"], cam["cam_view_proj"],
                             cam["tanfov"], bg, 64, 64, tile=16,
                             max_per_tile=256, chunk=64, tile_group=4)
    got = rasterize_tiled_v4(g, cam["cam_view"], cam["cam_view_proj"],
                             cam["tanfov"], bg, 64, 64, tile=16,
                             max_per_tile=256, chunk=64, group=4,
                             steps_per_group=1.0)   # starved: 1 chunk/group
    a = np.asarray(got["alpha"])
    r = np.asarray(ref["alpha"])
    assert np.all(np.isfinite(np.asarray(got["image"])))
    # starved alpha can only be missing mass, never extra
    assert (a <= r + 1e-5).all()


def test_v4_vjp_gradients_match_xla():
    from gaussiananything_tpu.ops.rasterize_pallas import (
        rasterize_tiled_v4_train)
    g, cam = setup_scene(n=128, img=32)
    bg = jnp.ones(3)

    def loss_fused(gg):
        out = rasterize_tiled_v4_train(gg, cam["cam_view"],
                                       cam["cam_view_proj"], cam["tanfov"],
                                       bg, 32, 32, tile=16, max_per_tile=128,
                                       chunk=64, group=2,
                                       steps_per_group=2.0)
        return jnp.sum(out["image"] ** 2) + jnp.sum(out["dist"])

    def loss_xla(gg):
        out = rz.rasterize_tiled(gg, cam["cam_view"], cam["cam_view_proj"],
                                 cam["tanfov"], bg, 32, 32, tile=16,
                                 max_per_tile=128, chunk=64, tile_group=4)
        return jnp.sum(out["image"] ** 2) + jnp.sum(out["dist"])

    g1 = jax.grad(loss_fused)(g)
    g2 = jax.grad(loss_xla)(g)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=2e-3,
                               atol=2e-4)


def test_v4_binning_rank_fallback():
    """Outside the packed-key regime (> 16382 tiles or > 131072 splats)
    `_v4_binning` falls back to the id-payload co-sort: pairs hold SPLAT
    IDS directly (dorder None) and the bins match rank-regime bins after
    rank→id translation (ADVICE r4 item 1)."""
    from gaussiananything_tpu.ops.rasterize_pallas import _v4_binning
    g, cam = setup_scene(n=256, img=64)
    sp = rz.preprocess_splats(g, cam["cam_view"], cam["cam_view_proj"],
                              64, 64, cam["tanfov"])
    n_tiles = (64 // 16) ** 2
    # rank regime
    p_r, s_r, c_r, dorder = _v4_binning(sp, 64, 64, 16, 128, 0, 0,
                                        n_tiles, 256)
    assert dorder is not None
    # forced fallback: lie about n_tiles so the regime check fails
    p_f, s_f, c_f, d_f = _v4_binning(sp, 64, 64, 16, 128, 0, 0,
                                     (1 << 14), 256)
    assert d_f is None
    np.testing.assert_array_equal(np.asarray(c_r), np.asarray(c_f))
    np.testing.assert_array_equal(np.asarray(s_r), np.asarray(s_f))
    ids_from_ranks = np.asarray(dorder)[np.asarray(p_r[:-128])]
    for t in range(n_tiles):
        a = ids_from_ranks[int(s_r[t]):int(s_r[t]) + int(c_r[t])]
        b = np.asarray(p_f)[int(s_f[t]):int(s_f[t]) + int(c_f[t])]
        np.testing.assert_array_equal(a, b, err_msg=f"tile {t}")


@pytest.mark.slow
def test_v4_fused_row_band_sharding_interpret():
    """impl='fused_nograd' composes with row-band sharding: two v4 band
    renders (row0/full_h) tile together into the full-image v4 render
    (the render_view_sharded worker contract, ADVICE r4 item 5)."""
    from gaussiananything_tpu.ops.rasterize_pallas import rasterize_tiled_v4
    g, cam = setup_scene(n=256, img=64)
    bg = jnp.ones(3)
    args = (g, cam["cam_view"], cam["cam_view_proj"], cam["tanfov"], bg)
    full = rasterize_tiled_v4(*args, 64, 64, tile=16, max_per_tile=128,
                              chunk=64, group=4)
    bands = [rasterize_tiled_v4(*args, 32, 64, tile=16, max_per_tile=128,
                                chunk=64, group=4, full_h=64, row0=r)
             for r in (0, 32)]
    for k in ["image", "alpha", "normal_view", "dist"]:
        stacked = jnp.concatenate([b[k] for b in bands], axis=0)
        np.testing.assert_allclose(np.asarray(stacked), np.asarray(full[k]),
                                   atol=1e-5, err_msg=k)
