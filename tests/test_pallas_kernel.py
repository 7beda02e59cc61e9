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
