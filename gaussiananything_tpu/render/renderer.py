"""Batched multi-view 2DGS renderer.

API parity with `GaussianRenderer2DGS.render` (`nsr/gs_surfel.py:41,195-202`)
but with the B×V python loop replaced by `jax.vmap` over views and batch —
one fused XLA program renders all views.

Returns channel-first maps:
  image (B,V,3,H,W) in [0,1], alpha (B,V,1,H,W), depth (median, B,V,1,H,W),
  rend_normal (world-space, B,V,3,H,W), dist (B,V,1,H,W),
  depth_expected (B,V,1,H,W).
"""
from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from gaussiananything_tpu.ops import rasterize as rz


def default_impl(grad: bool = True) -> str:
    """Production impl pick: the fused Pallas kernels on TPU (forward-only
    variant when no gradients are needed), the XLA path elsewhere (the
    Pallas interpreter on CPU is orders slower than compiled XLA)."""
    if jax.default_backend() == "tpu":
        return "fused" if grad else "fused_nograd"
    return "xla"


class GaussianRenderer2DGS:
    """Stateless config holder mirroring the reference class."""

    def __init__(self, output_size: int = 512, tile: int = 16,
                 max_per_tile: int = 1024, chunk: int = 256,
                 tile_group: int = 16,
                 bg_color=(1.0, 1.0, 1.0), impl: str = "xla"):
        # defaults = the measured 512² optimum (BENCH_NOTES round-3 sweep)
        self.output_size = output_size
        self.tile = tile
        self.max_per_tile = max_per_tile
        self.chunk = chunk
        self.tile_group = tile_group
        self.bg_color = jnp.asarray(bg_color, jnp.float32)
        self.impl = impl

    def render(self, gaussians: jnp.ndarray, cam_view: jnp.ndarray,
               cam_view_proj: jnp.ndarray, cam_pos: jnp.ndarray,
               tanfov: jnp.ndarray, bg_color: Optional[jnp.ndarray] = None,
               output_size: Optional[int] = None) -> Dict[str, jnp.ndarray]:
        """gaussians (B,N,13); cam_view/cam_view_proj (B,V,4,4);
        cam_pos (B,V,3); tanfov scalar or (B,V)."""
        out_size = output_size or self.output_size
        bg = self.bg_color if bg_color is None else jnp.asarray(bg_color)
        B, V = cam_view.shape[:2]
        tanfov = jnp.broadcast_to(jnp.asarray(tanfov, jnp.float32), (B, V))
        if bg.ndim == 1:
            bg = jnp.broadcast_to(bg, (B, V, 3))
        return render_multiview(
            gaussians, cam_view, cam_view_proj, tanfov, bg, out_size,
            self.tile, self.max_per_tile, self.chunk, self.tile_group,
            impl=self.impl)


@functools.partial(
    jax.jit,
    static_argnames=("out_size", "tile", "max_per_tile", "chunk",
                     "tile_group", "impl", "mesh"))
def render_multiview(gaussians, cam_view, cam_view_proj, tanfov, bg,
                     out_size: int, tile: int, max_per_tile: int, chunk: int,
                     tile_group: int, impl: str = "xla", mesh=None
                     ) -> Dict[str, jnp.ndarray]:
    """impl: "xla" = differentiable XLA compositing loop (hand-managed
    reverse-scan VJP); "fused" = the Pallas v4 fused forward + fused
    analytic Pallas backward (the fast path for BOTH inference and
    training); "fused_nograd" = v4 forward only (no VJP machinery).

    mesh: a `jax.sharding.Mesh` with a `tile` axis → each view's rows are
    band-sharded over that axis via `render.sharded.render_view_sharded`
    (shard_map; splat cotangents psum over `tile` in the backward). The
    surrounding computation stays in GSPMD global semantics, so losses
    computed on the returned maps are value-identical to the unsharded
    path — this is the multi-chip rays/s scaling plan of SURVEY.md §5.7.
    """
    def one_view(g, cv, cvp, tf, bgc):
        if mesh is not None:
            from gaussiananything_tpu.render import sharded
            out = sharded.render_view_sharded(
                mesh, g, cv, cvp, tf, bgc, out_size, tile=tile,
                max_per_tile=max_per_tile, chunk=chunk, impl=impl)
        elif impl == "fused":
            from gaussiananything_tpu.ops.rasterize_pallas import (
                rasterize_tiled_v4_train)
            out = rasterize_tiled_v4_train(
                g, cv, cvp, tf, bgc, out_size, out_size, tile=tile,
                max_per_tile=max_per_tile, chunk=chunk)
        elif impl == "fused_nograd":
            from gaussiananything_tpu.ops.rasterize_pallas import (
                rasterize_tiled_v4)
            out = rasterize_tiled_v4(
                g, cv, cvp, tf, bgc, out_size, out_size, tile=tile,
                max_per_tile=max_per_tile, chunk=chunk)
        else:
            out = rz.rasterize_tiled(
                g, cv, cvp, tf, bgc, out_size, out_size, tile=tile,
                max_per_tile=max_per_tile, chunk=chunk,
                tile_group=tile_group)
        # world-space normal: row-vector view → world rotation is cv[:3,:3]
        # applied inverse ⇒ n_world = n_view @ cv[:3,:3].T  (parity with
        # `nsr/gs_surfel.py:128`, which right-multiplies by view_matrix[:3,:3].T).
        # Componentwise on (H, W) planes: a (H, W, 3) matmul both pads the
        # minor dim 3→128 (T(8,128) layout) and rounds MXU inputs to bf16
        # at default precision; scalar-broadcast fma is exact fp32.
        nv = [out["normal_view"][..., i] for i in range(3)]
        n_world = jnp.stack(
            [nv[0] * cv[j, 0] + nv[1] * cv[j, 1] + nv[2] * cv[j, 2]
             for j in range(3)], axis=-1)
        alpha = out["alpha"][..., None]
        depth_exp = out["depth_expected"][..., None] / jnp.maximum(alpha, 1e-10)
        depth_exp = jnp.where(alpha > 1e-6, depth_exp, 0.0)
        return {
            "image": jnp.clip(out["image"], 0.0, 1.0),
            "alpha": alpha,
            "depth": out["depth_median"][..., None],
            "depth_expected": depth_exp,
            "rend_normal": n_world,
            "dist": out["dist"][..., None],
        }

    # lax.map (NOT vmap) over flattened B·V views: under vmap the
    # rasterizer's count-adaptive `lax.cond` chunk skipping lowers to
    # `select`, executing every chunk for every tile (measured 2.7 M vs
    # 7.4 M rays/s at 512²/73k splats). Each view already exposes
    # thousands of parallel tiles, so serializing views loses nothing.
    B, V = cam_view.shape[:2]
    S = B * V
    flat = jax.tree.map(
        lambda a: a.reshape((S,) + a.shape[2:]),
        (cam_view, cam_view_proj, tanfov, bg))
    bidx = jnp.arange(S, dtype=jnp.int32) // V

    def body(args):
        bi, cv, cvp, tf, bgc = args
        return one_view(gaussians[bi], cv, cvp, tf, bgc)

    out = jax.lax.map(body, (bidx,) + flat)
    out = jax.tree.map(
        lambda a: a.reshape((B, V) + a.shape[1:]), out)
    # (B,V,H,W,C) → channel-first (B,V,C,H,W) for reference-parity consumers.
    return {k: jnp.moveaxis(v, -1, 2) for k, v in out.items()}
