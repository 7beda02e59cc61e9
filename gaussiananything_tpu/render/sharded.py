"""Multi-chip pixel/ray-sharded rendering via shard_map.

The TPU answer to the rasterizer-scaling north star (BASELINE.md: ≥90%
linear rays/s scaling 1 chip → ≥2 hosts): the image's ROWS are sharded over
the mesh `tile` axis — each chip renders its horizontal band against the
full (replicated) splat set (≤73k splats ≈ 6 MB fp32: replication is free,
matching the "replicate primitives, shard rays" plan in SURVEY.md §5.7).
No collectives are needed in the forward pass; the backward all-reduces
splat gradients over `tile` automatically (psum inserted by shard_map's
transpose), riding ICI.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gaussiananything_tpu.ops import rasterize as rz


def render_view_sharded(mesh: Mesh, gaussians: jnp.ndarray,
                        cam_view: jnp.ndarray, cam_view_proj: jnp.ndarray,
                        tanfov, bg_color: jnp.ndarray, out_size: int,
                        tile: int = 16, max_per_tile: int = 1024,
                        chunk: int = 256, impl: str = "xla"
                        ) -> Dict[str, jnp.ndarray]:
    """One view rendered with rows sharded over the mesh `tile` axis.

    gaussians (N, 13) replicated; returns full (H, W, C…) maps.
    impl: "xla" | "fused" | "fused_nograd" — the fused Pallas kernels
    compose with row bands through their `row0`/`full_h` support (each
    shard bins + composites only its band's tiles).
    """
    n_shards = mesh.shape["tile"]
    assert out_size % (n_shards * tile) == 0, (
        f"out_size {out_size} must be divisible by tile-axis {n_shards} × "
        f"tile {tile}")
    band = out_size // n_shards

    def worker(g, cv, cvp, tf, bg):
        i = jax.lax.axis_index("tile")
        if impl in ("fused", "fused_nograd"):
            from gaussiananything_tpu.ops import rasterize_pallas as rp
            fn = (rp.rasterize_tiled_v4_train if impl == "fused"
                  else rp.rasterize_tiled_v4)
            out = fn(g, cv, cvp, tf, bg, band, out_size, tile=tile,
                     max_per_tile=max_per_tile, chunk=chunk,
                     full_h=out_size, row0=i * band)
        else:
            out = rz.rasterize_tiled(
                g, cv, cvp, tf, bg, band, out_size, tile=tile,
                max_per_tile=max_per_tile, chunk=chunk,
                tile_group=max(1, (band // tile) * (out_size // tile) // 8),
                full_h=out_size, row0=i * band)
        return out

    try:
        shard_map = jax.shard_map
    except AttributeError:  # older jax
        from jax.experimental.shard_map import shard_map

    # check_vma off: the scan carry inside the rasterizer starts replicated
    # and becomes device-varying, which the static VMA checker rejects.
    try:
        shard = shard_map(
            worker, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P()),
            out_specs=P("tile"), check_vma=False)
    except TypeError:  # older keyword
        shard = shard_map(
            worker, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P()),
            out_specs=P("tile"), check_rep=False)
    return shard(gaussians, cam_view, cam_view_proj,
                 jnp.asarray(tanfov, jnp.float32), bg_color)
