"""Farthest point sampling — jit-safe O(K·N) masked-argmax scan.

TPU-native replacement for pytorch3d's CUDA `sample_farthest_points`
(consumed at `nsr/srt/encoder.py:533` to pick 768 latent anchors from the
surface point cloud). The sequential K-step scan is the right shape for TPU:
each step is a fused (N,)-vector distance update + argmax, no dynamic shapes.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k",))
def sample_farthest_points(points: jnp.ndarray, k: int,
                           mask: jnp.ndarray | None = None,
                           deterministic_start: bool = True,
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """points (..., N, 3) -> (selected (..., k, 3), indices (..., k)).

    `mask` (..., N) optionally marks valid input points (padding excluded).
    Start point is index 0 (deterministic, matching pytorch3d's
    random_start=False path).
    """

    def _single(pts, msk):
        n = pts.shape[0]
        big = jnp.float32(1e10)
        valid = msk if msk is not None else jnp.ones((n,), bool)
        start = jnp.argmax(valid)  # first valid point

        def body(carry, _):
            dists, last_idx = carry
            last = pts[last_idx]
            d = jnp.sum((pts - last[None, :]) ** 2, axis=-1)
            dists = jnp.minimum(dists, d)
            masked = jnp.where(valid, dists, -big)
            nxt = jnp.argmax(masked)
            return (dists, nxt), last_idx

        (_, _), idxs = jax.lax.scan(
            body, (jnp.full((n,), big), start), None, length=k)
        return pts[idxs], idxs

    batch = points.shape[:-2]
    flat = points.reshape((-1,) + points.shape[-2:])
    if mask is not None:
        mflat = mask.reshape((-1,) + mask.shape[-1:])
        sel, idx = jax.vmap(_single)(flat, mflat)
    else:
        sel, idx = jax.vmap(lambda p: _single(p, None))(flat)
    return sel.reshape(batch + (k, 3)), idx.reshape(batch + (k,))
