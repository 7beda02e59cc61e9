"""Per-sample assembly of the 15-channel encoder input and GS camera dicts.

Parity with the reference dataset's `PostProcess`
(`datasets/g_buffer_objaverse.py:109,189-261`): the encoder consumes
15 channels per view = rgb(3, imagenet-normalised) ‖ normal(3) ‖
plucker rays(6) ‖ world xyz(3) (channel assembly at `:256-261`, asserted at
`nsr/srt/encoder.py:552`). Depth maps are backprojected to world xyz with
the camera; masked pixels get xyz = 0.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from gaussiananything_tpu.render import cameras as cam_mod

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def backproject_depth(depth: jnp.ndarray, c2w: jnp.ndarray,
                      tanfov: jnp.ndarray) -> jnp.ndarray:
    """depth (..., 1, H, W) + c2w (..., 4, 4) → world xyz (..., 3, H, W)."""
    H, W = depth.shape[-2:]
    xs = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W * 2 - 1
    ys = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H * 2 - 1
    gx, gy = jnp.meshgrid(xs, ys)

    def one(d, pose, tf):
        z = d[0]
        pts_view = jnp.stack([gx * tf * z, gy * tf * z, z], -1)  # (H, W, 3)
        R = pose[:3, :3]   # camera axes as columns (c2w)
        t = pose[:3, 3]
        pts_world = jnp.einsum("hwj,ij->hwi", pts_view, R,
                               precision=jax.lax.Precision.HIGHEST) + t
        return jnp.moveaxis(pts_world, -1, 0)

    flat_d = depth.reshape((-1,) + depth.shape[-3:])
    flat_p = c2w.reshape((-1, 4, 4))
    flat_t = jnp.broadcast_to(jnp.asarray(tanfov),
                              depth.shape[:-3]).reshape(-1)
    out = jax.vmap(one)(flat_d, flat_p, flat_t)
    return out.reshape(depth.shape[:-3] + (3, H, W))


def assemble_encoder_input(rgb: jnp.ndarray, normal: jnp.ndarray,
                           depth: jnp.ndarray, alpha: jnp.ndarray,
                           pose25: jnp.ndarray) -> jnp.ndarray:
    """(B, V, 3/3/1/1, H, W) maps + (B, V, 25) poses → (B, V, 15, H, W)."""
    B, V, _, H, W = rgb.shape
    mean = jnp.asarray(IMAGENET_MEAN).reshape(1, 1, 3, 1, 1)
    std = jnp.asarray(IMAGENET_STD).reshape(1, 1, 3, 1, 1)
    rgb_n = (rgb - mean) / std

    c2w = pose25[..., :16].reshape(B, V, 4, 4)
    K = pose25[..., 16:].reshape(B, V, 3, 3)
    plucker = cam_mod.plucker_rays(c2w, K, H, W)         # (B, V, 6, H, W)
    fx = pose25[..., 16]
    tanfov = jnp.tan(cam_mod.focal2fov(fx) / 2)

    xyz = backproject_depth(depth, c2w, tanfov)
    xyz = xyz * (alpha > 0.5)
    return jnp.concatenate([rgb_n, normal, plucker, xyz], axis=2)


def canonicalize_poses(pose25: jnp.ndarray, canonical_idx: int = 0
                       ) -> jnp.ndarray:
    """Rebase a view chunk's c2w poses so view `canonical_idx` sits at the
    canonical position (identity rotation, camera on -z at its own radius).

    Parity with `normalize_camera(for_encoder=False)`
    (`datasets/g_buffer_objaverse.py:355-399`, the frame_0_as_canonical
    training-time pose canonicalization; transform = F @ inv(c2w[idx]) with
    F = eye(4) except F[2,3] = -|t_idx|, applied to every pose in the
    chunk). pose25 (V, 25): 16 c2w + 9 K; K rows pass through.
    """
    V = pose25.shape[0]
    c2w = pose25[:, :16].reshape(V, 4, 4)
    radius = jnp.linalg.norm(c2w[canonical_idx, :3, 3])
    fixed = jnp.eye(4).at[2, 3].set(-radius)
    transform = fixed @ jnp.linalg.inv(c2w[canonical_idx])
    new_c2w = jnp.einsum("ij,vjk->vik", transform, c2w,
                         precision=jax.lax.Precision.HIGHEST)
    return jnp.concatenate([new_c2w.reshape(V, 16), pose25[:, 16:]], axis=-1)


def canonicalize_pts(pose25: jnp.ndarray, pcd: jnp.ndarray,
                     canonical_idx: int = 0) -> jnp.ndarray:
    """Move a world-space point cloud into the canonical frame of view
    `canonical_idx` — the SAME rigid transform `canonicalize_poses`
    applies to the cameras, so rebased poses keep seeing the same scene.

    Parity with `canonicalize_pts` (`datasets/g_buffer_objaverse.py:291-321`:
    new_pcd = (F @ inv(c2w[idx]) @ [pcd; 1])[:3]). pcd (..., N, 3).
    """
    c2w = pose25[canonical_idx, :16].reshape(4, 4)
    radius = jnp.linalg.norm(c2w[:3, 3])
    fixed = jnp.eye(4).at[2, 3].set(-radius)
    transform = fixed @ jnp.linalg.inv(c2w)
    return (jnp.einsum("ij,...nj->...ni", transform[:3, :3], pcd,
                       precision=jax.lax.Precision.HIGHEST)
            + transform[:3, 3])
