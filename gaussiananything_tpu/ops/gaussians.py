"""13-channel 2D surfel Gaussian parameterisation.

Channel layout (parity with `nsr/gs_surfel.py:67-72`):
    [0:3]   xyz position
    [3:4]   opacity
    [4:6]   scale (2 dof — surfel tangent extents)
    [6:10]  rotation quaternion (w, x, y, z)
    [10:13] rgb (colors_precomp, sh_degree 0)

Activation contract (parity with `vit/vit_triplane.py:1303-1313,1388-1400`):
    pos     = clip(anchor + tanh(raw) * POS_OFFSET_GAIN, ±POS_BOUND)
    opacity = sigmoid(raw)
    scale   = softplus(raw) * SCALE_GAIN          (SCALE_GAIN = 0.45*0.01/softplus(0))
    rot     = l2-normalise(raw)
    rgb     = 0.5 * tanh(raw) + 0.5
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

POS_BOUND = 0.45
# offsets: tanh * 0.45 * 0.5 * skip_weight(0.1)  (`vit/vit_triplane.py:1289-1290`)
POS_OFFSET_GAIN = 0.45 * 0.5 * 0.1
SCALE_GAIN = 0.45 * 0.01 / float(np.log(2.0))  # softplus(0) = ln 2


class GaussianSplats(NamedTuple):
    """Structure-of-arrays view of a batch of surfel gaussians."""

    xyz: jnp.ndarray        # (..., N, 3)
    opacity: jnp.ndarray    # (..., N, 1)
    scale: jnp.ndarray      # (..., N, 2)
    rotation: jnp.ndarray   # (..., N, 4) wxyz, unit norm
    rgb: jnp.ndarray        # (..., N, 3)


def unpack_gaussians(g: jnp.ndarray) -> GaussianSplats:
    assert g.shape[-1] == 13, f"expected 13 channels, got {g.shape[-1]}"
    return GaussianSplats(
        xyz=g[..., 0:3],
        opacity=g[..., 3:4],
        scale=g[..., 4:6],
        rotation=g[..., 6:10],
        rgb=g[..., 10:13],
    )


def pack_gaussians(s: GaussianSplats) -> jnp.ndarray:
    return jnp.concatenate(
        [s.xyz, s.opacity, s.scale, s.rotation, s.rgb], axis=-1)


def activate_gaussians(raw: jnp.ndarray, anchor_xyz: jnp.ndarray,
                       skip_weight: float = 0.1,
                       pos_bound: float = POS_BOUND) -> jnp.ndarray:
    """raw 13-ch head output + anchor positions -> activated 13-ch gaussians.

    `skip_weight` scales the tanh offset (reference default 0.1,
    `vit/vit_triplane.py:1289`).

    Always computes (and returns) fp32 regardless of the head's compute
    dtype: the activated gaussians feed the fp32 rasterizer and camera
    math, pinning the bf16↔fp32 boundary here (the reference's BF16 AMP
    likewise autocasts the renderer inputs back to fp32,
    `nsr/train_util.py:119-127`).
    """
    raw = raw.astype(jnp.float32)
    anchor_xyz = anchor_xyz.astype(jnp.float32)
    offset = jnp.tanh(raw[..., 0:3]) * (pos_bound * 0.5 * skip_weight)
    xyz = jnp.clip(anchor_xyz + offset, -pos_bound, pos_bound)
    opacity = jax.nn.sigmoid(raw[..., 3:4])
    scale = jax.nn.softplus(raw[..., 4:6]) * SCALE_GAIN
    rot = raw[..., 6:10]
    # safe normalise (finite grad at 0 — see utils.quaternions.normalize)
    rot = rot * jax.lax.rsqrt(jnp.sum(rot * rot, axis=-1, keepdims=True)
                              + 1e-16)
    rgb = 0.5 * jnp.tanh(raw[..., 10:13]) + 0.5
    return jnp.concatenate([xyz, opacity, scale, rot, rgb], axis=-1)


def activate_gaussians_at(pos: jnp.ndarray, raw: jnp.ndarray) -> jnp.ndarray:
    """Activate opacity/scale/rot/rgb from `raw` with the POSITION given
    directly (the reference's `_gaussian_pred_activations(pos=..., x=...)`,
    `vit/vit_triplane.py:1425-1436`: upsampled positions are formed from the
    residual pre-activation upstream, not from the summed child raw)."""
    raw = raw.astype(jnp.float32)
    opacity = jax.nn.sigmoid(raw[..., 3:4])
    scale = jax.nn.softplus(raw[..., 4:6]) * SCALE_GAIN
    rot = raw[..., 6:10]
    rot = rot * jax.lax.rsqrt(jnp.sum(rot * rot, axis=-1, keepdims=True)
                              + 1e-16)
    rgb = 0.5 * jnp.tanh(raw[..., 10:13]) + 0.5
    return jnp.concatenate([pos.astype(jnp.float32), opacity, scale, rot,
                            rgb], axis=-1)


def inverse_sigmoid(x, eps: float = 1e-6):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x) - jnp.log1p(-x)
