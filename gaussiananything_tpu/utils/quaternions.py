"""Quaternion / rotation utilities (pure JAX, batched, jit-safe).

Capability parity with the reference's `utils/general_utils.py:153 build_rotation`
and pytorch3d's `matrix_to_quaternion` (used by `nsr/lsgm/flow_matching_trainer.py`).
Quaternions are (w, x, y, z), matching the reference convention.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize(v: jnp.ndarray, eps: float = 1e-8, axis: int = -1) -> jnp.ndarray:
    """Safe normalise: v / sqrt(Σv² + eps²).

    NOT `v / (‖v‖ + eps)`: sqrt has infinite slope at 0, so that form emits
    NaN gradients for exactly-zero vectors (e.g. padded dummy splats) even
    when the incoming cotangent is zero.
    """
    return v * jax.lax.rsqrt(jnp.sum(v * v, axis=axis, keepdims=True)
                             + eps * eps)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz quaternion -> (..., 3, 3) rotation matrix.

    Matches `build_rotation` in the reference (`utils/general_utils.py:153`):
    the quaternion is L2-normalised first; columns of R are the rotated basis
    axes, so for a 2D surfel R[..., :, 0] / R[..., :, 1] are the tangential
    axes and R[..., :, 2] is the normal.
    """
    q = normalize(q)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
            2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
            2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(q.shape[:-1] + (3, 3))


def rotmat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation matrix -> (..., 4) wxyz quaternion.

    Branch-free Shepperd's method (jit-safe): compute all four candidate
    quaternions and select by the largest diagonal combination.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    def _sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    tx = 1 + m00 - m11 - m22
    ty = 1 - m00 + m11 - m22
    tz = 1 - m00 - m11 + m22
    tw = 1 + m00 + m11 + m22
    q_w = jnp.stack([tw, m21 - m12, m02 - m20, m10 - m01], -1) / (2 * _sqrt(tw))[..., None]
    q_x = jnp.stack([m21 - m12, tx, m01 + m10, m02 + m20], -1) / (2 * _sqrt(tx))[..., None]
    q_y = jnp.stack([m02 - m20, m01 + m10, ty, m12 + m21], -1) / (2 * _sqrt(ty))[..., None]
    q_z = jnp.stack([m10 - m01, m02 + m20, m12 + m21, tz], -1) / (2 * _sqrt(tz))[..., None]

    idx = jnp.argmax(jnp.stack([tw, tx, ty, tz], -1), axis=-1)
    cands = jnp.stack([q_w, q_x, q_y, q_z], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    q = normalize(q)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of wxyz quaternions."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )
