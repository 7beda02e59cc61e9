"""Camera math for 2DGS rendering and multi-view data, pure JAX / numpy-free.

Conventions (identical to the reference so data & checkpoints interoperate):
  * All camera matrices are stored ROW-VECTOR style (transposed vs column
    convention): ``x_clip = [x_world, 1] @ cam_view_proj``. This matches
    `world_view_transform.transpose(0,1)` in the reference
    (`nsr/lsgm/flow_matching_trainer.py:2174-2228` ``c_to_3dgs_format``).
  * Projection: OpenGL-style perspective with z mapped to [0, zfar/(zfar-znear)]
    as in `utils/gs_utils/graphics_utils.py:getProjectionMatrix` (z_sign=+1,
    camera looks down +z in view space).
  * 25-dim flat pose layout = 16 (c2w, row-major) + 9 (K, row-major), as
    produced by the reference dataset (`datasets/g_buffer_objaverse.py`
    ``read_camera_matrix_single``).
  * znear=0.01, zfar=100 (reference defaults).

Everything is batched & jit-safe; host-side helpers take/return jnp arrays.
"""
from __future__ import annotations

import math
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gaussiananything_tpu.utils.quaternions import rotmat_to_quat

ZNEAR = 0.01
ZFAR = 100.0


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal, pixels=1.0):
    return 2 * jnp.arctan2(pixels, 2 * focal)


def world2view(c2w: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) camera-to-world -> ROW-VECTOR world-to-view transform.

    Equivalent to ``getWorld2View2(R, t).T`` of the reference (no translate /
    scale): the returned M satisfies x_view = [x_world, 1] @ M.
    """
    w2c = jnp.linalg.inv(c2w)
    return jnp.swapaxes(w2c, -1, -2)


def projection_matrix(znear: float = ZNEAR, zfar: float = ZFAR,
                      fov_x: float = math.radians(30.0),
                      fov_y: float | None = None) -> jnp.ndarray:
    """Row-vector perspective projection (transpose of the reference's
    `getProjectionMatrix`, `utils/gs_utils/graphics_utils.py:65-88`)."""
    if fov_y is None:
        fov_y = fov_x
    tan_x = math.tan(fov_x / 2)
    tan_y = math.tan(fov_y / 2)
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 1.0 / tan_x
    P[1, 1] = 1.0 / tan_y
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = 1.0
    P[3, 2] = -(zfar * znear) / (zfar - znear)
    return jnp.asarray(P)


def pose_to_gs_camera(pose25: jnp.ndarray, znear: float = ZNEAR,
                      zfar: float = ZFAR) -> Dict[str, jnp.ndarray]:
    """25-dim flat pose -> GS render camera dict.

    Mirrors `c_to_3dgs_format` (`nsr/lsgm/flow_matching_trainer.py:2174-2228`)
    but batched & jit-safe. Returns keys: cam_view (…,4,4), cam_view_proj
    (…,4,4), cam_pos (…,3), tanfov (…,), source_cv2wT_quat (…,4).
    """
    batch = pose25.shape[:-1]
    c2w = pose25[..., :16].reshape(batch + (4, 4))
    fx = pose25[..., 16]
    fov = focal2fov(fx)  # (...,)
    tanfov = jnp.tan(fov / 2)

    cam_view = world2view(c2w)
    # per-sample projection (fov may vary): build row-vector proj directly
    inv_tan = 1.0 / tanfov
    zeros = jnp.zeros_like(inv_tan)
    ones = jnp.ones_like(inv_tan)
    zz = ones * (zfar / (zfar - znear))
    zw = ones * (-(zfar * znear) / (zfar - znear))
    proj = jnp.stack(
        [
            jnp.stack([inv_tan, zeros, zeros, zeros], -1),
            jnp.stack([zeros, inv_tan, zeros, zeros], -1),
            jnp.stack([zeros, zeros, zz, ones], -1),
            jnp.stack([zeros, zeros, zw, zeros], -1),
        ],
        axis=-2,
    )
    cam_view_proj = jnp.matmul(cam_view, proj, precision=jax.lax.Precision.HIGHEST)
    cam_pos = c2w[..., :3, 3]
    cv2wT_quat = rotmat_to_quat(jnp.swapaxes(c2w[..., :3, :3], -1, -2))
    return {
        "cam_view": cam_view,
        "cam_view_proj": cam_view_proj,
        "cam_pos": cam_pos,
        "tanfov": tanfov,
        "source_cv2wT_quat": cv2wT_quat,
        "orig_c2w": c2w,
    }


def intrinsics_from_fov(fov_deg: float = 30.0) -> np.ndarray:
    """Normalised 3x3 K for fov (reference uses fov 30° ⇒ fx≈1.3889,
    `nsr/camera_utils.py` fixed intrinsics)."""
    focal = 0.5 / math.tan(math.radians(fov_deg) / 2)
    return np.array([[focal, 0, 0.5], [0, focal, 0.5], [0, 0, 1]], dtype=np.float32)


def look_at(cam_pos: np.ndarray, target: np.ndarray | None = None,
            up: Sequence[float] = (0.0, 0.0, 1.0)) -> np.ndarray:
    """z-up look-at camera-to-world (forward = +z of the camera frame towards
    the target, matching the reference's `generate_input_camera`
    `nsr/camera_utils.py:197`)."""
    if target is None:
        target = np.zeros(3, dtype=np.float32)
    forward = target - cam_pos
    forward = forward / (np.linalg.norm(forward) + 1e-8)
    up = np.asarray(up, dtype=np.float32)
    right = np.cross(forward, up)
    right /= np.linalg.norm(right) + 1e-8
    cam_up = np.cross(right, forward)
    c2w = np.eye(4, dtype=np.float32)
    # camera frame: x=right, y=-cam_up (image down), z=forward — OpenCV style,
    # consistent with the projection above (view +z towards the scene).
    c2w[:3, 0] = right
    c2w[:3, 1] = -cam_up
    c2w[:3, 2] = forward
    c2w[:3, 3] = cam_pos
    return c2w


def generate_input_camera(r: float, poses_deg: Sequence[Tuple[float, float]],
                          fov_deg: float = 30.0) -> np.ndarray:
    """Spherical pose synthesis: list of (elevation, azimuth) in degrees at
    radius r -> (V, 25) flat poses (16 c2w + 9 K).

    Parity with `generate_input_camera` (`nsr/camera_utils.py:197`).
    """
    K = intrinsics_from_fov(fov_deg).reshape(-1)
    out = []
    for elev, azi in poses_deg:
        elev_r, azi_r = math.radians(elev), math.radians(azi)
        pos = np.array(
            [
                r * math.cos(elev_r) * math.cos(azi_r),
                r * math.cos(elev_r) * math.sin(azi_r),
                r * math.sin(elev_r),
            ],
            dtype=np.float32,
        )
        c2w = look_at(pos)
        out.append(np.concatenate([c2w.reshape(-1), K]))
    return np.stack(out).astype(np.float32)


def uni_mesh_path(n_azimuths: int = 10, radius: float = 1.8,
                  fov_deg: float = 30.0) -> np.ndarray:
    """5 elevations × n azimuths camera sweep used for TSDF fusion / videos
    (parity with `uni_mesh_path`, `nsr/camera_utils.py:233`)."""
    elevations = [0, -30, 30, -60, 60]
    poses = [(e, a) for e in elevations
             for a in np.linspace(0, 360, n_azimuths, endpoint=False)]
    return generate_input_camera(radius, poses, fov_deg)


def sample_uniform_cameras_on_sphere(rng: np.random.Generator, n: int,
                                     radius: float = 1.8,
                                     fov_deg: float = 30.0) -> np.ndarray:
    """Uniform sphere sampling (parity with `nsr/camera_utils.py:268`)."""
    z = rng.uniform(-1, 1, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    elev = np.degrees(np.arcsin(z))
    azi = np.degrees(phi)
    return generate_input_camera(radius, list(zip(elev, azi)), fov_deg)


def plucker_rays(c2w: jnp.ndarray, K: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Per-pixel Plücker embedding (cross(o,d)‖d, 6 channels) from pose +
    normalised intrinsics; parity with the reference dataset's `gen_rays` +
    plucker assembly (`datasets/g_buffer_objaverse.py:189-226,256-261`).

    c2w: (..., 4, 4); K: (..., 3, 3) normalised (cx,cy in [0,1]).
    Returns (..., 6, h, w).
    """
    x = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    y = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    xx, yy = jnp.meshgrid(x, y)  # (h, w)
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    dirs_cam = jnp.stack(
        [
            (xx - cx[..., None, None]) / fx[..., None, None],
            (yy - cy[..., None, None]) / fy[..., None, None],
            jnp.ones_like(xx) * jnp.ones_like(cx)[..., None, None],
        ],
        axis=-1,
    )  # (..., h, w, 3)
    R = c2w[..., :3, :3]
    d = jnp.einsum("...hwj,...ij->...hwi", dirs_cam, R,
                   precision=jax.lax.Precision.HIGHEST)
    # x·rsqrt(Σx²+eps²): norm(x)+eps has NaN gradients at x=0 (CLAUDE.md)
    d = d * jax.lax.rsqrt(jnp.sum(d * d, axis=-1, keepdims=True) + 1e-16)
    o = jnp.broadcast_to(c2w[..., None, None, :3, 3], d.shape)
    plucker = jnp.concatenate([jnp.cross(o, d), d], axis=-1)  # (..., h, w, 6)
    return jnp.moveaxis(plucker, -1, -3)
