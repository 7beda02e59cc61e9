import jax.numpy as jnp
import numpy as np

from gaussiananything_tpu.render import cameras


def test_world2view_roundtrip():
    pose = cameras.generate_input_camera(1.8, [(20, 65)])[0]
    c2w = pose[:16].reshape(4, 4)
    cam_view = cameras.world2view(jnp.asarray(c2w))
    # row-vector convention: [x, 1] @ cam_view = view coords
    origin = jnp.array([*c2w[:3, 3], 1.0]) @ cam_view
    np.testing.assert_allclose(np.asarray(origin[:3]), 0.0, atol=1e-5)


def test_camera_looks_at_origin():
    pose = cameras.generate_input_camera(1.8, [(30, 120)])[0]
    cam = cameras.pose_to_gs_camera(jnp.asarray(pose))
    # world origin should project to the image centre with positive depth
    h = jnp.array([0.0, 0.0, 0.0, 1.0]) @ cam["cam_view_proj"]
    ndc = h[:2] / h[3]
    np.testing.assert_allclose(np.asarray(ndc), 0.0, atol=1e-5)
    view = jnp.array([0.0, 0.0, 0.0, 1.0]) @ cam["cam_view"]
    assert float(view[2]) > 0  # +z towards scene
    np.testing.assert_allclose(float(view[2]), 1.8, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cam["cam_pos"]),
                               np.asarray(pose[:16].reshape(4, 4)[:3, 3]),
                               atol=1e-6)


def test_projection_depth_range():
    pose = cameras.generate_input_camera(1.8, [(0, 0)])[0]
    cam = cameras.pose_to_gs_camera(jnp.asarray(pose))
    # a point at znear maps to z/w = 0; at zfar to 1
    cam_pos = np.asarray(cam["cam_pos"])
    fwd = -cam_pos / np.linalg.norm(cam_pos)
    for dist, expect in [(cameras.ZNEAR, 0.0), (cameras.ZFAR, 1.0)]:
        p = cam_pos + fwd * dist
        h = jnp.array([*p, 1.0]) @ cam["cam_view_proj"]
        np.testing.assert_allclose(float(h[2] / h[3]), expect, atol=1e-4)


def test_plucker_rays_shape_and_norm():
    pose = cameras.generate_input_camera(1.8, [(10, 30)])[0]
    c2w = jnp.asarray(pose[:16].reshape(4, 4))
    K = jnp.asarray(pose[16:].reshape(3, 3))
    pl = cameras.plucker_rays(c2w, K, 32, 32)
    assert pl.shape == (6, 32, 32)
    d = np.asarray(pl[3:])
    np.testing.assert_allclose(np.linalg.norm(d, axis=0), 1.0, atol=1e-5)
    # central ray ≈ camera forward (+z column of c2w)
    center_dir = d[:, 16, 16]
    fwd = np.asarray(c2w[:3, 2])
    assert np.dot(center_dir, fwd) > 0.99


def test_uni_mesh_path_count():
    poses = cameras.uni_mesh_path(10)
    assert poses.shape == (50, 25)


def test_rotmat_quat_roundtrip():
    from gaussiananything_tpu.utils.quaternions import (quat_to_rotmat,
                                                        rotmat_to_quat)
    rng = np.random.default_rng(0)
    q = rng.normal(size=(64, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q *= np.where(q[:, :1] < 0, -1, 1)
    R = quat_to_rotmat(jnp.asarray(q))
    q2 = rotmat_to_quat(R)
    np.testing.assert_allclose(np.asarray(q2), q, atol=1e-4)
