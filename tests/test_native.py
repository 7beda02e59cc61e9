import numpy as np
import pytest

from gaussiananything_tpu import native_bindings


@pytest.mark.skipif(not native_bindings.have_native(),
                    reason="native lib not built (make -C native)")
class TestNative:
    def test_surface_nets_matches_python(self):
        from gaussiananything_tpu.render.tsdf import \
            surface_nets as py_surface_nets
        D = 32
        bound = 0.495
        lin = (np.arange(D) + 0.5) / D * 2 * bound - bound
        gx, gy, gz = np.meshgrid(lin, lin, lin, indexing="ij")
        sdf = (np.sqrt(gx**2 + gy**2 + gz**2) - 0.3).astype(np.float32)
        col = np.random.default_rng(0).uniform(
            size=(D, D, D, 3)).astype(np.float32)
        v_py, f_py, c_py = py_surface_nets(sdf, col, bound)
        v_c, f_c, c_c = native_bindings.surface_nets(sdf, col, bound)
        assert len(v_c) == len(v_py)
        assert len(f_c) == len(f_py)
        # vertex ordering may differ; compare as sorted sets
        sv_py = np.array(sorted(map(tuple, np.round(v_py, 5))))
        sv_c = np.array(sorted(map(tuple, np.round(v_c, 5))))
        np.testing.assert_allclose(sv_c, sv_py, atol=1e-4)
        rad = np.linalg.norm(v_c, axis=1)
        assert abs(rad.mean() - 0.3) < 0.02
        assert f_c.max() < len(v_c)
        assert c_c.shape == (len(v_c), 3)

    def test_ply_native_roundtrip(self, tmp_path):
        from gaussiananything_tpu.render.ply_io import read_ply, write_ply
        rng = np.random.default_rng(0)
        fields = {k: rng.normal(size=100).astype(np.float32)
                  for k in ["x", "y", "z", "opacity"]}
        p = str(tmp_path / "native.ply")
        write_ply(p, fields)  # routes through native writer
        back = read_ply(p)
        for k in fields:
            np.testing.assert_allclose(back[k], fields[k], atol=1e-6)


def test_tsdf_integrate_native_matches_jax():
    """C++ OpenMP TSDF fusion == the jitted JAX integrate (same math,
    bilinear corners, running means) on a synthetic two-view scene."""
    import jax.numpy as jnp
    import numpy as np
    from gaussiananything_tpu import native_bindings
    from gaussiananything_tpu.render.tsdf import integrate_tsdf

    if not native_bindings.have_tsdf_integrate():
        import pytest
        pytest.skip("native lib unavailable")

    rng = np.random.default_rng(0)
    V, H, W, D = 2, 17, 19, 16
    depth = (1.5 + 0.3 * rng.random((V, 1, H, W))).astype(np.float32)
    rgb = rng.random((V, 3, H, W)).astype(np.float32)
    alpha = (rng.random((V, 1, H, W)) > 0.2).astype(np.float32)
    cv = np.stack([np.eye(4, dtype=np.float32).copy() for _ in range(V)])
    cv[0, 3, 2] = 2.0
    cv[1, 3, 2] = 2.2
    cv[1, 3, 0] = 0.1
    tanfov = 0.6

    tsdf_j, color_j = integrate_tsdf(
        jnp.asarray(depth), jnp.asarray(rgb), jnp.asarray(alpha),
        jnp.asarray(cv), jnp.asarray(tanfov), resolution=D)
    tsdf_j = np.asarray(tsdf_j)
    color_j = np.moveaxis(np.asarray(color_j), 0, -1)

    tsdf_n, color_n = native_bindings.tsdf_integrate(
        depth, rgb, alpha, cv, tanfov, resolution=D)

    np.testing.assert_allclose(tsdf_n, tsdf_j, atol=2e-5)
    np.testing.assert_allclose(color_n, color_j, atol=2e-5)
