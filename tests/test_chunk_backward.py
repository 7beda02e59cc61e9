"""Pin the hand-derived chunk VJP (`ops/rasterize._chunk_backward`) to
jax autodiff of `composite_chunk_grouped` on randomized inputs.

This is the unit-level guarantee under the frame-level custom VJP
(`_composite_frame_bwd`), which `tests/test_rasterize.py::TestGradients`
checks end-to-end against the oracle. Role parity: the CUDA backward
kernel of `diff-surfel-rasterization` (consumed at `nsr/gs_surfel.py:15`).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gaussiananything_tpu.ops import rasterize as rz


def _random_case(seed: int, G: int = 3, P: int = 16, K: int = 32):
    rng = np.random.default_rng(seed)
    data = np.zeros((rz.PACKED_F, G, K), np.float32)
    data[0:9] = rng.normal(size=(9, G, K)) * 0.05
    data[9:12] = rng.normal(size=(3, G, K)) * 0.01
    data[11] += 2.0                                       # tz2 ~ depth scale
    data[12] = rng.uniform(0, 4, (G, K))
    data[13] = rng.uniform(0, 4, (G, K))
    data[14] = rng.uniform(1.0, 3.0, (G, K))
    data[15] = rng.uniform(0, 1, (G, K))
    data[16:22] = rng.normal(size=(6, G, K)) * 0.5 + 0.3
    px = rng.uniform(0, 4, (G, P)).astype(np.float32)
    py = rng.uniform(0, 4, (G, P)).astype(np.float32)
    state = rz.init_pixel_state_g(G, P)._replace(
        trans=jnp.asarray(rng.uniform(0.3, 1.0, (G, P)), jnp.float32),
        alpha_acc=jnp.asarray(rng.uniform(0, 0.5, (G, P)), jnp.float32),
        dist_d=jnp.asarray(rng.uniform(0, 0.3, (G, P)), jnp.float32),
        dist_d2=jnp.asarray(rng.uniform(0, 0.2, (G, P)), jnp.float32))
    ct = rz.PixelState(*[
        jnp.asarray(rng.normal(size=np.asarray(x).shape), jnp.float32)
        for x in state])
    return state, jnp.asarray(px), jnp.asarray(py), jnp.asarray(data), ct


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_autodiff(seed):
    state, px, py, data, ct = _random_case(seed)
    _, vjp = jax.vjp(
        lambda s, d: rz.composite_chunk_grouped(s, px, py, d), state, data)
    ref_s, ref_d = vjp(ct)
    got_s, got_d = rz._chunk_backward(state, px, py, data, ct)
    for name in ref_s._fields:
        a, b = np.asarray(getattr(ref_s, name)), np.asarray(
            getattr(got_s, name))
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5,
                                   err_msg=f"state ct: {name}")
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(ref_d),
                               rtol=1e-4,
                               atol=1e-4 * float(np.abs(ref_d).max() + 1),
                               err_msg="data ct")


def test_dummy_column_gets_zero_cotangent():
    """Masked/padded lanes (opacity 0) must receive exactly zero data
    cotangent — the frame backward scatter-adds every lane, relying on
    dead lanes contributing nothing."""
    state, px, py, data, ct = _random_case(3)
    data = data.at[rz._PK_OP, :, ::2].set(0.0)
    _, got_d = rz._chunk_backward(state, px, py, data, ct)
    assert float(np.abs(np.asarray(got_d)[:, :, ::2]).max()) == 0.0
