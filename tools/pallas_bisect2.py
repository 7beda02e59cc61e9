"""Variant A: field-major geom (16, T, M) / feat (8, T, M) / state (16, G, P).

Hypothesis: v2's slow Mosaic compiles come from lane-dim field indexing
(geom_ref[:, :, i] = a relayout per field). Field-major blocks make every
field access a leading-dim offset with NO relayout.
"""
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G, P, CHUNK, NC = 8, 256, 256, 4
NG = 8
T = NG * G


def _lane_cumsum(x):
    n = x.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 1)
    s = 1
    while s < n:
        shifted = pltpu.roll(x, shift=s, axis=len(x.shape) - 1)
        x = x + jnp.where(lane >= s, shifted, 0.0)
        s *= 2
    return x


def make_kernel(stage):
    def kernel(scal_ref, geom_ref, feat_ref, px_ref, py_ref, out_ref,
               st_ref):
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            st_ref[0] = jnp.ones((G, P), jnp.float32)
            st_ref[1:16] = jnp.zeros((15, G, P), jnp.float32)

        gmax = scal_ref[pl.program_id(0)]
        trans = st_ref[0][:, :, None]                 # (G, P, 1)
        active = (c * CHUNK < gmax) & (jnp.max(trans) > 1e-4)

        @pl.when(active)
        def _():
            px = px_ref[0][:, :, None]                # (G, P, 1)
            py = py_ref[0][:, :, None]

            def col(i):
                return geom_ref[i][:, None, :]        # (G, 1, CHUNK)

            k0 = px * col(6) - col(0)
            k1 = px * col(7) - col(1)
            k2 = px * col(8) - col(2)
            l0 = py * col(6) - col(3)
            l1 = py * col(7) - col(4)
            l2 = py * col(8) - col(5)
            p0 = k1 * l2 - k2 * l1
            p1 = k2 * l0 - k0 * l2
            p2 = k0 * l1 - k1 * l0
            safe = jnp.where(jnp.abs(p2) < 1e-9, 1e-9, p2)
            u = p0 / safe
            v = p1 / safe
            rho = u * u + v * v
            if stage == 0:
                st_ref[1] = st_ref[1] + jnp.sum(rho, axis=2)
                return
            alpha = jnp.minimum(col(15) * jnp.exp(-0.5 * rho), 0.99)
            alpha = jnp.where(alpha >= 1.0 / 255, alpha, 0.0)
            if stage == 1:
                st_ref[1] = st_ref[1] + jnp.sum(alpha, axis=2)
                return
            log1m = jnp.log1p(-alpha)
            cums = _lane_cumsum(log1m)
            t_excl = jnp.exp(cums - log1m)
            w = trans * alpha * t_excl
            if stage == 2:
                st_ref[1] = st_ref[1] + jnp.sum(w, axis=2)
                st_ref[0] = st_ref[0] * jnp.exp(cums[:, :, CHUNK - 1])
                return

            def fcol(i):
                return feat_ref[i][:, None, :]

            st_ref[1] = st_ref[1] + jnp.sum(w * fcol(0), axis=2)
            st_ref[2] = st_ref[2] + jnp.sum(w * fcol(1), axis=2)
            st_ref[3] = st_ref[3] + jnp.sum(w * fcol(2), axis=2)
            st_ref[4] = st_ref[4] + jnp.sum(w, axis=2)
            st_ref[0] = st_ref[0] * jnp.exp(cums[:, :, CHUNK - 1])

        @pl.when(c == NC - 1)
        def _():
            out_ref[:, :, :] = st_ref[:, :, :]

    return kernel


def compile_stage(stage):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NG, NC),
        in_specs=[
            pl.BlockSpec((16, G, CHUNK), lambda g, c, s: (0, g, c)),
            pl.BlockSpec((8, G, CHUNK), lambda g, c, s: (0, g, c)),
            pl.BlockSpec((1, G, P), lambda g, c, s: (0, g, 0)),
            pl.BlockSpec((1, G, P), lambda g, c, s: (0, g, 0)),
        ],
        out_specs=pl.BlockSpec((16, G, P), lambda g, c, s: (0, g, 0)),
        scratch_shapes=[pltpu.VMEM((16, G, P), jnp.float32)],
    )
    f = pl.pallas_call(
        make_kernel(stage),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((16, T, P), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary")),
    )
    gmax = jnp.full((NG,), CHUNK * NC, jnp.int32)
    geom = jnp.ones((16, T, NC * CHUNK), jnp.float32)
    feat = jnp.ones((8, T, NC * CHUNK), jnp.float32)
    px = jnp.ones((1, T, P), jnp.float32)
    py = jnp.ones((1, T, P), jnp.float32)
    t0 = time.perf_counter()
    out = jax.block_until_ready(jax.jit(f)(gmax, geom, feat, px, py))
    print(f"A stage {stage}: compile+run {time.perf_counter()-t0:7.1f} s  "
          f"digest {float(jnp.sum(out)):.3e}", flush=True)


if __name__ == "__main__":
    import sys
    stages = [int(a) for a in sys.argv[1:]] or [0]
    for s in stages:
        compile_stage(s)
