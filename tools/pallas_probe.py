"""Probe: Pallas v2 grouped kernel compile time + throughput vs XLA.

Usage: run from repo root on the chip. Set RES/CFG below or via env.
"""
import os
import time

import jax
import jax.numpy as jnp

from gaussiananything_tpu.data.synthetic import make_object
from gaussiananything_tpu.render import cameras
from gaussiananything_tpu.ops import rasterize as rz
from gaussiananything_tpu.ops.rasterize_pallas import (
    rasterize_tiled_pallas_grouped)

RES = int(os.environ.get("RES", 256))
N = int(os.environ.get("N", 18432))
TILE = int(os.environ.get("TILE", 16))
MPT = int(os.environ.get("MPT", 1024))
CHUNK = int(os.environ.get("CHUNK", 256))
GROUP = int(os.environ.get("GROUP", 8))
R = 20


def loop_time(step, x0, iters=3):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, R, step, x)

    jax.block_until_ready(run(x0))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x0))
        ts.append(time.perf_counter() - t0)
    return min(ts) / R * 1e3


def main():
    g = make_object(0, n=N, kind="sphere")
    cam = cameras.pose_to_gs_camera(
        jnp.asarray(cameras.generate_input_camera(1.8, [(20, 45)])[0]))
    cv, cvp, tf = cam["cam_view"], cam["cam_view_proj"], cam["tanfov"]
    bg = jnp.ones(3)

    print(f"RES={RES} N={N} tile={TILE} mpt={MPT} chunk={CHUNK} "
          f"group={GROUP}", flush=True)

    t0 = time.perf_counter()
    out = rasterize_tiled_pallas_grouped(
        g, cv, cvp, tf, bg, RES, RES, tile=TILE, max_per_tile=MPT,
        chunk=CHUNK, group=GROUP)
    jax.block_until_ready(out["image"])
    print(f"pallas v2 compile+first: {time.perf_counter()-t0:.1f} s",
          flush=True)

    def pstep(i, acc):
        out = rasterize_tiled_pallas_grouped(
            g + acc * 1e-20, cv, cvp, tf, bg, RES, RES, tile=TILE,
            max_per_tile=MPT, chunk=CHUNK, group=GROUP)
        return acc + jnp.sum(out["image"]) * 1e-9

    print(f"pallas v2 frame: {loop_time(pstep, jnp.float32(0)):8.3f} ms",
          flush=True)

    def xstep(i, acc):
        out = rz.rasterize_tiled(
            g + acc * 1e-20, cv, cvp, tf, bg, RES, RES, tile=TILE,
            max_per_tile=MPT, chunk=CHUNK, tile_group=16)
        return acc + jnp.sum(out["image"]) * 1e-9

    print(f"XLA frame:       {loop_time(xstep, jnp.float32(0)):8.3f} ms",
          flush=True)

    # value check vs XLA
    ref = rz.rasterize_tiled(g, cv, cvp, tf, bg, RES, RES, tile=TILE,
                             max_per_tile=MPT, chunk=CHUNK, tile_group=16)
    import numpy as np
    for k in ("image", "alpha"):
        d = float(jnp.max(jnp.abs(out[k] - ref[k])))
        print(f"max|Δ {k}| = {d:.2e}", flush=True)
        assert np.isfinite(d)


if __name__ == "__main__":
    main()
