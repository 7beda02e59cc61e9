"""Config sweep for the v4 fused rasterizer on the chip."""
import time

import jax
import jax.numpy as jnp

from gaussiananything_tpu.data.synthetic import make_object
from gaussiananything_tpu.render import cameras
from gaussiananything_tpu.ops import rasterize as rz
from gaussiananything_tpu.ops.rasterize_pallas import rasterize_tiled_v4

R = 20
RES = 512


def loop_time(step, x0, iters=3):
    run = jax.jit(lambda x: jax.lax.fori_loop(0, R, step, x))
    jax.block_until_ready(run(x0))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x0))
        ts.append(time.perf_counter() - t0)
    return min(ts) / R * 1e3


def main():
    g = make_object(0, n=73728, kind="sphere")
    cam = cameras.pose_to_gs_camera(
        jnp.asarray(cameras.generate_input_camera(1.8, [(20, 45)])[0]))
    cv, cvp, tf = cam["cam_view"], cam["cam_view_proj"], cam["tanfov"]
    bg = jnp.ones(3)
    ref = rz.rasterize_tiled(g, cv, cvp, tf, bg, RES, RES, tile=16,
                             max_per_tile=2048, chunk=256, tile_group=16)

    for (G, chunk, spg) in ((16, 128, 3.0), (16, 256, 1.7), (32, 128, 5.0),
                            (32, 256, 2.6), (8, 256, 1.7), (16, 512, 1.2)):
        def step(i, acc, G=G, chunk=chunk, spg=spg):
            out = rasterize_tiled_v4(
                g + acc * 1e-20, cv, cvp, tf, bg, RES, RES, tile=16,
                max_per_tile=2048, chunk=chunk, group=G,
                steps_per_group=spg)
            return acc + jnp.sum(out["image"]) * 1e-9

        t0 = time.perf_counter()
        out = rasterize_tiled_v4(g, cv, cvp, tf, bg, RES, RES, tile=16,
                                 max_per_tile=2048, chunk=chunk, group=G,
                                 steps_per_group=spg)
        jax.block_until_ready(out["image"])
        compile_s = time.perf_counter() - t0
        d = max(float(jnp.max(jnp.abs(out[k] - ref[k]))) for k in ref)
        ms = loop_time(step, jnp.float32(0))
        print(f"G={G:2d} chunk={chunk:3d} spg={spg:3.1f}: {ms:7.3f} ms "
              f"({RES*RES/ms*1e-3:.1f} M rays/s)  maxΔ={d:.1e} "
              f"compile {compile_s:.0f}s", flush=True)


if __name__ == "__main__":
    main()
