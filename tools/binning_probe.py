"""Phase attribution for the REAL binning + composite pipeline on chip.

In-jit loops with sequential dependency + digest checks. Measures:
  A) full rasterize_tiled frame
  B) preprocess + pack only
  C) preprocess + build_tile_pairs (binning incl. sort)
  D) binning with the lax.sort call replaced by identity (UNSORTED —
     wrong output, same shapes) to isolate the sort itself.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from gaussiananything_tpu.data.synthetic import make_object
from gaussiananything_tpu.render import cameras
from gaussiananything_tpu.ops import rasterize as rz

R = 20


def loop_time(step, x0, iters=3):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, R, step, x)

    out = jax.block_until_ready(run(x0))
    del out
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x0))
        ts.append(time.perf_counter() - t0)
    return min(ts) / R * 1e3


def main():
    res = 512
    g = make_object(0, n=73728, kind="sphere")
    poses = cameras.generate_input_camera(1.8, [(20, 45)])
    cam = cameras.pose_to_gs_camera(jnp.asarray(poses[0]))
    cv, cvp, tf = cam["cam_view"], cam["cam_view_proj"], cam["tanfov"]
    bg = jnp.ones(3)

    def full_frame(i, acc):
        out = rz.rasterize_tiled(g + acc * 1e-20, cv, cvp, tf, bg, res, res,
                                 tile=16, max_per_tile=2048, chunk=256,
                                 tile_group=16)
        return acc + jnp.sum(out["image"]) * 1e-9

    print(f"A full frame:        {loop_time(full_frame, jnp.float32(0)):8.3f}"
          " ms", flush=True)

    def pre_pack(i, acc):
        sp = rz.preprocess_splats(g + acc * 1e-20, cv, cvp, res, res, tf)
        packed = rz.pack_splat_render(sp)
        return acc + jnp.sum(packed) * 1e-9

    print(f"B preprocess+pack:   {loop_time(pre_pack, jnp.float32(0)):8.3f}"
          " ms", flush=True)

    def binning(i, acc):
        sp = rz.preprocess_splats(g + acc * 1e-20, cv, cvp, res, res, tf)
        pairs, starts, counts = rz.build_tile_pairs(sp, res, res, 16, 2048)
        return acc + (jnp.sum(starts) + jnp.sum(counts)
                      + jnp.sum(pairs[:100])).astype(jnp.float32) * 1e-9

    print(f"C pre+binning:       {loop_time(binning, jnp.float32(0)):8.3f}"
          " ms", flush=True)

    # D: monkeypatch the sort out (identity, wrong values, same shapes)
    orig_sort = jax.lax.sort
    try:
        jax.lax.sort = lambda ops, num_keys=1, is_stable=False, \
            dimension=-1: ops
        rz.jax.lax.sort = jax.lax.sort

        def binning_nosort(i, acc):
            sp = rz.preprocess_splats(g + acc * 1e-20, cv, cvp, res, res, tf)
            pairs, starts, counts = rz.build_tile_pairs(sp, res, res, 16,
                                                        2048)
            return acc + (jnp.sum(starts) + jnp.sum(counts)
                          + jnp.sum(pairs[:100])).astype(jnp.float32) * 1e-9

        print("D pre+binning-NOSORT:"
              f"{loop_time(binning_nosort, jnp.float32(0)):8.3f} ms",
              flush=True)
    finally:
        jax.lax.sort = orig_sort
        rz.jax.lax.sort = orig_sort


if __name__ == "__main__":
    main()
