"""Config sweep + correctness gate for the v4 fused rasterizer on chip.

Each config's full output dict is compared against the XLA tiled path at
the release shape; any channel beyond its parity tolerance FAILS the
sweep (non-zero exit) — chip sweeps double as correctness gates
(VERDICT r4 weak-5). depth_median keeps the knife-edge criterion of
tools/golden_parity_512.py (p99.9 + flip fraction) since a last-ulp
transmittance difference legitimately flips the selected splat.

    python -m tools.v4_sweep [--gather f32|c64] [--quick]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from gaussiananything_tpu.data.synthetic import make_object
from gaussiananything_tpu.render import cameras
from gaussiananything_tpu.ops import rasterize as rz
from gaussiananything_tpu.ops import rasterize_pallas as rp

R = 20
RES = 512
TOL = {"image": 2e-3, "alpha": 2e-3, "depth_median": 5e-3,
       "depth_expected": 5e-3, "normal_view": 2e-3, "dist": 2e-3}
MEDIAN_FLIP_FRAC = 1e-4
MEDIAN_FLIP_BOUND = 0.2


def loop_time(step, x0, iters=3):
    run = jax.jit(lambda x: jax.lax.fori_loop(0, R, step, x))
    jax.block_until_ready(run(x0))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x0))
        ts.append(time.perf_counter() - t0)
    return min(ts) / R * 1e3


def check(out, ref):
    """Returns (ok, worst_desc) under the golden-parity criteria."""
    ok = True
    worst = ""
    for k in ref:
        err = np.abs(np.asarray(out[k], np.float32)
                     - np.asarray(ref[k], np.float32))
        d = float(err.max())
        if k == "depth_median":
            q = float(np.quantile(err, 0.999))
            flip = float((err > TOL[k]).mean())
            k_ok = (q <= TOL[k] and flip <= MEDIAN_FLIP_FRAC
                    and d <= MEDIAN_FLIP_BOUND)
        else:
            k_ok = d <= TOL[k]
        if not k_ok:
            ok = False
            worst += f" {k}:{d:.2e}!"
    return ok, worst


def main():
    if "--gather" in sys.argv:
        rp.GATHER_KIND = sys.argv[sys.argv.index("--gather") + 1]
    g = make_object(0, n=73728, kind="sphere")
    cam = cameras.pose_to_gs_camera(
        jnp.asarray(cameras.generate_input_camera(1.8, [(20, 45)])[0]))
    cv, cvp, tf = cam["cam_view"], cam["cam_view_proj"], cam["tanfov"]
    bg = jnp.ones(3)
    ref = rz.rasterize_tiled(g, cv, cvp, tf, bg, RES, RES, tile=16,
                             max_per_tile=2048, chunk=256, tile_group=16)

    # measured need on the bench scene (CPU, 3 views): spg 2.52-2.55 at
    # c128, 4.30-4.36 at c64 — budgets sit ~6% above need. Gather cost is
    # per-table-ROW (~10 ns/row, r5 isolated probe), so the c64 rows
    # (util 0.80 vs 0.69) carry a ~23% smaller table.
    # DMA rows are OFF by default: Mosaic rejects the unaligned segment
    # slices ("tile index in dimension 1 divisible by (128)" — arbitrary
    # segment starts can't be DMA offsets; see BENCH_NOTES r5). Kept
    # behind --dma-only for when an aligned-layout rework lands.
    configs = [(16, 128, 2.7, False), (16, 128, 3.0, False)]
    if "--dma-only" in sys.argv:
        configs = [(16, 128, 2.7, True)]
    if "--quick" in sys.argv:
        configs = configs[:1]
    all_ok = True
    for (G, chunk, spg, dma) in configs:
        fn = rp.rasterize_tiled_v4_dma if dma else rp.rasterize_tiled_v4

        def step(i, acc, G=G, chunk=chunk, spg=spg, fn=fn):
            out = fn(g + acc * 1e-20, cv, cvp, tf, bg, RES, RES, tile=16,
                     max_per_tile=2048, chunk=chunk, group=G,
                     steps_per_group=spg)
            return acc + jnp.sum(out["image"]) * 1e-9

        t0 = time.perf_counter()
        out = fn(g, cv, cvp, tf, bg, RES, RES, tile=16,
                 max_per_tile=2048, chunk=chunk, group=G,
                 steps_per_group=spg)
        jax.block_until_ready(out["image"])
        compile_s = time.perf_counter() - t0
        ok, worst = check(out, ref)
        all_ok &= ok
        ms = loop_time(step, jnp.float32(0))
        print(f"G={G:2d} chunk={chunk:3d} spg={spg:3.1f} "
              f"{'DMA' if dma else 'tab'} gather={rp.GATHER_KIND}: "
              f"{ms:7.3f} ms ({RES*RES/ms*1e-3:.1f} M rays/s)  "
              f"{'OK' if ok else 'FAIL' + worst}  compile {compile_s:.0f}s",
              flush=True)
    print("SWEEP " + ("PASS" if all_ok else "FAIL"), flush=True)
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
