"""Golden-parity job: production rasterizer vs oracle at the release shape.

Runs on the TPU (or CPU with --platform cpu, slowly): renders the release
shape — 512², 73,728 splats — through the selected production path and
the O(N·H·W) oracle, for several cameras, and records per-channel max
absolute differences plus image hashes to `tests/goldens/parity_512.json`
(--impl xla) or `parity_512_fused.json` (--impl fused).

--impl fused — the TPU production path (Pallas v4 fused forward + fused
analytic backward, `ops/rasterize_pallas.py`) — additionally compares
its FORWARD against the XLA tiled path and its BACKWARD (full-channel
loss gradient w.r.t. the 13-channel gaussians) against the XLA
reverse-scan VJP, so the committed artifact pins the path training
actually runs, both directions (VERDICT r4 item 2).

`tests/test_golden_parity.py` asserts the committed artifacts' recorded
errors are inside tolerance; re-run this script after any rasterizer
change and commit the refreshed artifact:

    python -m tools.golden_parity_512 [--impl xla|fused]

The oracle composites EVERY splat per pixel (no binning, no tile lists,
no footprint clamp, no per-tile cap), so agreement pins the whole binning
pipeline — two-bucket emission, (tile, depth-rank) co-sort, chunk
scheduling, the custom-VJP compositing loop — to the unbinned 2DGS
semantics of `diff-surfel-rasterization` (consumed at
`/root/reference/nsr/gs_surfel.py:85-142`). max_per_tile is raised to
cover the densest tile so graceful-degradation drops don't enter parity
(the drop contract is tested separately in tests/test_rasterize_stress.py).
"""
from __future__ import annotations

import hashlib
import json
import os
import sys
import time

RES = 512
N_SPLATS = 73728
CHANNELS = ("image", "alpha", "depth_median", "depth_expected",
            "normal_view", "dist")
# fp32 summation-order noise between the chunked oracle and the tiled
# path's different chunk partitioning; alpha-weighted accumulators at
# ~1e2 depth scale stay under 2e-3.
TOL = {"image": 2e-3, "alpha": 2e-3, "depth_median": 5e-3,
       "depth_expected": 5e-3, "normal_view": 2e-3, "dist": 2e-3}
# depth_median is DISCONTINUOUS in the transmittance: it selects the one
# splat whose compositing crosses T=0.5, so a last-ulp T difference from
# the two paths' different chunk reassociation flips the selection to the
# neighbouring splat and the "error" is the inter-splat depth gap (the
# CUDA median-depth channel, nsr/gs_surfel.py:132, has the same knife
# edge). Parity criterion for it: the 99.9th-percentile error must be
# inside TOL and at most MEDIAN_FLIP_FRAC of pixels may sit beyond it,
# each bounded by the scene depth range. Continuous channels keep the
# strict max-abs criterion.
MEDIAN_FLIP_FRAC = 1e-4
MEDIAN_FLIP_BOUND = 0.2


def main():
    import jax
    if "--platform" in sys.argv:
        jax.config.update(
            "jax_platforms", sys.argv[sys.argv.index("--platform") + 1])
    import jax.numpy as jnp
    import numpy as np

    from gaussiananything_tpu.data.synthetic import make_object
    from gaussiananything_tpu.ops import rasterize as rz
    from gaussiananything_tpu.render import cameras

    impl = sys.argv[sys.argv.index("--impl") + 1] \
        if "--impl" in sys.argv else "xla"

    g = make_object(0, n=N_SPLATS, kind="sphere")
    views = [(20, 45), (-10, 200), (55, 310)]
    poses = cameras.generate_input_camera(1.8, views)
    bg = jnp.ones(3)

    record = {"res": RES, "n_splats": N_SPLATS, "views": views, "impl": impl,
              "device": str(jax.devices()[0]), "channels": {}}
    worst = {c: 0.0 for c in CHANNELS}
    worst_q = {c: 0.0 for c in CHANNELS}      # 99.9th percentile
    worst_flip = {c: 0.0 for c in CHANNELS}   # fraction beyond TOL
    worst_xla = {c: 0.0 for c in CHANNELS}    # fused vs xla-tiled fwd
    grad_max_diff = 0.0
    grad_scale = 0.0
    hashes = []

    def xla_render(*a):
        return rz.rasterize_tiled(
            *a, bg, RES, RES, tile=16, max_per_tile=8192, chunk=256,
            tile_group=16)

    if impl == "fused":
        from gaussiananything_tpu.ops.rasterize_pallas import (
            rasterize_tiled_v4_train)

        # spg raised so the step budget never truncates at mpt 8192 (the
        # parity contract excludes graceful-degradation drops)
        def prod_render(*a):
            return rasterize_tiled_v4_train(
                *a, bg, RES, RES, tile=16, max_per_tile=8192, chunk=128,
                group=16, steps_per_group=8.0)
    else:
        prod_render = xla_render

    def chan_loss(renderer):
        def loss(*a):
            o = renderer(*a)
            # weighted full-channel objective: every output participates
            return (o["image"].sum() + o["alpha"].sum()
                    + 0.1 * o["dist"].sum() + o["normal_view"].sum()
                    + 0.01 * o["depth_expected"].sum())
        return loss

    for vi in range(len(views)):
        cam = cameras.pose_to_gs_camera(jnp.asarray(poses[vi]))
        args = (g, cam["cam_view"], cam["cam_view_proj"], cam["tanfov"])
        t0 = time.perf_counter()
        tiled = jax.jit(prod_render)(*args)
        jax.block_until_ready(tiled["image"])
        t_tiled = time.perf_counter() - t0
        t0 = time.perf_counter()
        oracle = jax.jit(lambda *a: rz.rasterize_naive(
            *a, RES, RES, bg))(*args)
        jax.block_until_ready(oracle["image"])
        t_oracle = time.perf_counter() - t0
        print(f"view {vi}: {impl} {t_tiled:.1f}s oracle {t_oracle:.1f}s",
              flush=True)
        if impl == "fused":
            xla_out = jax.jit(xla_render)(*args)
            for c in CHANNELS:
                dx = float(np.max(np.abs(
                    np.asarray(tiled[c], np.float32)
                    - np.asarray(xla_out[c], np.float32))))
                worst_xla[c] = max(worst_xla[c], dx)
            g_fused = jax.jit(jax.grad(chan_loss(prod_render)))(*args)
            g_xla = jax.jit(jax.grad(chan_loss(xla_render)))(*args)
            gd = float(np.max(np.abs(np.asarray(g_fused, np.float32)
                                     - np.asarray(g_xla, np.float32))))
            gs = float(np.max(np.abs(np.asarray(g_xla, np.float32))))
            grad_max_diff = max(grad_max_diff, gd)
            grad_scale = max(grad_scale, gs)
            print(f"  grad: max|Δ| = {gd:.3e}  (max|g_xla| = {gs:.3e})",
                  flush=True)
        for c in CHANNELS:
            err = np.abs(np.asarray(tiled[c], np.float32)
                         - np.asarray(oracle[c], np.float32))
            d = float(np.max(err))
            q = float(np.quantile(err, 0.999))
            flip = float(np.mean(err > TOL[c]))
            worst[c] = max(worst[c], d)
            worst_q[c] = max(worst_q[c], q)
            worst_flip[c] = max(worst_flip[c], flip)
            if c == "depth_median":
                ok_c = (q <= TOL[c] and flip <= MEDIAN_FLIP_FRAC
                        and d <= MEDIAN_FLIP_BOUND)
                status = "OK" if ok_c else "FAIL"
                print(f"  {c:>14}: max|Δ| = {d:.3e}  p99.9 = {q:.3e} "
                      f"flip_frac = {flip:.2e} {status}", flush=True)
            else:
                status = "OK" if d <= TOL[c] else "FAIL"
                print(f"  {c:>14}: max|Δ| = {d:.3e}  (tol {TOL[c]:g}) "
                      f"{status}", flush=True)
        hashes.append(hashlib.sha256(
            np.asarray(tiled["image"], np.float32).tobytes()).hexdigest())

    record["channels"] = {c: {"max_abs_diff": worst[c], "tol": TOL[c],
                              "p999": worst_q[c],
                              "frac_beyond_tol": worst_flip[c]}
                          for c in CHANNELS}
    record["tiled_image_sha256"] = hashes
    ok = all(worst[c] <= TOL[c] for c in CHANNELS if c != "depth_median") \
        and worst_q["depth_median"] <= TOL["depth_median"] \
        and worst_flip["depth_median"] <= MEDIAN_FLIP_FRAC \
        and worst["depth_median"] <= MEDIAN_FLIP_BOUND
    if impl == "fused":
        # fused-vs-XLA forward agreement (same binning semantics ⇒ the
        # knife-edge reassociation tolerance applies to depth_median only)
        record["vs_xla"] = {c: {"max_abs_diff": worst_xla[c], "tol": TOL[c]}
                            for c in CHANNELS}
        ok = ok and all(worst_xla[c] <= TOL[c] for c in CHANNELS
                        if c != "depth_median") \
            and worst_xla["depth_median"] <= MEDIAN_FLIP_BOUND
        # backward: fused analytic Pallas VJP vs the XLA reverse-scan VJP
        grad_tol = 2e-3 * max(1.0, grad_scale)
        record["grad"] = {"max_abs_diff": grad_max_diff,
                          "max_abs_xla_grad": grad_scale, "tol": grad_tol}
        ok = ok and grad_max_diff <= grad_tol
    record["pass"] = ok
    fname = "parity_512_fused.json" if impl == "fused" else "parity_512.json"
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "goldens", fname)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(record, f, indent=2)
    print(("PASS" if ok else "FAIL"), "->", out, flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
