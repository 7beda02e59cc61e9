"""Benchmark: 2DGS rasterizer rays/s at 512² with the release splat count.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...spread}.

Baseline context: the reference repo publishes no rasterizer throughput
(BASELINE.md). We compare against an estimated A100 figure for the CUDA
`diff-surfel-rasterization` at 512²/73,728 splats: ~200 fps forward ⇒
~5.2e7 rays/s. `vs_baseline` = ours / that estimate.

Measurement noise: the axon tunnel adds ±10–15% per process invocation
(BENCH_NOTES.md). The bench therefore runs REPEATS timed batches and
reports the MEDIAN (the headline `value`) plus min/max spread fields, so
round-over-round deltas are distinguishable from tunnel noise.
"""
from __future__ import annotations

import json
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_RAYS_PER_S_ESTIMATE = 5.2e7
REPEATS = 7          # timed batches (median reported)
ITERS_PER_REPEAT = 5


def main():
    from gaussiananything_tpu.data.synthetic import make_object
    from gaussiananything_tpu.render import cameras
    from gaussiananything_tpu.render.renderer import render_multiview

    res = 512
    n_splats = 73728
    g = make_object(0, n=n_splats, kind="sphere")

    poses = cameras.generate_input_camera(1.8, [(20, 45)])
    cam = cameras.pose_to_gs_camera(jnp.asarray(poses[0]))

    def render(gaussians):
        return render_multiview(
            gaussians[None], cam["cam_view"][None, None],
            cam["cam_view_proj"][None, None],
            jnp.broadcast_to(cam["tanfov"], (1, 1)),
            jnp.ones((1, 1, 3)), res,
            tile=16, max_per_tile=2048, chunk=256, tile_group=16)["image"]

    jit_render = jax.jit(render)
    out = jit_render(g)
    out.block_until_ready()  # compile
    # Validate once: a silently-elided executable reads at the dispatch
    # floor (BENCH_NOTES "measurement pitfalls").
    digest = float(jnp.sum(out))
    assert np.isfinite(digest) and digest != 0.0

    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(ITERS_PER_REPEAT):
            out = jit_render(g)
        out.block_until_ready()
        times.append((time.perf_counter() - t0) / ITERS_PER_REPEAT)

    dt = statistics.median(times)
    rays = lambda t: res * res / t  # noqa: E731
    rays_per_s = rays(dt)
    print(json.dumps({
        "metric": f"2DGS render rays/s/chip @{res}x{res}, {n_splats} splats",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / A100_RAYS_PER_S_ESTIMATE, 4),
        "repeats": REPEATS,
        "value_min": round(rays(max(times)), 1),
        "value_max": round(rays(min(times)), 1),
        "frame_ms_median": round(dt * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
