"""Rasterizer frame timing: forward, forward+backward, and phase split.

One serialized TPU job that captures every BENCH_NOTES rasterizer number
at the release shape (512², 73,728 splats): preprocess / binning /
composite phase times, full fwd frame, and fwd+bwd. Usage (strictly one
TPU process at a time):

    python -m tools.rasterizer_timing [--res 512] [--iters 20] \
        [--impl xla|fused|fused_nograd]

--impl selects the production path for the fwd / fwd+bwd rows: "fused" =
Pallas v4 forward + fused analytic Pallas backward (the TPU training
path), "fused_nograd" = v4 forward only (inference/bench path), "xla" =
the differentiable XLA compositing loop. Phase/ablation sections always
probe the XLA pipeline internals. Prints a small table; paste into
BENCH_NOTES.md.
"""
from __future__ import annotations

import sys
import time


def _arg(flag, default, cast=int):
    return cast(sys.argv[sys.argv.index(flag) + 1]) \
        if flag in sys.argv else default


def main():
    import jax
    import jax.numpy as jnp

    if "--platform" in sys.argv:
        jax.config.update(
            "jax_platforms", sys.argv[sys.argv.index("--platform") + 1])

    from gaussiananything_tpu.data.synthetic import make_object
    from gaussiananything_tpu.ops import rasterize as rz
    from gaussiananything_tpu.render import cameras

    res = _arg("--res", 512)
    iters = _arg("--iters", 20)
    n_splats = _arg("--splats", 73728)
    tile = _arg("--tile", 16)
    mpt = _arg("--mpt", 2048)
    chunk = _arg("--chunk", 256)
    group = _arg("--group", 16)

    g = make_object(0, n=n_splats, kind="sphere")
    poses = cameras.generate_input_camera(1.8, [(20, 45)])
    cam = cameras.pose_to_gs_camera(jnp.asarray(poses[0]))
    args = (g, cam["cam_view"], cam["cam_view_proj"], cam["tanfov"])
    bg = jnp.ones(3)
    print(f"device={jax.devices()[0]} res={res} N={n_splats} "
          f"tile={tile} mpt={mpt} chunk={chunk} group={group}", flush=True)

    def timed(name, fn, *a):
        out = fn(*a)                       # compile
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        # value digest: catches silently-elided / garbage executions (a
        # sub-ms reading through the tunnel is otherwise unverifiable)
        leaves = jax.tree.leaves(out)
        digest = float(jnp.asarray(leaves[0]).ravel()[:4096].astype(
            jnp.float32).sum()) if leaves else float("nan")
        print(f"{name:>28}: {dt*1e3:8.2f} ms   [digest {digest:.6g}]",
              flush=True)
        return dt, out

    # -- phases ------------------------------------------------------------
    pre = jax.jit(lambda g_, cv, cvp, tf: rz.preprocess_splats(
        g_, cv, cvp, res, res, tf))
    _, sp = timed("preprocess", pre, *args)

    binf = jax.jit(lambda s: rz.build_tile_pairs(s, res, res, tile, mpt))
    _, binned = timed("binning (build_tile_pairs)", binf, sp)

    # composite-only: preprocess + binning passed in precomputed, so this
    # jit contains ONLY pack + the group/chunk loop + detile. The frame
    # minus this is the true in-frame preprocess+binning cost (standalone
    # phase timings above are dispatch-bound at sub-ms scales).
    import jax.numpy as _jnp
    import math as _math

    def composite_only(sp_, pairs, starts, counts):
        tiles_x = res // tile
        n_tiles = tiles_x * tiles_x
        G = _math.gcd(group, n_tiles)
        order = _jnp.argsort(-counts)
        counts_s = _jnp.take(counts, order)
        gmax = counts_s[::G]
        n_act = (gmax + chunk - 1) // chunk
        tx_s = (order % tiles_x).astype(_jnp.float32)
        ty_s = (order // tiles_x).astype(_jnp.float32)
        packed = rz.pack_splat_render(sp_)
        packed = _jnp.concatenate(
            [packed, _jnp.zeros((rz.PACKED_F, 1), _jnp.float32)], axis=1)
        starts_s = _jnp.take(starts, order)
        return rz._composite_frame((tile, G, chunk, mpt // chunk), packed,
                                   pairs, starts_s, counts_s, n_act,
                                   tx_s, ty_s, _jnp.asarray(0.0)).rgb
    comp = jax.jit(composite_only)
    timed("composite only", comp, sp, *binned)

    # -- in-jit ablation (reliable phase split) -----------------------------
    # Standalone sub-ms phase jits above read at the tunnel dispatch floor
    # (~0.05 ms) regardless of work — attribute instead by DIFFERENCES of
    # full-frame variants, all of which return scalars (forced execution,
    # no transfer):
    #   A = preprocess+pack+binning (+count sort)      [reduce-sum outputs]
    #   B = A + composite loop                          [reduce-sum state]
    #   C = full frame (B + detile/undo-sort)           [reduce-sum maps]
    if "--ablate" in sys.argv:
        def variant_a(g_, cv, cvp, tf):
            sp_ = rz.preprocess_splats(g_, cv, cvp, res, res, tf)
            pairs, starts, counts = rz.build_tile_pairs(sp_, res, res, tile,
                                                        mpt)
            packed = rz.pack_splat_render(sp_)
            order = _jnp.argsort(-counts)
            return (packed.sum() + pairs.sum() + _jnp.take(starts, order).sum()
                    + counts.sum())

        def variant_b(g_, cv, cvp, tf):
            sp_ = rz.preprocess_splats(g_, cv, cvp, res, res, tf)
            pairs, starts, counts = rz.build_tile_pairs(sp_, res, res, tile,
                                                        mpt)
            tiles_x = res // tile
            n_tiles = tiles_x * tiles_x
            G = _math.gcd(group, n_tiles)
            order = _jnp.argsort(-counts)
            counts_s = _jnp.take(counts, order)
            n_act = (counts_s[::G] + chunk - 1) // chunk
            packed = rz.pack_splat_render(sp_)
            packed = _jnp.concatenate(
                [packed, _jnp.zeros((rz.PACKED_F, 1), _jnp.float32)], axis=1)
            st = rz._composite_frame(
                (tile, G, chunk, mpt // chunk), packed, pairs,
                _jnp.take(starts, order), counts_s, n_act,
                (order % tiles_x).astype(_jnp.float32),
                (order // tiles_x).astype(_jnp.float32), _jnp.asarray(0.0))
            return sum(_jnp.sum(leaf) for leaf in jax.tree.leaves(st))

        def variant_c(g_, cv, cvp, tf):
            o = rz.rasterize_tiled(g_, cv, cvp, tf, bg, res, res, tile=tile,
                                   max_per_tile=mpt, chunk=chunk,
                                   tile_group=group)
            return sum(_jnp.sum(leaf) for leaf in jax.tree.leaves(o))

        ta, _ = timed("A: pre+pack+bin+sort", jax.jit(variant_a), *args)
        tb, _ = timed("B: A + composite", jax.jit(variant_b), *args)
        tc, _ = timed("C: full frame", jax.jit(variant_c), *args)
        print(f"{'composite (B-A)':>28}: {(tb-ta)*1e3:8.2f} ms", flush=True)
        print(f"{'detile (C-B)':>28}: {(tc-tb)*1e3:8.2f} ms", flush=True)

    # -- full forward --------------------------------------------------------
    impl = sys.argv[sys.argv.index("--impl") + 1] \
        if "--impl" in sys.argv else "xla"
    if impl in ("fused", "fused_nograd", "fused_dma"):
        from gaussiananything_tpu.ops.rasterize_pallas import (
            rasterize_tiled_v4, rasterize_tiled_v4_dma,
            rasterize_tiled_v4_train)
        v4_chunk = _arg("--chunk", 128)   # v4 optimum (r4 sweep)

        def render_impl(*a):
            fn = {"fused": rasterize_tiled_v4_train,
                  "fused_nograd": rasterize_tiled_v4,
                  "fused_dma": rasterize_tiled_v4_dma}[impl]
            return fn(*a, bg, res, res, tile=tile, max_per_tile=mpt,
                      chunk=v4_chunk, group=group)
    else:
        def render_impl(*a):
            return rz.rasterize_tiled(
                *a, bg, res, res, tile=tile, max_per_tile=mpt, chunk=chunk,
                tile_group=group)

    fwd = jax.jit(render_impl)
    t_fwd, out = timed(f"forward frame [{impl}]", fwd, *args)
    rays = res * res / t_fwd
    print(f"{'forward rays/s':>28}: {rays/1e6:8.2f} M", flush=True)
    assert bool(jnp.isfinite(out["image"]).all())

    # -- config sweep (fwd only) ---------------------------------------------
    if "--sweep" in sys.argv:
        # tile=8 removed: measured 1.5-1.8x worse (sort doubles, 4x groups).
        # chunk<=128 rows probe whether finer chunk granularity + the
        # saturation early-exit beat the padding waste they add.
        for tl, ck, gr in ((16, 256, 16), (16, 256, 32), (16, 256, 64),
                           (16, 512, 32), (16, 128, 16), (16, 512, 16)):
            f = jax.jit(lambda *a, tl=tl, ck=ck, gr=gr: rz.rasterize_tiled(
                *a, bg, res, res, tile=tl, max_per_tile=mpt, chunk=ck,
                tile_group=gr))
            t, _ = timed(f"fwd tile={tl} chunk={ck} G={gr}", f, *args)
            print(f"{'rays/s':>28}: {res*res/t/1e6:8.2f} M", flush=True)

    # -- forward + backward ---------------------------------------------------
    if impl in ("fused_nograd", "fused_dma"):
        print("(fwd+bwd skipped: fused_nograd has no VJP)", flush=True)
        return

    def loss(g_, cv, cvp, tf):
        o = render_impl(g_, cv, cvp, tf)
        return (o["image"].sum() + o["alpha"].sum() + o["dist"].sum()
                + o["normal_view"].sum() + o["depth_expected"].sum())

    grad = jax.jit(jax.grad(loss))
    t_fb, gout = timed(f"forward+backward [{impl}]", grad, *args)
    assert bool(jnp.isfinite(gout).all())
    print(f"{'bwd/fwd ratio':>28}: {max(t_fb - t_fwd, 0.0)/t_fwd:8.2f}x "
          f"(fwd+bwd {t_fb*1e3:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
