"""Pallas TPU kernel for 2DGS tile compositing.

The hot loop of the rasterizer (`ops/rasterize.py`) fused into one Mosaic
kernel: per-tile front-to-back compositing with

  * scalar-prefetched per-tile splat COUNTS — each tile runs only
    ceil(count/chunk) chunk iterations instead of max_per_tile/chunk
    (the XLA path cannot skip padding work; mean count ≪ cap in practice);
  * early exit (whole-chunk skip) when every pixel's transmittance is
    saturated;
  * ONE within-chunk lane-axis prefix scan (log-transmittance); the
    prefix alpha-mass needed by the distortion term is derived analytically
    from it (Σ_{j<i} w_j = T_in·(1 − Π_{j<i}(1−α_j))), the m/m² prefixes
    use two more scans;
  * accumulation matmul on the MXU; all state resident in a VMEM scratch.

Binning (depth sort → capped per-tile lists) stays in XLA — sorts are
already optimal there. Backward reuses the differentiable XLA path via
custom_vjp (`rasterize_tiled_fused`); a hand-derived Pallas VJP is the next
optimisation.

Channel packing:
  geom (T, M, 16): tx(3) ty(3) tw(3) tz(3) cpx cpy cz opacity
  feat (T, M, 8):  rgb(3) normal(3) 1[Σw] pad
  state scratch (P, 16): trans rgb(3) alpha d_exp d_med dist normal(3)
                         dA dD dD2 pad(3)
  out  (T, P, 16): rgb(3) alpha d_exp d_med dist normal(3) trans pad(5)
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussiananything_tpu.ops import rasterize as rz

NEAR_CULL = rz.NEAR_CULL
ALPHA_EPS = rz.ALPHA_EPS
T_EPS = rz.T_EPS
ZNEAR, ZFAR = rz.ZNEAR, rz.ZFAR


def _lane_cumsum(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix-sum along the last (lane) axis, log₂ steps."""
    n = x.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 1)
    s = 1
    while s < n:
        shifted = pltpu.roll(x, shift=s, axis=len(x.shape) - 1)
        x = x + jnp.where(lane >= s, shifted, 0.0)
        s *= 2
    return x


def _make_kernel(tile: int, chunk: int, max_per_tile: int, tiles_x: int,
                 with_aux: bool = True):
    P = tile * tile
    n_chunks_max = max_per_tile // chunk

    def kernel(scal_ref, geom_ref, feat_ref, out_ref, st_ref):
        i = pl.program_id(0)
        count = scal_ref[i]
        row0 = scal_ref[pl.num_programs(0)]
        ty = (i // tiles_x).astype(jnp.float32)
        tx = (i % tiles_x).astype(jnp.float32)

        pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
        lx = (pix % tile).astype(jnp.float32)
        ly = (pix // tile).astype(jnp.float32)
        px = tx * tile + lx                       # (P, 1)
        py = ty * tile + ly + row0.astype(jnp.float32)

        st_ref[:, :] = jnp.concatenate(
            [jnp.ones((P, 1), jnp.float32),
             jnp.zeros((P, 15), jnp.float32)], axis=1)

        n_chunks = jnp.minimum(
            jax.lax.div(count + chunk - 1, chunk), n_chunks_max)

        def chunk_step(c, _):
            trans = st_ref[:, 0:1]

            @pl.when(jnp.max(trans) > T_EPS)
            def _():
                sl = pl.ds(c * chunk, chunk)
                geom = geom_ref[0, sl, :]             # (K, 16)
                feat = feat_ref[0, sl, :]             # (K, 8)

                def col(j):
                    return geom[:, j].reshape(1, chunk)

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
                rho3d = u * u + v * v
                z_int = u * col(9) + v * col(10) + col(11)
                dx = px - col(12)
                dy = py - col(13)
                rho2d = rz.FILTER_INV_SQUARE * (dx * dx + dy * dy)
                use3d = rho3d <= rho2d
                rho = jnp.minimum(rho3d, rho2d)
                depth = jnp.where(use3d, z_int, col(14))
                g = jnp.exp(-0.5 * rho) * rz._rho_window(rho)
                alpha = jnp.minimum(col(15) * g, rz.ALPHA_MAX)
                lane = jax.lax.broadcasted_iota(jnp.int32, (P, chunk), 1)
                in_count = (c * chunk + lane) < count
                keep = (alpha >= ALPHA_EPS) & (depth > NEAR_CULL) & in_count
                alpha = jnp.where(keep, alpha, 0.0)
                depth = jnp.where(keep, depth, 0.0)

                log1m = jnp.log1p(-alpha)
                cums = _lane_cumsum(log1m)
                t_excl = jnp.exp(cums - log1m)
                t_in = trans * t_excl
                # prune below-threshold tails, matching the CUDA early stop
                alpha = jnp.where(t_in > T_EPS, alpha, 0.0)
                log1m = jnp.log1p(-alpha)
                cums = _lane_cumsum(log1m)
                t_excl = jnp.exp(cums - log1m)
                w = trans * alpha * t_excl            # (P, K)

                acc = jnp.dot(w, feat,
                              preferred_element_type=jnp.float32)
                w_sum = acc[:, 6:7]
                new_rgb = st_ref[:, 1:4] + acc[:, 0:3]
                new_alpha = st_ref[:, 4:5] + w_sum
                new_dexp = st_ref[:, 5:6] + jnp.sum(
                    w * depth, axis=1, keepdims=True)

                t_after = trans * jnp.exp(cums)
                crossed = (t_in > 0.5) & (t_after <= 0.5)
                new_dmed = st_ref[:, 6:7] + jnp.sum(
                    jnp.where(crossed, depth, 0.0), axis=1, keepdims=True)
                new_normal = st_ref[:, 8:11] + acc[:, 3:6]

                if with_aux:
                    zc = jnp.maximum(depth, ZNEAR)
                    m = jnp.where(keep, (ZFAR * (zc - ZNEAR))
                                  / (zc * (ZFAR - ZNEAR)), 0.0)
                    wm_r = w * m
                    wm2_r = wm_r * m
                    wm = jnp.sum(wm_r, axis=1, keepdims=True)
                    wm2 = jnp.sum(wm2_r, axis=1, keepdims=True)
                    # Σ_{j<i} w_j = T_in·(1 − t_excl_i): no extra scan.
                    A_pre = st_ref[:, 11:12] + trans * (1.0 - t_excl)
                    D_pre = st_ref[:, 12:13] + (_lane_cumsum(wm_r) - wm_r)
                    D2_pre = st_ref[:, 13:14] + (_lane_cumsum(wm2_r)
                                                 - wm2_r)
                    new_dist = st_ref[:, 7:8] + jnp.sum(
                        w * (m * m * A_pre + D2_pre - 2 * m * D_pre),
                        axis=1, keepdims=True)
                    st_ref[:, 7:8] = new_dist
                    st_ref[:, 11:12] = st_ref[:, 11:12] + w_sum
                    st_ref[:, 12:13] = st_ref[:, 12:13] + wm
                    st_ref[:, 13:14] = st_ref[:, 13:14] + wm2

                st_ref[:, 0:1] = trans * jnp.exp(cums[:, chunk - 1:chunk])
                st_ref[:, 1:4] = new_rgb
                st_ref[:, 4:5] = new_alpha
                st_ref[:, 5:6] = new_dexp
                st_ref[:, 6:7] = new_dmed
                st_ref[:, 8:11] = new_normal

            return None

        jax.lax.fori_loop(0, n_chunks, chunk_step, None)

        out_ref[0, :, 0:3] = st_ref[:, 1:4]      # rgb
        out_ref[0, :, 3:4] = st_ref[:, 4:5]      # alpha
        out_ref[0, :, 4:5] = st_ref[:, 5:6]      # depth_exp
        out_ref[0, :, 5:6] = st_ref[:, 6:7]      # depth_med
        out_ref[0, :, 6:7] = st_ref[:, 7:8]      # dist
        out_ref[0, :, 7:10] = st_ref[:, 8:11]    # normal
        out_ref[0, :, 10:11] = st_ref[:, 0:1]    # trans
        out_ref[0, :, 11:16] = jnp.zeros((P, 5), jnp.float32)

    return kernel


def pack_tile_inputs(sp_pad: rz.SplatProj, lists: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather per-tile splat rows into the packed geom/feat arrays."""
    opac = jnp.where(sp_pad.valid, sp_pad.opacity, 0.0)
    geom_all = jnp.concatenate(
        [sp_pad.t_x, sp_pad.t_y, sp_pad.t_w, sp_pad.t_z,
         sp_pad.center_pix, sp_pad.center_z[:, None], opac[:, None]],
        axis=1)                                          # (N+1, 16)
    feat_all = jnp.concatenate(
        [sp_pad.rgb, sp_pad.normal_view,
         jnp.ones((sp_pad.rgb.shape[0], 1)),
         jnp.zeros((sp_pad.rgb.shape[0], 1))], axis=1)   # (N+1, 8)
    T, M = lists.shape
    idx = lists.reshape(-1)
    geom = jnp.take(geom_all, idx, axis=0).reshape(T, M, 16)
    feat = jnp.take(feat_all, idx, axis=0).reshape(T, M, 8)
    return geom, feat


@functools.partial(
    jax.jit,
    static_argnames=("img_h", "img_w", "tile", "max_per_tile", "chunk",
                     "full_h", "with_aux"))
def rasterize_tiled_pallas(gaussians: jnp.ndarray, cam_view: jnp.ndarray,
                           cam_view_proj: jnp.ndarray, tanfov,
                           bg_color: jnp.ndarray, img_h: int, img_w: int,
                           tile: int = 16, max_per_tile: int = 1024,
                           chunk: int = 256, full_h: int = 0,
                           row0=0, with_aux: bool = False
                           ) -> Dict[str, jnp.ndarray]:
    """Drop-in fast-forward replacement for `rz.rasterize_tiled` (same output
    dict; gradients via the XLA path — see `rasterize_tiled_fused`).

    with_aux=False (default) skips the depth-distortion accumulators ('dist'
    returns zeros) — the inference path doesn't use them and the extra
    prefix scans currently blow Mosaic's VMEM budget at chunk≥128.
    """
    assert img_h % tile == 0 and img_w % tile == 0
    assert max_per_tile % chunk == 0
    sp = rz.preprocess_splats(gaussians, cam_view, cam_view_proj,
                              full_h or img_h, img_w, tanfov)
    lists, counts = rz.build_tile_lists(sp, img_h, img_w, tile, max_per_tile,
                                        row0=row0)
    sp_pad = jax.tree.map(
        lambda a: jnp.concatenate(
            [a, jnp.zeros((1,) + a.shape[1:], a.dtype)], 0), sp)
    sp_pad = sp_pad._replace(valid=sp_pad.valid.at[-1].set(False))
    geom, feat = pack_tile_inputs(sp_pad, lists)

    tiles_x = img_w // tile
    tiles_y = img_h // tile
    n_tiles = tiles_x * tiles_y
    P = tile * tile

    scalars = jnp.concatenate(
        [counts.astype(jnp.int32),
         jnp.asarray(row0, jnp.int32).reshape(1)])

    kernel = _make_kernel(tile, chunk, max_per_tile, tiles_x,
                          with_aux=with_aux)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, max_per_tile, 16), lambda i, s: (i, 0, 0)),
            pl.BlockSpec((1, max_per_tile, 8), lambda i, s: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, P, 16), lambda i, s: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((P, 16), jnp.float32)],
    )
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, P, 16), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(scalars, geom, feat)

    def detile(a):
        c_shape = a.shape[2:]
        a = a.reshape(tiles_y, tiles_x, tile, tile, *c_shape)
        a = jnp.moveaxis(a, 2, 1)
        return a.reshape(img_h, img_w, *c_shape)

    trans = detile(out[:, :, 10])
    return {
        "image": detile(out[:, :, 0:3]) + trans[..., None] * bg_color,
        "alpha": detile(out[:, :, 3]),
        "depth_expected": detile(out[:, :, 4]),
        "depth_median": detile(out[:, :, 5]),
        "dist": detile(out[:, :, 6]),
        "normal_view": detile(out[:, :, 7:10]),
    }


def rasterize_tiled_fused(gaussians, cam_view, cam_view_proj, tanfov,
                          bg_color, img_h: int, img_w: int, tile: int = 16,
                          max_per_tile: int = 1024, chunk: int = 64,
                          tile_group: int = 32, full_h: int = 0, row0=0):
    """Pallas forward + XLA-autodiff backward via custom_vjp.

    Forward pass runs the fused kernel (fast inference/eval); gradients fall
    back to the differentiable XLA compositing path, recomputing the forward
    (rematerialisation — no residuals stored).

    Default chunk=64: the forward forces with_aux=True (value/gradient
    consistency for 'dist'), and the aux prefix-scan kernel blows Mosaic's
    VMEM budget at chunk ≥ 128 (see `rasterize_tiled_pallas` docstring) —
    a chunk=256 default compiled only in the CPU interpreter tests.
    """

    @jax.custom_vjp
    def _render(g):
        # with_aux=True: the backward differentiates the XLA path, whose
        # 'dist' channel is real — the forward must produce it too, or a
        # loss reading 'dist' would see zero value with nonzero gradients.
        return rasterize_tiled_pallas(
            g, cam_view, cam_view_proj, tanfov, bg_color, img_h, img_w,
            tile=tile, max_per_tile=max_per_tile, chunk=chunk,
            full_h=full_h, row0=row0, with_aux=True)

    def _fwd(g):
        return _render(g), g

    def _bwd(g, ct):
        def xla_path(gg):
            return rz.rasterize_tiled(
                gg, cam_view, cam_view_proj, tanfov, bg_color, img_h, img_w,
                tile=tile, max_per_tile=max_per_tile, chunk=chunk,
                tile_group=tile_group, full_h=full_h, row0=row0)

        _, vjp = jax.vjp(xla_path, g)
        return vjp(ct)

    _render.defvjp(_fwd, _bwd)
    return _render(gaussians)


# ---------------------------------------------------------------------------
# Kernel v2: count-sorted tile groups.
#
# The v1 kernel (grid = one program per tile) is latency-bound on TPU: the
# Pallas grid runs SEQUENTIALLY on the core, so 4096 programs × tiny (64, K)
# vector work underutilises the VPU. v2 restores full vector width by
# processing G tiles per program as (G·P, K) blocks, and recovers the
# work-skipping by SORTING tiles by splat count first: within a group the
# max count bounds the chunk loop, so the work done is ~Σ sorted-group
# maxima ≈ Σ per-tile counts, not n_tiles × max_per_tile.
# ---------------------------------------------------------------------------


def _make_grouped_kernel(tile: int, chunk: int, max_per_tile: int,
                         group: int, n_tiles: int):
    P = tile * tile
    GP = group * P
    n_chunks_max = max_per_tile // chunk

    def kernel(scal_ref, geom_ref, feat_ref, px_ref, py_ref, cnt_ref,
               out_ref, st_ref):
        g = pl.program_id(0)
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            st_ref[:, :, 0:1] = jnp.ones((group, P, 1), jnp.float32)
            st_ref[:, :, 1:16] = jnp.zeros((group, P, 15), jnp.float32)

        gmax = scal_ref[g]
        trans = st_ref[:, :, 0:1]                       # (G, P, 1)
        active = (c * chunk < gmax) & (jnp.max(trans) > T_EPS)

        @pl.when(active)
        def _():
            # all hot arrays are 3-D (G, P, chunk): P sublanes, chunk lanes
            px = px_ref[:][:, :, None]                  # (G, P, 1)
            py = py_ref[:][:, :, None]
            cnt = cnt_ref[:][:, :, None]                # (G, 1, 1)

            def col(i):
                return geom_ref[:, :, i][:, None, :]    # (G, 1, chunk)

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
            rho3d = u * u + v * v
            z_int = u * col(9) + v * col(10) + col(11)
            dx = px - col(12)
            dy = py - col(13)
            rho2d = rz.FILTER_INV_SQUARE * (dx * dx + dy * dy)
            use3d = rho3d <= rho2d
            rho = jnp.minimum(rho3d, rho2d)
            depth = jnp.where(use3d, z_int, col(14))
            gau = jnp.exp(-0.5 * rho) * rz._rho_window(rho)
            alpha = jnp.minimum(col(15) * gau, rz.ALPHA_MAX)
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (group, P, chunk), 2)
            in_count = (c * chunk + lane) < cnt.astype(jnp.int32)
            keep = (alpha >= ALPHA_EPS) & (depth > NEAR_CULL) & in_count
            alpha = jnp.where(keep, alpha, 0.0)
            depth = jnp.where(keep, depth, 0.0)

            log1m = jnp.log1p(-alpha)
            cums = _lane_cumsum(log1m)
            t_excl = jnp.exp(cums - log1m)
            t_in = trans * t_excl
            alpha = jnp.where(t_in > T_EPS, alpha, 0.0)
            log1m = jnp.log1p(-alpha)
            cums = _lane_cumsum(log1m)
            t_excl = jnp.exp(cums - log1m)
            w = trans * alpha * t_excl                  # (G, P, chunk)

            def fcol(i):
                return feat_ref[:, :, i][:, None, :]

            def rsum(x):
                return jnp.sum(x, axis=2, keepdims=True)

            st_ref[:, :, 1:2] = st_ref[:, :, 1:2] + rsum(w * fcol(0))
            st_ref[:, :, 2:3] = st_ref[:, :, 2:3] + rsum(w * fcol(1))
            st_ref[:, :, 3:4] = st_ref[:, :, 3:4] + rsum(w * fcol(2))
            st_ref[:, :, 4:5] = st_ref[:, :, 4:5] + rsum(w)
            st_ref[:, :, 5:6] = st_ref[:, :, 5:6] + rsum(w * depth)
            t_after = trans * jnp.exp(cums)
            crossed = (t_in > 0.5) & (t_after <= 0.5)
            st_ref[:, :, 6:7] = st_ref[:, :, 6:7] + rsum(
                jnp.where(crossed, depth, 0.0))
            st_ref[:, :, 8:9] = st_ref[:, :, 8:9] + rsum(w * fcol(3))
            st_ref[:, :, 9:10] = st_ref[:, :, 9:10] + rsum(w * fcol(4))
            st_ref[:, :, 10:11] = st_ref[:, :, 10:11] + rsum(w * fcol(5))
            st_ref[:, :, 0:1] = trans * jnp.exp(
                cums[:, :, chunk - 1:chunk])

        @pl.when(c == n_chunks_max - 1)
        def _():
            s = st_ref[:, :, :]
            out_ref[:, :, 0:3] = s[:, :, 1:4]
            out_ref[:, :, 3:4] = s[:, :, 4:5]
            out_ref[:, :, 4:5] = s[:, :, 5:6]
            out_ref[:, :, 5:6] = s[:, :, 6:7]
            out_ref[:, :, 6:7] = s[:, :, 7:8]
            out_ref[:, :, 7:10] = s[:, :, 8:11]
            out_ref[:, :, 10:11] = s[:, :, 0:1]
            out_ref[:, :, 11:16] = jnp.zeros((group, P, 5), jnp.float32)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("img_h", "img_w", "tile", "max_per_tile", "chunk",
                     "group", "full_h"))
def rasterize_tiled_pallas_grouped(
        gaussians: jnp.ndarray, cam_view: jnp.ndarray,
        cam_view_proj: jnp.ndarray, tanfov, bg_color: jnp.ndarray,
        img_h: int, img_w: int, tile: int = 8, max_per_tile: int = 512,
        chunk: int = 128, group: int = 16, full_h: int = 0,
        row0=0) -> Dict[str, jnp.ndarray]:
    """Count-sorted grouped Pallas forward (fast path; no 'dist' output)."""
    assert img_h % tile == 0 and img_w % tile == 0
    assert max_per_tile % chunk == 0
    sp = rz.preprocess_splats(gaussians, cam_view, cam_view_proj,
                              full_h or img_h, img_w, tanfov)
    lists, counts = rz.build_tile_lists(sp, img_h, img_w, tile, max_per_tile,
                                        row0=row0)
    tiles_x = img_w // tile
    tiles_y = img_h // tile
    n_tiles = tiles_x * tiles_y
    P = tile * tile
    assert n_tiles % group == 0
    n_groups = n_tiles // group

    # sort tiles by count (desc) so each group's max bounds its loop
    order = jnp.argsort(-counts)
    inv_order = jnp.argsort(order)
    lists_s = jnp.take(lists, order, axis=0)
    counts_s = jnp.take(counts, order)

    sp_pad = jax.tree.map(
        lambda a: jnp.concatenate(
            [a, jnp.zeros((1,) + a.shape[1:], a.dtype)], 0), sp)
    sp_pad = sp_pad._replace(valid=sp_pad.valid.at[-1].set(False))
    geom, feat = pack_tile_inputs(sp_pad, lists_s)

    # per-tile pixel coordinate tables (sorted order)
    ty = (order // tiles_x).astype(jnp.float32)
    tx = (order % tiles_x).astype(jnp.float32)
    ly, lx = jnp.meshgrid(jnp.arange(tile, dtype=jnp.float32),
                          jnp.arange(tile, dtype=jnp.float32), indexing="ij")
    px_tab = tx[:, None] * tile + lx.reshape(-1)[None, :]       # (T, P)
    py_tab = ty[:, None] * tile + ly.reshape(-1)[None, :] \
        + jnp.asarray(row0, jnp.float32)

    gmax = counts_s.reshape(n_groups, group).max(axis=1).astype(jnp.int32)
    cnt_f = counts_s.astype(jnp.float32)[:, None]               # (T, 1)

    kernel = _make_grouped_kernel(tile, chunk, max_per_tile, group, n_tiles)
    n_chunks_max = max_per_tile // chunk
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups, n_chunks_max),
        in_specs=[
            pl.BlockSpec((group, chunk, 16), lambda g, c, s: (g, c, 0)),
            pl.BlockSpec((group, chunk, 8), lambda g, c, s: (g, c, 0)),
            pl.BlockSpec((group, P), lambda g, c, s: (g, 0)),
            pl.BlockSpec((group, P), lambda g, c, s: (g, 0)),
            pl.BlockSpec((group, 1), lambda g, c, s: (g, 0)),
        ],
        out_specs=pl.BlockSpec((group, P, 16), lambda g, c, s: (g, 0, 0)),
        scratch_shapes=[pltpu.VMEM((group, P, 16), jnp.float32)],
    )
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, P, 16), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(gmax, geom, feat, px_tab, py_tab, cnt_f)

    out = jnp.take(out, inv_order, axis=0)      # unsort tiles

    def detile(a):
        c_shape = a.shape[2:]
        a = a.reshape(tiles_y, tiles_x, tile, tile, *c_shape)
        a = jnp.moveaxis(a, 2, 1)
        return a.reshape(img_h, img_w, *c_shape)

    trans = detile(out[:, :, 10])
    return {
        "image": detile(out[:, :, 0:3]) + trans[..., None] * bg_color,
        "alpha": detile(out[:, :, 3]),
        "depth_expected": detile(out[:, :, 4]),
        "depth_median": detile(out[:, :, 5]),
        "dist": detile(out[:, :, 6]),
        "normal_view": detile(out[:, :, 7:10]),
    }


# ---------------------------------------------------------------------------
# Kernel v3: v1's 2-D per-tile body, G tiles unrolled per program.
#
# Empirics on v5e: v1's 4096 one-tile programs are grid-overhead-bound
# (~100 µs/program) and v2's 3-D blocks stall the remote Mosaic compiler.
# v3 keeps the 2-D (P, chunk) math that compiles fast and simply unrolls G
# tiles inside one program, cutting grid steps by G while preserving the
# per-tile dynamic chunk bound (count skipping).
# ---------------------------------------------------------------------------


def _make_unrolled_kernel(tile: int, chunk: int, max_per_tile: int,
                          tiles_x: int, group: int):
    P = tile * tile
    n_chunks_max = max_per_tile // chunk

    def kernel(scal_ref, geom_ref, feat_ref, out_ref):
        g = pl.program_id(0)
        row0 = scal_ref[pl.num_programs(0) * group]

        for j in range(group):                       # static unroll
            tile_id = g * group + j
            count = scal_ref[tile_id]
            ty = (tile_id // tiles_x).astype(jnp.float32)
            tx = (tile_id % tiles_x).astype(jnp.float32)
            pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
            lx = (pix % tile).astype(jnp.float32)
            ly = (pix // tile).astype(jnp.float32)
            px = tx * tile + lx
            py = ty * tile + ly + row0.astype(jnp.float32)

            n_chunks = jnp.minimum(
                jax.lax.div(count + chunk - 1, chunk), n_chunks_max)

            def chunk_step(c, carry, j=j, px=px, py=py, count=count):
                (trans, rgb, alpha_acc, depth_exp, depth_med, normal) = carry
                sl = pl.ds(c * chunk, chunk)
                geom = geom_ref[j, sl, :]
                feat = feat_ref[j, sl, :]

                def col(i):
                    return geom[:, i].reshape(1, chunk)

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
                rho3d = u * u + v * v
                z_int = u * col(9) + v * col(10) + col(11)
                dx = px - col(12)
                dy = py - col(13)
                rho2d = rz.FILTER_INV_SQUARE * (dx * dx + dy * dy)
                rho = jnp.minimum(rho3d, rho2d)
                depth = jnp.where(rho3d <= rho2d, z_int, col(14))
                gau = jnp.exp(-0.5 * rho) * rz._rho_window(rho)
                alpha = jnp.minimum(col(15) * gau, rz.ALPHA_MAX)
                lane = jax.lax.broadcasted_iota(jnp.int32, (P, chunk), 1)
                keep = ((alpha >= ALPHA_EPS) & (depth > NEAR_CULL)
                        & ((c * chunk + lane) < count))
                alpha = jnp.where(keep, alpha, 0.0)
                depth = jnp.where(keep, depth, 0.0)

                log1m = jnp.log1p(-alpha)
                cums = _lane_cumsum(log1m)
                t_excl = jnp.exp(cums - log1m)
                t_in = trans * t_excl
                alpha = jnp.where(t_in > T_EPS, alpha, 0.0)
                log1m = jnp.log1p(-alpha)
                cums = _lane_cumsum(log1m)
                t_excl = jnp.exp(cums - log1m)
                w = trans * alpha * t_excl

                acc = jnp.dot(w, feat, preferred_element_type=jnp.float32)
                rgb = rgb + acc[:, 0:3]
                normal = normal + acc[:, 3:6]
                alpha_acc = alpha_acc + acc[:, 6:7]
                depth_exp = depth_exp + jnp.sum(w * depth, axis=1,
                                                keepdims=True)
                t_after = trans * jnp.exp(cums)
                crossed = (t_in > 0.5) & (t_after <= 0.5)
                depth_med = depth_med + jnp.sum(
                    jnp.where(crossed, depth, 0.0), axis=1, keepdims=True)
                trans = trans * jnp.exp(cums[:, chunk - 1:chunk])
                return (trans, rgb, alpha_acc, depth_exp, depth_med, normal)

            z1 = jnp.zeros((P, 1), jnp.float32)
            z3 = jnp.zeros((P, 3), jnp.float32)
            init = (jnp.ones((P, 1), jnp.float32), z3, z1, z1, z1, z3)
            (trans, rgb, alpha_acc, depth_exp, depth_med,
             normal) = jax.lax.fori_loop(0, n_chunks, chunk_step, init)

            out_ref[j, :, 0:3] = rgb
            out_ref[j, :, 3:4] = alpha_acc
            out_ref[j, :, 4:5] = depth_exp
            out_ref[j, :, 5:6] = depth_med
            out_ref[j, :, 6:7] = jnp.zeros((P, 1), jnp.float32)
            out_ref[j, :, 7:10] = normal
            out_ref[j, :, 10:11] = trans
            out_ref[j, :, 11:16] = jnp.zeros((P, 5), jnp.float32)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("img_h", "img_w", "tile", "max_per_tile", "chunk",
                     "group", "full_h"))
def rasterize_tiled_pallas_v3(
        gaussians: jnp.ndarray, cam_view: jnp.ndarray,
        cam_view_proj: jnp.ndarray, tanfov, bg_color: jnp.ndarray,
        img_h: int, img_w: int, tile: int = 8, max_per_tile: int = 512,
        chunk: int = 128, group: int = 8, full_h: int = 0,
        row0=0) -> Dict[str, jnp.ndarray]:
    """G-unrolled fast-forward path (no 'dist'; count-sorted groups)."""
    assert img_h % tile == 0 and img_w % tile == 0
    assert max_per_tile % chunk == 0
    sp = rz.preprocess_splats(gaussians, cam_view, cam_view_proj,
                              full_h or img_h, img_w, tanfov)
    lists, counts = rz.build_tile_lists(sp, img_h, img_w, tile, max_per_tile,
                                        row0=row0)
    tiles_x = img_w // tile
    tiles_y = img_h // tile
    n_tiles = tiles_x * tiles_y
    P = tile * tile
    assert n_tiles % group == 0

    sp_pad = jax.tree.map(
        lambda a: jnp.concatenate(
            [a, jnp.zeros((1,) + a.shape[1:], a.dtype)], 0), sp)
    sp_pad = sp_pad._replace(valid=sp_pad.valid.at[-1].set(False))
    geom, feat = pack_tile_inputs(sp_pad, lists)

    # NOTE: px/py derive from the ORIGINAL tile id inside the kernel, so no
    # count sorting here (sorting would need an id indirection table; the
    # unroll already amortises grid overhead).
    scalars = jnp.concatenate(
        [counts.astype(jnp.int32),
         jnp.asarray(row0, jnp.int32).reshape(1)])

    kernel = _make_unrolled_kernel(tile, chunk, max_per_tile, tiles_x, group)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles // group,),
        in_specs=[
            pl.BlockSpec((group, max_per_tile, 16),
                         lambda g, s: (g, 0, 0)),
            pl.BlockSpec((group, max_per_tile, 8),
                         lambda g, s: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((group, P, 16), lambda g, s: (g, 0, 0)),
    )
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, P, 16), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(scalars, geom, feat)

    def detile(a):
        c_shape = a.shape[2:]
        a = a.reshape(tiles_y, tiles_x, tile, tile, *c_shape)
        a = jnp.moveaxis(a, 2, 1)
        return a.reshape(img_h, img_w, *c_shape)

    trans = detile(out[:, :, 10])
    return {
        "image": detile(out[:, :, 0:3]) + trans[..., None] * bg_color,
        "alpha": detile(out[:, :, 3]),
        "depth_expected": detile(out[:, :, 4]),
        "depth_median": detile(out[:, :, 5]),
        "dist": detile(out[:, :, 6]),
        "normal_view": detile(out[:, :, 7:10]),
    }


# ---------------------------------------------------------------------------
# Kernel v4: field-major packed-step pipeline. THE production fused forward.
#
# Round-4 discovery: v1–v3's minutes-long (often non-terminating) Mosaic
# compiles were NOT an environment limitation — they came from lane-dim
# field indexing (`geom_ref[:, :, i]`, a vreg relayout per field that the
# compiler unrolls pathologically). With FIELD-MAJOR blocks (fields on a
# leading, untiled dim) the same math compiles in seconds at any grid.
#
# Design (vs the CUDA tile pipeline consumed at nsr/gs_surfel.py:85-114):
#   * binning reuses the XLA `build_tile_pairs` sort (depth-ordered
#     per-tile segments of one flat array);
#   * XLA pre-gathers ONLY the executed (group, chunk) blocks into a
#     dense step table (22, n_steps, G, chunk) — count-adaptive like the
#     XLA hot loop, not the dense (T, max_per_tile) tables of v1–v3;
#   * 1-D Pallas grid over PACKED steps (scalar-prefetched step → (group,
#     chunk) maps): no grid slots for never-executed chunk iterations;
#   * per-TILE early exit on saturated transmittance (finer than the XLA
#     path's group-level exit);
#   * all 13 output/state channels accumulate in the VMEM-resident output
#     block (16, P, G) — state layout chosen so lane-reductions land on
#     sublanes with NO relayout;
#   * per-pair math identical to `composite_chunk_grouped` (same packed
#     table, same gates); transmittance uses a lane-roll multiplicative
#     doubling scan (exact product, different fp association than the
#     XLA cumprod — last-ulp differences only).
# ---------------------------------------------------------------------------


GATHER_KIND = "f32"   # "f32" | "c64" — A/B'd on chip (tools/v4_sweep)
MXU_FWD_REDUCE = True   # fwd broadcast-column reductions on the MXU (A/B)
MXU_BWD_REDUCE = True   # bwd structure-csum bundle on the MXU (A/B)


def _gather_table(packed: jnp.ndarray, sid: jnp.ndarray, cap: int, G: int,
                  chunk: int) -> jnp.ndarray:
    """Step-table gather: field-major (F, N+1) fp32 → (F, cap, G, chunk).

    Gather cost on v5e is per-output-ROW (~10 ns/row, width-independent —
    r5 isolated probe: 393k-row gathers cost 5.1 ms at width 22 vs 4.0 ms
    at width 1), so the only layout lever is avoiding RELAYOUTS around the
    gather: field-major take + free reshape measures 0.6 ms cheaper than
    row-major take + moveaxis at the bench shape. "c64" (complex64 field-
    pair packing, halving gather "slots") measured frame-NEUTRAL in a bare
    loop and +7 ms inside the production view-map jit — kept only as the
    sweep's A/B record.
    """
    if GATHER_KIND == "c64" and packed.shape[0] % 2 == 0:
        F = packed.shape[0]
        c = jax.lax.complex(packed[0::2, :], packed[1::2, :])
        y = jnp.take(c, sid, axis=1)                     # (F//2, M) c64
        out = jnp.stack([jnp.real(y), jnp.imag(y)], 1).reshape(F, -1)
        return out.reshape(F, cap, G, chunk)
    return jnp.take(packed, sid, axis=1).reshape(-1, cap, G, chunk)


RANK_PAIRS = True    # key-only rank sort vs id co-sort — A/B (the rank
#                      regime trades a +payload sort for a (22, N) table
#                      permute gather; both measured near-neutral)


def _v4_binning(spx, img_h, img_w, tile, max_per_tile, row0, big_capacity,
                n_tiles, N):
    """build_tile_pairs with the packed-key rank regime when it applies;
    falls back to the id-payload co-sort for huge scenes (N > 131072 or
    > 16382 tiles), where `pairs` already hold splat ids (dorder=None)."""
    if RANK_PAIRS and n_tiles + 1 <= (1 << 14) - 1 and N <= (1 << 17):
        return rz.build_tile_pairs(
            spx, img_h, img_w, tile, max_per_tile, row0=row0,
            big_capacity=big_capacity, rank_pairs=True)
    pairs, starts, counts = rz.build_tile_pairs(
        spx, img_h, img_w, tile, max_per_tile, row0=row0,
        big_capacity=big_capacity)
    return pairs, starts, counts, None


def _make_v4_kernel(tile: int, chunk: int, group: int, n_chunks_max: int,
                    unroll: bool = True, dma: bool = False):
    """dma=False: the step table arrives pre-gathered as a pipelined
    (F, 1, G, chunk) block. dma=True: the kernel DMAs each tile's chunk
    slice out of the SEGMENT-ordered table (F, L) in HBM itself —
    replacing the XLA sid+step-table gathers (two ~390k-row slot-bound
    gathers + mask arithmetic) with one segment gather outside and G
    small rectangular DMAs per step inside (all issued up front, waited
    per tile so transfer overlaps compute); out-of-count lanes are
    masked with the per-tile counts instead of dummy-splat zero rows."""
    P = tile * tile
    G = group

    def body(sg_ref, sc_ref, tx_ref, ty_ref, r0_ref, out_ref, read_cols,
             rem_of):
        i = pl.program_id(0)
        g = sg_ref[i]
        c = sc_ref[i]
        row0 = r0_ref[0].astype(jnp.float32)

        @pl.when(c == 0)
        def _():
            out_ref[0, 0] = jnp.ones((P, G), jnp.float32)
            out_ref[0, 1:16] = jnp.zeros((15, P, G), jnp.float32)

        pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
        lx = (pix % tile).astype(jnp.float32)
        ly = (pix // tile).astype(jnp.float32)

        def tile_body(j):
            trans = out_ref[0, 0, :, j][:, None]            # (P, 1)
            # OUTSIDE the saturation predicate: on the DMA path read_cols
            # waits on tile j's transfer semaphore, and a skipped wait
            # would leave the signal pending for the NEXT step's wait
            col, col6 = read_cols(j)
            rem = rem_of(j)

            @pl.when((jnp.max(trans) > T_EPS) & (c < n_chunks_max))
            def _():
                t_lin = g * G + j
                px = tx_ref[t_lin].astype(jnp.float32) * tile + lx
                py = ty_ref[t_lin].astype(jnp.float32) * tile + ly + row0

                # identical expression order to composite_chunk_grouped
                p0 = px * col(0) + py * col(3) + col(6)     # (P, chunk)
                p1 = px * col(1) + py * col(4) + col(7)
                p2 = px * col(2) + py * col(5) + col(8)
                safe = jnp.where(jnp.abs(p2) < 1e-9, 1e-9, p2)
                inv = 1.0 / safe
                u = p0 * inv
                v = p1 * inv
                rho3d = u * u + v * v
                dx = px - col(12)
                dy = py - col(13)
                rho2d = rz.FILTER_INV_SQUARE * (dx * dx + dy * dy)
                use3d = rho3d <= rho2d
                rho = jnp.minimum(rho3d, rho2d)
                depth = jnp.where(use3d,
                                  u * col(9) + v * col(10) + col(11),
                                  col(14))
                gau = jnp.exp(-0.5 * rho) * rz._rho_window(rho)
                alpha = jnp.minimum(col(15) * gau, rz.ALPHA_MAX)
                lane = jax.lax.broadcasted_iota(jnp.int32, (P, chunk), 1)
                keep = (alpha >= ALPHA_EPS) & (depth > NEAR_CULL)
                if rem is not None:     # DMA path: mask past-count lanes
                    keep = keep & (lane < rem)
                alpha = jnp.where(keep, alpha, 0.0)
                depth = jnp.where(keep, depth, 0.0)

                # multiplicative doubling scan: t_incl[i] = Π_{k<=i}(1-α_k)
                t_incl = 1.0 - alpha
                s = 1
                while s < chunk:
                    sh = pltpu.roll(t_incl, shift=s, axis=1)
                    t_incl = t_incl * jnp.where(lane >= s, sh, 1.0)
                    s *= 2
                t_excl = jnp.where(
                    lane >= 1, pltpu.roll(t_incl, shift=1, axis=1), 1.0)
                t_in = trans * t_excl
                below = t_in <= T_EPS
                w = jnp.where(below, 0.0, trans * alpha * t_excl)

                def rsum(x):
                    return jnp.sum(x, axis=1)               # (P,)

                if MXU_FWD_REDUCE:
                    # The 7 broadcast-column reductions Σ_k w[p,k]·f[k]
                    # are ONE (P,chunk)·(chunk,7) contraction → MXU (runs
                    # beside the VPU; fp32 via HIGHEST — default rounds
                    # MXU inputs to bf16, CLAUDE.md), replacing 7 VPU
                    # multiply+tree-reduce chains. Only the per-PIXEL-
                    # varying reductions (depth, median, distortion
                    # moments) stay on the VPU.
                    rhs = jnp.concatenate(
                        [col6(), jnp.ones((1, chunk), jnp.float32)], axis=0)
                    feats = jax.lax.dot_general(
                        w, rhs, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)  # (P, 7)
                    s_w = feats[:, 6]
                    out_ref[0, 1, :, j] += feats[:, 0]
                    out_ref[0, 2, :, j] += feats[:, 1]
                    out_ref[0, 3, :, j] += feats[:, 2]
                    out_ref[0, 8, :, j] += feats[:, 3]
                    out_ref[0, 9, :, j] += feats[:, 4]
                    out_ref[0, 10, :, j] += feats[:, 5]
                else:
                    s_w = rsum(w)
                    out_ref[0, 1, :, j] += rsum(w * col(16))
                    out_ref[0, 2, :, j] += rsum(w * col(17))
                    out_ref[0, 3, :, j] += rsum(w * col(18))
                    out_ref[0, 8, :, j] += rsum(w * col(19))
                    out_ref[0, 9, :, j] += rsum(w * col(20))
                    out_ref[0, 10, :, j] += rsum(w * col(21))
                out_ref[0, 5, :, j] += rsum(w * depth)

                t_after = trans * t_incl
                crossed = (t_in > 0.5) & (t_after <= 0.5)
                out_ref[0, 6, :, j] += rsum(jnp.where(crossed, depth, 0.0))

                # depth distortion: chunk sums + entry-state cross terms
                zc = jnp.maximum(depth, ZNEAR)
                m = (ZFAR * (zc - ZNEAR)) / (zc * (ZFAR - ZNEAR))
                wm = w * m
                s_wm = rsum(wm)
                s_wm2 = rsum(wm * m)
                A_in = out_ref[0, 4, :, j]                  # alpha_acc entry
                D_in = out_ref[0, 11, :, j]
                D2_in = out_ref[0, 12, :, j]
                out_ref[0, 7, :, j] += (A_in * s_wm2 + D2_in * s_w
                                        - 2.0 * D_in * s_wm
                                        + (s_w * s_wm2 - s_wm * s_wm))
                out_ref[0, 4, :, j] = A_in + s_w
                out_ref[0, 11, :, j] = D_in + s_wm
                out_ref[0, 12, :, j] = D2_in + s_wm2

                t_raw = (trans * t_incl[:, chunk - 1:chunk])[:, 0]
                out_ref[0, 0, :, j] = jnp.where(t_raw > T_EPS, t_raw, 0.0)

        if unroll:
            for j in range(G):
                tile_body(j)
        else:
            jax.lax.fori_loop(0, G, lambda j, _: (tile_body(j), None)[1],
                              None)

    if not dma:
        def kernel(sg_ref, sc_ref, tx_ref, ty_ref, r0_ref, tab_ref,
                   out_ref):
            def read_cols(j):
                def col(f):
                    return tab_ref[f, 0, j, :].reshape(1, chunk)

                return col, lambda: tab_ref[16:22, 0, j, :]

            body(sg_ref, sc_ref, tx_ref, ty_ref, r0_ref, out_ref,
                 read_cols, lambda j: None)

        return kernel

    def dma_kernel(sg_ref, sc_ref, tx_ref, ty_ref, st_ref, ct_ref, r0_ref,
                   seg_ref, out_ref, buf, sems):
        i = pl.program_id(0)
        g = sg_ref[i]
        c = sc_ref[i]

        def slice_dma(j):
            t_lin = g * G + j
            off = st_ref[t_lin] + c * chunk
            return pltpu.make_async_copy(
                seg_ref.at[:, pl.ds(off, chunk)], buf.at[j], sems.at[j])

        for j in range(G):          # issue everything up front
            slice_dma(j).start()

        def read_cols(j):
            def col(f):
                return buf[j, f, :].reshape(1, chunk)

            return col, lambda: buf[j, 16:22, :]

        def rem_of(j):
            t_lin = g * G + j
            return ct_ref[t_lin] - c * chunk        # (scalar) vs lane iota

        def waiting_body(sg2, sc2, tx2, ty2, r02, out2, rc, rm):
            # wait for tile j's transfer just before computing it
            def rc_wait(j):
                slice_dma(j).wait()
                return rc(j)

            body(sg2, sc2, tx2, ty2, r02, out2, rc_wait, rm)

        waiting_body(sg_ref, sc_ref, tx_ref, ty_ref, r0_ref, out_ref,
                     read_cols, rem_of)

    return dma_kernel


@functools.partial(
    jax.jit,
    static_argnames=("img_h", "img_w", "tile", "max_per_tile", "chunk",
                     "group", "steps_per_group", "full_h", "big_capacity",
                     "interpret"))
def rasterize_tiled_v4(gaussians: jnp.ndarray, cam_view: jnp.ndarray,
                       cam_view_proj: jnp.ndarray, tanfov,
                       bg_color: jnp.ndarray, img_h: int, img_w: int,
                       tile: int = 16, max_per_tile: int = 2048,
                       chunk: int = 128, group: int = 16,
                       steps_per_group: float = 2.7, full_h: int = 0,
                       row0=0, big_capacity: int = 0,
                       interpret=None) -> Dict[str, jnp.ndarray]:
    """v4 fused forward (see kernel docstring). Same output dict as
    `rz.rasterize_tiled`; non-differentiable (use `rasterize_tiled_v4_train`
    for training).

    steps_per_group bounds the packed-step budget: cap = n_groups ×
    steps_per_group. Groups are count-sorted descending and budget is
    assigned greedily (every group keeps its first step — init + chunk 0
    — so starvation degrades the SHALLOWEST tiles' tails first, the same
    farthest-first degradation direction as the max_per_tile cap).
    """
    assert img_h % tile == 0 and img_w % tile == 0
    assert max_per_tile % chunk == 0
    sp = rz.preprocess_splats(gaussians, cam_view, cam_view_proj,
                              full_h or img_h, img_w, tanfov)
    spx = jax.tree.map(jax.lax.stop_gradient, sp)
    tiles_x = img_w // tile
    tiles_y = img_h // tile
    n_tiles = tiles_x * tiles_y
    N = gaussians.shape[0]
    pairs, starts, counts, dorder = _v4_binning(
        spx, img_h, img_w, tile, max_per_tile, row0, big_capacity,
        n_tiles, N)

    P = tile * tile
    if n_tiles % group != 0:
        import math
        group = math.gcd(group, n_tiles)
    G = group
    n_groups = n_tiles // G
    n_chunks_max = max_per_tile // chunk

    # ---- count-sorted groups + packed step map ----------------------------
    order = jnp.argsort(-counts)
    counts_s = jnp.take(counts, order)
    starts_s = jnp.take(starts, order)
    gmax = counts_s[::G]
    n_act = jnp.clip((gmax + chunk - 1) // chunk, 1, n_chunks_max)

    cap = int(n_groups * steps_per_group)
    # every group gets 1 guaranteed step; extra chunks granted greedily in
    # count order until the budget runs out
    extra = n_act - 1
    cum_prev = jnp.cumsum(extra) - extra
    allowed = jnp.clip(cap - n_groups - cum_prev, 0, extra)
    n_act2 = 1 + allowed
    offs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(n_act2).astype(jnp.int32)])
    total = offs[-1]                                        # <= cap
    mark = jnp.zeros((cap,), jnp.int32).at[offs[1:-1]].add(
        1, mode="drop")
    step_group = jnp.cumsum(mark)
    step_chunk = (jnp.arange(cap, dtype=jnp.int32)
                  - jnp.take(offs, step_group))
    live = jnp.arange(cap, dtype=jnp.int32) < total
    step_group = jnp.where(live, step_group, n_groups - 1)
    step_chunk = jnp.where(live, step_chunk, n_chunks_max)

    # ---- gather the executed blocks into the dense step table --------------
    # `pairs` holds depth RANKS (packed-key regime); permute the packed
    # table into depth order once (cheap N-column gather) so the
    # step-table gather indexes it directly — no splat-id payload rode
    # through the pair sort. Fallback regime: pairs are splat ids and the
    # table is indexed directly (dorder is None).
    packed = rz.pack_splat_render(sp)                       # (22, N)
    if dorder is not None:
        packed = jnp.take(packed, dorder, axis=1)
    packed = jnp.concatenate(
        [packed, jnp.zeros((rz.PACKED_F, 1), jnp.float32)], axis=1)
    starts_gj = jnp.take(starts_s.reshape(n_groups, G), step_group, axis=0)
    counts_gj = jnp.take(counts_s.reshape(n_groups, G), step_group, axis=0)
    lane = jnp.arange(chunk, dtype=jnp.int32)
    pos = step_chunk[:, None, None] * chunk + lane[None, None, :]
    slot = starts_gj[:, :, None] + pos                      # (cap, G, chunk)
    in_rng = pos < counts_gj[:, :, None]
    sid = jnp.take(pairs, jnp.where(in_rng, slot, 0).reshape(-1))
    sid = jnp.where(in_rng.reshape(-1), sid, N)             # dummy splat
    tab = _gather_table(packed, sid, cap, G, chunk)

    tx = (order % tiles_x).astype(jnp.int32)
    ty = (order // tiles_x).astype(jnp.int32)
    r0 = jnp.asarray(row0, jnp.int32).reshape(1)

    kernel = _make_v4_kernel(tile, chunk, G, n_chunks_max)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(cap,),
        in_specs=[
            pl.BlockSpec((rz.PACKED_F, 1, G, chunk),
                         lambda i, sg, sc, tx, ty, r0: (0, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 16, P, G),
            lambda i, sg, sc, tx, ty, r0: (sg[i], 0, 0, 0)),
    )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_groups, 16, P, G), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(step_group, step_chunk, tx, ty, r0, tab)

    # (n_groups, 16, P, G) → (n_tiles, P, 16) in ORIGINAL tile order
    o = jnp.transpose(out, (0, 3, 2, 1)).reshape(n_tiles, P, 16)
    inv = jnp.argsort(order)
    o = jnp.take(o, inv, axis=0)
    o = o.reshape(tiles_y, tiles_x, tile, tile, 16)
    o = jnp.moveaxis(o, 2, 1).reshape(img_h, img_w, 16)

    trans = o[..., 0]
    return {
        "image": o[..., 1:4] + trans[..., None] * bg_color,
        "alpha": o[..., 4],
        "depth_expected": o[..., 5],
        "depth_median": o[..., 6],
        "dist": o[..., 7],
        "normal_view": o[..., 8:11],
    }


@functools.partial(
    jax.jit,
    static_argnames=("img_h", "img_w", "tile", "max_per_tile", "chunk",
                     "group", "steps_per_group", "full_h", "big_capacity",
                     "interpret"))
def rasterize_tiled_v4_dma(gaussians: jnp.ndarray, cam_view: jnp.ndarray,
                           cam_view_proj: jnp.ndarray, tanfov,
                           bg_color: jnp.ndarray, img_h: int, img_w: int,
                           tile: int = 16, max_per_tile: int = 2048,
                           chunk: int = 128, group: int = 16,
                           steps_per_group: float = 2.7, full_h: int = 0,
                           row0=0, big_capacity: int = 0,
                           interpret=None) -> Dict[str, jnp.ndarray]:
    """v4 forward with the step table fed by IN-KERNEL DMA slices.

    XLA builds ONE segment-ordered table (F, L) = packed[:, pairs]; the
    kernel DMAs each (tile, chunk) slice with scalar-prefetched dynamic
    offsets (starts_s[t] + c·chunk) and masks past-count lanes against
    counts_s. Replaces the 2-stage sid + step-table gathers (~390k output
    rows each, slot-bound — BENCH_NOTES r5) and all the step-slot mask
    arithmetic. Output-identical to `rasterize_tiled_v4` up to the usual
    last-ulp reassociation. Non-differentiable (bench/inference A/B)."""
    assert img_h % tile == 0 and img_w % tile == 0
    assert max_per_tile % chunk == 0
    sp = rz.preprocess_splats(gaussians, cam_view, cam_view_proj,
                              full_h or img_h, img_w, tanfov)
    spx = jax.tree.map(jax.lax.stop_gradient, sp)
    tiles_x = img_w // tile
    tiles_y = img_h // tile
    n_tiles = tiles_x * tiles_y
    N = gaussians.shape[0]
    pairs, starts, counts, dorder = _v4_binning(
        spx, img_h, img_w, tile, max_per_tile, row0, big_capacity,
        n_tiles, N)

    P = tile * tile
    if n_tiles % group != 0:
        import math
        group = math.gcd(group, n_tiles)
    G = group
    n_groups = n_tiles // G
    n_chunks_max = max_per_tile // chunk

    order = jnp.argsort(-counts)
    counts_s = jnp.take(counts, order)
    starts_s = jnp.take(starts, order)
    gmax = counts_s[::G]
    n_act = jnp.clip((gmax + chunk - 1) // chunk, 1, n_chunks_max)
    cap = int(n_groups * steps_per_group)
    extra = n_act - 1
    cum_prev = jnp.cumsum(extra) - extra
    allowed = jnp.clip(cap - n_groups - cum_prev, 0, extra)
    n_act2 = 1 + allowed
    offs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(n_act2).astype(jnp.int32)])
    total = offs[-1]
    mark = jnp.zeros((cap,), jnp.int32).at[offs[1:-1]].add(1, mode="drop")
    step_group = jnp.cumsum(mark)
    step_chunk = (jnp.arange(cap, dtype=jnp.int32)
                  - jnp.take(offs, step_group))
    live = jnp.arange(cap, dtype=jnp.int32) < total
    step_group = jnp.where(live, step_group, n_groups - 1)
    step_chunk = jnp.where(live, step_chunk, n_chunks_max - 1)

    packed = rz.pack_splat_render(sp)                       # (22, N)
    if dorder is not None:
        packed = jnp.take(packed, dorder, axis=1)
    packed = jnp.concatenate(
        [packed, jnp.zeros((rz.PACKED_F, 1), jnp.float32)], axis=1)
    # the ONE gather: segment-ordered table; pairs is already padded with
    # max_per_tile trailing slots so offset+chunk never over-runs
    # field dim padded 22 → 24: Mosaic requires DMA slice sublane dims
    # aligned to the (8, 128) tiling
    packed24 = jnp.concatenate(
        [packed, jnp.zeros((2, packed.shape[1]), jnp.float32)], axis=0)
    seg_tab = jnp.take(packed24, pairs, axis=1)             # (24, L)

    tx = (order % tiles_x).astype(jnp.int32)
    ty = (order // tiles_x).astype(jnp.int32)
    r0 = jnp.asarray(row0, jnp.int32).reshape(1)

    kernel = _make_v4_kernel(tile, chunk, G, n_chunks_max, dma=True)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(cap,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, 16, P, G),
            lambda i, sg, sc, tx, ty, st, ct, r0: (sg[i], 0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((G, 24, chunk), jnp.float32),
                        pltpu.SemaphoreType.DMA((G,))],
    )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_groups, 16, P, G), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(step_group, step_chunk, tx, ty,
      starts_s.astype(jnp.int32), counts_s.astype(jnp.int32), r0, seg_tab)

    o = jnp.transpose(out, (0, 3, 2, 1)).reshape(n_tiles, P, 16)
    inv = jnp.argsort(order)
    o = jnp.take(o, inv, axis=0)
    o = o.reshape(tiles_y, tiles_x, tile, tile, 16)
    o = jnp.moveaxis(o, 2, 1).reshape(img_h, img_w, 16)

    trans = o[..., 0]
    return {
        "image": o[..., 1:4] + trans[..., None] * bg_color,
        "alpha": o[..., 4],
        "depth_expected": o[..., 5],
        "depth_median": o[..., 6],
        "dist": o[..., 7],
        "normal_view": o[..., 8:11],
    }


# ---------------------------------------------------------------------------
# v4 training path: fused forward + fused ANALYTIC backward kernel.
#
# The forward variant additionally streams each step's 4-channel ENTRY
# state (trans, alpha_acc, dist_d, dist_d2 — all the backward needs besides
# the table) to HBM: (cap, 4, P, G) ≈ 10 MB at 512², vs the 109 MB
# full-PixelState checkpoint of the XLA reverse-scan VJP. The backward
# kernel walks the packed steps in REVERSE (index_map cap-1-i), recomputes
# the chunk forward from the entry state, applies the same analytic
# adjoints as `rz._chunk_backward`, carries the state cotangent per group
# in VMEM scratch, and writes each step's d_tab block EXCLUSIVELY — the
# kernel does zero scatters; splat-space reduction happens in XLA through
# the table gather's autodiff VJP (one batched scatter-add).
# ---------------------------------------------------------------------------


def _v4_fwd_entries_kernel(tile: int, chunk: int, group: int,
                           n_chunks_max: int):
    """Forward kernel that also writes per-step entry states."""
    base = _make_v4_kernel(tile, chunk, group, n_chunks_max)
    P = tile * tile
    G = group

    def kernel(sg_ref, sc_ref, tx_ref, ty_ref, r0_ref, tab_ref, out_ref,
               entry_ref):
        c = sc_ref[pl.program_id(0)]

        # init first (c == 0), so entries see the initialized state
        @pl.when(c == 0)
        def _():
            out_ref[0, 0] = jnp.ones((P, G), jnp.float32)
            out_ref[0, 1:16] = jnp.zeros((15, P, G), jnp.float32)

        entry_ref[0, 0] = out_ref[0, 0]
        entry_ref[0, 1] = out_ref[0, 4]
        entry_ref[0, 2] = out_ref[0, 11]
        entry_ref[0, 3] = out_ref[0, 12]
        base(sg_ref, sc_ref, tx_ref, ty_ref, r0_ref, tab_ref, out_ref)

    return kernel


def _v4_bwd_kernel(tile: int, chunk: int, group: int, n_chunks_max: int,
                   cap: int):
    P = tile * tile
    G = group
    F2 = rz.FILTER_INV_SQUARE

    def kernel(sg_ref, sc_ref, nact_ref, tx_ref, ty_ref, r0_ref,
               tab_ref, entry_ref, ct_ref, dtab_ref, scr_ref):
        i = pl.program_id(0)
        ir = cap - 1 - i
        g = sg_ref[ir]
        c = sc_ref[ir]
        row0 = r0_ref[0].astype(jnp.float32)

        # first visit of this group in reverse order = its last executed
        # chunk: seed the state cotangent from the output cotangent block
        @pl.when(c == nact_ref[g] - 1)
        def _():
            scr_ref[:, :, :] = ct_ref[0]

        dtab_ref[:, :, :, :] = jnp.zeros((rz.PACKED_F, 1, G, chunk),
                                         jnp.float32)

        pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
        lx = (pix % tile).astype(jnp.float32)
        ly = (pix // tile).astype(jnp.float32)

        def tile_body(j):
            tau = entry_ref[0, 0, :, j][:, None]            # (P, 1)

            @pl.when((jnp.max(tau) > T_EPS) & (c < n_chunks_max))
            def _():
                t_lin = g * G + j
                px = tx_ref[t_lin].astype(jnp.float32) * tile + lx
                py = ty_ref[t_lin].astype(jnp.float32) * tile + ly + row0

                def col(f):
                    return tab_ref[f, 0, j, :].reshape(1, chunk)

                # ---- forward recompute (identical expression order) ----
                p0 = px * col(0) + py * col(3) + col(6)
                p1 = px * col(1) + py * col(4) + col(7)
                p2 = px * col(2) + py * col(5) + col(8)
                safe = jnp.where(jnp.abs(p2) < 1e-9, 1e-9, p2)
                inv = 1.0 / safe
                u = p0 * inv
                v = p1 * inv
                rho3d = u * u + v * v
                dx = px - col(12)
                dy = py - col(13)
                rho2d = F2 * (dx * dx + dy * dy)
                use3d = rho3d <= rho2d
                rho = jnp.minimum(rho3d, rho2d)
                depth = jnp.where(use3d,
                                  u * col(9) + v * col(10) + col(11),
                                  col(14))
                expw = jnp.exp(-0.5 * rho)
                win = rz._rho_window(rho)
                gau = expw * win
                og = col(15) * gau
                alpha_raw = jnp.minimum(og, rz.ALPHA_MAX)
                keep = (alpha_raw >= ALPHA_EPS) & (depth > NEAR_CULL)
                alpha = jnp.where(keep, alpha_raw, 0.0)
                depth = jnp.where(keep, depth, 0.0)

                lane = jax.lax.broadcasted_iota(jnp.int32, (P, chunk), 1)
                t_incl = 1.0 - alpha
                s = 1
                while s < chunk:
                    sh = pltpu.roll(t_incl, shift=s, axis=1)
                    t_incl = t_incl * jnp.where(lane >= s, sh, 1.0)
                    s *= 2
                t_excl = jnp.where(
                    lane >= 1, pltpu.roll(t_incl, shift=1, axis=1), 1.0)
                t_in = tau * t_excl
                below = t_in <= T_EPS
                w = jnp.where(below, 0.0, tau * alpha * t_excl)
                t_last = t_incl[:, chunk - 1:chunk]
                t_after = tau * t_incl
                crossed = (t_in > 0.5) & (t_after <= 0.5)
                zc = jnp.maximum(depth, ZNEAR)
                m = (ZFAR * (zc - ZNEAR)) / (zc * (ZFAR - ZNEAR))
                wm = w * m

                def rsum(x):                                # (P, 1)
                    return jnp.sum(x, axis=1, keepdims=True)

                def csum(x):                                # (1, chunk)
                    return jnp.sum(x, axis=0, keepdims=True)

                s_w = rsum(w)
                s_wm = rsum(wm)
                s_wm2 = rsum(wm * m)

                # ---- state-in / chunk-sum cotangents -------------------
                A_in = entry_ref[0, 1, :, j][:, None]
                D_in = entry_ref[0, 2, :, j][:, None]
                D2_in = entry_ref[0, 3, :, j][:, None]
                ct_tr = scr_ref[0, :, j][:, None]
                ct_r0 = scr_ref[1, :, j][:, None]
                ct_r1 = scr_ref[2, :, j][:, None]
                ct_r2 = scr_ref[3, :, j][:, None]
                ct_A = scr_ref[4, :, j][:, None]
                ct_de = scr_ref[5, :, j][:, None]
                ct_md = scr_ref[6, :, j][:, None]
                ct_di = scr_ref[7, :, j][:, None]
                ct_n0 = scr_ref[8, :, j][:, None]
                ct_n1 = scr_ref[9, :, j][:, None]
                ct_n2 = scr_ref[10, :, j][:, None]
                ct_Dw = scr_ref[11, :, j][:, None]
                ct_Dw2 = scr_ref[12, :, j][:, None]

                ct_A_new = ct_A + ct_di * s_wm2
                ct_Dw_new = ct_Dw - 2.0 * ct_di * s_wm
                ct_Dw2_new = ct_Dw2 + ct_di * s_w
                ct_s_w = ct_A + ct_di * (D2_in + s_wm2)
                ct_s_wm = ct_Dw - 2.0 * ct_di * (D_in + s_wm)
                ct_s_wm2 = ct_Dw2 + ct_di * (A_in + s_w)

                cw = (ct_r0 * col(16) + ct_r1 * col(17) + ct_r2 * col(18)
                      + ct_n0 * col(19) + ct_n1 * col(20) + ct_n2 * col(21)
                      + ct_s_w + ct_de * depth
                      + ct_s_wm * m + ct_s_wm2 * (m * m))
                cw = jnp.where(below, 0.0, cw)

                # ---- alpha / transmittance chain -----------------------
                q = cw * w
                incl = q
                s = 1
                while s < chunk:
                    sh = pltpu.roll(incl, shift=s, axis=1)
                    incl = incl + jnp.where(lane >= s, sh, 0.0)
                    s *= 2
                suffix = incl[:, chunk - 1:chunk] - incl
                trans_raw = tau * t_last
                flushed = trans_raw <= T_EPS
                ct_trans_out = jnp.where(flushed, 0.0, ct_tr)
                trans_out = jnp.where(flushed, 0.0, trans_raw)
                bracket = suffix + ct_trans_out * trans_out
                ct_alpha = cw * tau * t_excl - bracket / (1.0 - alpha)
                ct_tr_new = (rsum(cw * alpha * t_excl)
                             + ct_trans_out * t_last)

                # ---- depth / mapped-depth chain ------------------------
                ct_m = ct_s_wm * w + ct_s_wm2 * (2.0 * w * m)
                dm_dz = jnp.where(depth >= ZNEAR,
                                  (ZFAR * ZNEAR / (ZFAR - ZNEAR)) / (zc * zc),
                                  0.0)
                ct_depth = (ct_de * w + ct_md * crossed + ct_m * dm_dz)
                ct_depth = jnp.where(keep, ct_depth, 0.0)
                k3 = keep & use3d
                ct_depth3 = jnp.where(k3, ct_depth, 0.0)
                ct_num = ct_depth3 * inv
                dtab_ref[14, 0, j, :] = csum(
                    jnp.where(keep & ~use3d, ct_depth, 0.0))[0]

                # ---- opacity / gaussian chain --------------------------
                ct_og = jnp.where(keep & (og < rz.ALPHA_MAX), ct_alpha, 0.0)
                dtab_ref[15, 0, j, :] = csum(ct_og * gau)[0]
                ct_g = ct_og * col(15)
                ramp = rz.RHO_CUT - rho
                dwin = jnp.where((ramp > 0.0) & (ramp < rz.RHO_RAMP),
                                 -1.0 / rz.RHO_RAMP, 0.0)
                ct_rho = ct_g * (expw * dwin - 0.5 * expw * win)
                ct_rho3d = jnp.where(use3d, ct_rho, 0.0)
                ct_rho2d = jnp.where(use3d, 0.0, ct_rho)
                ct_u = 2.0 * u * ct_rho3d
                ct_v = 2.0 * v * ct_rho3d
                ct_dx = ct_rho2d * F2 * 2.0 * dx
                ct_dy = ct_rho2d * F2 * 2.0 * dy
                dtab_ref[12, 0, j, :] = -csum(ct_dx)[0]
                dtab_ref[13, 0, j, :] = -csum(ct_dy)[0]

                # ---- projective ray-plane chain ------------------------
                ct_p0 = ct_u * inv
                ct_p1 = ct_v * inv
                ct_inv = ct_u * p0 + ct_v * p1 + ct_depth3 * (depth * safe)
                ct_safe = -(inv * inv) * ct_inv
                ct_p2 = jnp.where(jnp.abs(p2) < 1e-9, 0.0, ct_safe)

                # ---- MXU bundle for the structure-factorable csums -----
                # 18 pixel-axis reductions factor as Σ_p L[p,a]·R[p,c]:
                # lhs columns (1, px, py | ct_r*, ct_n*), rhs lane panels
                # (ct_num, ct_p0..2 | w). ONE (P,9)ᵀ·(P,5·chunk) MXU
                # contraction replaces 18 VPU multiply + sublane-tree-
                # reduce chains (the backward's dominant vector cost).
                # fp32 via HIGHEST (default rounds MXU inputs to bf16 —
                # CLAUDE.md).
                if MXU_BWD_REDUCE:
                    ones_p = jnp.ones((P, 1), jnp.float32)
                    lhs = jnp.concatenate(
                        [ones_p, px, py, ct_r0, ct_r1, ct_r2,
                         ct_n0, ct_n1, ct_n2], axis=1)      # (P, 9)
                    rhs = jnp.concatenate(
                        [ct_num, ct_p0, ct_p1, ct_p2, w], axis=1)  # (P,5K)
                    red = jax.lax.dot_general(
                        lhs, rhs, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)  # (9, 5K)

                    def red_at(a, p):                       # (1, chunk)
                        return red[a:a + 1, p * chunk:(p + 1) * chunk]
                else:
                    def red_at(a, p, _tab={}):              # VPU fallback
                        lcol = (1.0, px, py, ct_r0, ct_r1, ct_r2,
                                ct_n0, ct_n1, ct_n2)[a]
                        rpan = (ct_num, ct_p0, ct_p1, ct_p2, w)[p]
                        return csum(lcol * rpan)

                ct_tza = red_at(1, 0)
                ct_tzb = red_at(2, 0)
                ct_tzc = red_at(0, 0)
                tz0, tz1, tz2 = col(9), col(10), col(11)
                dtab_ref[0, 0, j, :] = (red_at(1, 1) + ct_tza * tz0)[0]
                dtab_ref[1, 0, j, :] = (red_at(1, 2) + ct_tza * tz1)[0]
                dtab_ref[2, 0, j, :] = (red_at(1, 3) + ct_tza * tz2)[0]
                dtab_ref[3, 0, j, :] = (red_at(2, 1) + ct_tzb * tz0)[0]
                dtab_ref[4, 0, j, :] = (red_at(2, 2) + ct_tzb * tz1)[0]
                dtab_ref[5, 0, j, :] = (red_at(2, 3) + ct_tzb * tz2)[0]
                dtab_ref[6, 0, j, :] = (red_at(0, 1) + ct_tzc * tz0)[0]
                dtab_ref[7, 0, j, :] = (red_at(0, 2) + ct_tzc * tz1)[0]
                dtab_ref[8, 0, j, :] = (red_at(0, 3) + ct_tzc * tz2)[0]
                dtab_ref[9, 0, j, :] = (ct_tza * col(0) + ct_tzb * col(3)
                                        + ct_tzc * col(6))[0]
                dtab_ref[10, 0, j, :] = (ct_tza * col(1) + ct_tzb * col(4)
                                         + ct_tzc * col(7))[0]
                dtab_ref[11, 0, j, :] = (ct_tza * col(2) + ct_tzb * col(5)
                                         + ct_tzc * col(8))[0]

                dtab_ref[16, 0, j, :] = red_at(3, 4)[0]
                dtab_ref[17, 0, j, :] = red_at(4, 4)[0]
                dtab_ref[18, 0, j, :] = red_at(5, 4)[0]
                dtab_ref[19, 0, j, :] = red_at(6, 4)[0]
                dtab_ref[20, 0, j, :] = red_at(7, 4)[0]
                dtab_ref[21, 0, j, :] = red_at(8, 4)[0]

                # ---- carry the state cotangent backward ----------------
                scr_ref[0, :, j] = ct_tr_new[:, 0]
                scr_ref[4, :, j] = ct_A_new[:, 0]
                scr_ref[11, :, j] = ct_Dw_new[:, 0]
                scr_ref[12, :, j] = ct_Dw2_new[:, 0]

        for j in range(G):
            tile_body(j)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("img_h", "img_w", "tile", "max_per_tile", "chunk",
                     "group", "steps_per_group", "full_h", "big_capacity",
                     "interpret"))
def rasterize_tiled_v4_train(gaussians: jnp.ndarray, cam_view: jnp.ndarray,
                             cam_view_proj: jnp.ndarray, tanfov,
                             bg_color: jnp.ndarray, img_h: int, img_w: int,
                             tile: int = 16, max_per_tile: int = 2048,
                             chunk: int = 128, group: int = 16,
                             steps_per_group: float = 2.7, full_h: int = 0,
                             row0=0, big_capacity: int = 0,
                             interpret=None) -> Dict[str, jnp.ndarray]:
    """v4 fused forward + fused analytic Pallas BACKWARD (training path).

    Fully differentiable w.r.t. `gaussians`: the custom_vjp boundary wraps
    only the Pallas composite (table blocks → state blocks); preprocess,
    packing, the table gather (whose autodiff VJP is the splat-space
    scatter-add), de-tiling, and the bg blend stay in XLA autodiff.
    Replaces the CUDA analytic BACKWARD kernel of
    diff-surfel-rasterization (consumed at nsr/gs_surfel.py:15).
    """
    assert img_h % tile == 0 and img_w % tile == 0
    assert max_per_tile % chunk == 0
    sp = rz.preprocess_splats(gaussians, cam_view, cam_view_proj,
                              full_h or img_h, img_w, tanfov)
    spx = jax.tree.map(jax.lax.stop_gradient, sp)
    tiles_x = img_w // tile
    tiles_y = img_h // tile
    n_tiles = tiles_x * tiles_y
    N = gaussians.shape[0]
    pairs, starts, counts, dorder = _v4_binning(
        spx, img_h, img_w, tile, max_per_tile, row0, big_capacity,
        n_tiles, N)
    P = tile * tile
    if n_tiles % group != 0:
        import math
        group = math.gcd(group, n_tiles)
    G = group
    n_groups = n_tiles // G
    n_chunks_max = max_per_tile // chunk

    order = jnp.argsort(-counts)
    counts_s = jnp.take(counts, order)
    starts_s = jnp.take(starts, order)
    gmax = counts_s[::G]
    n_act = jnp.clip((gmax + chunk - 1) // chunk, 1, n_chunks_max)

    cap = int(n_groups * steps_per_group)
    extra = n_act - 1
    cum_prev = jnp.cumsum(extra) - extra
    allowed = jnp.clip(cap - n_groups - cum_prev, 0, extra)
    n_act2 = (1 + allowed).astype(jnp.int32)
    offs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(n_act2).astype(jnp.int32)])
    total = offs[-1]
    mark = jnp.zeros((cap,), jnp.int32).at[offs[1:-1]].add(1, mode="drop")
    step_group = jnp.cumsum(mark)
    step_chunk = (jnp.arange(cap, dtype=jnp.int32)
                  - jnp.take(offs, step_group))
    live = jnp.arange(cap, dtype=jnp.int32) < total
    step_group = jnp.where(live, step_group, n_groups - 1)
    step_chunk = jnp.where(live, step_chunk, n_chunks_max)

    packed = rz.pack_splat_render(sp)                       # differentiable
    if dorder is not None:
        packed = jnp.take(packed, dorder, axis=1)
    packed = jnp.concatenate(
        [packed, jnp.zeros((rz.PACKED_F, 1), jnp.float32)], axis=1)
    starts_gj = jnp.take(starts_s.reshape(n_groups, G), step_group, axis=0)
    counts_gj = jnp.take(counts_s.reshape(n_groups, G), step_group, axis=0)
    lane = jnp.arange(chunk, dtype=jnp.int32)
    pos = step_chunk[:, None, None] * chunk + lane[None, None, :]
    slot = starts_gj[:, :, None] + pos
    in_rng = pos < counts_gj[:, :, None]
    sid = jnp.take(pairs, jnp.where(in_rng, slot, 0).reshape(-1))
    sid = jnp.where(in_rng.reshape(-1), sid, N)
    # `pairs` carry depth ranks into the depth-ordered field-major table
    # (_gather_table: per-row slot-bound on TPU). Its VJP is the
    # splat-space scatter-add.
    tab = _gather_table(packed, sid, cap, G, chunk)

    tx = (order % tiles_x).astype(jnp.int32)
    ty = (order // tiles_x).astype(jnp.int32)
    r0 = jnp.asarray(row0, jnp.int32).reshape(1)
    if interpret is None:
        interp = jax.default_backend() != "tpu"
    else:
        interp = interpret

    @jax.custom_vjp
    def composite(tab, step_group, step_chunk, n_act2, tx, ty, r0):
        out, _ = composite_fwd_res(tab, step_group, step_chunk, tx, ty, r0)
        return out

    def composite_fwd_res(tab, step_group, step_chunk, tx, ty, r0):
        kernel = _v4_fwd_entries_kernel(tile, chunk, G, n_chunks_max)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(cap,),
            in_specs=[
                pl.BlockSpec((rz.PACKED_F, 1, G, chunk),
                             lambda i, sg, sc, tx, ty, r0: (0, i, 0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, 16, P, G),
                             lambda i, sg, sc, tx, ty, r0:
                             (sg[i], 0, 0, 0)),
                pl.BlockSpec((1, 4, P, G),
                             lambda i, sg, sc, tx, ty, r0: (i, 0, 0, 0)),
            ),
        )
        out, entry = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((n_groups, 16, P, G), jnp.float32),
                jax.ShapeDtypeStruct((cap, 4, P, G), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("arbitrary",)),
            interpret=interp,
        )(step_group, step_chunk, tx, ty, r0, tab)
        return out, entry

    def composite_fwd(tab, step_group, step_chunk, n_act2, tx, ty, r0):
        out, entry = composite_fwd_res(tab, step_group, step_chunk, tx, ty,
                                       r0)
        return out, (tab, entry, step_group, step_chunk, n_act2, tx, ty, r0)

    def composite_bwd(res, ct):
        tab, entry, step_group, step_chunk, n_act2, tx, ty, r0 = res
        kernel = _v4_bwd_kernel(tile, chunk, G, n_chunks_max, cap)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(cap,),
            in_specs=[
                pl.BlockSpec((rz.PACKED_F, 1, G, chunk),
                             lambda i, *s: (0, cap - 1 - i, 0, 0)),
                pl.BlockSpec((1, 4, P, G),
                             lambda i, *s: (cap - 1 - i, 0, 0, 0)),
                pl.BlockSpec((1, 16, P, G),
                             lambda i, sg, *s: (sg[cap - 1 - i], 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (rz.PACKED_F, 1, G, chunk),
                lambda i, *s: (0, cap - 1 - i, 0, 0)),
            scratch_shapes=[pltpu.VMEM((16, P, G), jnp.float32)],
        )
        d_tab = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((rz.PACKED_F, cap, G, chunk),
                                           jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("arbitrary",)),
            interpret=interp,
        )(step_group, step_chunk, n_act2, tx, ty, r0, tab, entry, ct)
        import numpy as _np
        f0 = lambda a: _np.zeros(a.shape, jax.dtypes.float0)  # noqa: E731
        return (d_tab, f0(step_group), f0(step_chunk), f0(n_act2), f0(tx),
                f0(ty), f0(r0))

    composite.defvjp(composite_fwd, composite_bwd)
    out = composite(tab, step_group, step_chunk, n_act2, tx, ty, r0)

    o = jnp.transpose(out, (0, 3, 2, 1)).reshape(n_tiles, P, 16)
    inv = jax.lax.stop_gradient(jnp.argsort(order))
    o = jnp.take(o, inv, axis=0)
    o = o.reshape(tiles_y, tiles_x, tile, tile, 16)
    o = jnp.moveaxis(o, 2, 1).reshape(img_h, img_w, 16)

    trans = o[..., 0]
    return {
        "image": o[..., 1:4] + trans[..., None] * bg_color,
        "alpha": o[..., 4],
        "depth_expected": o[..., 5],
        "depth_median": o[..., 6],
        "dist": o[..., 7],
        "normal_view": o[..., 8:11],
    }
