"""Differentiable 2DGS surfel rasterizer — TPU-native design.

Replaces the reference's external CUDA `diff-surfel-rasterization` submodule
(consumed at `nsr/gs_surfel.py:15,85-114`). The math follows the 2DGS paper
(Huang et al. 2024): each surfel is an oriented disk; a pixel ray intersects
the disk plane, the intersection's (u, v) in the disk frame gives the Gaussian
response; splats composite front-to-back in depth order with alpha blending.

TPU-first architecture (NOT a port of the CUDA tile/radix pipeline):

  * Per-splat preprocessing is a batched dense computation (VPU-friendly).
  * Compositing over a depth-sorted chunk of K splats is expressed with an
    exclusive log-space cumsum (transmittance) and (P, K) @ (K, C) matmuls
    (MXU-friendly) instead of a sequential per-splat loop.
  * Tile binning uses XLA sort with static-shape capped per-tile lists
    (sort by depth, stable sort by tile id → per-tile depth order), replacing
    the CUDA global radix sort. No dynamic shapes anywhere.
  * The whole pipeline is pure JAX and differentiable by autodiff; a Pallas
    fused kernel with custom VJP lives in `rasterize_pallas.py` for the hot
    512² path.

Output channel semantics match `allmap` post-processing in
`nsr/gs_surfel.py:121-142`:
  image (3), alpha (1), depth_expected (premultiplied by alpha; divide by
  alpha for the expected depth), depth_median (1), normal (3, VIEW space,
  alpha-weighted & unnormalised — rotate by view R^T for world space),
  dist (1, depth distortion).
"""
from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gaussiananything_tpu.ops.gaussians import unpack_gaussians
from gaussiananything_tpu.utils.quaternions import normalize

# Screen-space low-pass filter: the response is max(G_3d, G_2d) where G_2d is
# an isotropic 2D Gaussian at the projected centre with inverse variance 2.0
# (i.e. ~0.7px std), as in the 2DGS paper's object/screen-space filter mix.
FILTER_INV_SQUARE = 2.0
ALPHA_EPS = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4
NEAR_CULL = 0.2
# Explicit 3σ kernel cutoff. The CUDA pipeline truncates each splat at its
# binned tile RECT (ragged, bbox of the 3σ disk) — an implicit spatial
# cutoff whose kept-vs-dropped boundary depends on tile geometry. Cutting
# the kernel at rho > 9 instead makes the truncation a property of the
# SPLAT (identical in oracle, tiled, and band renders at any tile size),
# at a deviation from CUDA bounded by op·e^{-4.5} ≈ 0.011 in the rect
# corners beyond 3σ. The cut is a linear ramp over rho ∈ [8, 9] (not a
# step) so the render stays continuous in the splat parameters — a hard
# cut puts O(0.01) jumps exactly where autodiff and finite differences
# must agree.
RHO_CUT = 9.0
RHO_RAMP = 1.0


def _rho_window(rho: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip((RHO_CUT - rho) / RHO_RAMP, 0.0, 1.0)
ZNEAR, ZFAR = 0.01, 100.0


class SplatProj(NamedTuple):
    """Per-view projected splat parameters (all (N, …), fp32)."""

    t_x: jnp.ndarray       # (N, 3) pixel-x plane coeffs over (u, v, 1)
    t_y: jnp.ndarray       # (N, 3) pixel-y plane coeffs
    t_w: jnp.ndarray       # (N, 3) homogeneous-w coeffs
    t_z: jnp.ndarray       # (N, 3) view-depth coeffs: z(u,v) = (u,v,1)·t_z
    center_pix: jnp.ndarray  # (N, 2) projected centre in pixels
    center_z: jnp.ndarray  # (N,) view-space centre depth (sort key)
    opacity: jnp.ndarray   # (N,)
    rgb: jnp.ndarray       # (N, 3)
    normal_view: jnp.ndarray  # (N, 3) camera-facing view-space normal
    bb_min: jnp.ndarray    # (N, 2) screen-space AABB of the ρ≤RHO_CUT set
    bb_max: jnp.ndarray    # (N, 2)
    valid: jnp.ndarray     # (N,) bool — in front of camera & non-degenerate


def preprocess_splats(gaussians: jnp.ndarray, cam_view: jnp.ndarray,
                      cam_view_proj: jnp.ndarray, img_h: int, img_w: int,
                      tanfov: jnp.ndarray, scale_modifier: float = 1.0
                      ) -> SplatProj:
    """Project N 13-channel surfels into one view.

    cam_view / cam_view_proj are ROW-VECTOR transforms (x_view = x_h @ M),
    see `render/cameras.py`.
    """
    g = unpack_gaussians(gaussians.astype(jnp.float32))
    N = g.xyz.shape[0]

    # COMPONENT-VECTOR form: every hot operation below runs on (N,) arrays.
    # TPU vregs are (8 sublanes × 128 lanes); elementwise math on (N, 3)
    # arrays uses 3 of 128 lanes per pass (~2.3% utilisation), and the tiny
    # (N, 3, 4) @ (4, 4) camera products map to the MXU pathologically.
    # Expanding both into scalar-broadcast fma chains over (N,) component
    # vectors is full-lane VPU work — measured ~6.9 ms → sub-ms at 73k
    # splats — and is EXACT fp32 (the MXU at Precision.HIGHEST is a
    # multi-pass bf16 approximation; see CLAUDE.md precision notes).
    qn = normalize(g.rotation)
    qr, qx, qy, qz = qn[:, 0], qn[:, 1], qn[:, 2], qn[:, 3]
    su = g.scale[:, 0] * scale_modifier
    sv = g.scale[:, 1] * scale_modifier
    # Rotation-matrix columns (rotated basis axes), as in quat_to_rotmat:
    # column 0 / 1 = scaled tangents, column 2 = world normal.
    tu = ((1 - 2 * (qy * qy + qz * qz)) * su,
          (2 * (qx * qy + qr * qz)) * su,
          (2 * (qx * qz - qr * qy)) * su)
    tv = ((2 * (qx * qy - qr * qz)) * sv,
          (1 - 2 * (qx * qx + qz * qz)) * sv,
          (2 * (qy * qz + qr * qx)) * sv)
    nrm = (2 * (qx * qz + qr * qy),
           2 * (qy * qz - qr * qx),
           1 - 2 * (qx * qx + qy * qy))
    pxyz = (g.xyz[:, 0], g.xyz[:, 1], g.xyz[:, 2])

    P = cam_view_proj  # (4, 4) row-vector convention: clip = world_h @ P
    V = cam_view

    def _row_times(vec3, M, w_row, j):
        # (vec3, w) @ M column j  with scalar-broadcast fma (w ∈ {0, 1}).
        out = vec3[0] * M[0, j] + vec3[1] * M[1, j] + vec3[2] * M[2, j]
        return out + M[3, j] if w_row else out

    # Homogeneous splat-to-world rows: row0 = (tu, 0), row1 = (tv, 0),
    # row2 = (xyz, 1); clip(u,v) = (u,v,1) @ (Mh @ P).
    Tc = {(i, j): _row_times(row, P, w, j)
          for i, (row, w) in enumerate(((tu, 0), (tv, 0), (pxyz, 1)))
          for j in (0, 1, 3)}
    tz_c = tuple(_row_times(row, V, w, 2)
                 for row, w in ((tu, 0), (tv, 0), (pxyz, 1)))

    # Fold NDC→pixel into the plane coefficients. ndc2pix(v) = ((v+1)*S-1)/2.
    kx, bx = 0.5 * img_w, 0.5 * img_w - 0.5
    ky, by = 0.5 * img_h, 0.5 * img_h - 0.5
    tx_c = tuple(kx * Tc[(i, 0)] + bx * Tc[(i, 3)] for i in range(3))
    ty_c = tuple(ky * Tc[(i, 1)] + by * Tc[(i, 3)] for i in range(3))
    tw_c = tuple(Tc[(i, 3)] for i in range(3))

    # Projected centre: (u,v) = (0,0) → homogeneous coords are row 2.
    cw = tw_c[2]
    safe_cw = jnp.where(jnp.abs(cw) < 1e-8, 1e-8, cw)
    cpx = tx_c[2] / safe_cw
    cpy = ty_c[2] / safe_cw
    center_z = tz_c[2]

    # Camera-facing normal in view space (row-vector: n_view = n @ V[:3,:3]).
    nv = [_row_times(nrm, V, 0, j) for j in range(3)]
    pv = [_row_times(pxyz, V, 1, j) for j in range(3)]
    facing = nv[0] * pv[0] + nv[1] * pv[1] + nv[2] * pv[2]
    flip = jnp.where(facing > 0, -1.0, 1.0)
    nv = [c * flip for c in nv]

    # Exact screen-space AABB of the ρ ≤ RHO_CUT level set (the projective
    # conic bound of diff-surfel-rasterization's compute_aabb, consumed at
    # `nsr/gs_surfel.py:85`). Tangent lines x = const of the conic
    # {(u,v): u² + v² = RHO_CUT} under x = (p·t_x)/(p·t_w) solve
    # A x² − 2B x + C = 0 with A = t_w Q* t_wᵀ, B = t_x Q* t_wᵀ,
    # C = t_x Q* t_xᵀ, Q* = diag(RHO_CUT, RHO_CUT, −1) (the dual conic).
    # A centre-based 3σ·f/z radius UNDERESTIMATES tilted surfels (measured
    # up to 6.5 px short at 512²/73k — enough to miss a neighbouring tile),
    # which broke tiled↔oracle parity; this bound is exact.
    A_conic = RHO_CUT * (tw_c[0] * tw_c[0] + tw_c[1] * tw_c[1]) \
        - tw_c[2] * tw_c[2]
    bounded = A_conic < -1e-9         # ellipse (w ≠ 0 on the level set)
    safe_A = jnp.where(bounded, A_conic, -1.0)

    def _axis_bounds(t_a):
        B = RHO_CUT * (t_a[0] * tw_c[0] + t_a[1] * tw_c[1]) \
            - t_a[2] * tw_c[2]
        C = RHO_CUT * (t_a[0] * t_a[0] + t_a[1] * t_a[1]) \
            - t_a[2] * t_a[2]
        mid = B / safe_A
        half = jnp.sqrt(jnp.maximum(mid * mid - C / safe_A, 1e-4))
        return mid - half, mid + half

    x0, x1 = _axis_bounds(tx_c)
    y0, y1 = _axis_bounds(ty_c)
    # Union with the screen-space low-pass disk around the projected centre
    # (ρ2d = FILTER_INV_SQUARE·d² reaches the window cut at this radius).
    rf = float(np.sqrt(RHO_CUT / FILTER_INV_SQUARE)) + 0.5
    bb_min = jnp.stack([jnp.minimum(x0, cpx - rf),
                        jnp.minimum(y0, cpy - rf)], -1)
    bb_max = jnp.stack([jnp.maximum(x1, cpx + rf),
                        jnp.maximum(y1, cpy + rf)], -1)

    valid = (center_z > NEAR_CULL) & (g.opacity[:, 0] > 0) \
        & jnp.isfinite(cpx) & jnp.isfinite(cpy) & bounded

    # Assemble the public (N, …) layout once at the end (one relayout pass
    # per field — cheap; the per-splat MATH above never touched it).
    return SplatProj(
        t_x=jnp.stack(tx_c, -1), t_y=jnp.stack(ty_c, -1),
        t_w=jnp.stack(tw_c, -1), t_z=jnp.stack(tz_c, -1),
        center_pix=jnp.stack([cpx, cpy], -1), center_z=center_z,
        opacity=g.opacity[:, 0], rgb=g.rgb,
        normal_view=jnp.stack(nv, -1),
        bb_min=bb_min, bb_max=bb_max, valid=valid,
    )


def _mapped_depth(z: jnp.ndarray) -> jnp.ndarray:
    """Depth → [0,1] NDC-style map used by the distortion accumulator."""
    z = jnp.maximum(z, ZNEAR)
    return (ZFAR * (z - ZNEAR)) / (z * (ZFAR - ZNEAR))


class PixelState(NamedTuple):
    rgb: jnp.ndarray        # (P, 3)
    trans: jnp.ndarray      # (P,) transmittance
    alpha_acc: jnp.ndarray  # (P,)
    depth_exp: jnp.ndarray  # (P,) Σ w·z  (premultiplied expected depth)
    depth_med: jnp.ndarray  # (P,)
    normal: jnp.ndarray     # (P, 3)
    dist: jnp.ndarray       # (P,)
    dist_d: jnp.ndarray     # (P,) Σ w·m
    dist_d2: jnp.ndarray    # (P,) Σ w·m²


def _state_to_outputs(state: PixelState, bg_color: jnp.ndarray
                      ) -> Dict[str, jnp.ndarray]:
    rgb = state.rgb + state.trans[..., None] * bg_color
    return {
        "image": rgb,
        "alpha": state.alpha_acc,
        "depth_expected": state.depth_exp,   # premultiplied, as allmap ch0
        "depth_median": state.depth_med,
        "normal_view": state.normal,
        "dist": state.dist,
    }


def _take_splats(sp: SplatProj, idx: jnp.ndarray) -> SplatProj:
    return jax.tree.map(lambda a: jnp.take(a, idx, axis=0), sp)


def rasterize_naive(gaussians: jnp.ndarray, cam_view: jnp.ndarray,
                    cam_view_proj: jnp.ndarray, tanfov, img_h: int, img_w: int,
                    bg_color: jnp.ndarray, chunk: int = 256,
                    pixel_block: int = 8192) -> Dict[str, jnp.ndarray]:
    """Correctness-oracle renderer: every splat against every pixel.

    O(N·H·W) — use for tests and small scenes; `rasterize_tiled` is the
    production path. No binning, tile lists, footprint clamp, or per-tile
    cap: only the compositing semantics. Per-pixel evaluation is shared
    with the tiled path (`composite_chunk_grouped` over the packed table)
    so alpha/depth are BIT-identical per (pixel, splat) — an independently
    coded expression order differs in the last ulp, which flips the
    discrete `alpha >= ALPHA_EPS` keep decision and shows up as
    1/255-scale speckle between otherwise-identical renders (observed at
    512²/73k before the paths were unified).
    """
    sp = preprocess_splats(gaussians, cam_view, cam_view_proj, img_h, img_w,
                           tanfov)
    N = gaussians.shape[0]
    order = jnp.argsort(jnp.where(sp.valid, sp.center_z, jnp.inf))
    sp = _take_splats(sp, order)
    packed = pack_splat_render(sp)                          # (F, N)
    pad = (-N) % chunk
    if pad:
        # zero columns ⇒ opacity 0 ⇒ alpha 0: exact-1.0 transmittance
        # factors, no contribution.
        packed = jnp.pad(packed, ((0, 0), (0, pad)))
    n_chunks = packed.shape[1] // chunk

    npix = img_h * img_w
    ys, xs = jnp.meshgrid(jnp.arange(img_h, dtype=jnp.float32),
                          jnp.arange(img_w, dtype=jnp.float32), indexing="ij")
    px_all = xs.reshape(-1)
    py_all = ys.reshape(-1)

    def render_block(px, py):
        state = init_pixel_state_g(1, px.shape[0])

        def body(st, i):
            d = jax.lax.dynamic_slice_in_dim(packed, i * chunk, chunk, 1)
            return composite_chunk_grouped(
                st, px[None], py[None], d[:, None, :]), None

        state, _ = jax.lax.scan(body, state, jnp.arange(n_chunks))
        out = _state_to_outputs(state, bg_color)
        return {k: v[0] for k, v in out.items()}            # squeeze G=1

    assert npix % pixel_block == 0 or npix < pixel_block
    pb = min(pixel_block, npix)
    out = jax.lax.map(
        lambda i: render_block(
            jax.lax.dynamic_slice_in_dim(px_all, i * pb, pb, 0),
            jax.lax.dynamic_slice_in_dim(py_all, i * pb, pb, 0)),
        jnp.arange(npix // pb))
    out = jax.tree.map(lambda a: a.reshape((npix,) + a.shape[2:]), out)
    return {k: v.reshape((img_h, img_w) + v.shape[1:]) for k, v in out.items()}


# ---------------------------------------------------------------------------
# Packed per-splat render data for the tiled hot loop.
#
# The ray-plane cross product is bilinear in the pixel coords, so it folds
# into three precomputed vectors per splat:
#   k = px·t_w − t_x,  l = py·t_w − t_y,
#   p = k × l = px·A + py·B + C   with  A = t_y×t_w, B = t_w×t_x, C = t_x×t_y
# — 6 fma per pair instead of 6 fma + a 9-op cross product. All hot fields
# are packed into one (F, N) fp32 matrix so the per-tile gather is a single
# contiguous operation and chunk slices are plain lane slices.
# ---------------------------------------------------------------------------

# packed row layout
_PK_A = slice(0, 3)       # p-coefficient A
_PK_B = slice(3, 6)       # p-coefficient B
_PK_C = slice(6, 9)       # p-coefficient C
_PK_TZ = slice(9, 12)     # view-depth plane coeffs
_PK_CX, _PK_CY, _PK_CZ = 12, 13, 14   # projected centre + centre depth
_PK_OP = 15               # opacity (0 for invalid splats)
_PK_RGB = slice(16, 19)
_PK_NRM = slice(19, 22)
PACKED_F = 22


def pack_splat_render(sp: SplatProj) -> jnp.ndarray:
    """SplatProj → (PACKED_F, N) hot-loop matrix (see layout above).

    Cross products are expanded componentwise on (N,) vectors (full-lane
    VPU; `jnp.cross` on (N, 3) runs at 3/128 lane utilisation).
    """
    x0, x1, x2 = sp.t_x[:, 0], sp.t_x[:, 1], sp.t_x[:, 2]
    y0, y1, y2 = sp.t_y[:, 0], sp.t_y[:, 1], sp.t_y[:, 2]
    w0, w1, w2 = sp.t_w[:, 0], sp.t_w[:, 1], sp.t_w[:, 2]

    def _cross(a0, a1, a2, b0, b1, b2):
        return (a1 * b2 - a2 * b1, a2 * b0 - a0 * b2, a0 * b1 - a1 * b0)

    A = _cross(y0, y1, y2, w0, w1, w2)
    B = _cross(w0, w1, w2, x0, x1, x2)
    C = _cross(x0, x1, x2, y0, y1, y2)
    op = jnp.where(sp.valid, sp.opacity, 0.0)
    return jnp.stack([
        *A, *B, *C, sp.t_z[:, 0], sp.t_z[:, 1], sp.t_z[:, 2],
        sp.center_pix[:, 0], sp.center_pix[:, 1],
        sp.center_z, op, sp.rgb[:, 0], sp.rgb[:, 1], sp.rgb[:, 2],
        sp.normal_view[:, 0], sp.normal_view[:, 1], sp.normal_view[:, 2],
    ], axis=0)


def init_pixel_state_g(G: int, P: int) -> PixelState:
    z = jnp.zeros((G, P), jnp.float32)
    return PixelState(
        rgb=jnp.zeros((G, P, 3), jnp.float32),
        trans=jnp.ones((G, P), jnp.float32),
        alpha_acc=z, depth_exp=z, depth_med=z,
        normal=jnp.zeros((G, P, 3), jnp.float32),
        dist=z, dist_d=z, dist_d2=z,
    )


def composite_chunk_grouped(state: PixelState, px: jnp.ndarray,
                            py: jnp.ndarray, data: jnp.ndarray) -> PixelState:
    """Composite a depth-sorted chunk for G tiles × P pixels at once.

    px, py: (G, P). data: (PACKED_F, G, K) packed splat columns. All hot
    arrays are (G, P, K): P sublanes × K lanes per tile — full VPU blocks
    with no cross-tile interaction.

    Same math as `composite_chunk` but with the distortion accumulated from
    three chunk SUMS instead of three cumsums, using
      Σ_{i>j} w_i w_j (m_i−m_j)² = S_w·S_wm2 − S_wm²
    (exact — the diagonal terms cancel), which removes 3 of the 4 per-chunk
    prefix scans.
    """
    a0, a1, a2 = data[0][:, None, :], data[1][:, None, :], data[2][:, None, :]
    b0, b1, b2 = data[3][:, None, :], data[4][:, None, :], data[5][:, None, :]
    c0, c1, c2 = data[6][:, None, :], data[7][:, None, :], data[8][:, None, :]
    tz0, tz1, tz2 = (data[9][:, None, :], data[10][:, None, :],
                     data[11][:, None, :])
    cx, cy = data[_PK_CX][:, None, :], data[_PK_CY][:, None, :]
    cz, op = data[_PK_CZ][:, None, :], data[_PK_OP][:, None, :]

    # Plane evals stay FUSED VPU fma chains: routing them through an MXU
    # (P, 3) @ (3, 4K) contraction was tried and REGRESSED the forward
    # ~2 ms — the einsum is a fusion boundary, so p0/p1/p2 round-trip to
    # HBM as (G, P, 4K) f32 instead of living in vregs (the 3-deep
    # contraction also wastes the 128×128 systolic array). The backward's
    # ADJOINT reductions are the opposite case and do use one einsum
    # (`_chunk_backward`).
    pxe = px[..., None]                                     # (G, P, 1)
    pye = py[..., None]
    p0 = pxe * a0 + pye * b0 + c0                           # (G, P, K)
    p1 = pxe * a1 + pye * b1 + c1
    p2 = pxe * a2 + pye * b2 + c2
    safe = jnp.where(jnp.abs(p2) < 1e-9, 1e-9, p2)
    inv = 1.0 / safe
    u = p0 * inv
    v = p1 * inv
    rho3d = u * u + v * v

    dx = pxe - cx
    dy = pye - cy
    rho2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)
    use3d = rho3d <= rho2d
    rho = jnp.minimum(rho3d, rho2d)
    depth = jnp.where(use3d, u * tz0 + v * tz1 + tz2, cz)

    g = jnp.exp(-0.5 * rho) * _rho_window(rho)
    alpha = jnp.minimum(op * g, ALPHA_MAX)
    keep = (alpha >= ALPHA_EPS) & (depth > NEAR_CULL)
    alpha = jnp.where(keep, alpha, 0.0)
    depth = jnp.where(keep, depth, 0.0)

    # Direct cumprod transmittance (not the log1p/cumsum/exp chain used by
    # `composite_chunk`): α ≤ ALPHA_MAX < 1 keeps 1−α ≥ 1e-2, so a K≤512
    # fp32 product is well-conditioned, and it drops three transcendental
    # map passes from the hot loop (~10% step time at 512²).
    t_incl = jnp.cumprod(1.0 - alpha, axis=-1)              # Π_{j<=i}(1−α_j)
    # exclusive product by SHIFT, not division: exact (no rounding through
    # the divide) and drops a multi-cycle VPU division per pair-pixel
    t_excl = jnp.concatenate(
        [jnp.ones_like(t_incl[..., :1]), t_incl[..., :-1]], axis=-1)
    t_in = state.trans[..., None] * t_excl
    below = t_in <= T_EPS
    w = jnp.where(below, 0.0, state.trans[..., None] * alpha * t_excl)

    # rgb / normal / alpha-mass in ONE batched (G, P, K)@(G, K, 7) matmul
    feats = jnp.stack([data[16], data[17], data[18],
                       data[19], data[20], data[21],
                       jnp.ones_like(data[0])], axis=-1)    # (G, K, 7)
    # precision=HIGHEST: at DEFAULT the TPU MXU rounds the *inputs* to bf16
    # (rel. err up to 2^-8 ≈ 3.9e-3), which shows up as tiled-vs-oracle
    # parity drift ~2.7e-3 and per-pixel alpha mass > 1. The contraction is
    # tiny (C=7), so the extra MXU passes are noise in the frame time.
    acc = jnp.einsum("gpk,gkc->gpc", w, feats,
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    s_w = acc[..., 6]
    depth_exp = state.depth_exp + jnp.sum(w * depth, axis=-1)

    t_after = state.trans[..., None] * t_incl
    crossed = (t_in > 0.5) & (t_after <= 0.5)
    depth_med = state.depth_med + jnp.sum(jnp.where(crossed, depth, 0.0),
                                          axis=-1)

    m = _mapped_depth(depth)
    wm = w * m
    s_wm = jnp.sum(wm, axis=-1)
    s_wm2 = jnp.sum(wm * m, axis=-1)
    dist = state.dist \
        + state.alpha_acc * s_wm2 + state.dist_d2 * s_w \
        - 2.0 * state.dist_d * s_wm \
        + (s_w * s_wm2 - s_wm * s_wm)

    # Transmittance flush-to-zero: below T_EPS every future contribution is
    # already masked to exactly zero (the `below` gate above), so the ray is
    # DEAD — flushing its transmittance to 0 makes that termination explicit
    # and exact (bg blend included) instead of carrying a <=1e-4 residue.
    # This is what makes the frame loop's saturation early-exit bit-exact:
    # a chunk entered with all-zero trans returns the state unchanged.
    # Mirrors the CUDA rasterizer's per-pixel `T < 0.0001` termination test.
    trans_raw = state.trans * t_incl[..., -1]
    trans_out = jnp.where(trans_raw > T_EPS, trans_raw, 0.0)

    return PixelState(
        rgb=state.rgb + acc[..., 0:3],
        trans=trans_out,
        alpha_acc=state.alpha_acc + s_w,
        depth_exp=depth_exp, depth_med=depth_med,
        normal=state.normal + acc[..., 3:6],
        dist=dist, dist_d=state.dist_d + s_wm,
        dist_d2=state.dist_d2 + s_wm2,
    )


def _chunk_backward(state: PixelState, px: jnp.ndarray, py: jnp.ndarray,
                    data: jnp.ndarray, ct: PixelState
                    ) -> Tuple[PixelState, jnp.ndarray]:
    """Hand-derived VJP of `composite_chunk_grouped` w.r.t. (state, data).

    `ct` holds the output-state cotangents. The per-splat forward
    quantities are recomputed here (the outer loop stores only the chunk
    ENTRY states — see `_composite_frame_fwd`), with the fwd's exact
    expression order, then the adjoints are applied in one fused pass.
    Replaces `jax.vjp(composite_chunk_grouped, …)`, whose linearization
    materialises every (G, P, K) intermediate to HBM; the analytic form
    is what makes the backward ≈ forward-cost instead of 2.4× (the CUDA
    `diff-surfel-rasterization` BACKWARD kernel's role,
    `nsr/gs_surfel.py:15` consumption).

    Derivative conventions match jax autodiff: `where`/comparison gates
    route cotangents to the selected branch; min/clip ties are measure-
    zero and ignored.
    """
    a0, a1, a2 = data[0][:, None, :], data[1][:, None, :], data[2][:, None, :]
    b0, b1, b2 = data[3][:, None, :], data[4][:, None, :], data[5][:, None, :]
    c0, c1, c2 = data[6][:, None, :], data[7][:, None, :], data[8][:, None, :]
    tz0b, tz1b, tz2b = (data[9][:, None, :], data[10][:, None, :],
                        data[11][:, None, :])
    tz0, tz1, tz2 = data[9], data[10], data[11]             # (G, K)
    cx, cy = data[_PK_CX][:, None, :], data[_PK_CY][:, None, :]
    cz, op = data[_PK_CZ][:, None, :], data[_PK_OP][:, None, :]

    # ---- recompute (verbatim fwd expressions) -----------------------------
    pxe = px[..., None]
    pye = py[..., None]
    p0 = pxe * a0 + pye * b0 + c0
    p1 = pxe * a1 + pye * b1 + c1
    p2 = pxe * a2 + pye * b2 + c2
    safe = jnp.where(jnp.abs(p2) < 1e-9, 1e-9, p2)
    inv = 1.0 / safe
    u = p0 * inv
    v = p1 * inv
    rho3d = u * u + v * v
    dx = pxe - cx
    dy = pye - cy
    rho2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)
    use3d = rho3d <= rho2d
    rho = jnp.minimum(rho3d, rho2d)
    depth = jnp.where(use3d, u * tz0b + v * tz1b + tz2b, cz)
    expw = jnp.exp(-0.5 * rho)
    win = _rho_window(rho)
    g = expw * win
    og = op * g
    alpha_raw = jnp.minimum(og, ALPHA_MAX)
    keep = (alpha_raw >= ALPHA_EPS) & (depth > NEAR_CULL)
    alpha = jnp.where(keep, alpha_raw, 0.0)
    depth = jnp.where(keep, depth, 0.0)
    t_incl = jnp.cumprod(1.0 - alpha, axis=-1)
    t_excl = jnp.concatenate(                    # shifted exclusive product
        [jnp.ones_like(t_incl[..., :1]), t_incl[..., :-1]], axis=-1)
    tau = state.trans[..., None]
    t_in = tau * t_excl
    below = t_in <= T_EPS
    w = jnp.where(below, 0.0, tau * alpha * t_excl)
    t_after = tau * t_incl
    crossed = (t_in > 0.5) & (t_after <= 0.5)
    m = _mapped_depth(depth)
    wm = w * m
    s_w = jnp.sum(w, axis=-1)
    s_wm = jnp.sum(wm, axis=-1)
    s_wm2 = jnp.sum(wm * m, axis=-1)

    # ---- state-in cotangents ----------------------------------------------
    ct_A = ct.alpha_acc + ct.dist * s_wm2
    ct_Dw = ct.dist_d - 2.0 * ct.dist * s_wm
    ct_Dw2 = ct.dist_d2 + ct.dist * s_w
    # chunk-sum cotangents (dist cross-terms use the ENTRY accumulators)
    ct_s_w = ct.alpha_acc + ct.dist * (state.dist_d2 + s_wm2)
    ct_s_wm = ct.dist_d - 2.0 * ct.dist * (state.dist_d + s_wm)
    ct_s_wm2 = ct.dist_d2 + ct.dist * (state.alpha_acc + s_w)

    # ---- per-(pixel, splat) weight cotangent ------------------------------
    feats6 = jnp.stack([data[16], data[17], data[18],
                        data[19], data[20], data[21]], axis=-1)   # (G, K, 6)
    ct_acc6 = jnp.concatenate([ct.rgb, ct.normal], axis=-1)       # (G, P, 6)
    cw = jnp.einsum("gpc,gkc->gpk", ct_acc6, feats6,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
    cw = cw + ct_s_w[..., None] \
        + ct.depth_exp[..., None] * depth \
        + ct_s_wm[..., None] * m + ct_s_wm2[..., None] * (m * m)
    cw = jnp.where(below, 0.0, cw)

    # ---- alpha / transmittance chain --------------------------------------
    # w_j = τ α_j t_excl_j with t_excl_j = Π_{i<j}(1−α_i):
    #   ∂w_k/∂α_k = τ t_excl_k,   ∂w_j/∂α_k = −w_j/(1−α_k) for j>k,
    #   ∂τ'/∂α_k = −τ'/(1−α_k)  (τ' = τ·t_incl_K).
    q = cw * w
    incl = jnp.cumsum(q, axis=-1)
    suffix = incl[..., -1:] - incl                                # Σ_{j>k}
    trans_raw = state.trans * t_incl[..., -1]
    # flush-to-zero gate (fwd: trans_out = where(raw > T_EPS, raw, 0)):
    # no cotangent flows through a flushed transmittance.
    flushed = trans_raw <= T_EPS
    ct_trans_out = jnp.where(flushed, 0.0, ct.trans)
    trans_out = jnp.where(flushed, 0.0, trans_raw)
    bracket = suffix + (ct_trans_out * trans_out)[..., None]
    ct_alpha = cw * tau * t_excl - bracket / (1.0 - alpha)
    ct_trans = jnp.sum(cw * alpha * t_excl, axis=-1) \
        + ct_trans_out * t_incl[..., -1]

    # ---- depth / mapped-depth chain ----------------------------------------
    ct_m = ct_s_wm[..., None] * w + ct_s_wm2[..., None] * (2.0 * w * m)
    zc = jnp.maximum(depth, ZNEAR)
    dm_dz = jnp.where(depth >= ZNEAR,
                      (ZFAR * ZNEAR / (ZFAR - ZNEAR)) / (zc * zc), 0.0)
    ct_depth = ct.depth_exp[..., None] * w + ct.depth_med[..., None] * crossed \
        + ct_m * dm_dz
    ct_depth = jnp.where(keep, ct_depth, 0.0)
    k3 = keep & use3d
    ct_depth3 = jnp.where(k3, ct_depth, 0.0)
    # Adjoint treats depth ≡ (p0·tz0 + p1·tz1 + p2·tz2) · inv — equal to
    # the fwd's u·tz0 + v·tz1 + tz2 up to fp rounding — so the whole
    # depth chain flows through the coefficient einsum below as a fourth
    # "numerator" column instead of three extra (G, P, K) reductions.
    ct_num = ct_depth3 * inv
    ct_cz = jnp.sum(jnp.where(keep & ~use3d, ct_depth, 0.0), axis=1)

    # ---- opacity / gaussian-weight chain -----------------------------------
    ct_og = jnp.where(keep & (og < ALPHA_MAX), ct_alpha, 0.0)
    ct_op = jnp.sum(ct_og * g, axis=1)
    ct_g = ct_og * op
    ramp = RHO_CUT - rho
    dwin = jnp.where((ramp > 0.0) & (ramp < RHO_RAMP), -1.0 / RHO_RAMP, 0.0)
    ct_rho = ct_g * (expw * dwin - 0.5 * expw * win)
    ct_rho3d = jnp.where(use3d, ct_rho, 0.0)
    ct_rho2d = jnp.where(use3d, 0.0, ct_rho)
    ct_u = 2.0 * u * ct_rho3d
    ct_v = 2.0 * v * ct_rho3d
    ct_dx = ct_rho2d * FILTER_INV_SQUARE * 2.0 * dx
    ct_dy = ct_rho2d * FILTER_INV_SQUARE * 2.0 * dy
    ct_cx = -jnp.sum(ct_dx, axis=1)
    ct_cy = -jnp.sum(ct_dy, axis=1)

    # ---- projective ray-plane chain ----------------------------------------
    ct_p0 = ct_u * inv
    ct_p1 = ct_v * inv
    # num ≈ depth·safe under k3 (1 pass; exact to fp rounding)
    ct_inv = ct_u * p0 + ct_v * p1 + ct_depth3 * (depth * safe)
    ct_safe = -(inv * inv) * ct_inv
    ct_p2 = jnp.where(jnp.abs(p2) < 1e-9, 0.0, ct_safe)

    # Coefficient adjoints consolidated into ONE MXU einsum over the pixel
    # basis [px, py, 1]: columns o = [p0, p1, p2, depth-numerator]. This
    # replaces twelve (G, P, K)-shaped reduction passes; unlike in the
    # forward (where the einsum form regressed — fusion boundary), these
    # ARE reductions, so the MXU contraction over P is the right shape.
    basis = jnp.stack([pxe[..., 0], pye[..., 0],
                       jnp.ones_like(pxe[..., 0])], -1)     # (G, P, 3)
    ct_lin = jnp.stack([ct_p0, ct_p1, ct_p2, ct_num], -2)   # (G, P, 4, K)
    ct_coef = jnp.einsum("gpc,gpok->gcok", basis, ct_lin,
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)  # (G, 3, 4, K)
    # depth_num's coefficient column o=3 holds [_tz(a), _tz(b), _tz(c)]:
    # chain back into a/b/c (· tz_i) and into tz (· a/b/c components).
    ct_tza = ct_coef[:, 0, 3]
    ct_tzb = ct_coef[:, 1, 3]
    ct_tzc = ct_coef[:, 2, 3]
    ca0 = ct_coef[:, 0, 0] + ct_tza * tz0
    ca1 = ct_coef[:, 0, 1] + ct_tza * tz1
    ca2 = ct_coef[:, 0, 2] + ct_tza * tz2
    cb0 = ct_coef[:, 1, 0] + ct_tzb * tz0
    cb1 = ct_coef[:, 1, 1] + ct_tzb * tz1
    cb2 = ct_coef[:, 1, 2] + ct_tzb * tz2
    cc0 = ct_coef[:, 2, 0] + ct_tzc * tz0
    cc1 = ct_coef[:, 2, 1] + ct_tzc * tz1
    cc2 = ct_coef[:, 2, 2] + ct_tzc * tz2
    ct_tz0 = ct_tza * data[0] + ct_tzb * data[3] + ct_tzc * data[6]
    ct_tz1 = ct_tza * data[1] + ct_tzb * data[4] + ct_tzc * data[7]
    ct_tz2 = ct_tza * data[2] + ct_tzb * data[5] + ct_tzc * data[8]

    ct_feats = jnp.einsum("gpk,gpc->gkc", w, ct_acc6,
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)     # (G, K, 6)

    ct_data = jnp.stack([
        ca0, ca1, ca2, cb0, cb1, cb2, cc0, cc1, cc2,
        ct_tz0, ct_tz1, ct_tz2, ct_cx, ct_cy, ct_cz, ct_op,
        ct_feats[..., 0], ct_feats[..., 1], ct_feats[..., 2],
        ct_feats[..., 3], ct_feats[..., 4], ct_feats[..., 5],
    ], axis=0)                                                    # (22, G, K)

    ct_state = PixelState(
        rgb=ct.rgb, trans=ct_trans, alpha_acc=ct_A,
        depth_exp=ct.depth_exp, depth_med=ct.depth_med, normal=ct.normal,
        dist=ct.dist, dist_d=ct_Dw, dist_d2=ct_Dw2,
    )
    return ct_state, ct_data


# ---------------------------------------------------------------------------
# Tiled production path: XLA sort-based binning + capped per-tile lists.
# ---------------------------------------------------------------------------

def build_tile_pairs(sp: SplatProj, img_h: int, img_w: int, tile: int,
                     max_per_tile: int, row0=0,
                     big_capacity: int = 0, packed_key=None,
                     rank_pairs: bool = False
                     ) -> Tuple[jnp.ndarray, ...]:
    """Bin splats into a tile-sorted, depth-ordered flat pair array.

    Two-bucket emission (the sort over (tile, splat) pairs is the frame-
    dominant binning cost — 26 of 40 ms at 512²/73k with the naive
    N×36-slot scheme, because nearly every splat spans ≤ 2×2 tiles):

      * SMALL bucket — every splat gets 4 slots covering a 2×2 tile
        window (exact for footprints ≤ 2×2, the overwhelming majority).
      * BIG bucket — splats whose span exceeds 2×2 are compacted (depth
        order preserved) into `big_capacity` 36-slot entries (6×6 window,
        the same global clamp as before; radius is cropped to it). Bigs
        beyond capacity degrade to their top-left 2×2 window in the small
        bucket (graceful partial coverage, analogous to the max_per_tile
        farthest-first drop).

    `big_capacity=0` → auto: exact single-pass behaviour for N ≤ 16384
    (capacity = N: sorting is cheap there), else max(N // 16, 4096).
    The (tile, rank) co-sort is the binning pipeline's dominant cost
    (~10 ms of a ~25 ms frame at 512²/73k, measured by in-jit ablation)
    and its size is slot-count-bound, so the big bucket's 36 slots/entry
    must not be over-provisioned: release-shape scenes measure ~3% big
    splats (2151/73728 on the bench sphere), so N//16 leaves >2×
    headroom; beyond capacity the degradation is the graceful partial
    2×2 fallback (stress-tested). Callers with big-splat-heavy content
    pass an explicit capacity (`rasterize_tiled(big_capacity=…)`).

    Within-tile depth order is restored by co-sorting on the lexicographic
    (tile, depth-rank) key — reproducing the CUDA (tile | depth) radix
    sort key of `diff-surfel-rasterization` consumed at
    `nsr/gs_surfel.py:85-114`.

    Returns (pairs, starts, counts): `pairs` is the flat splat-id array
    (concatenated per-tile depth-sorted segments, padded with
    `max_per_tile` trailing zeros so a (starts[t] + c) dynamic slice of
    any chunk ≤ max_per_tile never clamps), `starts[t]` the segment
    offset, `counts[t] = min(segment length, max_per_tile)`.

    `rank_pairs=True` (requires the packed-key regime) returns
    (pairs_rank, starts, counts, depth_order) where `pairs` holds depth
    RANKS instead of splat ids: rank → splat is the returned permutation,
    so callers index a depth-ordered packed table directly. This makes
    the pair sort KEY-ONLY — the rank rides in the key's low bits and
    there is no payload to move through the sort network (the dominant
    binning cost is the sort, and its cost scales with bytes moved).
    """
    tiles_x = img_w // tile
    tiles_y = img_h // tile
    n_tiles = tiles_x * tiles_y
    N = sp.center_z.shape[0]
    if big_capacity <= 0:
        big_capacity = N if N <= 16384 else max(N // 16, 4096)
    big_capacity = min(big_capacity, N)

    order = jnp.argsort(jnp.where(sp.valid, sp.center_z, jnp.inf))
    x0 = jnp.take(sp.bb_min[:, 0], order)
    x1 = jnp.take(sp.bb_max[:, 0], order)
    y0 = jnp.take(sp.bb_min[:, 1], order) - row0   # band-local rows
    y1 = jnp.take(sp.bb_max[:, 1], order) - row0
    # Clamp the footprint so a splat's tile span NEVER exceeds 6×6 —
    # truncating the pair list instead would drop different tiles in full
    # vs band (sharded) binning. Clamp = hard crop of giant splats' AABB
    # at span_side·tile px per axis, anchored at the bbox centre. MUST be
    # a global constant (not a function of this grid's n_tiles) so
    # full-image and band renders cut splats identically.
    big_span = 36
    span_side = 6
    half_cap = (span_side - 1) * tile / 2   # width ≤ 80 px ⇒ span ≤ 6 tiles
    mx, my = 0.5 * (x0 + x1), 0.5 * (y0 + y1)
    x0 = jnp.maximum(x0, mx - half_cap)
    x1 = jnp.minimum(x1, mx + half_cap)
    y0 = jnp.maximum(y0, my - half_cap)
    y1 = jnp.minimum(y1, my + half_cap)
    valid = jnp.take(sp.valid, order)

    tx0 = jnp.clip(jnp.floor(x0 / tile).astype(jnp.int32), 0, tiles_x - 1)
    tx1 = jnp.clip(jnp.floor(x1 / tile).astype(jnp.int32), 0, tiles_x - 1)
    ty0 = jnp.clip(jnp.floor(y0 / tile).astype(jnp.int32), 0, tiles_y - 1)
    ty1 = jnp.clip(jnp.floor(y1 / tile).astype(jnp.int32), 0, tiles_y - 1)
    on_screen = (x1 >= 0) & (x0 < img_w) & (y1 >= 0) & (y0 < img_h)
    valid = valid & on_screen

    span_x = tx1 - tx0 + 1
    span_y = ty1 - ty0 + 1
    rank = jnp.arange(N, dtype=jnp.int32)                   # depth rank

    # Compact big splats (depth order preserved by the monotone cumsum).
    # Compaction is a GATHER (searchsorted on the inclusive big-count for
    # each slot), not a scatter: the scatter form sent every non-selected
    # splat to one overflow slot — ~N colliding updates that serialise the
    # TPU scatter unit (measured as the bulk of the binning phase).
    is_big = valid & ((span_x > 2) | (span_y > 2))
    incl = jnp.cumsum(is_big.astype(jnp.int32))             # (N,) inclusive
    n_big = incl[-1]
    pos = incl - 1
    sel = is_big & (pos < big_capacity)
    slots_b = jnp.arange(big_capacity + 1, dtype=jnp.int32)
    # slot s ← first splat index with incl == s+1 (exactly the (s+1)-th big)
    src = jnp.searchsorted(incl, slots_b + 1, side="left")
    b_valid = slots_b < jnp.minimum(n_big, big_capacity)
    src = jnp.where(b_valid, src, 0)
    import os as _os
    if _os.environ.get("GA_RASTER_DEBUG"):
        # Overflowed bigs silently degrade to partial 2×2 coverage; this
        # is the runtime signal for tuning `big_capacity` on new content.
        jax.debug.print(
            "build_tile_pairs: {} big splats (capacity {})", n_big,
            big_capacity)

    def compact(a):
        return jnp.where(b_valid, jnp.take(a, src),
                         jnp.zeros((), a.dtype))

    b_tx0, b_ty0 = compact(tx0), compact(ty0)
    b_span_x, b_span_y = compact(span_x), compact(span_y)
    b_rank, b_splat = compact(rank), compact(order)

    # SMALL bucket: 4 slots over a 2×2 window; unselected bigs fall back
    # to their top-left 2×2 (partial coverage). Slot arrays are PLANE-MAJOR
    # (slot, N): flattening (slot, N) → (slot·N,) is a free row concat,
    # whereas the (N, slot) interleave is a vreg relayout (4 × ~0.5 ms of
    # the 512² frame, measured). The flat array's pre-sort ORDER is
    # irrelevant — the (tile, rank) sort key fully determines the result.
    slots4 = jnp.arange(4, dtype=jnp.int32)
    s_off_x = slots4[:, None] % 2
    s_off_y = slots4[:, None] // 2
    s_ok = valid[None, :] & ~sel[None, :] \
        & (s_off_x < jnp.minimum(span_x, 2)[None, :]) \
        & (s_off_y < jnp.minimum(span_y, 2)[None, :])
    s_tile4 = (ty0[None, :] + s_off_y) * tiles_x + (tx0[None, :] + s_off_x)
    s_tile4 = jnp.where(s_ok, s_tile4, n_tiles)             # sentinel bucket

    # BIG bucket: 36 slots over the (clamped) 6×6 window.
    slots36 = jnp.arange(big_span, dtype=jnp.int32)
    b_off_x = slots36[:, None] % jnp.maximum(b_span_x, 1)[None, :]
    b_off_y = slots36[:, None] // jnp.maximum(b_span_x, 1)[None, :]
    b_ok = b_valid[None, :] \
        & (slots36[:, None] < (b_span_x * b_span_y)[None, :]) \
        & (b_off_y < b_span_y[None, :])
    b_tile36 = (b_ty0[None, :] + b_off_y) * tiles_x + (b_tx0[None, :] + b_off_x)
    b_tile36 = jnp.where(b_ok, b_tile36, n_tiles)

    flat_tile = jnp.concatenate([s_tile4.reshape(-1), b_tile36.reshape(-1)])
    flat_rank = jnp.concatenate([
        jnp.broadcast_to(rank[None, :], (4, N)).reshape(-1),
        jnp.broadcast_to(b_rank[None, :],
                         (big_span, big_capacity + 1)).reshape(-1)])
    flat_splat = jnp.concatenate([
        jnp.broadcast_to(order[None, :], (4, N)).reshape(-1),
        jnp.broadcast_to(b_splat[None, :],
                         (big_span, big_capacity + 1)).reshape(-1)])

    # Lexicographic (tile, rank) co-sort carrying the splat id: one
    # variadic lax.sort instead of argsort + random gathers (the gathers
    # cost ~8× the sort itself on TPU). Keys are unique per live pair, so
    # stability is unnecessary. When (tile, rank) fits 31 bits the two
    # keys are packed into ONE int32 (tile<<17 | rank) — a single-key
    # sort's comparator touches half the data of the 2-key one.
    # `packed_key=None` → auto by shape; bool forces a path (tests assert
    # both produce identical bins).
    if packed_key is None:
        packed_key = n_tiles + 1 <= (1 << 14) - 1 and N <= (1 << 17)
    if rank_pairs:
        assert n_tiles + 1 <= (1 << 14) - 1 and N <= (1 << 17), (
            "rank_pairs requires the packed-key regime")
        # KEY-ONLY sort: the rank IS the payload (low 17 bits); splat ids
        # are recovered for free because the caller indexes a packed table
        # pre-permuted into depth order. (The earlier 'key-only' attempt
        # that REGRESSED +1.7 ms recovered splat ids with a 463k-element
        # take(order, rank) random gather — unnecessary once the table
        # itself is depth-ordered.)
        s_key = jax.lax.sort((flat_tile << 17) | flat_rank,
                             is_stable=False)
        s_tile = s_key >> 17
        s_splat = s_key & ((1 << 17) - 1)          # depth ranks
    elif packed_key:
        assert n_tiles + 1 <= (1 << 14) - 1 and N <= (1 << 17)
        packed_key = (flat_tile << 17) | flat_rank
        # Single-key CO-sort carrying the splat payload. (A key-only sort
        # + take(order, key & mask) to recover the payload was tried and
        # REGRESSED ~1.7 ms: the 463k-element random gather costs more
        # than moving the payload through the sort network.)
        s_key, s_splat = jax.lax.sort((packed_key, flat_splat),
                                      num_keys=1, is_stable=False)
        s_tile = s_key >> 17
    else:
        s_tile, _, s_splat = jax.lax.sort((flat_tile, flat_rank, flat_splat),
                                          num_keys=2, is_stable=False)

    # Per-tile offsets & counts: one searchsorted over the bucket boundaries
    # (bucket i spans [starts[i], starts[i+1]); n_tiles is the sentinel).
    # method="sort" replaces the default 19-step binary-search while loop
    # (~0.5 ms of tiny sequential ops at 512²) with one more sort pass.
    tile_ids = jnp.arange(n_tiles + 1, dtype=jnp.int32)
    bounds = jnp.searchsorted(s_tile, tile_ids, side="left")
    starts = bounds[:-1]
    counts = jnp.minimum(bounds[1:] - starts, max_per_tile)

    pairs = jnp.concatenate(
        [s_splat, jnp.zeros((max_per_tile,), s_splat.dtype)])
    if rank_pairs:
        return pairs, starts, counts, order
    return pairs, starts, counts


def build_tile_lists(sp: SplatProj, img_h: int, img_w: int, tile: int,
                     max_per_tile: int, row0=0
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Materialised per-tile depth-sorted index lists (static shapes).

    Thin wrapper over `build_tile_pairs` kept for the Pallas variants and
    tests: returns (tiles_y*tiles_x, max_per_tile) splat indices with -1
    padding, and the per-tile counts. Overflow beyond max_per_tile is
    dropped farthest-first (graceful degradation).
    """
    pairs, starts, counts = build_tile_pairs(sp, img_h, img_w, tile,
                                             max_per_tile, row0=row0)
    j = jnp.arange(max_per_tile, dtype=jnp.int32)
    gather_idx = starts[:, None] + j[None, :]
    in_range = j[None, :] < counts[:, None]
    gather_idx = jnp.where(in_range, gather_idx, 0)
    lists = jnp.where(in_range, jnp.take(pairs, gather_idx), -1)
    return lists, counts


# ---------------------------------------------------------------------------
# Frame compositing loop with a hand-managed reverse-scan VJP.
#
# Autodiff through the (group lax.map × chunk lax.scan) loop makes XLA
# materialise the packed table's cotangent PER (group, chunk) iteration —
# a stacked f32[n_groups, n_chunks, F, N+1] scatter buffer (19.3 GB at
# 512²/73k with 64×8 iterations, measured OOM on v5e). The custom VJP
# below stores only each chunk's ENTRY PixelState in the forward
# (n_groups·n_chunks·G·P·13 floats ≈ 109 MB at 512²) and re-walks the
# loop in reverse, accumulating d_packed in a single (F, N+1) scan carry.
# ---------------------------------------------------------------------------

def _frame_loop(static, packed, pairs, starts_s, counts_s, n_act,
                tx_s, ty_s, row0f, keep_entries: bool):
    """Primal count-adaptive group/chunk compositing loop.

    static = (tile, G, chunk, n_chunks). Returns (stacked final PixelState
    with leaves (n_groups, G, P, …), per-chunk entry states with leaves
    (n_groups, n_chunks, G, P, …) or None).
    """
    tile, G, chunk, n_chunks = static
    P = tile * tile
    n_groups = tx_s.shape[0] // G
    N_dummy = packed.shape[1] - 1
    yy, xx = jnp.meshgrid(jnp.arange(tile, dtype=jnp.float32),
                          jnp.arange(tile, dtype=jnp.float32), indexing="ij")
    local_x = xx.reshape(-1)
    local_y = yy.reshape(-1)
    j_chunk = jnp.arange(chunk, dtype=jnp.int32)

    def slice_ids(st_g, ct_g, c):
        # G contiguous int slices of the flat pair array (the max_per_tile
        # tail padding guarantees no clamp shift); masked entries point at
        # the dead dummy splat.
        ids = jax.vmap(lambda s0: jax.lax.dynamic_slice_in_dim(
            pairs, s0 + c * chunk, chunk))(st_g)            # (G, chunk)
        return jnp.where(c * chunk + j_chunk[None, :] < ct_g[:, None],
                         ids, N_dummy)

    def group_body(gi):
        st_g = jax.lax.dynamic_slice_in_dim(starts_s, gi * G, G, 0)
        ct_g = jax.lax.dynamic_slice_in_dim(counts_s, gi * G, G, 0)
        tx = jax.lax.dynamic_slice_in_dim(tx_s, gi * G, G, 0)
        ty = jax.lax.dynamic_slice_in_dim(ty_s, gi * G, G, 0)
        px = local_x[None, :] + tx[:, None] * tile          # (G, P)
        py = local_y[None, :] + ty[:, None] * tile + row0f
        active = n_act[gi]

        def chunk_body(st, c):
            def run(s):
                ids = slice_ids(st_g, ct_g, c)
                d = jnp.take(packed, ids.reshape(-1), axis=1)
                d = d.reshape(PACKED_F, G, chunk)
                return composite_chunk_grouped(s, px, py, d)

            # Early exit on saturation: once EVERY pixel in the group's G
            # tiles has transmittance <= T_EPS, later chunks contribute
            # exactly zero weight (the `below` mask in
            # `composite_chunk_grouped`), so skipping them changes only the
            # dead trans value (already <= 1e-4; its bg-blend residue is
            # below render tolerance). This is the TPU analog of the CUDA
            # rasterizer's per-pixel early termination — at group
            # granularity because the group is the unit of real control
            # flow (`lax.cond` under `lax.map`). Depth-sorted opaque
            # content saturates front tiles after the first chunk or two.
            live = jnp.max(st.trans) > T_EPS
            nxt = jax.lax.cond((c < active) & live, run, lambda s: s, st)
            return nxt, (st if keep_entries else None)

        state, entries = jax.lax.scan(chunk_body, init_pixel_state_g(G, P),
                                      jnp.arange(n_chunks))
        return state, entries

    return jax.lax.map(group_body, jnp.arange(n_groups))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _composite_frame(static, packed, pairs, starts_s, counts_s, n_act,
                     tx_s, ty_s, row0f) -> PixelState:
    state, _ = _frame_loop(static, packed, pairs, starts_s, counts_s,
                           n_act, tx_s, ty_s, row0f, keep_entries=False)
    return state


def _composite_frame_fwd(static, packed, pairs, starts_s, counts_s, n_act,
                         tx_s, ty_s, row0f):
    state, entries = _frame_loop(static, packed, pairs, starts_s, counts_s,
                                 n_act, tx_s, ty_s, row0f, keep_entries=True)
    return state, (packed, pairs, starts_s, counts_s, n_act, tx_s, ty_s,
                   row0f, entries)


def _composite_frame_bwd(static, res, ct):
    (packed, pairs, starts_s, counts_s, n_act, tx_s, ty_s, row0f,
     entries) = res
    tile, G, chunk, n_chunks = static
    n_groups = tx_s.shape[0] // G
    N_dummy = packed.shape[1] - 1
    yy, xx = jnp.meshgrid(jnp.arange(tile, dtype=jnp.float32),
                          jnp.arange(tile, dtype=jnp.float32), indexing="ij")
    local_x = xx.reshape(-1)
    local_y = yy.reshape(-1)
    j_chunk = jnp.arange(chunk, dtype=jnp.int32)

    def group_bwd(ct_packed, gi):
        st_g = jax.lax.dynamic_slice_in_dim(starts_s, gi * G, G, 0)
        ct_g = jax.lax.dynamic_slice_in_dim(counts_s, gi * G, G, 0)
        tx = jax.lax.dynamic_slice_in_dim(tx_s, gi * G, G, 0)
        ty = jax.lax.dynamic_slice_in_dim(ty_s, gi * G, G, 0)
        px = local_x[None, :] + tx[:, None] * tile
        py = local_y[None, :] + ty[:, None] * tile + row0f
        active = n_act[gi]
        idx_g = lambda a: jax.lax.dynamic_index_in_dim(a, gi, 0,  # noqa: E731
                                                       keepdims=False)
        ct_state = jax.tree.map(idx_g, ct)                  # (G, P, …)
        entries_g = jax.tree.map(idx_g, entries)            # (n_chunks, …)

        def chunk_bwd(carry, c_rev):
            c = n_chunks - 1 - c_rev
            s_in = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, c, 0, keepdims=False), entries_g)

            def run(args):
                ct_st_, ctp = args
                ids, in_range = slice_ids_bwd(st_g, ct_g, c)
                d = jnp.take(packed,
                             jnp.where(in_range, ids, N_dummy).reshape(-1),
                             axis=1)
                d = d.reshape(PACKED_F, G, chunk)
                ct_s_in, ct_d = _chunk_backward(s_in, px, py, d, ct_st_)
                # Dead slots get UNIQUE scratch columns (N_dummy+1+slot)
                # rather than all aliasing the one dummy column: a TPU
                # scatter-add serialises on duplicate indices, and at
                # chunk > count half the slots can be dead — all colliding
                # on one column.
                scratch = N_dummy + 1 + jnp.arange(G * chunk,
                                                   dtype=jnp.int32)
                sc_ids = jnp.where(in_range.reshape(-1), ids.reshape(-1),
                                   scratch)
                ctp = ctp.at[:, sc_ids].add(
                    ct_d.reshape(PACKED_F, G * chunk))
                return ct_s_in, ctp

            # Executed-chunk predicate MUST match the forward exactly: the
            # saturation test on the stored ENTRY state is the same value
            # the forward's carry held before chunk c.
            live = jnp.max(s_in.trans) > T_EPS
            new = jax.lax.cond((c < active) & live, run, lambda a: a, carry)
            return new, None

        def slice_ids_bwd(st_g_, ct_g_, c):
            ids = jax.vmap(lambda s0: jax.lax.dynamic_slice_in_dim(
                pairs, s0 + c * chunk, chunk))(st_g_)
            in_range = c * chunk + j_chunk[None, :] < ct_g_[:, None]
            return ids, in_range

        (_, ct_packed), _ = jax.lax.scan(chunk_bwd, (ct_state, ct_packed),
                                         jnp.arange(n_chunks))
        return ct_packed, None

    # +G·chunk scratch columns for the unique dead-slot scatter targets
    wide = jnp.zeros((PACKED_F, packed.shape[1] + G * chunk), jnp.float32)
    ct_wide, _ = jax.lax.scan(group_bwd, wide, jnp.arange(n_groups))
    ct_packed = ct_wide[:, :packed.shape[1]]

    import numpy as _np
    f0 = lambda a: _np.zeros(a.shape, jax.dtypes.float0)    # noqa: E731
    return (ct_packed, f0(pairs), f0(starts_s), f0(counts_s), f0(n_act),
            jnp.zeros_like(tx_s), jnp.zeros_like(ty_s),
            jnp.zeros_like(row0f))


_composite_frame.defvjp(_composite_frame_fwd, _composite_frame_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("img_h", "img_w", "tile", "max_per_tile", "chunk",
                     "tile_group", "full_h", "big_capacity"))
def rasterize_tiled(gaussians: jnp.ndarray, cam_view: jnp.ndarray,
                    cam_view_proj: jnp.ndarray, tanfov,
                    bg_color: jnp.ndarray, img_h: int, img_w: int,
                    tile: int = 16, max_per_tile: int = 1024,
                    chunk: int = 256, tile_group: int = 32,
                    full_h: int = 0, row0=0,
                    big_capacity: int = 0) -> Dict[str, jnp.ndarray]:
    """Production renderer: one view, N splats, (img_h, img_w) output.

    Differentiable: the compositing loop carries a hand-managed reverse-scan
    VJP (`_composite_frame`); binning indices are non-differentiable ints.
    Returns the dict of `_state_to_outputs` reshaped to (H, W, C).

    Band rendering (pixel/ray sharding across chips): pass the camera's
    `full_h` and this band's first row `row0` to render only rows
    [row0, row0+img_h) of a full_h-tall image — used by
    `render/sharded.py` to shard rows over the mesh `tile` axis.
    """
    assert img_h % tile == 0 and img_w % tile == 0
    assert max_per_tile % chunk == 0
    sp = preprocess_splats(gaussians, cam_view, cam_view_proj,
                           full_h or img_h, img_w, tanfov)
    pairs, starts, counts = build_tile_pairs(
        jax.tree.map(jax.lax.stop_gradient, sp), img_h, img_w, tile,
        max_per_tile, row0=row0, big_capacity=big_capacity)
    tiles_x = img_w // tile
    tiles_y = img_h // tile
    n_tiles = tiles_x * tiles_y
    P = tile * tile
    if n_tiles % tile_group != 0:
        import math
        tile_group = math.gcd(tile_group, n_tiles)
    G = tile_group
    n_groups = n_tiles // G
    n_chunks = max_per_tile // chunk

    # Count-adaptive scheduling: sort tiles by splat count (descending) so
    # groups are count-homogeneous, then run each group only up to
    # ceil(group_max/chunk) chunks. Empty background tiles cost nothing —
    # the per-frame work is ~Σ per-tile counts instead of n_tiles ×
    # max_per_tile (the CUDA pipeline gets this for free from its dynamic
    # per-tile ranges; here it is a scalar `lax.cond` per (group, chunk),
    # a REAL branch because the group loop is `lax.map`, not vmap).
    order = jax.lax.stop_gradient(jnp.argsort(-counts))
    counts_s = jnp.take(counts, order)
    gmax = counts_s[::G]                                   # (n_groups,) maxima
    n_act = (gmax + chunk - 1) // chunk                    # chunks per group

    tx_s = (order % tiles_x).astype(jnp.float32)           # sorted tile cols
    ty_s = (order // tiles_x).astype(jnp.float32)

    # Splat data stays packed at (F, N); per-tile id lists are NEVER
    # materialised — each tile's ids live as a contiguous segment of the
    # sorted flat `pairs` array, read with per-(group, chunk) dynamic
    # slices. The float gather happens inside the chunk loop, so both
    # gather traffic and compute are count-adaptive: ~sum(counts) x F
    # floats instead of n_tiles x max_per_tile x F, and large
    # max_per_tile is nearly free for the dominant sparse tiles. The
    # dummy column keeps masked/padded entries pointing at a dead splat.
    packed = pack_splat_render(sp)                          # (F, N)
    packed = jnp.concatenate(
        [packed, jnp.zeros((PACKED_F, 1), jnp.float32)], axis=1)
    starts_s = jnp.take(starts, order)                      # (n_tiles,)

    state = _composite_frame((tile, G, chunk, n_chunks), packed, pairs,
                             starts_s, counts_s, n_act, tx_s, ty_s,
                             jnp.asarray(row0, jnp.float32))
    out = _state_to_outputs(state, bg_color)                # leaves (ng,G,P,…)

    # leaves: (n_groups, G, P, C…) in sorted-tile order → undo the sort,
    # then detile to (H, W, C…). ONE fused gather/relayout over all 10
    # output channels (six per-map take+transpose passes measured ~3.8 ms
    # of the frame by in-jit ablation; the combined pass roughly halves
    # that).
    inv = jax.lax.stop_gradient(jnp.argsort(order))
    keys = list(out)        # derived, so a new output map can't be dropped
    widths = [(out[k].shape[3] if out[k].ndim == 4 else 1) for k in keys]
    stacked = jnp.concatenate(
        [out[k].reshape(n_tiles, P, w) for k, w in zip(keys, widths)],
        axis=-1)                                            # (n_tiles, P, 10)
    stacked = jnp.take(stacked, inv, axis=0)
    stacked = stacked.reshape(tiles_y, tiles_x, tile, tile, -1)
    stacked = jnp.moveaxis(stacked, 2, 1)   # (ty, tile_h, tx, tile_w, C)
    stacked = stacked.reshape(img_h, img_w, -1)

    res, off = {}, 0
    for k, w in zip(keys, widths):
        sl = stacked[..., off:off + w]
        res[k] = sl if out[k].ndim == 4 else sl[..., 0]
        off += w
    return res
