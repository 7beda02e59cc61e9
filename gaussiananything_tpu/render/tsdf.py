"""TSDF fusion + mesh extraction — dependency-free (no Open3D).

Capability parity with `export_mesh_from_2dgs` / `extract_mesh_bounded`
(`nsr/lsgm/flow_matching_trainer.py:1244-1395`, `utils/mesh_util.py:22`):
render multi-view RGB-D (median depth) along the `uni_mesh_path` camera
sweep, integrate into a truncated signed distance volume (reference params:
voxel = radius/160, sdf_trunc = 12·voxel, alpha threshold 0.08, aabb
[-0.45, 0.45]³ × 1.1), then extract a colored triangle mesh.

TPU-first: the volume integration is a jitted scan over views — each view
updates the whole D³ grid with fused projective-SDF math (vectorised, no
Python voxel loops). Mesh extraction runs on host via naive surface nets
(smoother than marching cubes at equal grid size, far less code).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("resolution", "bound",
                                             "trunc_voxels", "alpha_thres"))
def integrate_tsdf(depths: jnp.ndarray, colors: jnp.ndarray,
                   alphas: jnp.ndarray, cam_view: jnp.ndarray,
                   tanfov: jnp.ndarray, resolution: int = 128,
                   bound: float = 0.495, trunc_voxels: float = 12.0,
                   alpha_thres: float = 0.08
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fuse V views into (tsdf (D,D,D), color (D,D,D,3)).

    depths/alphas (V, 1, H, W); colors (V, 3, H, W); cam_view (V, 4, 4)
    row-vector world→view transforms; tanfov scalar.
    """
    D = resolution
    voxel = 2 * bound / D
    trunc = trunc_voxels * voxel
    lin = (jnp.arange(D, dtype=jnp.float32) + 0.5) / D * 2 * bound - bound
    gxx, gyy, gzz = jnp.meshgrid(lin, lin, lin, indexing="ij")
    # COMPONENT-VECTOR form throughout: every voxel-sized array is (N,).
    # (N, 3)/(N, 4) arrays at N = D³ get the (8, 128) tile layout with the
    # minor dim padded 3→128 — a 42.7× memory expansion (measured: four
    # 8 GB buffers for 192 MB of color data → compile-time OOM at D=256).
    gx = gxx.reshape(-1)
    gy = gyy.reshape(-1)
    gz = gzz.reshape(-1)

    H, W = depths.shape[-2:]

    def bilinear_weights(u, v):
        """Continuous pixel coords → 4 corner (index, weight) pairs.

        Edge-clamped bilinear, matching Open3D's TSDF image sampling
        (`nsr/lsgm/flow_matching_trainer.py:1338-1343` uses o3d
        integrate); corners are validity-weighted by the caller's `seen`
        test, so depth-edge ghosts get culled by the alpha gate.
        """
        u0 = jnp.floor(u)
        v0 = jnp.floor(v)
        fu = u - u0
        fv = v - v0
        u0i = jnp.clip(u0.astype(jnp.int32), 0, W - 1)
        u1i = jnp.clip(u0i + 1, 0, W - 1)
        v0i = jnp.clip(v0.astype(jnp.int32), 0, H - 1)
        v1i = jnp.clip(v0i + 1, 0, H - 1)
        flat = [v0i * W + u0i, v0i * W + u1i, v1i * W + u0i, v1i * W + u1i]
        wts = [(1 - fu) * (1 - fv), fu * (1 - fv), (1 - fu) * fv, fu * fv]
        return flat, wts

    def sample(chan_flat, flat, wts):
        """(H·W,) flattened channel sampled at the 4 corners → (N,)."""
        return sum(jnp.take(chan_flat, f) * w for f, w in zip(flat, wts))

    def integrate_one(carry, inp):
        tsdf, weight, c0, c1, c2 = carry
        depth, rgb, alpha, cv = inp
        # camera products as scalar-broadcast fma on (N,) vectors: exact
        # fp32 (no MXU bf16 input rounding — CLAUDE.md precision notes;
        # ~7e-3 z error ≈ one voxel at D=160) and no (N, 4) padding.
        vx = gx * cv[0, 0] + gy * cv[1, 0] + gz * cv[2, 0] + cv[3, 0]
        vy = gx * cv[0, 1] + gy * cv[1, 1] + gz * cv[2, 1] + cv[3, 1]
        z = gx * cv[0, 2] + gy * cv[1, 2] + gz * cv[2, 2] + cv[3, 2]
        px = vx / (z * tanfov)                           # ndc x in [-1,1]
        py = vy / (z * tanfov)
        u = ((px + 1) * 0.5 * W - 0.5)
        v = ((py + 1) * 0.5 * H - 0.5)
        in_img = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1) & (z > 0.05)
        flat, wts = bilinear_weights(u, v)
        d_px = sample(depth.reshape(-1), flat, wts)
        a_px = sample(alpha.reshape(-1), flat, wts)
        seen = in_img & (a_px > alpha_thres) & (d_px > 0.05)
        sdf = d_px - z
        w_new = jnp.where(seen & (sdf > -trunc), 1.0, 0.0)
        sdf_c = jnp.clip(sdf / trunc, -1.0, 1.0)
        new_w = weight + w_new
        inv_w = 1.0 / jnp.maximum(new_w, 1e-8)
        tsdf = (tsdf * weight + sdf_c * w_new) * inv_w
        cs = [sample(rgb[c].reshape(-1), flat, wts) for c in range(3)]
        c0 = (c0 * weight + cs[0] * w_new) * inv_w
        c1 = (c1 * weight + cs[1] * w_new) * inv_w
        c2 = (c2 * weight + cs[2] * w_new) * inv_w
        return (tsdf, new_w, c0, c1, c2), None

    zeros = jnp.zeros((D ** 3,))
    init = (jnp.ones((D ** 3,)), zeros, zeros, zeros, zeros)
    (tsdf, weight, c0, c1, c2), _ = jax.lax.scan(
        integrate_one, init, (depths, colors, alphas, cam_view))
    tsdf = jnp.where(weight > 0, tsdf, 1.0)
    # channel-LEADING on device: a (D³, 3) stack gets the (8, 128) tile
    # layout with 3→128 lane padding — 8.6 GB at D=256, a runtime OOM that
    # killed the TPU worker. Callers host-transpose to (D, D, D, 3).
    color = jnp.stack([c0, c1, c2], 0)
    return tsdf.reshape(D, D, D), color.reshape(3, D, D, D)


def surface_nets(tsdf: np.ndarray, color: Optional[np.ndarray] = None,
                 bound: float = 0.495
                 ) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Naive surface nets over a (D,D,D) SDF grid → (verts, faces, colors)."""
    D = tsdf.shape[0]
    voxel = 2 * bound / D
    sign = tsdf < 0

    # cells with any sign change among their 8 corners
    c = sign[:-1, :-1, :-1]
    changed = np.zeros_like(c)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                changed |= sign[dx:D - 1 + dx, dy:D - 1 + dy,
                                dz:D - 1 + dz] != c
    cell_idx = -np.ones((D - 1,) * 3, np.int64)
    cells = np.argwhere(changed)
    if len(cells) == 0:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64),
                None)
    cell_idx[tuple(cells.T)] = np.arange(len(cells))

    # vertex per cell: SDF-weighted average of edge crossings ≈ centroid of
    # interpolated corner crossings; approximate with centre + gradient nudge
    corners = np.stack([tsdf[cells[:, 0] + dx, cells[:, 1] + dy,
                             cells[:, 2] + dz]
                        for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)],
                       axis=1)                                      # (M, 8)
    offs = np.array([[dx, dy, dz] for dx in (0, 1) for dy in (0, 1)
                     for dz in (0, 1)], np.float32)
    w = 1.0 / (np.abs(corners) + 1e-4)
    centroid = (w[..., None] * offs[None]).sum(1) / w.sum(1)[:, None]
    verts = (cells + centroid + 0.5) * voxel - bound

    vcol = None
    if color is not None:
        ci = np.clip(np.round(cells + centroid).astype(np.int64), 0, D - 1)
        vcol = color[ci[:, 0], ci[:, 1], ci[:, 2]]

    # faces: for each axis edge (between voxel (i,j,k) and +axis neighbour)
    # with sign change, connect the 4 cells sharing that edge
    faces = []
    for axis in range(3):
        sa = [slice(None)] * 3
        sa[axis] = slice(0, D - 1)
        sb = [slice(None)] * 3
        sb[axis] = slice(1, D)
        crossing = sign[tuple(sa)] != sign[tuple(sb)]
        flip = sign[tuple(sb)]
        # the 4 cells around edge along `axis` at (i,j,k): offsets in the
        # other two axes ∈ {-1, 0}
        a1, a2 = [a for a in range(3) if a != axis]
        edges = np.argwhere(crossing)
        keep = ((edges[:, a1] >= 1) & (edges[:, a1] <= D - 2)
                & (edges[:, a2] >= 1) & (edges[:, a2] <= D - 2)
                & (edges[:, axis] <= D - 2))
        edges = edges[keep]
        fl = flip[tuple(edges.T)]
        quad = []
        for o1, o2 in ((0, 0), (-1, 0), (-1, -1), (0, -1)):
            e = edges.copy()
            e[:, a1] += o1
            e[:, a2] += o2
            quad.append(cell_idx[tuple(e.T)])
        q = np.stack(quad, 1)                                   # (E, 4)
        ok = (q >= 0).all(1)
        q = q[ok]
        fl = fl[ok]
        q_f = np.where(fl[:, None], q[:, ::-1], q)
        faces.append(np.stack([q_f[:, 0], q_f[:, 1], q_f[:, 2]], 1))
        faces.append(np.stack([q_f[:, 0], q_f[:, 2], q_f[:, 3]], 1))
    faces = np.concatenate(faces, 0)
    return verts.astype(np.float32), faces, vcol


def export_mesh_from_gaussians(path: str, gaussians: jnp.ndarray,
                               resolution: int = 128, n_views: int = 10,
                               render_size: int = 256,
                               radius: float = 1.8) -> Tuple[np.ndarray,
                                                             np.ndarray]:
    """Full pipeline: uni_mesh_path sweep → median-depth renders → TSDF →
    surface nets → .glb (or .obj). Returns (verts, faces)."""
    from gaussiananything_tpu.render import cameras
    from gaussiananything_tpu.render.renderer import render_multiview

    poses = cameras.uni_mesh_path(n_views, radius)
    cam = cameras.pose_to_gs_camera(jnp.asarray(poses))
    V = poses.shape[0]
    out = render_multiview(
        gaussians[None], cam["cam_view"][None], cam["cam_view_proj"][None],
        jnp.broadcast_to(cam["tanfov"][None], (1, V)),
        jnp.ones((1, V, 3)), render_size, tile=16, max_per_tile=1024,
        chunk=256, tile_group=16)
    from gaussiananything_tpu import native_bindings
    if native_bindings.have_tsdf_integrate():
        # Host C++ OpenMP integrate (the reference's Open3D-on-CPU role):
        # the XLA integrate is gather-bound on TPU (45 s at 176³/50 views)
        # while C++ with cache-resident images takes ~1 s. Renders cross
        # the tunnel as f16 (half the bytes; depth quantisation ≪ voxel).
        fetch = {k: np.asarray(out[k][0].astype(jnp.float16)
                               ).astype(np.float32)
                 for k in ("depth", "image", "alpha")}
        tsdf_np, color_np = native_bindings.tsdf_integrate(
            fetch["depth"], fetch["image"], fetch["alpha"],
            np.asarray(cam["cam_view"]), float(cam["tanfov"][0]),
            resolution=resolution)
    else:
        tsdf, color = integrate_tsdf(
            out["depth"][0], out["image"][0], out["alpha"][0],
            cam["cam_view"], cam["tanfov"][0], resolution=resolution)
        # (channel-leading device color → host transpose to (D, D, D, 3))
        tsdf_np = np.asarray(tsdf)
        color_np = np.moveaxis(np.asarray(color), 0, -1)
    # native C++ extractor when built; python fallback otherwise.
    verts, faces, vcol = native_bindings.surface_nets(tsdf_np, color_np)
    if path.endswith(".obj"):
        with open(path, "w") as f:
            for v in verts:
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
            for face in faces + 1:
                f.write(f"f {face[0]} {face[1]} {face[2]}\n")
    else:
        from gaussiananything_tpu.render.ply_io import save_mesh_glb
        save_mesh_glb(path, verts, faces, vcol)
    return verts, faces
