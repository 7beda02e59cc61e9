"""Procedural multi-view dataset: random surfel objects rendered with our
own rasterizer, producing exactly the training-batch schema of the real
g-buffer pipeline (`datasets/g_buffer_objaverse.py` MultiViewObjverseDataset
+ PostProcess). Used for the end-to-end demo pipeline and tests — swap in
`data/gbuffer.py` for real Objaverse renders.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gaussiananything_tpu.data.postprocess import assemble_encoder_input
from gaussiananything_tpu.ops.gaussians import GaussianSplats, pack_gaussians
from gaussiananything_tpu.render import cameras
from gaussiananything_tpu.render.renderer import render_multiview


def describe_object(seed: int, kind: str | None = None) -> str:
    """Deterministic caption for `make_object(seed)` — re-derives the same
    first rng draw, so the text matches the geometry (the synthetic stand-in
    for the reference's Cap3D captions, `datasets/g_buffer_objaverse.py:3771`)."""
    rng = np.random.default_rng(seed)
    kind = kind or rng.choice(["sphere", "ellipsoid", "torus"])
    hue = ["red", "green", "blue", "yellow", "purple", "cyan"][seed % 6]
    return f"a {hue} {kind}"


def make_object(seed: int, n: int = 1024, kind: str | None = None
                ) -> np.ndarray:
    """Random surfel object (N, 13): sphere / ellipsoid / torus shell with
    smooth position-derived colors."""
    rng = np.random.default_rng(seed)
    kind = kind or rng.choice(["sphere", "ellipsoid", "torus"])
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    if kind == "sphere":
        xyz = 0.35 * d
        nrm = d
    elif kind == "ellipsoid":
        ax = rng.uniform(0.15, 0.4, 3)
        xyz = d * ax
        nrm = d / ax
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    else:  # torus
        theta = rng.uniform(0, 2 * np.pi, n)
        phi = rng.uniform(0, 2 * np.pi, n)
        R, r = 0.28, 0.12
        xyz = np.stack([(R + r * np.cos(phi)) * np.cos(theta),
                        (R + r * np.cos(phi)) * np.sin(theta),
                        r * np.sin(phi)], 1)
        nrm = np.stack([np.cos(phi) * np.cos(theta),
                        np.cos(phi) * np.sin(theta), np.sin(phi)], 1)
    # quaternion rotating +z to nrm
    z = np.array([0.0, 0, 1])
    v = np.cross(z, nrm)
    c = nrm @ z
    q = np.concatenate([(1 + c)[:, None], v], 1)
    q_norm = np.linalg.norm(q, axis=1, keepdims=True)
    deg = q_norm[:, 0] < 1e-6               # nrm == -z
    q[deg] = np.array([0.0, 1, 0, 0])
    q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-8)
    base = rng.uniform(0.2, 1.0, 3)
    rgb = np.clip(base[None] * (0.6 + 0.4 * (xyz / 0.4 + 1) / 2), 0, 1)
    scale = np.full((n, 2), 2.2 * np.sqrt(1.0 / n) * 0.6)
    return pack_gaussians(GaussianSplats(
        xyz=jnp.asarray(xyz.astype(np.float32)),
        opacity=jnp.full((n, 1), 0.95),
        scale=jnp.asarray(scale.astype(np.float32)),
        rotation=jnp.asarray(q.astype(np.float32)),
        rgb=jnp.asarray(rgb.astype(np.float32)),
    ))


def render_scene_views(gaussians: jnp.ndarray, poses25: np.ndarray,
                       res: int = 128) -> Dict[str, jnp.ndarray]:
    """Render (V, 25) poses → GT maps dict (V leading), channel-first.

    Non-tile-divisible `res` (e.g. the DINOv2 conditioning size 518) is
    rendered at the nearest multiple of 16 and bicubic-resized, matching
    the reference's render-512 → kornia-resize-518 conditioning path
    (`sgm/modules/encoders/modules.py:863-875`).
    """
    rres = max(16, int(round(res / 16)) * 16)
    cam = cameras.pose_to_gs_camera(jnp.asarray(poses25))
    out = render_multiview(
        gaussians[None],
        cam["cam_view"][None], cam["cam_view_proj"][None],
        jnp.broadcast_to(cam["tanfov"][None], (1, poses25.shape[0])),
        jnp.ones((1, poses25.shape[0], 3)), rres,
        tile=16, max_per_tile=512, chunk=128,
        tile_group=max(1, (rres // 16) ** 2 // 8))
    out = {k: v[0] for k, v in out.items()}
    if rres != res:
        # bicubic only for the rgb image (the conditioning consumer);
        # bilinear for geometry/alpha maps — bicubic ringing at silhouette
        # edges puts alpha outside [0,1] and invents depth values.
        out = {k: jax.image.resize(
            v, v.shape[:-2] + (res, res),
            method="bicubic" if k == "image" else "linear")
            for k, v in out.items()}
        out["alpha"] = jnp.clip(out["alpha"], 0.0, 1.0)
    return out


def make_batch(seed: int, batch: int = 1, n_views_in: int = 4,
               n_views_sup: int = 4, res: int = 128, n_pts: int = 1024,
               n_splats: int = 1024) -> Dict[str, jnp.ndarray]:
    """Full VAE-trainer batch for `vae_loss_fn` (+ GT gaussians for tests)."""
    rng = np.random.default_rng(seed)
    batches = []
    for b in range(batch):
        g = make_object(seed * 131 + b, n=n_splats)
        elevs = rng.uniform(-30, 60, n_views_in + n_views_sup)
        azis = rng.uniform(0, 360, n_views_in + n_views_sup)
        poses = cameras.generate_input_camera(
            1.8, list(zip(elevs, azis)))
        maps = render_scene_views(g, poses, res)
        imgs_in = assemble_encoder_input(
            maps["image"][None, :n_views_in],
            maps["rend_normal"][None, :n_views_in],
            maps["depth"][None, :n_views_in],
            maps["alpha"][None, :n_views_in],
            jnp.asarray(poses[None, :n_views_in]))
        sup = slice(n_views_in, n_views_in + n_views_sup)
        cam = cameras.pose_to_gs_camera(jnp.asarray(poses[sup]))
        # surface point cloud = splat centres (stand-in for the FPS pcd file)
        idx = rng.choice(g.shape[0], n_pts, replace=n_pts > g.shape[0])
        batches.append({
            "images_in": imgs_in[0],
            "pcd": g[idx, :3],
            "cam_view": cam["cam_view"],
            "cam_view_proj": cam["cam_view_proj"],
            "cam_pos": cam["cam_pos"],
            "images_sup": maps["image"][sup],
            "alpha_sup": maps["alpha"][sup],
            "depth_sup": maps["depth"][sup],
            "gt_gaussians": g,
        })
    out = {k: jnp.stack([bb[k] for bb in batches]) for k in batches[0]}
    out["tanfov"] = cameras.pose_to_gs_camera(
        jnp.asarray(cameras.generate_input_camera(1.8, [(0, 0)])[0]))["tanfov"]
    return out
