"""Evaluation: image metrics + novel-view eval loop + turntable export.

The reference ships no metric code (SURVEY.md §4: evaluation unreleased);
quality is validated by visual dumps (`eval_novelview_loop`,
`nsr/train_nv_util.py:2693`; `_make_vis_img`,
`nsr/lsgm/flow_matching_trainer.py:1636`). The TPU build makes this
first-class: PSNR/SSIM/perceptual metrics + the same artifact dumps
(multi-LoD grids, turntable strips, latent stats).
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaussiananything_tpu.train import losses as L


def psnr(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((a - b) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))


def image_metrics(pred: jnp.ndarray, gt: jnp.ndarray) -> Dict[str, float]:
    """pred/gt (B, V, 3, H, W) in [0,1]."""
    B, V = pred.shape[:2]
    flat_p = pred.reshape((B * V,) + pred.shape[2:])
    flat_g = gt.reshape((B * V,) + gt.shape[2:])
    return {
        "psnr": float(psnr(flat_p, flat_g)),
        "ssim": float(L.ssim(flat_p, flat_g)),
        "perceptual": float(L.perceptual_loss(flat_p, flat_g)),
    }


def geometry_metrics(pred_xyz: jnp.ndarray, gt_xyz: jnp.ndarray,
                     f_thresh: float = 0.02) -> Dict[str, float]:
    """Point-cloud geometry evaluation: symmetric chamfer, Sinkhorn-EMD,
    and F-score@thresh (fraction of points whose nearest neighbour in the
    other cloud is within `f_thresh` world units — the standard 3D-gen
    geometry metric; the reference's quantitative eval is an unreleased
    TODO, so this extends it). pred/gt: (N, 3) / (M, 3) single clouds."""
    from gaussiananything_tpu.ops.pointcloud import (chamfer_distance,
                                                     sinkhorn_emd)
    a = pred_xyz[None]
    b = gt_xyz[None]
    cd = float(chamfer_distance(a, b)[0])
    emd = float(sinkhorn_emd(a, b)[0])
    d2 = jnp.sum((pred_xyz[:, None, :] - gt_xyz[None, :, :]) ** 2, -1)
    d_pred = jnp.sqrt(jnp.min(d2, axis=1))         # pred → gt
    d_gt = jnp.sqrt(jnp.min(d2, axis=0))           # gt → pred
    precision = float(jnp.mean(d_pred < f_thresh))
    recall = float(jnp.mean(d_gt < f_thresh))
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall > 0 else 0.0)
    return {"chamfer": cd, "emd": emd, "precision": precision,
            "recall": recall, "fscore": f1}


def eval_novelview(model, params, batch, rng, lod_resolutions,
                   out_dir: Optional[str] = None, step: int = 0
                   ) -> Dict[str, float]:
    """Reconstruct eval views with the VAE and measure against GT.

    batch: same schema as the VAE trainer. Saves per-LoD image strips when
    `out_dir` is given (parity with the reference's eval artifact dumps).
    """
    from gaussiananything_tpu.train.vae_trainer import (_resize_to,
                                                        render_lods)
    out = model.apply(params, batch["images_in"], batch["pcd"], rng)
    renders = render_lods(out["lods"], batch["cam_view"],
                          batch["cam_view_proj"], batch["tanfov"],
                          jnp.ones(3), lod_resolutions[: len(out["lods"])])
    metrics: Dict[str, float] = {}
    fin = renders[-1]
    res = lod_resolutions[len(out["lods"]) - 1]
    gt = _resize_to(batch["images_sup"], res)
    metrics.update({f"eval/{k}": v
                    for k, v in image_metrics(fin["image"], gt).items()})
    metrics["eval/kl"] = float(jnp.mean(out["kl"]))
    metrics["eval/latent_std"] = float(jnp.std(out["mean"]))
    g = out["lods"][-1]
    metrics["eval/opacity_mean"] = float(jnp.mean(g[..., 3]))
    metrics["eval/scale_mean"] = float(jnp.mean(g[..., 4:6]))

    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)
        from PIL import Image
        rows = []
        for rend, r in zip(renders, lod_resolutions):
            img = np.asarray(rend["image"][0])        # (V, 3, r, r)
            strip = np.concatenate(
                [np.moveaxis(v, 0, -1) for v in img], axis=1)
            if strip.shape[0] != lod_resolutions[-1]:
                # nearest-neighbour upscale to the finest row size; index
                # gather handles NON-integer ratios (the release ladder's
                # 384→512 is 4/3 — integer kron produced mismatched row
                # widths and crashed the concatenate)
                H = lod_resolutions[-1]
                W = strip.shape[1] * H // strip.shape[0]
                yi = (np.arange(H) * strip.shape[0]) // H
                xi = (np.arange(W) * strip.shape[1]) // W
                strip = strip[yi][:, xi]
            rows.append(strip)
        gt_img = np.asarray(_resize_to(batch["images_sup"],
                                       lod_resolutions[-1])[0])
        rows.append(np.concatenate(
            [np.moveaxis(v, 0, -1) for v in gt_img], axis=1))
        grid = np.concatenate(rows, axis=0)
        Image.fromarray((np.clip(grid, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(out_dir, f"eval_{step:07d}.png"))
    return metrics


def export_turntable(path: str, gaussians: jnp.ndarray, n_frames: int = 24,
                     res: int = 256, radius: float = 1.8, fps: int = 12):
    """Render a turntable and write an .mp4 (imageio-ffmpeg) or a .png strip
    fallback (parity with `render_gs_video_given_latent`,
    `nsr/lsgm/flow_matching_trainer.py:1399`)."""
    from gaussiananything_tpu.render import cameras
    from gaussiananything_tpu.render.renderer import render_multiview

    poses = cameras.generate_input_camera(
        radius, [(20, a) for a in np.linspace(0, 360, n_frames,
                                              endpoint=False)])
    cam = cameras.pose_to_gs_camera(jnp.asarray(poses))
    frames = []
    group = 8
    for i in range(0, n_frames, group):
        sl = slice(i, min(i + group, n_frames))
        V = sl.stop - sl.start
        from gaussiananything_tpu.render.renderer import default_impl
        out = render_multiview(
            gaussians[None], cam["cam_view"][None, sl],
            cam["cam_view_proj"][None, sl],
            jnp.broadcast_to(cam["tanfov"][None, sl], (1, V)),
            jnp.ones((1, V, 3)), res, tile=16, max_per_tile=1024,
            chunk=256, tile_group=16, impl=default_impl(grad=False))
        for v in np.asarray(out["image"][0]):
            frames.append((np.clip(np.moveaxis(v, 0, -1), 0, 1)
                           * 255).astype(np.uint8))
    try:
        import imageio.v2 as imageio
        imageio.mimsave(path, frames, fps=fps)
    except Exception:
        from PIL import Image
        strip = np.concatenate(frames[:: max(1, len(frames) // 8)], axis=1)
        Image.fromarray(strip).save(os.path.splitext(path)[0] + ".png")
    return path
