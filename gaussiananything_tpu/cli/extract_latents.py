"""Extract diffusion-training latents with a trained VAE.

Parity with `scripts/save_pcd.py` + the VAE trainer's
`eval_novelview_loop(save_latent=True)` (`nsr/train_nv_util.py:2693`): runs
the encoder over the dataset and writes one npz per instance with
  latent_normalized (K, z)  — KL sample
  query_pcd_xyz    (K, 3)   — FPS anchors (world units)
  cond             (3, H, W) — a conditioning view render
  caption          ()        — instance caption (t23d training text source;
                               '' when the dataset ships none)
mirroring the reference latent.npz schema + caption sidecars
(`datasets/g_buffer_objaverse.py:3661-3687,3771`).
"""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=False, default=None,
                   help="VAE checkpoint: orbax dir or npz from "
                        "cli.import_release (omit for random-init demo)")
    p.add_argument("--preset", default="demo-e2e")
    p.add_argument("--out", required=True)
    p.add_argument("--num", type=int, default=32)
    p.add_argument("--data-dir", default=None,
                   help="packed gbuffer npz dataset (data/gbuffer.py "
                        "layout; see data/objaverse_raw.py for converting "
                        "raw renders); synthetic scenes otherwise")
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from gaussiananything_tpu.config import preset
    from gaussiananything_tpu.data.synthetic import make_batch
    from gaussiananything_tpu.models.vae import PointVAE

    cfg = preset(args.preset)
    model = PointVAE.from_config(cfg.vae)

    rng = jax.random.PRNGKey(0)
    b0 = make_batch(seed=0, batch=1, n_views_in=cfg.data.n_views_in,
                    n_views_sup=1, res=cfg.data.resolution,
                    n_pts=cfg.data.n_points, n_splats=512)
    # jit the init: an eager flax init dispatches thousands of tiny ops
    # through the tunnel (~3-5 ms each = minutes at release size)
    params = jax.jit(model.init)(rng, b0["images_in"], b0["pcd"], rng)
    if args.ckpt:
        from gaussiananything_tpu.train.state import restore_inference_params
        params = restore_inference_params(args.ckpt, params)

    os.makedirs(args.out, exist_ok=True)

    if args.data_dir:
        from gaussiananything_tpu.data.gbuffer import MultiViewDataset
        ds = MultiViewDataset(args.data_dir,
                              n_views_in=cfg.data.n_views_in, n_views_sup=1,
                              n_points=cfg.data.n_points,
                              resolution=cfg.data.resolution)

    @jax.jit
    def encode(imgs, pcd, key):
        dist, anchors = model.apply(params, imgs, pcd,
                                    method=model.encode)
        return dist.sample(key), anchors

    for i in range(args.num):
        if args.data_dir:
            b = ds.batch(1)
            caption = b.get("caption", [""])[0]
        else:
            from gaussiananything_tpu.data.synthetic import describe_object
            b = make_batch(seed=1000 + i, batch=1,
                           n_views_in=cfg.data.n_views_in, n_views_sup=1,
                           res=cfg.data.resolution, n_pts=cfg.data.n_points,
                           n_splats=512)
            caption = describe_object((1000 + i) * 131)
        z, anchors = encode(b["images_in"], b["pcd"],
                            jax.random.fold_in(rng, i))
        cond = jax.image.resize(
            b["images_sup"][0, 0], (3, cfg.dit.cond_img_size,
                                    cfg.dit.cond_img_size), "bilinear")
        np.savez(os.path.join(args.out, f"{i:05d}.npz"),
                 latent_normalized=np.asarray(z[0]),
                 query_pcd_xyz=np.asarray(anchors[0]),
                 cond=np.asarray(cond), caption=np.str_(caption))
    print(f"wrote {args.num} latents to {args.out}")


if __name__ == "__main__":
    main()
