"""Import official GaussianAnything torch checkpoints into this framework.

Converts the released `.pt` state dicts (README.md release table:
`ckpts/vae/model_rec1965000.pt`, `checkpoints/i23d/stage-1/...`,
`checkpoints/i23d/stage-2/...`, plus the frozen DINOv2/OpenCLIP/VGG/U2Net
towers) into the npz parameter format consumed by `cli/sample.py` /
`cli/serve.py` (`utils/param_io.load_params_npz`).

    python -m gaussiananything_tpu.cli.import_release \
        --kind vae --ckpt ckpts/vae/model_rec1965000.pt --out vae.npz

Kinds: vae | dit-stage1 | dit-stage2 | dinov2 | clip-text | lpips-vgg |
u2net. Conversion runs entirely on CPU (no TPU required).
"""
from __future__ import annotations

import argparse


def load_torch_checkpoint(path: str):
    """Load a torch checkpoint to a flat {name: np.ndarray} state dict.

    Unwraps the common nestings (`state_dict` / `model` / `ema` /
    DDP `module.` prefixes) so converters see the raw parameter names.
    """
    import numpy as np
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    for key in ("state_dict", "model", "ema"):
        if isinstance(obj, dict) and key in obj and isinstance(
                obj[key], dict):
            obj = obj[key]
    sd = {}
    for k, v in obj.items():
        if not hasattr(v, "numpy"):
            continue                      # skip non-tensor entries
        if k.startswith("module."):
            k = k[len("module."):]
        sd[k] = np.asarray(v.detach().to(torch.float32).numpy())
    return sd


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--kind", required=True,
                   choices=["vae", "dit-stage1", "dit-stage2",
                            "dit-t23d-stage1", "dit-t23d-stage2", "dinov2",
                            "clip-text", "lpips-vgg", "u2net"])
    p.add_argument("--ckpt", required=True, help="torch .pt/.pth checkpoint")
    p.add_argument("--out", required=True, help="output .npz path")
    # scaled-structure overrides (testing / non-release sizes)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--depth", type=int, default=None)
    p.add_argument("--heads", type=int, default=None)
    p.add_argument("--cond-dim", type=int, default=None)
    p.add_argument("--latent-num", type=int, default=None)
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gaussiananything_tpu.utils import param_io

    sd = load_torch_checkpoint(args.ckpt)
    rng = jax.random.PRNGKey(0)

    if args.kind == "vae":
        from gaussiananything_tpu.models.vae import PointVAE
        kw = {}
        if args.width:
            kw.update(decoder_width=args.width)
        if args.depth:
            kw.update(decoder_depth=args.depth)
        if args.heads:
            kw.update(decoder_heads=args.heads)
        if args.latent_num:
            kw.update(latent_num=args.latent_num)
        model = PointVAE(encoder_width=256, release_parity=True, **kw)
        n = kw.get("latent_num", 768)
        tpl = model.init(rng, jnp.zeros((1, 1, 15, 64, 64)),
                         jnp.zeros((1, max(n, 8), 3)), rng)
        params = param_io.convert_gaussiananything_vae(sd, tpl)
    elif args.kind.startswith("dit-"):
        from gaussiananything_tpu.models import dit as dit_mod
        factory = {
            "dit-stage1": dit_mod.stage1_dit_release,
            "dit-stage2": dit_mod.stage2_dit_release,
            "dit-t23d-stage1": dit_mod.t23d_stage1_dit_release,
            "dit-t23d-stage2": dit_mod.t23d_stage2_dit_release,
        }[args.kind]
        kw = {}
        if args.width:
            kw.update(width=args.width)
        if args.depth:
            kw.update(depth=args.depth)
        if args.heads:
            kw.update(heads=args.heads)
        if args.cond_dim:
            kw.update(cond_dim=args.cond_dim, vector_dim=args.cond_dim)
        model = factory(**kw)
        cd = model.cond_dim
        extra = dict(xyz=jnp.zeros((1, 16, 3))) if model.use_xyz_pe else {}
        tpl = model.init(rng, jnp.zeros((1, 16, model.in_channels)),
                         jnp.zeros((1,)), jnp.zeros((1, 2, cd)),
                         jnp.zeros((1, cd)), **extra)
        params = param_io.convert_gaussiananything_dit(sd, tpl)
    elif args.kind == "dinov2":
        from gaussiananything_tpu.models.dinov2 import dinov2_vitl14_reg
        model = dinov2_vitl14_reg()
        tpl = model.init(rng, jnp.zeros((1, 3, 518, 518)))
        params = param_io.convert_dinov2(sd, tpl)
        # nest under the ImageConditioner's submodule name so the npz
        # restores directly against the documented consumers
        # (sample --stage1-cond-ckpt / serve --cond-ckpt / train_flow
        # --cond-ckpt, all of which template on ImageConditioner).
        params = {"params": {"vit": params["params"]}}
    elif args.kind == "clip-text":
        from gaussiananything_tpu.models.openclip_text import (
            OpenClipTextTower)
        model = OpenClipTextTower()
        tpl = model.init(rng, jnp.zeros((1, 77), jnp.int32))
        params = param_io.convert_openclip_text(sd, tpl)
        # nest under TextConditioner's submodule name (see dinov2 above)
        params = {"params": {"text": params["params"]}}
    elif args.kind == "lpips-vgg":
        from gaussiananything_tpu.train.losses import init_lpips_template
        tpl = init_lpips_template()
        params = param_io.convert_lpips_vgg(sd, tpl)
    else:                                  # u2net
        from gaussiananything_tpu.models.matting import u2net
        model = u2net()
        tpl = model.init(rng, jnp.zeros((1, 320, 320, 3)))
        params = param_io.convert_u2net(sd, tpl)

    param_io.save_params_npz(args.out, params)
    import numpy as np
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(params))
    print(f"converted {args.kind}: {n_params / 1e6:.2f}M params -> "
          f"{args.out}")


if __name__ == "__main__":
    main()
