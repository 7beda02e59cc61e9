"""End-to-end test of the checkpoint-import CLI
(`cli/import_release.py`): torch.save a mirror state dict (the TRUE
reference param names) → run the CLI → load the npz → params match the
direct converter output."""
from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax                                                    # noqa: E402

from gaussiananything_tpu.cli.import_release import (          # noqa: E402
    load_torch_checkpoint, main)
from gaussiananything_tpu.utils.param_io import load_params_npz  # noqa: E402

from torch_mirror_ga import TorchClayDiT                       # noqa: E402


def test_dit_roundtrip(tmp_path):
    tm = TorchClayDiT(in_channels=3, dim=128, depth=2, heads=2, ctx_dim=96)
    pt = tmp_path / "dit.pt"
    torch.save(tm.state_dict(), pt)
    out = tmp_path / "dit.npz"
    main(["--kind", "dit-stage1", "--ckpt", str(pt), "--out", str(out),
          "--width", "128", "--depth", "2", "--heads", "2",
          "--cond-dim", "96"])
    params = load_params_npz(str(out))
    got = np.asarray(params["params"]["final_proj"]["kernel"])
    want = tm.final_layer.linear.weight.detach().numpy().T
    np.testing.assert_allclose(got, want, atol=0)
    assert len(jax.tree.leaves(params)) > 20


def test_unwraps_nested_and_ddp(tmp_path):
    tm = TorchClayDiT(in_channels=3, dim=128, depth=1, heads=2, ctx_dim=96)
    wrapped = {"state_dict": {f"module.{k}": v
                              for k, v in tm.state_dict().items()},
               "step": 100}
    pt = tmp_path / "wrapped.pt"
    torch.save(wrapped, pt)
    sd = load_torch_checkpoint(str(pt))
    assert "final_layer.linear.weight" in sd
    assert not any(k.startswith("module.") for k in sd)
    assert "step" not in sd


def test_t23d_training_roundtrip(tmp_path):
    """t23d TRAINING data path (VERDICT round-3 item 6): captions flow
    from extraction (`extract_latents` npz `caption` field, the
    `datasets/g_buffer_objaverse.py:3771` role) through `train_flow
    --cond text` (byte tokenizer + ucg dropout) to a saved checkpoint,
    which then drives text-conditioned sampling."""
    import numpy as np
    from gaussiananything_tpu.cli import extract_latents, train_flow

    lat = str(tmp_path / "lat")
    log = str(tmp_path / "log")
    extract_latents.main(["--out", lat, "--num", "3",
                          "--preset", "demo-e2e"])
    z = np.load(str(tmp_path / "lat" / "00000.npz"))
    assert str(z["caption"])            # non-empty synthetic caption

    train_flow.main(["--preset", "demo-e2e", "--stage", "1", "--steps",
                     "2", "--batch", "2", "--latent-dir", lat, "--cond",
                     "text", "--logdir", log])
    import os
    assert os.path.isdir(os.path.join(log, "ckpt"))

    # text-conditioned sampling with the trained tower
    import jax
    import jax.numpy as jnp
    from gaussiananything_tpu.config import preset
    from gaussiananything_tpu.models.conditioner import (TextConditioner,
                                                         tokenize_bytes)
    from gaussiananything_tpu.models.dit import stage1_dit
    from gaussiananything_tpu.train.fm_trainer import FMConfig, make_sampler
    from gaussiananything_tpu.train.state import restore_inference_params

    cfg = preset("demo-e2e")
    dit = stage1_dit(size=cfg.dit.size, cond_dim=cfg.dit.cond_width,
                     vector_dim=cfg.dit.cond_width)
    cond = TextConditioner(width=cfg.dit.cond_width,
                           depth=cfg.dit.cond_depth,
                           heads=cfg.dit.cond_heads)
    ids = jnp.asarray(tokenize_bytes(["a red sphere"]))
    rng = jax.random.PRNGKey(0)
    cond_params = cond.init(rng, ids)
    c = cond.apply(cond_params, ids)
    K = cfg.vae.latent_num
    dit_params = dit.init(rng, jnp.zeros((1, K, 3)), jnp.zeros((1,)),
                          c.crossattn, c.vector)
    dit_params = restore_inference_params(os.path.join(log, "ckpt"),
                                          dit_params)
    cond_params = restore_inference_params(os.path.join(log, "ckpt_cond"),
                                           cond_params)
    fm = FMConfig(stage=1, cfg_scale=2.0, num_steps=4, sampler="euler")
    sampler = make_sampler(dit, cond, fm, latent_shape=(K, 3))
    xyz = sampler(dit_params, cond_params, ids, rng)
    assert xyz.shape == (1, K, 3)
    assert bool(jnp.isfinite(xyz).all())
