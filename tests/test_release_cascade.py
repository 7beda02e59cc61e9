"""Integration test of the official-checkpoint i23d cascade at test scale:
torch-mirror checkpoints (TRUE reference param names) → converters →
release-parity models → the ACTUAL sampling/decoding machinery used by
`cli/sample.py --release` (make_sampler CFG flow + PointVAE.decode).

Proves the imported stage-1 DiT, stage-2 DiT, and VAE plug into the
framework's cascade end-to-end: image conditioning → 3-ch point tokens →
10-ch KL tokens → 3 gaussian LoDs, all finite and in range.
"""
from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax                                                     # noqa: E402
import jax.numpy as jnp                                        # noqa: E402

from gaussiananything_tpu.models.conditioner import (          # noqa: E402
    ImageConditioner)
from gaussiananything_tpu.models.dit import PointDiT           # noqa: E402
from gaussiananything_tpu.models.vae import PointVAE           # noqa: E402
from gaussiananything_tpu.train.fm_trainer import (            # noqa: E402
    FMConfig, XYZ_SCALE, make_sampler)
from gaussiananything_tpu.utils.param_io import (              # noqa: E402
    convert_gaussiananything_dit, convert_gaussiananything_vae)

from test_release_import import CFG, _randomize                # noqa: E402
from torch_mirror_ga import TorchClayDiT, TorchReleaseVAE      # noqa: E402

W = 128          # conditioner width == DiT cond_dim
K = CFG["num_tokens"]          # 12 latent tokens
ZC = CFG["z_channels"]         # 10


@pytest.fixture(scope="module")
def cascade():
    rng = jax.random.PRNGKey(0)
    cond = ImageConditioner(width=W, depth=1, heads=2, img_size=56,
                            backbone="dinov2")
    img = jnp.zeros((1, 3, 56, 56)) + 0.5
    cond_params = cond.init(rng, img)

    def make_dit(stage):
        tm = TorchClayDiT(in_channels=3 if stage == 1 else ZC, dim=128,
                          depth=2, heads=2, ctx_dim=W,
                          use_pe_cond=(stage == 2)).eval()
        _randomize(tm, seed=stage)
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        fm = PointDiT(in_channels=3 if stage == 1 else ZC, width=128,
                      depth=2, heads=2, cond_dim=W, vector_dim=W,
                      use_xyz_pe=(stage == 2), release_parity=True)
        kw = dict(xyz=jnp.zeros((1, K, 3))) if stage == 2 else {}
        tpl = fm.init(rng, jnp.zeros((1, K, fm.in_channels)),
                      jnp.zeros((1,)), jnp.zeros((1, 2, W)),
                      jnp.zeros((1, W)), **kw)
        return fm, convert_gaussiananything_dit(sd, tpl)

    dit1, dit1_params = make_dit(1)
    dit2, dit2_params = make_dit(2)

    tv = TorchReleaseVAE(**CFG).eval()
    _randomize(tv)
    sd = {k: v.detach().numpy() for k, v in tv.state_dict().items()}
    vae = PointVAE(latent_num=K, z_channels=ZC, encoder_width=256,
                   decoder_width=CFG["dim"], decoder_depth=CFG["depth"],
                   decoder_heads=CFG["heads"], up_factors=CFG["up_factors"],
                   up_depths=CFG["up_depths"], release_parity=True)
    tpl = vae.init(rng, jnp.zeros((1, 2, 15, 64, 64)),
                   jnp.zeros((1, 64, 3)), rng)
    vae_params = convert_gaussiananything_vae(sd, tpl)
    return (cond, cond_params, dit1, dit1_params, dit2, dit2_params,
            vae, vae_params, img)


def test_full_cascade(cascade):
    (cond, cond_params, dit1, dit1_params, dit2, dit2_params,
     vae, vae_params, img) = cascade
    rng = jax.random.PRNGKey(7)

    fm1 = FMConfig(stage=1, cfg_scale=4.5, num_steps=4, sampler="euler")
    sampler1 = make_sampler(dit1, cond, fm1, latent_shape=(K, 3))
    xyz_n = sampler1(dit1_params, cond_params, img, rng)
    assert xyz_n.shape == (1, K, 3)
    xyz = xyz_n * XYZ_SCALE                       # world units

    fm2 = FMConfig(stage=2, cfg_scale=4.5, num_steps=4, sampler="euler")
    sampler2 = make_sampler(dit2, cond, fm2, latent_shape=(K, ZC))
    kl = sampler2(dit2_params, cond_params, img, rng, xyz=xyz)
    assert kl.shape == (1, K, ZC)

    lods = vae.apply(vae_params, kl, xyz, method=PointVAE.decode)
    assert len(lods) == 1 + len(CFG["up_factors"])
    n = K
    for f, lod in zip((1,) + tuple(CFG["up_factors"]), lods):
        n *= f
        assert lod.shape == (1, n, 13)
        assert bool(jnp.isfinite(lod).all())
        op = np.asarray(lod[..., 3])
        assert op.min() >= 0 and op.max() <= 1
        q = np.asarray(lod[..., 6:10])
        np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0,
                                   atol=1e-4)


def test_cfg_actually_guides(cascade):
    """cfg_scale must change the sample (the guided velocity mixes the
    conditional/unconditional branches, `dit/dit_i23d.py:159-172`)."""
    (cond, cond_params, dit1, dit1_params, _d2, _d2p,
     _v, _vp, img) = cascade
    rng = jax.random.PRNGKey(3)
    fm1 = FMConfig(stage=1, cfg_scale=1.0, num_steps=4, sampler="euler")
    sampler = make_sampler(dit1, cond, fm1, latent_shape=(K, 3))
    a = sampler(dit1_params, cond_params, img, rng, cfg_scale=1.0)
    b = sampler(dit1_params, cond_params, img, rng, cfg_scale=6.0)
    assert float(jnp.abs(a - b).max()) > 1e-5


def test_dopri5_sampler_wiring(cascade):
    """cfg.sampler='dopri5' (the reference's default adaptive solver,
    `transport/transport.py:384-431`, atol 1e-6 / rtol 1e-3) through the
    cascade sampler — result matches a fine fixed-step Heun solve."""
    (cond, cond_params, dit1, dit1_params, _d2, _d2p,
     _v, _vp, img) = cascade
    rng = jax.random.PRNGKey(11)
    fm_ad = FMConfig(stage=1, cfg_scale=2.0, sampler="dopri5")
    s_ad = make_sampler(dit1, cond, fm_ad, latent_shape=(K, 3))
    x_ad = s_ad(dit1_params, cond_params, img, rng)

    fm_h = FMConfig(stage=1, cfg_scale=2.0, num_steps=200, sampler="heun")
    s_h = make_sampler(dit1, cond, fm_h, latent_shape=(K, 3))
    x_h = s_h(dit1_params, cond_params, img, rng)
    assert bool(jnp.isfinite(x_ad).all())
    np.testing.assert_allclose(np.asarray(x_ad), np.asarray(x_h),
                               rtol=5e-3, atol=2e-3)
