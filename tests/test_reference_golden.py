"""Golden tests against the ACTUAL reference code (not hand-written mirrors).

Imports the real `/root/reference` torch modules on CPU through
`reference_shims` (faithful timm/xformers pieces + import stubs) and pins:

  * transport/path.py GVP / Linear / VP plan values, velocity↔score
    change of variables, and SDE diffusion forms against
    `gaussiananything_tpu.diffusion.transport`;
  * dit/dit_i23d.py stage-1 + stage-2 CLAY towers (the release i23d DiTs,
    `DiT_L_Pixelart_clay_pcd[_stage2]` structure at reduced width/depth)
    against the converted flax `PointDiT(release_parity=True)`;
  * dit/dit_decoder.py `DiTBlock2` against the hand mirror (state-dict
    cross-load — transitively grounds the mirror-based VAE goldens);
  * nsr/srt/encoder.py `HybridEncoderPCDStructuredLatentSNoPCD` (which IS
    the ldm `Encoder` trunk + SRT + agg CA assembly) against the mirror,
    feeding the mirror the real module's own FPS anchors.

These replace the mirror as ground truth (VERDICT round-3 item 3); the
mirrors stay for conversion-coverage speed.
"""
from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import reference_shims                                         # noqa: E402

reference_shims.install()

import jax                                                     # noqa: E402
import jax.numpy as jnp                                        # noqa: E402

reference_shims.patch_cuda_only_names()

DIM, DEPTH, HEADS, CTX = 128, 3, 2, 96
B, N, L = 2, 16, 11


# ---------------------------------------------------------------------------
# transport plans
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kind", ["linear", "gvp", "vp"])
def test_path_plan_values_match_reference(kind):
    from transport.path import ICPlan, GVPCPlan, VPCPlan
    from gaussiananything_tpu.diffusion import transport as our

    ref = {"linear": ICPlan, "gvp": GVPCPlan, "vp": VPCPlan}[kind]()
    path = {"linear": our.linear_path, "gvp": our.gvp_path,
            "vp": our.vp_path}[kind]()

    t = torch.linspace(0.05, 0.95, 7, dtype=torch.float64)
    tj = jnp.asarray(t.numpy())
    a_ref, _ = ref.compute_alpha_t(t)
    s_ref, _ = ref.compute_sigma_t(t)
    np.testing.assert_allclose(np.asarray(path.alpha(tj)), a_ref.numpy(),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(path.sigma(tj)), s_ref.numpy(),
                               rtol=1e-6, atol=1e-7)

    # velocity → score change of variables on random tensors
    r = np.random.RandomState(0)
    x = r.randn(7, 5).astype(np.float64)
    v = r.randn(7, 5).astype(np.float64)
    sc_ref = ref.get_score_from_velocity(torch.from_numpy(v),
                                         torch.from_numpy(x), t)
    sc_our = our.score_from_velocity(path, jnp.asarray(v), jnp.asarray(x),
                                     tj)
    np.testing.assert_allclose(np.asarray(sc_our), sc_ref.numpy(),
                               rtol=1e-5, atol=1e-6)

    # SDE diffusion forms ("constant" returns the scalar norm in the ref)
    for form in ("constant", "SBDM", "sigma", "linear"):
        d_ref = ref.compute_diffusion(torch.from_numpy(x), t, form=form,
                                      norm=2.0)
        d_our = np.asarray(our.sde_diffusion(
            path, jnp.asarray(t.numpy()), form=form.lower(), norm=2.0))
        d_ref = (d_ref.numpy() if isinstance(d_ref, torch.Tensor)
                 else np.full((7, 1), d_ref))
        np.testing.assert_allclose(
            np.broadcast_to(d_our[:, None], (7, d_ref.shape[-1])),
            np.broadcast_to(d_ref, (7, d_ref.shape[-1])),
            rtol=1e-5, atol=1e-7, err_msg=form)


# ---------------------------------------------------------------------------
# release i23d DiT towers (real classes)
# ---------------------------------------------------------------------------

def _randomize(model: torch.nn.Module, seed: int = 0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if p.ndim == 1 and name.endswith("weight"):
                p.copy_(1.0 + 0.05 * torch.randn(p.shape, generator=g))
            elif p.ndim >= 2:
                fan_in = int(np.prod(p.shape[1:]))
                p.copy_(torch.randn(p.shape, generator=g)
                        / max(fan_in, 1) ** 0.5)
            else:
                p.copy_(0.2 * torch.randn(p.shape, generator=g))


@pytest.mark.parametrize("stage", [1, 2])
def test_release_dit_tower_real_reference(stage):
    """Real `DiT_I23D_PCD_PixelArt_noclip[_clay_stage2]` with the release
    CLAY block (`ImageCondDiTBlockPixelArtRMSNormClayLRM`), reduced dims,
    → `convert_gaussiananything_dit` → flax `PointDiT(release_parity)`."""
    from dit import dit_i23d
    from gaussiananything_tpu.models.dit import PointDiT
    from gaussiananything_tpu.utils.param_io import (
        convert_gaussiananything_dit)

    in_ch = 3 if stage == 1 else 10
    common = dict(
        vit_blk=dit_i23d.ImageCondDiTBlockPixelArtRMSNormClayLRM,
        use_clay_ca=True, hidden_size=DIM, patch_size=1, num_heads=HEADS,
        depth=DEPTH, in_channels=in_ch, context_dim=CTX,
        pooling_ctx_dim=CTX, learn_sigma=False, roll_out=True)
    if stage == 1:
        tm = dit_i23d.DiT_I23D_PCD_PixelArt_noclip(**common)
    else:
        tm = dit_i23d.DiT_I23D_PCD_PixelArt_noclip_clay_stage2(
            use_pe_cond=True, **common)
    tm = tm.eval()
    _randomize(tm, seed=stage)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    fm = PointDiT(in_channels=in_ch, width=DIM, depth=DEPTH, heads=HEADS,
                  cond_dim=CTX, vector_dim=CTX, use_xyz_pe=(stage == 2),
                  release_parity=True, variant="clay")
    r = np.random.RandomState(stage)
    x = r.randn(B, N, in_ch).astype(np.float32)
    t = r.rand(B).astype(np.float32)
    tokens = r.randn(B, L, CTX).astype(np.float32) * 0.5
    vector = r.randn(B, CTX).astype(np.float32) * 0.5
    xyz = (r.rand(B, N, 3).astype(np.float32) - 0.5) * 0.9

    kw = dict(xyz=jnp.asarray(xyz)) if stage == 2 else {}
    params = fm.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t),
                     jnp.asarray(tokens), jnp.asarray(vector), **kw)
    params = convert_gaussiananything_dit(sd, params)
    out_f = fm.apply(params, jnp.asarray(x), jnp.asarray(t),
                     jnp.asarray(tokens), jnp.asarray(vector), **kw)

    ctx = {"img_crossattn": torch.from_numpy(tokens),
           "img_vector": torch.from_numpy(vector)}
    if stage == 2:
        ctx["fps-xyz"] = torch.from_numpy(xyz)
    with torch.no_grad():
        out_t = tm(torch.from_numpy(x), torch.from_numpy(t), context=ctx)
    assert np.asarray(out_f).shape == tuple(out_t.shape)
    np.testing.assert_allclose(np.asarray(out_f), out_t.numpy(),
                               atol=3e-4, rtol=2e-3)


# ---------------------------------------------------------------------------
# DiT2 decoder block (real vs mirror, shared weights)
# ---------------------------------------------------------------------------

def test_dit2_block_real_vs_mirror():
    from dit.dit_decoder import DiTBlock2 as RealBlock
    from torch_mirror_ga import DiTBlock2 as MirrorBlock

    real = RealBlock(DIM, HEADS, mlp_ratio=4).eval()
    _randomize(real, seed=7)
    mirror = MirrorBlock(DIM, HEADS).eval()
    missing, unexpected = mirror.load_state_dict(real.state_dict(),
                                                 strict=False)
    assert not missing, missing
    r = np.random.RandomState(3)
    x = torch.from_numpy(r.randn(B, N, DIM).astype(np.float32))
    # DiTBlock2 conditions PER TOKEN (modulate2 — the DiT2 decoder's
    # inverted conditioning, dit/dit_decoder.py:27-35)
    c = torch.from_numpy(r.randn(B, N, DIM).astype(np.float32) * 0.3)
    with torch.no_grad():
        np.testing.assert_allclose(mirror(x, c).numpy(),
                                   real(x, c).numpy(), atol=2e-5,
                                   rtol=1e-4)


# ---------------------------------------------------------------------------
# hybrid pcd-structured encoder (real assembly vs mirror, shared weights)
# ---------------------------------------------------------------------------

def test_hybrid_encoder_real_vs_mirror():
    from nsr.srt.encoder import HybridEncoderPCDStructuredLatentSNoPCD
    from torch_mirror_ga import TorchHybridEncoder

    V, RES, NPCD, K, ZCH = 2, 64, 64, 12, 10
    real = HybridEncoderPCDStructuredLatentSNoPCD(
        num_frames=V, latent_num=K, ch=64, out_ch=3, ch_mult=(1, 2, 4, 4),
        num_res_blocks=1, attn_resolutions=(), in_channels=15,
        resolution=RES, z_channels=ZCH, double_z=True,
        attn_type="mv-vanilla",
        attn_kwargs={"n_heads": 8, "d_head": 64}).eval()
    _randomize(real, seed=11)

    mirror = TorchHybridEncoder(ch=64, ch_mult=(1, 2, 4, 4), z_channels=ZCH,
                                srt_depth=3).eval()
    sd = real.state_dict()
    missing, unexpected = mirror.load_state_dict(sd, strict=False)
    assert not missing, f"mirror params absent from the real module: " \
        f"{missing}"

    r = np.random.RandomState(5)
    imgs = r.randn(B, V, 15, RES, RES).astype(np.float32) * 0.5
    pcd = (r.rand(B, NPCD, 3).astype(np.float32) - 0.5) * 0.6

    with torch.no_grad():
        real_out = real(torch.from_numpy(imgs.reshape(B * V, 15, RES, RES)),
                        torch.from_numpy(pcd))
        anchors = real_out["query_pcd_xyz"]
        mirror_h = mirror(torch.from_numpy(imgs), anchors)
    np.testing.assert_allclose(mirror_h.numpy(), real_out["h"].numpy(),
                               atol=3e-5, rtol=1e-4)
