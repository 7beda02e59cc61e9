"""Point-cloud-structured 3D VAE: encoder + KL bottleneck + cascaded
gaussian decoder.

Assembly parity with `pcd_structured_latent_space_vae_decoder_cascaded`
(`vit/vit_triplane.py:1211,1266,1594`) and the `AE` façade
(`nsr/script_util.py:32,303-410`):

  encode:  HybridPCDEncoder → (B, K, 2·z) + anchors
  bottleneck: quant MLP 2z→2·embed, DiagonalGaussian (logvar soft-clamp ±20,
    `torch_utils/distributions/distributions.py:41-49`), post-quant z→width
  decode:  DiT2 backbone on K query tokens → surfel head (per-attribute init
    contract, `vit/vit_triplane.py:287-341`) → base 768 gaussians → three
    upsamplers (f=8,4,3) → 4 LoD levels of activated 13-ch gaussians.

The latent exposed to the diffusion stage is (kl_z ‖ anchor_xyz):
768×(z_channels+3), matching the `latent_normalized`/`query_pcd_xyz` split
(`datasets/g_buffer_objaverse.py:3661-3687`).
"""
from __future__ import annotations

import functools
from typing import Dict, List, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from gaussiananything_tpu.models.dit2_decoder import DiT2
from gaussiananything_tpu.models.encoder import HybridPCDEncoder
from gaussiananything_tpu.models.layers import Mlp, XYZPosEmbed
from gaussiananything_tpu.models.upsampler import GaussianUpsampler
from gaussiananything_tpu.ops.gaussians import (activate_gaussians,
                                                activate_gaussians_at)


class DiagonalGaussian(NamedTuple):
    mean: jnp.ndarray
    logvar: jnp.ndarray

    def sample(self, rng) -> jnp.ndarray:
        std = jnp.exp(0.5 * self.logvar)
        return self.mean + std * jax.random.normal(rng, self.mean.shape,
                                                   self.mean.dtype)

    def kl(self) -> jnp.ndarray:
        """Per-sample KL to N(0,1), summed over token/channel dims."""
        return 0.5 * jnp.sum(
            self.mean ** 2 + jnp.exp(self.logvar) - 1.0 - self.logvar,
            axis=tuple(range(1, self.mean.ndim)))


def soft_clamp(x: jnp.ndarray, v: float = 20.0) -> jnp.ndarray:
    """x → v·tanh(x/v), parity with `soft_clamp20`
    (`torch_utils/distributions/distributions.py:30`)."""
    return v * jnp.tanh(x / v)


def _surfel_head_kernel_init(key, shape, dtype=jnp.float32):
    """Per-attribute weight init: zeros except rotation rows = 1.0
    (`gaussian_prediction.init_gaussian_prediction`,
    `vit/vit_triplane.py:287-341`: scale_inits [0,0,0,1,0])."""
    k = jnp.zeros(shape, dtype)
    return k.at[:, 6:10].set(1.0)


def _surfel_head_bias_init(key, shape, dtype=jnp.float32,
                           scale_bias: float = -2.5):
    """bias_inits [0, 0, −2.5, 0, 0.5] over (xyz, opacity, scale, rot, rgb)."""
    b = jnp.zeros(shape, dtype)
    b = b.at[4:6].set(scale_bias)
    b = b.at[10:13].set(0.5)
    return b


class SurfelHead(nn.Module):
    """SiLU + Linear(width→13) with the reference init contract.

    scale_bias: raw-scale bias init. The reference's −2.5
    (`vit/vit_triplane.py:287-341`) yields scale ≈ 5.1e-4 — SUB-PIXEL at
    every training resolution (0.28 px at 512²), which puts d alpha/d scale
    ≈ 0 through the 2D low-pass branch and freezes splat growth at short
    horizons (BENCH_NOTES r4). Configurable for the pixel-scale-init
    ablation (e.g. +1.33 ⇒ scale ≈ 1e-2 ≈ 1.3 px at 128²/6144 splats)."""

    dtype: jnp.dtype = jnp.float32
    scale_bias: float = -2.5

    @nn.compact
    def __call__(self, x):
        x = nn.silu(x)
        return nn.Dense(
            13, kernel_init=_surfel_head_kernel_init,
            bias_init=functools.partial(_surfel_head_bias_init,
                                        scale_bias=self.scale_bias),
            dtype=self.dtype)(x)


class PointVAE(nn.Module):
    """Full 3D VAE. All submodules are independently addressable so the
    trainer can run encoder-only / decoder-only paths (the reference's
    `behaviour=` dispatch, `nsr/script_util.py:303-410`)."""

    latent_num: int = 768
    z_channels: int = 10
    encoder_width: int = 384
    decoder_width: int = 768
    decoder_depth: int = 12
    decoder_heads: int = 12
    up_factors: Sequence[int] = (8, 4, 3)
    up_depths: Sequence[int] = (2, 1, 1)
    skip_weight: float = 0.1
    # Weight-compatible release mode for importing the official checkpoint
    # (`ckpts/vae/model_rec1965000.pt`) via
    # `utils/param_io.convert_gaussiananything_vae`: parity encoder/DiT2/
    # upsamplers, no anchor-PE injection into the decoder conditioning
    # (the reference conditions ONLY on post_quant(z); anchor xyz enters
    # through the offset skip, `vit/vit_triplane.py:1390-1400`), and
    # unscaled upsample offsets (no skip_weight above the base level,
    # `vit/vit_triplane.py:1044-1049`).
    release_parity: bool = False
    scale_bias: float = -2.5     # SurfelHead ablation knob (see its doc)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = HybridPCDEncoder(
            latent_num=self.latent_num, z_channels=self.z_channels,
            width=self.encoder_width, release_parity=self.release_parity,
            dtype=self.dtype)
        # 2-layer GELU MLPs matching the reference's quant/post-quant convs
        # (`vit/vit_triplane.py:1318-1326`: timm Mlp with hidden = in).
        self.quant_mlp = Mlp(hidden=2 * self.z_channels,
                             out=2 * self.z_channels, dtype=self.dtype)
        self.post_quant_mlp = Mlp(hidden=self.z_channels,
                                  out=self.decoder_width, dtype=self.dtype)
        if not self.release_parity:
            self.anchor_pe = XYZPosEmbed(self.decoder_width, dtype=self.dtype)
        self.backbone = DiT2(num_tokens=self.latent_num,
                             width=self.decoder_width,
                             depth=self.decoder_depth,
                             heads=self.decoder_heads,
                             release_parity=self.release_parity,
                             dtype=self.dtype)
        self.base_head = SurfelHead(dtype=self.dtype,
                                    scale_bias=self.scale_bias)
        self.upsamplers = [
            GaussianUpsampler(factor=f, depth=d,
                              release_parity=self.release_parity,
                              dtype=self.dtype)
            for f, d in zip(self.up_factors, self.up_depths)
        ]

    # ------------------------------------------------------------- encode
    def encode(self, images: jnp.ndarray, pcd: jnp.ndarray
               ) -> Tuple[DiagonalGaussian, jnp.ndarray]:
        h, anchors = self.encoder(images, pcd)
        # fp32 latent statistics regardless of compute dtype: the KL and
        # the sampled z are the VAE's numerical core.
        moments = self.quant_mlp(h).astype(jnp.float32)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return DiagonalGaussian(mean, soft_clamp(logvar)), anchors

    # ------------------------------------------------------------- decode
    def decode(self, z: jnp.ndarray, anchors: jnp.ndarray
               ) -> List[jnp.ndarray]:
        """z (B, K, z_channels), anchors (B, K, 3) →
        list of 4 activated gaussian LoDs (B, K·∏f, 13)."""
        c = self.post_quant_mlp(z)
        if not self.release_parity:
            # anchor geometry must reach the decoder: latent tokens are the
            # only conditioning, so fold anchor xyz in via Fourier features
            # (extension; the reference relies on the offset skip alone).
            c = c + self.anchor_pe(anchors)
        feat = self.backbone(c)                        # (B, K, width)

        raw = self.base_head(feat)                     # (B, K, 13)
        if self.release_parity:
            # reference `_get_base_gaussians` applies no pos clip
            # (`vit/vit_triplane.py:1388-1400`)
            pos0 = anchors.astype(jnp.float32) + jnp.tanh(
                raw[..., 0:3].astype(jnp.float32)) * (0.45 * 0.5
                                                      * self.skip_weight)
            lods = [activate_gaussians_at(pos0, raw)]
        else:
            lods = [activate_gaussians(raw, anchors, self.skip_weight)]
        parent_xyz = lods[0][..., 0:3]
        for up in self.upsamplers:
            feat, raw, residual = up(feat, raw, parent_xyz)
            rep_parent = jnp.repeat(parent_xyz, up.factor, axis=1)
            if self.release_parity:
                # reference: child pos = tanh(RESIDUAL[:3])·0.225 + parent
                # (no skip scaling, no clip; other channels from the summed
                # child raw — `vit/vit_triplane.py:1040-1058`)
                pos = rep_parent + jnp.tanh(
                    residual[..., 0:3].astype(jnp.float32)) * (0.45 * 0.5)
                act = activate_gaussians_at(pos, raw)
            else:
                act = activate_gaussians(raw, rep_parent, self.skip_weight)
            lods.append(act)
            parent_xyz = act[..., 0:3]
        return lods

    # ------------------------------------------------------------ forward
    def __call__(self, images: jnp.ndarray, pcd: jnp.ndarray,
                 rng) -> Dict[str, jnp.ndarray]:
        dist, anchors = self.encode(images, pcd)
        z = dist.sample(rng)
        lods = self.decode(z, anchors)
        return {
            "lods": lods,
            "kl": dist.kl(),
            "mean": dist.mean,
            "logvar": dist.logvar,
            "anchors": anchors,
            "z": z,
        }

    @classmethod
    def from_config(cls, vae_cfg, dtype=None) -> "PointVAE":
        """Build from a `config.VAEModelConfig` (single source of truth for
        CLI/tools call sites)."""
        from gaussiananything_tpu.config import compute_dtype
        return cls(
            latent_num=vae_cfg.latent_num, z_channels=vae_cfg.z_channels,
            encoder_width=vae_cfg.encoder_width,
            decoder_width=vae_cfg.decoder_width,
            decoder_depth=vae_cfg.decoder_depth,
            decoder_heads=vae_cfg.decoder_heads,
            up_factors=tuple(vae_cfg.up_factors),
            up_depths=tuple(vae_cfg.up_depths),
            skip_weight=vae_cfg.skip_weight,
            release_parity=getattr(vae_cfg, "release_parity", False),
            scale_bias=getattr(vae_cfg, "scale_bias", -2.5),
            dtype=dtype or compute_dtype(vae_cfg.compute_dtype))

    # Diffusion-facing latent: (kl_z ‖ anchors/scale) per token.
    def latent_for_diffusion(self, images, pcd, rng,
                             xyz_scale: float = 0.164) -> jnp.ndarray:
        """xyz normaliser 0.164 parity: `datasets/g_buffer_objaverse.py:3645`."""
        dist, anchors = self.encode(images, pcd)
        z = dist.sample(rng)
        return jnp.concatenate([z, anchors / xyz_scale], axis=-1)
