"""Multi-view VAE encoder: SD-style conv stack with cross-view attention +
point-cloud-structured latent aggregation.

Capability parity with the reference's release encoder
`HybridEncoderPCDStructuredLatentSNoPCD` (`nsr/srt/encoder.py:454-610`):
  conv downsample (f=8) over each posed 15-ch view → flatten views into one
  token set → add Fourier position embedding of each token's unprojected xyz
  (taken from the input's xyz channels at token centres,
  `nsr/srt/encoder.py:565` `x[:, -3:, 4::8, 4::8]`) → FPS-sample K surface
  anchors from the GT point cloud (`:533-538`) → cross-attend anchors→tokens
  (`agg_ca`, `:475-479,594`) → small SRT transformer (`:461-468,602`) →
  pre-norm MLP to 2·z_channels (`Mlp_out`, `:487-494,604`).

TPU-first changes: NHWC conv layout, one fused attention over all views
(`mv-vanilla` SpatialTransformer3D equivalent), everything vmap/jit-safe with
static shapes; FPS is the jit-safe masked-argmax scan from `ops/fps.py`.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from gaussiananything_tpu.models.layers import (Attention, CrossAttentionBlock,
                                                GroupNorm32, Mlp, ResBlock,
                                                TransformerBlock, XYZPosEmbed)
from gaussiananything_tpu.ops.fps import sample_farthest_points


class MVConvEncoder(nn.Module):
    """SD-style conv encoder; mid-block attention is joint over all views.

    Parity: `ldm/modules/diffusionmodules/model.py:469,574` (`MVEncoder`,
    ch=64, ch_mult (1,2,4,4), 1 res block, attn_type 'mv-vanilla').
    Input (B, V, H, W, C_in) NHWC; output (B, V, H/8, W/8, out_ch).
    """

    ch: int = 64
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    out_ch: int = 256
    heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, V, H, W, C = x.shape
        h = x.reshape(B * V, H, W, C)
        h = nn.Conv(self.ch, (3, 3), dtype=self.dtype)(h)
        for i, mult in enumerate(self.ch_mult):
            h = ResBlock(self.ch * mult, dtype=self.dtype)(h)
            if i < len(self.ch_mult) - 1:
                h = nn.Conv(self.ch * mult, (3, 3), strides=(2, 2),
                            dtype=self.dtype)(h)
        # mid: res — multi-view attention — res
        mid_ch = h.shape[-1]
        h = ResBlock(mid_ch, dtype=self.dtype)(h)
        hh, ww = h.shape[1], h.shape[2]
        tokens = h.reshape(B, V * hh * ww, mid_ch)
        tokens = tokens + Attention(self.heads, dtype=self.dtype)(
            nn.LayerNorm(dtype=jnp.float32)(tokens))
        h = tokens.reshape(B * V, hh, ww, mid_ch)
        h = ResBlock(mid_ch, dtype=self.dtype)(h)
        h = GroupNorm32()(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), dtype=self.dtype)(h)
        return h.reshape(B, V, hh, ww, self.out_ch)


class HybridPCDEncoder(nn.Module):
    """Full pcd-structured latent encoder. Returns (latent 2·z, anchor xyz).

    Input images channel-FIRST (B, V, C_in, H, W) with xyz in the last 3
    channels (15-ch assembly parity, `nsr/srt/encoder.py:552`); `pcd`
    (B, P, 3) is the GT surface point cloud for FPS anchors.
    """

    latent_num: int = 768          # `nsr/srt/encoder.py:456`
    z_channels: int = 10           # release shell: i23d-stage1.sh:186
    width: int = 384
    conv_ch: int = 64
    conv_out: int = 256
    srt_depth: int = 3
    heads: int = 8
    downsample: int = 8
    # Weight-compatible release mode (`HybridEncoderPCDStructuredLatentSNoPCD`,
    # `nsr/srt/encoder.py:648-653`, the `mv-sd-dit-srt-pcd-structured-nopcd`
    # dino_version of vae3d-adv-512.sh): faithful SD trunk, ONE shared
    # xyz-PE module for tokens and pcd, plain (non-residual) aggregation CA
    # over image tokens only (ca_no_pcd=True), exact-GELU SRT MLPs.
    # Requires width == conv trunk output channels (256).
    release_parity: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, pcd: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, V, C, H, W = images.shape
        assert C == 15, f"expected 15-channel rgb+normal+plucker+xyz, got {C}"
        x = jnp.moveaxis(images, 2, -1)  # NHWC
        if self.release_parity:
            from gaussiananything_tpu.models.sd_encoder import (SDEncoderTrunk,
                                                                exact_gelu)
            assert self.width == self.conv_out, \
                "parity mode runs at the conv trunk width (256)"
            feat = SDEncoderTrunk(ch=self.conv_ch, dtype=self.dtype,
                                  name="sd_trunk")(x)
            _, _, hh, ww, _ = feat.shape
            tokens = feat.reshape(B, V * hh * ww, self.width)
        else:
            feat = MVConvEncoder(ch=self.conv_ch, out_ch=self.conv_out,
                                 heads=self.heads, dtype=self.dtype)(x)
            _, _, hh, ww, _ = feat.shape
            tokens = feat.reshape(B, V * hh * ww, self.conv_out)
            tokens = nn.Dense(self.width, dtype=self.dtype)(tokens)

        # token-centre xyz from the input xyz channels (stride f, offset f/2)
        f = self.downsample
        tok_xyz = images[:, :, -3:, f // 2::f, f // 2::f]        # (B,V,3,hh,ww)
        tok_xyz = jnp.moveaxis(tok_xyz, 2, -1).reshape(B, V * hh * ww, 3)

        anchors, _ = sample_farthest_points(pcd, self.latent_num)
        if self.release_parity:
            # ONE xyz_pos_embed for both token PE and pcd-query PE
            # (`nsr/srt/encoder.py:483,584-590`: the same module embeds
            # token_xyz and the fps-gathered pcd points).
            pe = XYZPosEmbed(self.width, dtype=self.dtype,
                             name="xyz_pos_embed")
            tokens = tokens + pe(tok_xyz)
            q = pe(anchors)          # == masked_gather(pe(pcd), fps_idx)
            # plain attention (no residual/MLP wrapper): the reference's
            # agg_ca is a bare MemoryEfficientCrossAttention whose output
            # REPLACES the query (`nsr/srt/encoder.py:475-479,594`);
            # SNoPCD attends over image tokens only (ca_no_pcd=True).
            q = Attention(self.heads, dim_head=64, qk_norm=True,
                          qkv_bias=False, dtype=self.dtype,
                          name="agg_ca")(q, tokens)
            for i in range(self.srt_depth):
                q = TransformerBlock(self.heads, qk_norm=True,
                                     act=exact_gelu, dtype=self.dtype,
                                     name=f"srt_{i}")(q)
        else:
            tokens = tokens + XYZPosEmbed(self.width, dtype=self.dtype)(
                tok_xyz)
            # one PE table for the pcd; queries are its values at the FPS
            # anchors (reference: query_pcd_h = masked_gather(pcd_h, fps_idx))
            anchor_embed = XYZPosEmbed(self.width, dtype=self.dtype,
                                       name="anchor_embed")
            pcd_h = anchor_embed(pcd)
            q = anchor_embed(anchors)
            # aggregate from BOTH the image tokens and the PE'd point cloud
            # (`nsr/srt/encoder.py:594-597` agg_ca(query, cat([h, pcd_h])))
            kv = jnp.concatenate([tokens, pcd_h], axis=1)
            q = CrossAttentionBlock(self.heads, qk_norm=True,
                                    dtype=self.dtype, name="agg_ca")(q, kv)
            for i in range(self.srt_depth):
                q = TransformerBlock(self.heads, dtype=self.dtype,
                                     name=f"srt_{i}")(q)
        q = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(q)
        latent = Mlp(self.width, out=2 * self.z_channels, dtype=self.dtype,
                     name="mlp_out")(q)
        return latent, anchors
