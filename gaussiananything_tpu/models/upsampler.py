"""Cascaded gaussian super-resolution upsamplers.

Capability parity with `GS_Adaptive_Read_Write_CA_adaptive_2dgs`
(`vit/vit_triplane.py:426-1065`): per-anchor learnable f-token queries are
concatenated with the anchor feature, run through a small self-attention
transformer over each (f+1)-token group (`:821-830,1001-1037` — deliberately
factored into B·N independent length-(f+1) sequences to stay cheap), then a
pre-norm ZERO-INIT residual head produces 13-ch deltas (`:984-989`); children
gaussians = repeat(parent pre-activation, f) + residual, with xyz offsets
added to the parent xyz (`:1040-1058`).

The release decoder stacks three of these: f=8 (depth 2), f=4, f=3 (depth 1)
(`vit/vit_triplane.py:1332-1344,1616-1641`) giving 768→6144→24576→73728.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from gaussiananything_tpu.models.layers import (TransformerBlock,
                                                XYZPosEmbed, zero_init_dense)


class GaussianUpsampler(nn.Module):
    factor: int                      # children per parent
    depth: int = 1
    heads: int = 8
    # Weight-compatible release mode: no xyz-PE on the queries (the
    # reference's queries are the bare `latent_embedding` table,
    # `vit/vit_triplane.py:1001-1016`), SRT_TX semantics for the group
    # transformer (heads = D/64 = 12, qk-norm, exact-GELU MLP,
    # `vit/vit_triplane.py:824-830` + `nsr/srt/layers.py:146`).
    release_parity: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray, raw_gaussians: jnp.ndarray,
                 parent_xyz: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """feat (B, N, D) parent features; raw_gaussians (B, N, 13)
        pre-activation parent params; parent_xyz (B, N, 3) activated anchors.

        Returns (child_feat (B, N·f, D), child_raw (B, N·f, 13),
        child_anchor_xyz (B, N·f, 3)).
        """
        B, N, D = feat.shape
        f = self.factor
        queries = self.param("latent_embedding",
                             nn.initializers.normal(stddev=0.02),
                             (1, 1, f, D))
        q = jnp.broadcast_to(queries, (B, N, f, D)).astype(self.dtype)
        if self.release_parity:
            from gaussiananything_tpu.models.sd_encoder import exact_gelu
            heads, qk_norm, act = D // 64, True, exact_gelu
        else:
            # group queries carry the parent's xyz (extension; not in ref)
            q = q + XYZPosEmbed(D, dtype=self.dtype)(
                parent_xyz)[:, :, None, :]
            heads, qk_norm, act = self.heads, False, nn.gelu
        # group sequence: [anchor_feat, f queries] — self-attn within group
        grp = jnp.concatenate([feat[:, :, None, :], q], axis=2)  # (B,N,f+1,D)
        grp = grp.reshape(B * N, f + 1, D)
        for i in range(self.depth):
            grp = TransformerBlock(heads, qk_norm=qk_norm, act=act,
                                   dtype=self.dtype, name=f"tx_{i}")(grp)
        child_feat = grp[:, 1:, :].reshape(B, N * f, D)

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(child_feat)
        residual = zero_init_dense(13, dtype=self.dtype, name="res_head")(h)
        child_raw = jnp.repeat(raw_gaussians, f, axis=1) + residual
        # residual is returned so the caller can form xyz offsets from the
        # RESIDUAL alone — the reference's offsets = offset_act(residual[:3])
        # + repeated parent pos (`vit/vit_triplane.py:1044-1049`), while the
        # opacity/scale/rot/rgb channels activate from the SUMMED child_raw.
        return child_feat, child_raw, residual
