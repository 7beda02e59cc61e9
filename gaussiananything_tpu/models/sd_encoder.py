"""Release-parity SD conv encoder trunk (weight-compatible rewrite).

Faithful flax port of the reference's `ldm.modules.diffusionmodules.model.
Encoder` trunk as configured on the GaussianAnything release path
(`nsr/script_util.py:1425-1443`: ch=64, ch_mult (1,2,4,4), 1 res block,
attn_resolutions=[], attn_type='mv-vanilla', double_z) with the Hybrid
encoder's `conv_out = Identity` surgery (`nsr/srt/encoder.py:487`), so the
officially released VAE checkpoint `ckpts/vae/model_rec1965000.pt` can be
imported one-to-one (`utils/param_io.convert_gaussiananything_vae`).

Structure (torch param names in comments; flax names chosen so the
converter is a mechanical rename):
  conv_in                                  Conv2d(15, 64, 3, pad 1)
  down.{0..3}.block.0                      ResnetBlock (+ nin_shortcut at
                                           level 1, 2 where in != out)
  down.{0,1,2}.downsample.conv             3x3 stride-2, asymmetric pad
                                           (0,1,0,1) (`model.py:Downsample`)
  mid.block_1 / mid.attn_1 / mid.block_2   attn = SpatialTransformer3D
                                           (`ldm/modules/attention.py:721`)
  norm_out (+ silu; conv_out is Identity)

The mid attention is the multi-view ('mv-vanilla') one: inside each
`BasicTransformerBlock3D`, attn1 runs JOINTLY over all V views' tokens and
attn2 per-view (`ldm/modules/attention.py:706-719`), with 1x1 conv
proj_in/proj_out (zero-init out) around the block and a GEGLU FeedForward.

TPU-first notes: NHWC layout throughout (conv weights transposed at import
time); attention via `jax.nn.dot_product_attention`; everything static-
shape and jit-safe.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from gaussiananything_tpu.models.layers import Attention, GroupNorm32


def exact_gelu(x):
    """erf-based GELU (torch nn.GELU default; flax default is tanh-approx)."""
    return nn.gelu(x, approximate=False)


class SDResnetBlock(nn.Module):
    """`ResnetBlock` parity (`ldm/modules/diffusionmodules/model.py:469`
    with temb_channels=0, dropout=0): GN32 + silu + conv3x3, twice, with a
    1x1 nin_shortcut when channels change."""

    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = GroupNorm32(name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), dtype=self.dtype, name="conv1")(h)
        h = GroupNorm32(name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                        name="nin_shortcut")(x)
        return x + h


class SDDownsample(nn.Module):
    """`Downsample` parity: pad (0,1,0,1) then VALID 3x3 stride-2 conv."""

    ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.ch, (3, 3), strides=(2, 2), padding="VALID",
                       dtype=self.dtype, name="conv")(x)


class GEGLUFeedForward(nn.Module):
    """`FeedForward(glu=True)` parity: GEGLU proj (dim -> 2*4*dim) then
    Linear back (`ldm/modules/attention.py` GEGLU/FeedForward).
    torch names: net.0.proj, net.2."""

    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        inner = d * self.mult
        h = nn.Dense(2 * inner, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * exact_gelu(gate)
        return nn.Dense(d, dtype=self.dtype, name="out")(h)


class MVMidAttention(nn.Module):
    """`SpatialTransformer3D(in_ch, n_heads=8, d_head=64, depth=1)` parity.

    Input (B, V, h, w, C). attn1 attends jointly over all views' tokens;
    attn2 per view; GEGLU ff; residual around the whole module with a
    zero-init proj_out (`ldm/modules/attention.py:721-780`).
    """

    heads: int = 8
    dim_head: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, V, hh, ww, C = x.shape
        inner = self.heads * self.dim_head
        # GroupNorm statistics are PER VIEW (torch sees (B·V, C, h, w)) —
        # norm on the flattened view batch, not the (B, V, …) tensor, where
        # flax would pool statistics across views.
        h = GroupNorm32(name="norm")(x.reshape(B * V, hh, ww, C))
        h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(h)

        t = h.reshape(B, V * hh * ww, inner)
        t = t + Attention(self.heads, dim_head=self.dim_head, qkv_bias=False,
                          dtype=self.dtype, name="attn1")(
            nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(t))
        t = t.reshape(B * V, hh * ww, inner)
        t = t + Attention(self.heads, dim_head=self.dim_head, qkv_bias=False,
                          dtype=self.dtype, name="attn2")(
            nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(t))
        t = t + GEGLUFeedForward(dtype=self.dtype, name="ff")(
            nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm3")(t))

        t = nn.Dense(C, dtype=self.dtype, name="proj_out",
                     kernel_init=nn.initializers.zeros)(t)
        return x + t.reshape(B, V, hh, ww, C)


class SDEncoderTrunk(nn.Module):
    """Full release-parity trunk. Input (B, V, H, W, 15) NHWC; output
    (B, V, H/8, W/8, ch*ch_mult[-1]) = silu(norm_out(mid)) — the Hybrid
    encoder replaces conv_out with Identity (`nsr/srt/encoder.py:487`)."""

    ch: int = 64
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, V, H, W, C = x.shape
        h = x.reshape(B * V, H, W, C)
        h = nn.Conv(self.ch, (3, 3), dtype=self.dtype, name="conv_in")(h)
        for i, mult in enumerate(self.ch_mult):
            for j in range(self.num_res_blocks):
                h = SDResnetBlock(self.ch * mult, dtype=self.dtype,
                                  name=f"down_{i}_block_{j}")(h)
            if i < len(self.ch_mult) - 1:
                h = SDDownsample(h.shape[-1], dtype=self.dtype,
                                 name=f"down_{i}_downsample")(h)
        mid_ch = h.shape[-1]
        h = SDResnetBlock(mid_ch, dtype=self.dtype, name="mid_block_1")(h)
        hh, ww = h.shape[1], h.shape[2]
        h = MVMidAttention(dtype=self.dtype, name="mid_attn_1")(
            h.reshape(B, V, hh, ww, mid_ch))
        h = h.reshape(B * V, hh, ww, mid_ch)
        h = SDResnetBlock(mid_ch, dtype=self.dtype, name="mid_block_2")(h)
        h = GroupNorm32(name="norm_out")(h)
        h = nn.silu(h)
        return h.reshape(B, V, hh, ww, mid_ch)
