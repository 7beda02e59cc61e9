"""Faithful DINOv2 ViT (with registers) in flax — the release i23d image
conditioner backbone.

The reference conditions i23d generation on frozen torch-hub
``dinov2_vitl14_reg`` at 518 px with ``output_cls=True``
(`sgm/modules/encoders/modules.py:791-933`,
`sgm/configs/img23d-clipl-compat-fm-lognorm-480-uniform-clay-dinoonly.yaml`).
This module reproduces that architecture exactly — learned pos-embed with
bicubic grid interpolation, 4 register tokens inserted after the pos-add,
LayerScale residual gains, fused-qkv attention, pre-norm blocks — so a
converted torch checkpoint (see `utils/param_io.convert_dinov2`) computes the
same function. Param names mirror the torch module tree one-to-one:

  cls_token, pos_embed, register_tokens,
  patch_embed.proj ⇒ patch_embed (flax Conv),
  blocks.{i}.{norm1, attn.qkv, attn.proj, ls1.gamma, norm2,
             mlp.fc1, mlp.fc2, ls2.gamma},
  norm

Note: off-native input sizes interpolate the pos-embed bicubically;
jax.image.resize's cubic kernel (Keys a=-0.5) differs slightly from
torch's (a=-0.75) — exact parity holds at the checkpoint's native size
(518 px for the release weights), which is the release inference path.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class LayerScale(nn.Module):
    dim: int
    init: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.constant(self.init),
                           (self.dim,))
        return x * gamma


class Dinov2Attention(nn.Module):
    """Fused-qkv multi-head self-attention (dinov2 `layers/attention.py`)."""

    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, N, D = x.shape
        dh = self.dim // self.heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.heads, dh)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        o = jax.nn.dot_product_attention(q, k, v)
        o = o.reshape(B, N, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(o)


class Dinov2Block(nn.Module):
    dim: int
    heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        h = Dinov2Attention(self.dim, self.heads, dtype=self.dtype,
                            name="attn")(h)
        x = x + LayerScale(self.dim, name="ls1")(h)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="mlp.fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp.fc2")(h)
        return x + LayerScale(self.dim, name="ls2")(h)


def interpolate_pos_embed(pos: jnp.ndarray, grid: int) -> jnp.ndarray:
    """(1, 1+N0, D) learned pos-embed → (1, 1+grid², D); bicubic on the
    patch grid, cls position passed through (dinov2
    `vision_transformer.py:179-211` interpolate_pos_encoding)."""
    cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
    n0 = patch_pos.shape[1]
    g0 = int(round(n0 ** 0.5))
    assert g0 * g0 == n0, f"pos embed grid {n0} not square"
    if g0 == grid:
        return pos
    D = pos.shape[-1]
    p = patch_pos.reshape(1, g0, g0, D)
    p = jax.image.resize(p.astype(jnp.float32), (1, grid, grid, D), "bicubic")
    return jnp.concatenate([cls_pos, p.reshape(1, grid * grid, D)], axis=1)


class Dinov2ViT(nn.Module):
    """Returns (x_norm_patchtokens, x_norm_clstoken) like the torch model's
    is_training=True dict (`dinov2/models/vision_transformer.py:326`)."""

    patch: int = 14
    width: int = 1024
    depth: int = 24
    heads: int = 16
    num_registers: int = 4
    img_size: int = 518          # native size of the stored pos embed
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """images (B, 3, H, W), already imagenet-normalised."""
        B, _, H, W = images.shape
        assert H % self.patch == 0 and W % self.patch == 0
        x = jnp.moveaxis(images, 1, -1).astype(self.dtype)
        x = nn.Conv(self.width, (self.patch, self.patch),
                    strides=(self.patch, self.patch), dtype=self.dtype,
                    name="patch_embed")(x)
        grid = x.shape[1]
        x = x.reshape(B, -1, self.width)

        n0 = (self.img_size // self.patch) ** 2
        cls = self.param("cls_token", nn.initializers.normal(1e-6),
                         (1, 1, self.width))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, 1 + n0, self.width))
        reg = self.param("register_tokens", nn.initializers.normal(1e-6),
                         (1, self.num_registers, self.width))

        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, self.width)).astype(self.dtype), x],
            axis=1)
        x = x + interpolate_pos_embed(pos, grid).astype(self.dtype)
        # registers inserted AFTER the pos add (no positional encoding)
        x = jnp.concatenate(
            [x[:, :1],
             jnp.broadcast_to(reg, (B, self.num_registers, self.width)
                              ).astype(self.dtype),
             x[:, 1:]], axis=1)

        for i in range(self.depth):
            x = Dinov2Block(self.width, self.heads, dtype=self.dtype,
                            name=f"blocks.{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x)
        patch_tokens = x[:, 1 + self.num_registers:]
        cls_token = x[:, 0]
        return patch_tokens, cls_token


def dinov2_vitl14_reg(img_size: int = 518, dtype=jnp.float32) -> Dinov2ViT:
    return Dinov2ViT(patch=14, width=1024, depth=24, heads=16,
                     num_registers=4, img_size=img_size, dtype=dtype)


def dinov2_vits14_reg(img_size: int = 518, dtype=jnp.float32) -> Dinov2ViT:
    return Dinov2ViT(patch=14, width=384, depth=12, heads=6,
                     num_registers=4, img_size=img_size, dtype=dtype)
