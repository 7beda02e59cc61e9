"""Conditioning stack: image ViT embedder, text embedder, GeneralConditioner.

Capability parity with sgm's `GeneralConditioner`
(`sgm/modules/encoders/modules.py:80-195`): a list of embedders, each with a
`ucg_rate` classifier-free-guidance dropout (per-sample Bernoulli zeroing,
`:159-166`); outputs are routed by key into `crossattn` (token sequences) and
`vector` (pooled) slots; `get_unconditional_conditioning` zeroes the
embeddings for the uncond branch (`:176-195`).

The reference conditions on frozen torch-hub DINOv2 ViT-L/14-reg @518 (image)
and OpenCLIP ViT-L text (`:791-933`; yaml configs in `sgm/configs/`). Those
pretrained weights cannot be downloaded here, so the TPU build ships its own
flax ViT/text-transformer with the same interface; weights may be trained
from scratch or loaded from a converted checkpoint (`params_path`).
"""
from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gaussiananything_tpu.data.postprocess import (IMAGENET_MEAN,
                                                   IMAGENET_STD)
from gaussiananything_tpu.models.layers import (TransformerBlock,
                                                get_2d_sincos_pos_embed)


class VisionTransformer(nn.Module):
    """DINOv2-style ViT with register tokens: returns (tokens, pooled_cls)."""

    patch: int = 14
    width: int = 1024
    depth: int = 24
    heads: int = 16
    num_registers: int = 4
    img_size: int = 224
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        """images (B, 3, H, W) in [0,1] (imagenet-normalised by caller or
        raw — the embedder normalises)."""
        B = images.shape[0]
        x = jnp.moveaxis(images, 1, -1)
        mean = jnp.asarray(IMAGENET_MEAN)
        std = jnp.asarray(IMAGENET_STD)
        x = (x - mean) / std
        x = nn.Conv(self.width, (self.patch, self.patch),
                    strides=(self.patch, self.patch), dtype=self.dtype,
                    name="patch_embed")(x)
        g = x.shape[1]
        x = x.reshape(B, -1, self.width)
        pos = get_2d_sincos_pos_embed(self.width, g)
        x = x + jnp.asarray(pos)[None].astype(self.dtype)
        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, self.width))
        reg = self.param("reg_tokens", nn.initializers.normal(0.02),
                         (1, self.num_registers, self.width))
        x = jnp.concatenate([
            jnp.broadcast_to(cls, (B, 1, self.width)).astype(self.dtype),
            jnp.broadcast_to(reg, (B, self.num_registers, self.width)
                             ).astype(self.dtype), x], axis=1)
        for i in range(self.depth):
            x = TransformerBlock(self.heads, dtype=self.dtype,
                                 name=f"block_{i}")(x)
        x = nn.LayerNorm(dtype=jnp.float32)(x)
        return x, x[:, 0]


class TextTransformer(nn.Module):
    """Byte-tokenised text encoder (CLIP-like interface)."""

    vocab: int = 257          # bytes + pad
    width: int = 768
    depth: int = 12
    heads: int = 12
    max_len: int = 77
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, token_ids: jnp.ndarray):
        """token_ids (B, max_len) int32 → (tokens (B,L,width), pooled)."""
        emb = nn.Embed(self.vocab, self.width, dtype=self.dtype)(token_ids)
        pos = self.param("pos", nn.initializers.normal(0.01),
                         (1, self.max_len, self.width))
        x = emb + pos.astype(self.dtype)
        for i in range(self.depth):
            x = TransformerBlock(self.heads, dtype=self.dtype,
                                 name=f"block_{i}")(x)
        x = nn.LayerNorm(dtype=jnp.float32)(x)
        mask = (token_ids > 0).astype(jnp.float32)[..., None]
        pooled = jnp.sum(x * mask, 1) / jnp.maximum(jnp.sum(mask, 1), 1.0)
        return x, pooled


def tokenize_bytes(texts: Sequence[str], max_len: int = 77) -> np.ndarray:
    out = np.zeros((len(texts), max_len), np.int32)
    for i, t in enumerate(texts):
        b = t.encode("utf-8")[: max_len]
        out[i, : len(b)] = np.frombuffer(b, np.uint8).astype(np.int32) + 1
    return out


class Conditioning(NamedTuple):
    crossattn: jnp.ndarray   # (B, L, D) token context
    vector: jnp.ndarray      # (B, D) pooled context


class ImageConditioner(nn.Module):
    """DINOv2-equivalent image conditioner: cls+patch tokens as crossattn,
    cls as vector (FrozenDinov2ImageEmbedder parity,
    `sgm/modules/encoders/modules.py:791-933`).

    `backbone="scratch"` uses the in-repo trainable ViT;
    `backbone="dinov2"` uses the faithful `models/dinov2.Dinov2ViT`
    architecture (fused qkv, LayerScale, learned interp pos-embed) so
    converted torch-hub `dinov2_vitl14_reg` weights
    (`utils/param_io.convert_dinov2`) compute the reference function —
    the release i23d conditioning path.
    """

    width: int = 1024
    depth: int = 24
    heads: int = 16
    img_size: int = 224
    ucg_rate: float = 0.1
    backbone: str = "scratch"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, rng: Optional[jax.Array] = None,
                 train: bool = False) -> Conditioning:
        if self.backbone == "dinov2":
            from gaussiananything_tpu.models.dinov2 import Dinov2ViT
            if images.shape[-1] != self.img_size:
                # the reference bicubic-resizes ANY input to inp_size
                # (modules.py:863-875 kornia resize 518)
                images = jax.image.resize(
                    images, images.shape[:2] + (self.img_size,) * 2,
                    method="cubic")
            x = jnp.moveaxis(images, 1, -1)
            mean = jnp.asarray(IMAGENET_MEAN)
            std = jnp.asarray(IMAGENET_STD)
            x = jnp.moveaxis((x - mean) / std, -1, 1)
            patch_tokens, cls_tok = Dinov2ViT(
                width=self.width, depth=self.depth, heads=self.heads,
                img_size=self.img_size, dtype=self.dtype, name="vit")(x)
            # release semantics (output_cls=True, modules.py:896-931):
            # crossattn = x_norm_patchtokens ONLY; vector = cls token
            tokens = patch_tokens
            pooled = cls_tok
        else:
            tokens, pooled = VisionTransformer(
                width=self.width, depth=self.depth, heads=self.heads,
                img_size=self.img_size, dtype=self.dtype, name="vit")(images)
        if train and self.ucg_rate > 0 and rng is not None:
            keep = jax.random.bernoulli(
                rng, 1.0 - self.ucg_rate, (images.shape[0], 1, 1))
            tokens = tokens * keep
            pooled = pooled * keep[:, 0]
        return Conditioning(crossattn=tokens, vector=pooled)

    def unconditional(self, batch: int) -> Conditioning:
        n_extra = 1 + 4 if self.backbone == "scratch" else 0
        L = (self.img_size // 14) ** 2 + n_extra
        return Conditioning(
            crossattn=jnp.zeros((batch, L, self.width), jnp.float32),
            vector=jnp.zeros((batch, self.width), jnp.float32))


class TextConditioner(nn.Module):
    """CLIP-text-equivalent conditioner (FrozenOpenCLIPEmbedder2 parity).

    `backbone="bytes"` is the in-repo trainable byte-token transformer;
    `backbone="openclip"` is the faithful causal CLIP ViT-L/14 text tower
    (`models/openclip_text.OpenClipTextTower`) for converted 'openai'
    checkpoints (`utils/param_io.convert_openclip_text`) — pair it with
    `openclip_text.ClipBPETokenizer` ids.
    """

    width: int = 768
    depth: int = 12
    heads: int = 12
    max_len: int = 77
    ucg_rate: float = 0.1
    backbone: str = "bytes"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, token_ids, rng: Optional[jax.Array] = None,
                 train: bool = False) -> Conditioning:
        if self.backbone == "openclip":
            from gaussiananything_tpu.models.openclip_text import \
                OpenClipTextTower
            tokens, pooled = OpenClipTextTower(
                width=self.width, depth=self.depth, heads=self.heads,
                max_len=self.max_len, embed_dim=self.width,
                dtype=self.dtype, name="text")(token_ids)
        else:
            tokens, pooled = TextTransformer(
                width=self.width, depth=self.depth, heads=self.heads,
                max_len=self.max_len, dtype=self.dtype,
                name="text")(token_ids)
        if train and self.ucg_rate > 0 and rng is not None:
            keep = jax.random.bernoulli(
                rng, 1.0 - self.ucg_rate, (token_ids.shape[0], 1, 1))
            tokens = tokens * keep
            pooled = pooled * keep[:, 0]
        return Conditioning(crossattn=tokens, vector=pooled)

    def unconditional(self, batch: int) -> Conditioning:
        return Conditioning(
            crossattn=jnp.zeros((batch, self.max_len, self.width)),
            vector=jnp.zeros((batch, self.width)))
