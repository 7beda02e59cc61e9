"""Shared neural-net building blocks (flax.linen), bf16-friendly.

Design notes (TPU-first):
  * Attention uses `jax.nn.dot_product_attention` — XLA emits a fused
    flash-style kernel on TPU; replaces xformers `memory_efficient_attention`
    (`vit/vision_transformer.py:54-57`, `ldm/modules/attention.py:376-419`).
  * "FusedMLP" needs no custom kernel: XLA fuses the gelu chain into the
    surrounding matmuls.
  * Norms/softmax accumulate fp32 even under bf16 params.
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# Above this many score-matrix elements per (batch, head), attention is
# computed in query blocks (exact same math, lax.scan + remat) instead of
# one materialised (T, S) matrix. 16k-token joint-view encoder attention at
# 512² otherwise allocates 2× f32[B·H, 16384, 16384] = 16 GB in the train
# step (measured OOM on v5e); xformers' memory_efficient_attention plays
# this role in the reference (`ldm/modules/attention.py:376-419`).
_SCORES_BLOCK_THRESHOLD = 4096 * 4096
_QUERY_BLOCK = 2048


def _blocked_attention(q, k, v):
    """Exact attention, scanned over query blocks. q,k,v: (B, T/S, H, D)."""
    B, T, H, D = q.shape
    S = k.shape[1]
    scale = 1.0 / math.sqrt(D)
    qb = _QUERY_BLOCK
    pad = (-T) % qb
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
    n_blocks = q.shape[1] // qb
    qs = q.reshape(B, n_blocks, qb, H, D).transpose(1, 0, 2, 3, 4)

    @jax.checkpoint
    def block(q_blk):
        # (B, qb, H, D) @ (B, S, H, D) → (B, H, qb, S), fp32 softmax
        s = jnp.einsum("bqhd,bshd->bhqs", q_blk, k,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqs,bshd->bqhd", p.astype(v.dtype), v,
                          preferred_element_type=jnp.float32
                          ).astype(q_blk.dtype)

    out = jax.lax.map(block, qs)                   # (n_blocks, B, qb, H, D)
    out = out.transpose(1, 0, 2, 3, 4).reshape(B, n_blocks * qb, H, D)
    return out[:, :T]


def dot_attention(q, k, v, dtype=None):
    """q,k,v: (B, T, H, D). fp32 accumulation, bf16 in/out friendly.

    Long sequences route through `_blocked_attention` (O(T·qb) score
    memory); short ones through `jax.nn.dot_product_attention`, whose XLA
    lowering materialises (T, S) scores but fuses best at DiT-scale.
    """
    if q.shape[1] * k.shape[1] > _SCORES_BLOCK_THRESHOLD:
        return _blocked_attention(q, k, v)
    return jax.nn.dot_product_attention(q, k, v)


class Mlp(nn.Module):
    hidden: int
    out: Optional[int] = None
    act: Callable = nn.gelu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d_out = self.out or x.shape[-1]
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = self.act(x)
        return nn.Dense(d_out, dtype=self.dtype)(x)


class Attention(nn.Module):
    """Multi-head attention, optional cross inputs and qk-RMS-norm.

    qk_norm parity with the reference's encoder CA (`nsr/srt/encoder.py:475`)
    and CLAY DiT blocks (`dit/dit_models_xformers.py:717-759`).
    """

    heads: int
    dim_head: Optional[int] = None
    qk_norm: bool = False
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        d = x.shape[-1]
        dh = self.dim_head or d // self.heads
        inner = dh * self.heads
        q = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype,
                     name="to_q")(x)
        k = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype,
                     name="to_k")(context)
        v = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype,
                     name="to_v")(context)

        def split(t):
            return t.reshape(t.shape[:-1] + (self.heads, dh))

        q, k, v = split(q), split(k), split(v)
        if self.qk_norm:
            # eps 1e-5 parity with the reference RMSNorm (`dit/norm.py:12`)
            q = nn.RMSNorm(epsilon=1e-5, dtype=jnp.float32, name="q_norm")(q)
            k = nn.RMSNorm(epsilon=1e-5, dtype=jnp.float32, name="k_norm")(k)
        o = dot_attention(q.astype(self.dtype), k.astype(self.dtype),
                          v.astype(self.dtype))
        o = o.reshape(o.shape[:-2] + (inner,))
        return nn.Dense(d, dtype=self.dtype, name="to_out")(o)


class TransformerBlock(nn.Module):
    """Pre-norm self-attention block (SRT style, `nsr/srt/layers.py:146`)."""

    heads: int
    mlp_ratio: float = 4.0
    qk_norm: bool = False
    act: Callable = nn.gelu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # eps 1e-5 = torch nn.LayerNorm default (PreNorm, `nsr/srt/layers.py`)
        d = x.shape[-1]
        x = x + Attention(self.heads, qk_norm=self.qk_norm, dtype=self.dtype)(
            nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(x))
        x = x + Mlp(int(d * self.mlp_ratio), act=self.act, dtype=self.dtype)(
            nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(x))
        return x


class CrossAttentionBlock(nn.Module):
    """Pre-norm cross-attention + MLP (reader/writer CA,
    `nsr/srt/encoder.py:475-494`)."""

    heads: int
    mlp_ratio: float = 4.0
    qk_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_tokens, kv_tokens):
        d = q_tokens.shape[-1]
        q_tokens = q_tokens + Attention(
            self.heads, qk_norm=self.qk_norm, dtype=self.dtype)(
                nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(q_tokens),
                nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(kv_tokens))
        q_tokens = q_tokens + Mlp(int(d * self.mlp_ratio), dtype=self.dtype)(
            nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(q_tokens))
        return q_tokens


def fourier_embed(x: jnp.ndarray, multires: int = 10,
                  include_input: bool = True) -> jnp.ndarray:
    """NeRF positional encoding: sin/cos at 2^k frequencies.

    Output dim = in_dim * (2*multires + include_input). Parity with
    `get_embedder(10)` used by `XYZPosEmbed` (`vit/vit_triplane.py:187-230`).
    """
    freqs = 2.0 ** jnp.arange(multires, dtype=jnp.float32)
    xb = x[..., None, :] * freqs[:, None]                # (..., L, D)
    enc = jnp.concatenate([jnp.sin(xb), jnp.cos(xb)], axis=-1)
    enc = enc.reshape(x.shape[:-1] + (-1,))
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


class XYZPosEmbed(nn.Module):
    """Fourier-encode xyz then linear-project to width
    (`vit/vit_triplane.py:187`, MCC-style)."""

    embed_dim: int
    multires: int = 10
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz):
        return nn.Dense(self.embed_dim, dtype=self.dtype)(
            fourier_embed(xyz, self.multires).astype(self.dtype))


class TimestepEmbedder(nn.Module):
    """Sinusoidal timestep embedding + 2-layer MLP
    (`dit/dit_models_xformers.py:88`)."""

    hidden: int
    freq_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t):
        half = self.freq_dim // 2
        freqs = jnp.exp(-math.log(10000) * jnp.arange(half, dtype=jnp.float32)
                        / half)
        args = t.astype(jnp.float32)[..., None] * freqs
        emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], -1)
        emb = nn.Dense(self.hidden, dtype=self.dtype)(emb.astype(self.dtype))
        emb = nn.silu(emb)
        return nn.Dense(self.hidden, dtype=self.dtype)(emb)


def modulate(x, shift, scale):
    return x * (1 + scale) + shift


def get_2d_sincos_pos_embed(dim: int, grid: int) -> np.ndarray:
    """Standard DiT 2D sin-cos positional table, (grid*grid, dim)."""
    def _1d(d, pos):
        omega = np.arange(d // 2, dtype=np.float64) / (d / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("m,d->md", pos, omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    g = np.arange(grid, dtype=np.float32)
    gy, gx = np.meshgrid(g, g, indexing="ij")
    emb = np.concatenate(
        [_1d(dim // 2, gy.reshape(-1)), _1d(dim // 2, gx.reshape(-1))], axis=1)
    return emb.astype(np.float32)


class GroupNorm32(nn.Module):
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=min(self.groups, x.shape[-1]),
                            dtype=jnp.float32)(x)


class ResBlock(nn.Module):
    """SD-encoder residual conv block (GN + SiLU + 3x3), NHWC."""

    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = GroupNorm32()(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), dtype=self.dtype)(h)
        h = GroupNorm32()(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), dtype=self.dtype)(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype)(x)
        return x + h


def zero_init_dense(out: int, dtype=jnp.float32, name=None):
    return nn.Dense(out, kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, dtype=dtype, name=name)
