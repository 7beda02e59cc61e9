"""DiT2 latent-decoder backbone: inverted-conditioning DiT.

Capability parity with `dit/dit_decoder.py:19-152` (`DiT2`, `DiTBlock2`):
the model's input sequence x starts as a LEARNED positional query table
(1, K, width) repeated per batch (`dit/dit_decoder.py:109-110`,
re-initialised by `vae_3d.init_weights`, `vit/vit_triplane.py:1256-1262`);
the projected latent tokens act as PER-TOKEN adaLN conditioning: adaLN(c) is
chunked along the channel dim so each latent token modulates its own query
token (`modulate2`/`DiTBlock2.forward`, `dit/dit_decoder.py:15,19-35`).
No timestep/label embedders and no final layer (deleted, `:93-95`).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from gaussiananything_tpu.models.layers import Attention, Mlp


class DiTBlock2(nn.Module):
    heads: int
    mlp_ratio: float = 4.0
    qk_norm: bool = False
    exact_gelu: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c):
        d = x.shape[-1]
        act = (lambda t: nn.gelu(t, approximate=False)) if self.exact_gelu \
            else nn.gelu
        # per-token adaLN: c is (B, K, d) — six (B, K, d) modulation tensors
        mod = nn.Dense(6 * d, dtype=self.dtype, name="adaLN",
                       kernel_init=nn.initializers.zeros)(nn.silu(c))
        sh_a, sc_a, g_a, sh_m, sc_m, g_m = jnp.split(mod, 6, axis=-1)
        h = nn.LayerNorm(use_scale=False, use_bias=False,
                         dtype=jnp.float32)(x)
        h = h * (1 + sc_a) + sh_a
        x = x + g_a * Attention(self.heads, qk_norm=self.qk_norm,
                                dtype=self.dtype)(h)
        h = nn.LayerNorm(use_scale=False, use_bias=False,
                         dtype=jnp.float32)(x)
        h = h * (1 + sc_m) + sh_m
        x = x + g_m * Mlp(int(d * self.mlp_ratio), act=act,
                          dtype=self.dtype)(h)
        return x


class DiT2(nn.Module):
    """arch 'DiT2-B' defaults: depth 12, width 768, heads 12
    (`nsr/script_util.py:1512-1529` builds DiT2-B/2).

    `release_parity` reproduces the released checkpoint's exact forward
    (`dit/dit_decoder.py:103-160` with roll_out=True, plane_n=3,
    in_plane_attention=True, `nsr/script_util.py:1516-1529`): EVEN blocks
    attend within each of the 3 contiguous 256-token groups (the legacy
    "in-plane" split of the 768 latent tokens), ODD blocks globally; the
    reference qk-norms attention (RMSNorm over head_dim), uses exact GELU
    MLPs, and applies NO final norm after the blocks.
    """

    num_tokens: int = 768
    width: int = 768
    depth: int = 12
    heads: int = 12
    release_parity: bool = False
    plane_n: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, c):
        """c: (B, K, width) projected latent tokens -> (B, K, width)."""
        B = c.shape[0]
        pos = self.param(
            "query_pos_embed",
            nn.initializers.normal(stddev=0.02),
            (1, self.num_tokens, self.width))
        x = jnp.broadcast_to(pos, (B, self.num_tokens, self.width)
                             ).astype(self.dtype)
        for i in range(self.depth):
            blk = DiTBlock2(self.heads, qk_norm=self.release_parity,
                            exact_gelu=self.release_parity,
                            dtype=self.dtype, name=f"block_{i}")
            if self.release_parity and i % 2 == 0:
                n = self.plane_n
                grp = lambda t: t.reshape(B * n, self.num_tokens // n,  # noqa: E731
                                          self.width)
                x = grp(x)
                x = blk(x, grp(c)).reshape(B, self.num_tokens, self.width)
            else:
                x = blk(x, c)
        if self.release_parity:
            return x
        return nn.LayerNorm(dtype=jnp.float32)(x).astype(self.dtype)
