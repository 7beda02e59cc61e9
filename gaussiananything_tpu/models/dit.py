"""Flow-matching point-cloud DiT denoisers (stage-1 geometry, stage-2
texture, text-conditioned).

Capability parity:
  * stage-1 `DiT-PixArt-PCD-CLAY-L` = `DiT_I23D_PCD_PixelArt_noclip`
    (`dit/dit_i23d.py:437,1516-1524`): x_embedder is an MLP on the raw
    768×3 point tokens (no patchify/pos-embed, `:472-477`); t-embedding +
    pooled image vector feed ONE shared adaLN (`:501-509,544-545`); every
    block cross-attends to the image tokens.
  * stage-2 `…_clay_stage2` (`dit/dit_i23d.py:664`): denoises 768×10 KL
    tokens; stage-1 xyz is injected as `XYZPosEmbed(fps-xyz)` added to the
    x-embedding (use_pe_cond, `:697-705,735-740`).
  * CLAY-LRM block (`dit/dit_models_xformers.py:717-787`): pre-norm CA to
    cond tokens → adaLN-gated qk-norm self-attn → adaLN-gated MLP, with a
    per-block `scale_shift_table` added to the shared adaLN signal
    (t2i_modulate), RMSNorm variants.
  * text variant = same trunk with caption tokens as cond
    (`dit/dit_trilatent.py:262`).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from gaussiananything_tpu.models.layers import (Attention, Mlp,
                                                TimestepEmbedder, XYZPosEmbed,
                                                zero_init_dense)


class ClayDiTBlock(nn.Module):
    """CLAY-LRM CA→SA→FFN block (`ImageCondDiTBlockPixelArtRMSNormClayLRM`,
    `dit/dit_models_xformers.py:717-787`).

    `release_parity` pins the released checkpoints' exact semantics: the
    cross-attention is the reference's bias-less qk-normed MECA over RAW
    conditioner tokens (`dit/dit_models_xformers.py:740-747`) and the MLP
    uses exact (erf) GELU like xformers FusedMLP. RMSNorms are eps 1e-5
    affine in both modes (`dit/norm.py:12`).
    """

    heads: int
    mlp_ratio: float = 4.0
    release_parity: bool = False
    # "clay": CA→SA→FFN, the i23d release blocks; "text": SA→CA→FFN with a
    # per-block context RMSNorm, the t23d release blocks
    # (`PixelArtTextCondDiTBlock`, `dit/dit_models_xformers.py:329-376`).
    variant: str = "clay"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond_tokens, ada):
        """x (B,N,D); cond_tokens (B,L,C); ada (B, 6, D) shared adaLN."""
        d = x.shape[-1]
        table = self.param("scale_shift_table",
                           nn.initializers.normal(stddev=0.02 / d ** 0.5),
                           (6, d))
        mod = ada + table[None]
        sh_a, sc_a, g_a, sh_m, sc_m, g_m = [mod[:, i][:, None, :]
                                            for i in range(6)]
        if self.release_parity:
            act = (lambda t: nn.gelu(t, approximate=False))
            # CLAY CA: dim_head = hidden/heads (`:746`); text CA: MECA
            # default dim_head 64 (`:346-347`) — equal in every release size
            dh = d // self.heads if self.variant == "clay" else 64
            ca_kw = dict(qk_norm=True, qkv_bias=False, dim_head=dh)
        else:
            act = nn.gelu
            ca_kw = {}

        def cross_attn(h):
            ctx = cond_tokens
            if self.release_parity and self.variant == "text":
                # the text block RMS-normalises the CONTEXT tokens too
                # (`attention_y_norm`, `:351-353,371`)
                ctx = nn.RMSNorm(epsilon=1e-5, dtype=jnp.float32,
                                 name="attention_y_norm")(ctx)
            return Attention(self.heads, dtype=self.dtype,
                             name="cross_attn", **ca_kw)(
                nn.RMSNorm(epsilon=1e-5, dtype=jnp.float32,
                           name="prenorm_ca")(h), ctx)

        def self_attn(h):
            m = nn.RMSNorm(epsilon=1e-5, dtype=jnp.float32,
                           name="norm1")(h) * (1 + sc_a) + sh_a
            return g_a * Attention(self.heads, qk_norm=True,
                                   dtype=self.dtype, name="self_attn")(m)

        if self.variant == "text":
            x = x + self_attn(x)
            x = x + cross_attn(x)
        else:
            x = x + cross_attn(x)
            x = x + self_attn(x)
        h = nn.RMSNorm(epsilon=1e-5, dtype=jnp.float32,
                       name="norm2")(x) * (1 + sc_m) + sh_m
        x = x + g_m * Mlp(int(d * self.mlp_ratio), act=act,
                          dtype=self.dtype)(h)
        return x


class PointDiT(nn.Module):
    """Point-token flow-matching DiT trunk.

    sizes (reference `-L`): depth 24, width 1024, heads 16
    (`dit/dit_i23d.py:1516-1524`).
    """

    in_channels: int = 3
    width: int = 1024
    depth: int = 24
    heads: int = 16
    cond_dim: int = 1024         # conditioner token width
    vector_dim: int = 1024       # pooled conditioner vector width
    use_xyz_pe: bool = False     # stage-2: add XYZPosEmbed(fps-xyz)
    # Weight-compatible release mode for importing the official stage-1/2
    # flow-matching checkpoints (`checkpoints/i23d/stage-1/model_*.pt`) via
    # `utils/param_io.convert_gaussiananything_dit`, reproducing
    # `DiT_I23D_PCD_PixelArt_noclip[_clay_stage2]` exactly
    # (`dit/dit_i23d.py:437-567,664-753`): raw t (the reference embeds
    # t∈[0,1] directly, no ×1000), LayerNorm+zero-Linear pooled-vector
    # embedder, NO conditioner-token projection (blocks cross-attend the
    # raw DINO tokens), T2I final layer (per-model (2,D) table added to the
    # t-embedding, no-affine LayerNorm eps 1e-6).
    release_parity: bool = False
    variant: str = "clay"        # see ClayDiTBlock.variant
    dtype: jnp.dtype = jnp.float32
    # Rematerialise each block in the backward: without it, 24 blocks of
    # stored activations (incl. fp32 attention scores) need ~62 GB at
    # batch 32 — the reference trains batch 32/GPU on 80 GB A100s with
    # this much headroom; on 16 GB v5e remat is what makes release-batch
    # flow-matching training fit (the usual FLOPs-for-HBM trade).
    remat: bool = False

    @nn.compact
    def __call__(self, x, t, cond_tokens, cond_vector,
                 xyz: Optional[jnp.ndarray] = None):
        """x (B, N, in_channels); t (B,) in [0,1];
        cond_tokens (B, L, cond_dim); cond_vector (B, vector_dim);
        xyz (B, N, 3) stage-1 geometry for stage-2 conditioning.

        Returns the velocity field, (B, N, in_channels), fp32.
        """
        d = self.width
        h = Mlp(d, out=d, dtype=self.dtype, name="x_embedder")(
            x.astype(self.dtype))
        if self.use_xyz_pe:
            assert xyz is not None, "stage-2 trunk needs fps-xyz conditioning"
            h = h + XYZPosEmbed(d, dtype=self.dtype, name="xyz_pe")(xyz)

        t_emb = TimestepEmbedder(d, dtype=self.dtype, name="t_embedder")(
            t if self.release_parity else t * 1000.0)
        if self.release_parity:
            vec = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                               name="pooled_vec_ln")(cond_vector)
            vec = nn.Dense(d, dtype=self.dtype, name="vector_proj",
                           kernel_init=nn.initializers.zeros)(vec)
        else:
            vec = nn.Dense(d, dtype=self.dtype,
                           name="vector_proj")(cond_vector)
        ada = nn.Dense(6 * d, dtype=self.dtype, name="shared_adaln",
                       kernel_init=nn.initializers.zeros)(
                           nn.silu(t_emb + vec))
        ada = ada.reshape(ada.shape[0], 6, d)

        if self.release_parity:
            ctx = cond_tokens.astype(self.dtype)
        else:
            ctx = nn.Dense(d, dtype=self.dtype, name="cond_proj")(
                cond_tokens.astype(self.dtype))
        block_cls = nn.remat(ClayDiTBlock) if self.remat else ClayDiTBlock
        for i in range(self.depth):
            h = block_cls(self.heads, release_parity=self.release_parity,
                          variant=self.variant, dtype=self.dtype,
                          name=f"block_{i}")(h, ctx, ada)

        # T2I final layer: shift/scale from t, zero-init output projection
        # (`dit/dit_models_xformers.py:62-85`); output cast fp32
        # (`dit/dit_i23d.py:565`).
        fin = self.param("final_scale_shift",
                         nn.initializers.normal(stddev=0.02 / d ** 0.5),
                         (2, d))
        if self.release_parity:
            # shift/scale = table + the COMBINED conditioning embedding
            # (t_emb + pooled vector — `dit/dit_i23d.py:544,563`
            # `final_layer(x, t)` with t = t_embedder + pooled_vec_embedder;
            # `T2IFinalLayer.forward`, no extra projection)
            t2 = fin[None] + (t_emb + vec)[:, None, :]
            sh, sc = t2[:, 0][:, None, :], t2[:, 1][:, None, :]
            h = nn.LayerNorm(use_scale=False, use_bias=False, epsilon=1e-6,
                             dtype=jnp.float32)(h) * (1 + sc) + sh
        else:
            t2 = nn.Dense(2 * d, dtype=self.dtype, name="final_adaln",
                          kernel_init=nn.initializers.zeros)(nn.silu(t_emb))
            t2 = t2.reshape(t2.shape[0], 2, d) + fin[None]
            sh, sc = t2[:, 0][:, None, :], t2[:, 1][:, None, :]
            h = nn.RMSNorm(epsilon=1e-5, dtype=jnp.float32)(h) * (1 + sc) + sh
        out = zero_init_dense(self.in_channels, dtype=self.dtype,
                              name="final_proj")(h)
        return out.astype(jnp.float32)


def stage1_dit(size: str = "L", **kw) -> PointDiT:
    cfg = {"L": dict(depth=24, width=1024, heads=16),
           "B": dict(depth=12, width=768, heads=12),
           "S": dict(depth=6, width=384, heads=6)}[size]
    cfg.update(kw)
    return PointDiT(in_channels=3, use_xyz_pe=False, **cfg)


def stage2_dit(size: str = "L", z_channels: int = 10, **kw) -> PointDiT:
    cfg = {"L": dict(depth=24, width=1024, heads=16),
           "B": dict(depth=12, width=768, heads=12),
           "S": dict(depth=6, width=384, heads=6)}[size]
    cfg.update(kw)
    return PointDiT(in_channels=z_channels, use_xyz_pe=True, **cfg)


def stage1_dit_release(**kw) -> PointDiT:
    """The released `DiT-PixArt-PCD-CLAY-L` stage-1 geometry denoiser
    (`dit/dit_i23d.py:1516-1524`; i23d-stage1.sh: in 3, context 1024)."""
    cfg = dict(depth=24, width=1024, heads=16, cond_dim=1024,
               vector_dim=1024)
    cfg.update(kw)
    return PointDiT(in_channels=3, use_xyz_pe=False, release_parity=True,
                    **cfg)


def stage2_dit_release(**kw) -> PointDiT:
    """The released `DiT-PixArt-PCD-CLAY-stage2-L` texture denoiser
    (`dit/dit_i23d.py:1546-1554`; i23d-stage2.sh: in 10, use_pe_cond)."""
    cfg = dict(depth=24, width=1024, heads=16, cond_dim=1024,
               vector_dim=1024)
    cfg.update(kw)
    return PointDiT(in_channels=10, use_xyz_pe=True, release_parity=True,
                    **cfg)


def t23d_stage1_dit_release(**kw) -> PointDiT:
    """The released t23d `DiT-PCD-L` geometry denoiser
    (`dit/dit_trilatent.py:262,519`; stage1-t23d.sh: in 3, CLIP text
    context 768)."""
    cfg = dict(depth=24, width=1024, heads=16, cond_dim=768,
               vector_dim=768)
    cfg.update(kw)
    return PointDiT(in_channels=3, use_xyz_pe=False, release_parity=True,
                    variant="text", **cfg)


def t23d_stage2_dit_release(**kw) -> PointDiT:
    """The released t23d `DiT-PCD-L-stage2-xyz2feat` texture denoiser
    (`dit/dit_trilatent.py:335,509`; stage2-t23d.sh: in 10, use_pe_cond)."""
    cfg = dict(depth=24, width=1024, heads=16, cond_dim=768,
               vector_dim=768)
    cfg.update(kw)
    return PointDiT(in_channels=10, use_xyz_pe=True, release_parity=True,
                    variant="text", **cfg)
