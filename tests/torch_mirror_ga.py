"""Torch mirrors of the reference release-VAE modules (test-only).

These re-implement the SEMANTICS of the modules making up the official
GaussianAnything VAE checkpoint (`ckpts/vae/model_rec1965000.pt`) in plain
torch, with the EXACT state-dict key layout of the reference classes
(`nsr/srt/encoder.py:648` HybridEncoderPCDStructuredLatentSNoPCD,
`vit/vit_triplane.py:1594` pcd_structured_latent_space_vae_decoder_cascaded,
`dit/dit_decoder.py:53` DiT2, `nsr/srt/layers.py:146` Transformer,
`ldm/modules/attention.py:721` SpatialTransformer3D). xformers
memory-efficient attention is replaced by exact softmax attention (same
math); xformers FusedMLP by Linear(+fused-bias activation) Sequentials with
the FusedMLP key layout (`mlp.0.weight`, `mlp.1.bias`, `mlp.2.weight`,
`mlp.3.bias`).

Used by tests/test_release_import.py to (a) synthesize a checkpoint with
the true reference parameter names and (b) produce golden activations that
the converted flax model must reproduce.
"""
from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def approx_gelu(x):
    return F.gelu(x, approximate="tanh")


class RMSNorm(nn.Module):
    """`dit/norm.py:11` parity (eps 1e-5, affine weight)."""

    def __init__(self, dim, eps=1e-5):
        super().__init__()
        self.eps = eps
        self.weight = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        var = x.float().pow(2).mean(-1, keepdim=True)
        return (x * torch.rsqrt(var + self.eps)) * self.weight


def sdpa(q, k, v, heads):
    """Plain softmax attention over (B, T, H*Dh) tensors."""
    B, Tq, D = q.shape
    Tk = k.shape[1]
    dh = D // heads

    def split(t, T):
        return t.reshape(B, T, heads, dh).permute(0, 2, 1, 3)

    q, k, v = split(q, Tq), split(k, Tk), split(v, Tk)
    a = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(dh), dim=-1)
    o = (a @ v).permute(0, 2, 1, 3).reshape(B, Tq, D)
    return o


class PackedAttention(nn.Module):
    """vit `Attention`/`MemEffAttention` mirror: packed qkv (+bias),
    head-dim RMS q/k norms, out proj."""

    def __init__(self, dim, num_heads, qkv_bias=True, qk_norm=True):
        super().__init__()
        self.num_heads = num_heads
        self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
        dh = dim // num_heads
        self.q_norm = RMSNorm(dh) if qk_norm else nn.Identity()
        self.k_norm = RMSNorm(dh) if qk_norm else nn.Identity()
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, T, D = x.shape
        qkv = self.qkv(x).reshape(B, T, 3, self.num_heads, D // self.num_heads)
        q, k, v = qkv.unbind(2)
        q, k = self.q_norm(q), self.k_norm(k)
        q = q.reshape(B, T, D)
        k = k.reshape(B, T, D)
        v = v.reshape(B, T, D)
        return self.proj(sdpa(q, k, v, self.num_heads))


class _FusedBiasAct(nn.Module):
    """xformers FusedDropoutBias stand-in: owns the bias of the preceding
    bias-less Linear, then optional exact GELU."""

    def __init__(self, dim, act):
        super().__init__()
        self.bias = nn.Parameter(torch.zeros(dim))
        self.act = act

    def forward(self, x):
        x = x + self.bias
        return F.gelu(x) if self.act else x


class FusedMLP(nn.Module):
    """xformers `fused_mlp.FusedMLP` key-layout mirror (exact GELU)."""

    def __init__(self, dim, hidden):
        super().__init__()
        self.mlp = nn.Sequential(
            nn.Linear(dim, hidden, bias=False), _FusedBiasAct(hidden, True),
            nn.Linear(hidden, dim, bias=False), _FusedBiasAct(dim, False))

    def forward(self, x):
        return self.mlp(x)


class PreNorm(nn.Module):
    def __init__(self, dim, fn):
        super().__init__()
        self.norm = nn.LayerNorm(dim)
        self.fn = fn

    def forward(self, x):
        return self.fn(self.norm(x))


class SRTTransformer(nn.Module):
    """`nsr/srt/layers.py:146` Transformer mirror."""

    def __init__(self, dim, depth, heads, mlp_dim):
        super().__init__()
        self.layers = nn.ModuleList([
            nn.ModuleList([
                PreNorm(dim, PackedAttention(dim, heads)),
                PreNorm(dim, FusedMLP(dim, mlp_dim)),
            ]) for _ in range(depth)
        ])

    def forward(self, x):
        for attn, ff in self.layers:
            x = attn(x) + x
            x = ff(x) + x
        return x


class MECA(nn.Module):
    """ldm `MemoryEfficientCrossAttention` mirror."""

    def __init__(self, query_dim, context_dim=None, heads=8, dim_head=64,
                 qk_norm=False):
        super().__init__()
        context_dim = context_dim or query_dim
        inner = heads * dim_head
        self.heads = heads
        self.to_q = nn.Linear(query_dim, inner, bias=False)
        self.to_k = nn.Linear(context_dim, inner, bias=False)
        self.q_norm = RMSNorm(dim_head) if qk_norm else nn.Identity()
        self.k_norm = RMSNorm(dim_head) if qk_norm else nn.Identity()
        self.to_v = nn.Linear(context_dim, inner, bias=False)
        self.to_out = nn.Sequential(nn.Linear(inner, query_dim),
                                    nn.Dropout(0.0))

    def forward(self, x, context=None):
        context = x if context is None else context
        q, k, v = self.to_q(x), self.to_k(context), self.to_v(context)
        B, Tq, D = q.shape
        dh = D // self.heads
        q = self.q_norm(q.reshape(B, Tq, self.heads, dh)).reshape(B, Tq, D)
        k = self.k_norm(k.reshape(B, -1, self.heads, dh)).reshape(
            B, context.shape[1], D)
        return self.to_out(sdpa(q, k, v, self.heads))


class GEGLU(nn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out * 2)

    def forward(self, x):
        x, gate = self.proj(x).chunk(2, dim=-1)
        return x * F.gelu(gate)


class FeedForward(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        self.net = nn.Sequential(GEGLU(dim, dim * mult), nn.Dropout(0.0),
                                 nn.Linear(dim * mult, dim))

    def forward(self, x):
        return self.net(x)


class BasicTransformerBlock3D(nn.Module):
    def __init__(self, dim, heads, dim_head):
        super().__init__()
        self.attn1 = MECA(dim, heads=heads, dim_head=dim_head)
        self.ff = FeedForward(dim)
        self.attn2 = MECA(dim, heads=heads, dim_head=dim_head)
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.norm3 = nn.LayerNorm(dim)

    def forward(self, x, num_frames):
        bf, l, c = x.shape
        x = x.reshape(bf // num_frames, num_frames * l, c)
        x = self.attn1(self.norm1(x)) + x
        x = x.reshape(bf, l, c)
        x = self.attn2(self.norm2(x)) + x
        x = self.ff(self.norm3(x)) + x
        return x


class SpatialTransformer3D(nn.Module):
    def __init__(self, in_ch, n_heads=8, d_head=64):
        super().__init__()
        inner = n_heads * d_head
        self.norm = nn.GroupNorm(32, in_ch, eps=1e-6)
        self.proj_in = nn.Conv2d(in_ch, inner, 1)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock3D(inner, n_heads, d_head)])
        self.proj_out = nn.Conv2d(inner, in_ch, 1)
        nn.init.zeros_(self.proj_out.weight)
        nn.init.zeros_(self.proj_out.bias)

    def forward(self, x, num_frames):
        b, c, h, w = x.shape
        x_in = x
        x = self.proj_in(self.norm(x))
        x = x.flatten(2).transpose(1, 2)                    # b, hw, inner
        for blk in self.transformer_blocks:
            x = blk(x, num_frames)
        x = x.transpose(1, 2).reshape(b, -1, h, w)
        return self.proj_out(x) + x_in


class ResnetBlock(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.in_channels, self.out_channels = in_ch, out_ch
        self.norm1 = nn.GroupNorm(32 if in_ch >= 32 else in_ch, in_ch,
                                  eps=1e-6)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.norm2 = nn.GroupNorm(32 if out_ch >= 32 else out_ch, out_ch,
                                  eps=1e-6)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        if in_ch != out_ch:
            self.nin_shortcut = nn.Conv2d(in_ch, out_ch, 1)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self.in_channels != self.out_channels:
            x = self.nin_shortcut(x)
        return x + h


class Downsample(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class _Down(nn.Module):
    pass


class TimmMlp(nn.Module):
    """timm `Mlp` mirror with tanh-approx GELU (the reference passes
    act_layer=approx_gelu for quant/post-quant/Mlp_out)."""

    def __init__(self, d_in, hidden, d_out):
        super().__init__()
        self.fc1 = nn.Linear(d_in, hidden)
        self.fc2 = nn.Linear(hidden, d_out)

    def forward(self, x):
        return self.fc2(approx_gelu(self.fc1(x)))


class XYZPosEmbed(nn.Module):
    """`vit/vit_triplane.py:187` mirror: NeRF PE (multires 10) + Linear."""

    def __init__(self, dim, multires=10):
        super().__init__()
        self.multires = multires
        self.xyz_projection = nn.Linear(3 * (2 * multires + 1), dim)

    def forward(self, xyz):
        outs = [xyz]
        for i in range(self.multires):
            f = 2.0 ** i
            outs += [torch.sin(xyz * f), torch.cos(xyz * f)]
        return self.xyz_projection(torch.cat(outs, dim=-1))


class _SRTContainer(nn.Module):
    def __init__(self, dim, depth, heads, mlp_dim):
        super().__init__()
        self.transformer = SRTTransformer(dim, depth, heads, mlp_dim)


class TorchHybridEncoder(nn.Module):
    """HybridEncoderPCDStructuredLatentSNoPCD mirror. forward takes the
    (B, V, 15, H, W) images plus PRECOMPUTED fps anchors (B, K, 3) — FPS
    tie-breaking is runtime behavior, not weights."""

    def __init__(self, ch=64, ch_mult=(1, 2, 4, 4), z_channels=10,
                 srt_depth=3):
        super().__init__()
        self.conv_in = nn.Conv2d(15, ch, 3, padding=1)
        chans = [ch * m for m in ch_mult]
        self.down = nn.ModuleList()
        prev = ch
        for i, c in enumerate(chans):
            lvl = _Down()
            lvl.block = nn.ModuleList([ResnetBlock(prev, c)])
            if i < len(chans) - 1:
                lvl.downsample = Downsample(c)
            self.down.append(lvl)
            prev = c
        mid_ch = chans[-1]
        self.mid = _Down()
        self.mid.block_1 = ResnetBlock(mid_ch, mid_ch)
        self.mid.attn_1 = SpatialTransformer3D(mid_ch)
        self.mid.block_2 = ResnetBlock(mid_ch, mid_ch)
        self.norm_out = nn.GroupNorm(32, mid_ch, eps=1e-6)
        self.srt = _SRTContainer(mid_ch, srt_depth, 8, 4 * mid_ch)
        self.agg_ca = MECA(mid_ch, mid_ch, qk_norm=True)
        self.xyz_pos_embed = XYZPosEmbed(mid_ch)
        self.Mlp_out = PreNorm(mid_ch,
                               TimmMlp(mid_ch, mid_ch, 2 * z_channels))

    def forward(self, images, anchors):
        B, V, C, H, W = images.shape
        x = images.reshape(B * V, C, H, W)
        h = self.conv_in(x)
        for i, lvl in enumerate(self.down):
            h = lvl.block[0](h)
            if hasattr(lvl, "downsample"):
                h = lvl.downsample(h)
        h = self.mid.block_1(h)
        h = self.mid.attn_1(h, num_frames=V)
        h = self.mid.block_2(h)
        h = F.silu(self.norm_out(h))                        # conv_out=Id

        tok_xyz = images[:, :, -3:, 4::8, 4::8]             # (B,V,3,h,w)
        tok_xyz = tok_xyz.permute(0, 1, 3, 4, 2).reshape(B, -1, 3)
        hh, ww = h.shape[2], h.shape[3]
        tokens = h.reshape(B, V, -1, hh * ww).permute(0, 1, 3, 2)
        tokens = tokens.reshape(B, V * hh * ww, -1)
        tokens = tokens + self.xyz_pos_embed(tok_xyz)

        q = self.xyz_pos_embed(anchors)
        q = self.agg_ca(q, tokens)                          # ca_no_pcd=True
        q = self.srt.transformer(q)
        return self.Mlp_out(q)                              # (B, K, 2z)


class DiTBlock2(nn.Module):
    def __init__(self, dim, heads, mlp_ratio=4):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.norm2 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.attn = PackedAttention(dim, heads)
        self.mlp = FusedMLP(dim, int(dim * mlp_ratio))
        self.adaLN_modulation = nn.Sequential(nn.SiLU(),
                                              nn.Linear(dim, 6 * dim))
        nn.init.zeros_(self.adaLN_modulation[1].weight)
        nn.init.zeros_(self.adaLN_modulation[1].bias)

    def forward(self, x, c):
        sh_a, sc_a, g_a, sh_m, sc_m, g_m = self.adaLN_modulation(c).chunk(
            6, dim=-1)
        x = x + g_a * self.attn(self.norm1(x) * (1 + sc_a) + sh_a)
        x = x + g_m * self.mlp(self.norm2(x) * (1 + sc_m) + sh_m)
        return x


class TorchDiT2(nn.Module):
    """DiT2 mirror with roll_out=True / plane_n=3 / in_plane_attention."""

    def __init__(self, num_tokens, dim, depth, heads, plane_n=3):
        super().__init__()
        self.plane_n = plane_n
        self.pos_embed = nn.Parameter(torch.zeros(1, num_tokens, dim))
        nn.init.normal_(self.pos_embed, std=0.02)
        self.blocks = nn.ModuleList(
            [DiTBlock2(dim, heads) for _ in range(depth)])

    def forward(self, c):
        B, L, D = c.shape
        n = self.plane_n
        x = self.pos_embed.repeat(B, 1, 1)
        for i, blk in enumerate(self.blocks):
            if i % 2 == 0:
                x = blk(x.reshape(B * n, L // n, D),
                        c.reshape(B * n, L // n, D)).reshape(B, L, D)
            else:
                x = blk(x, c)
        return x


class SurfelPred(nn.Module):
    """`surfel_prediction` mirror (init contract included)."""

    def __init__(self, dim):
        super().__init__()
        self.gaussian_pred = nn.Sequential(nn.SiLU(), nn.Linear(dim, 13))
        w, b = self.gaussian_pred[1].weight, self.gaussian_pred[1].bias
        nn.init.zeros_(w)
        nn.init.zeros_(b)
        with torch.no_grad():
            w[6:10].fill_(1.0)
            b[4:6].fill_(-2.5)
            b[10:13].fill_(0.5)

    def forward(self, x):
        return self.gaussian_pred(x)


class AdaCA2DGS(nn.Module):
    """GS_Adaptive_Read_Write_CA_adaptive_2dgs mirror (non-CA branch)."""

    def __init__(self, dim, f, depth):
        super().__init__()
        self.f = f
        self.latent_embedding = nn.Parameter(torch.randn(1, f, dim))
        self.transformer = SRTTransformer(dim, depth, dim // 64, 4 * dim)
        self.gaussian_residual_pred = PreNorm(dim, nn.Linear(dim, 13))
        nn.init.zeros_(self.gaussian_residual_pred.fn.weight)
        nn.init.zeros_(self.gaussian_residual_pred.fn.bias)

    def forward(self, latent_from_vit):
        """Returns (residual_pre_activate (B,N,f,13), child_emb (B,N,f,D))."""
        B, N, C = latent_from_vit.shape
        q = torch.cat([
            latent_from_vit.reshape(B * N, 1, C),
            self.latent_embedding.repeat(B * N, 1, 1),
        ], dim=1)
        q = self.transformer(q)[:, 1:].reshape(B, N, self.f, C)
        return self.gaussian_residual_pred(q), q


class _SuperRes(nn.Module):
    pass


class TorchVAEDecoder(nn.Module):
    """pcd_structured_latent_space_vae_decoder_cascaded mirror (decode-side
    modules + the quant MLP the reference stores under superresolution)."""

    def __init__(self, num_tokens=768, dim=768, depth=12, heads=12,
                 z_channels=10, up_factors=(8, 4, 3), up_depths=(2, 1, 1)):
        super().__init__()
        self.vit_decoder = TorchDiT2(num_tokens, dim, depth, heads)
        sr = nn.ModuleDict()
        sr["quant_conv"] = TimmMlp(2 * z_channels, 2 * z_channels,
                                   2 * z_channels)
        sr["post_quant_conv"] = TimmMlp(z_channels, z_channels, dim)
        sr["conv_sr"] = SurfelPred(dim)
        for k, (f, d) in enumerate(zip(up_factors, up_depths)):
            sr[f"ada_CA_f4_{k + 1}"] = AdaCA2DGS(dim, f, d)
        self.superresolution = sr
        self.register_buffer("w_avg", torch.zeros(512))
        self.skip_weight = 0.1
        self.scene_extent = 0.45

    # activation mirrors (`vit/vit_triplane.py:1288-1313,1388-1400`)
    def offset_act(self, x):
        return torch.tanh(x) * self.scene_extent * 0.5

    def act(self, pos, x):
        opacity = torch.sigmoid(x[..., 3:4])
        scale = F.softplus(x[..., 4:6]) * (self.scene_extent * 0.01
                                           / F.softplus(torch.tensor(0.0)))
        rot = F.normalize(x[..., 6:10], dim=-1)
        rgb = 0.5 * torch.tanh(x[..., 10:]) + 0.5
        return torch.cat([pos, opacity, scale, rot, rgb], dim=-1)

    def decode(self, z, anchors):
        c = self.superresolution["post_quant_conv"](z)
        feat = self.vit_decoder(c)
        raw = self.superresolution["conv_sr"](feat)         # (B, K, 13)
        pos = self.offset_act(raw[..., :3]) * self.skip_weight + anchors
        lods = [self.act(pos, raw)]
        parent_pos, parent_raw, parent_feat = pos, raw, feat
        for k in range(len([m for m in self.superresolution
                            if m.startswith("ada_CA")])):
            up = self.superresolution[f"ada_CA_f4_{k + 1}"]
            res, emb = up(parent_feat)
            B, N, f, _ = res.shape
            child_pos = self.offset_act(res[..., :3]) \
                + parent_pos[:, :, None, :]
            child_raw = res + parent_raw[:, :, None, :]
            lod = self.act(child_pos.reshape(B, N * f, 3),
                           child_raw.reshape(B, N * f, 13))
            lods.append(lod)
            parent_pos = child_pos.reshape(B, N * f, 3)
            parent_raw = child_raw.reshape(B, N * f, 13)
            parent_feat = emb.reshape(B, N * f, -1)
        return lods


def t2i_modulate(x, shift, scale):
    """`dit/dit_models_xformers.py:53`."""
    return x * (1 + scale) + shift


class TorchTimestepEmbedder(nn.Module):
    """`dit/dit_models_xformers.py:96-128` (cos-first sinusoidal, 256)."""

    def __init__(self, hidden, freq_dim=256):
        super().__init__()
        self.freq_dim = freq_dim
        self.mlp = nn.Sequential(nn.Linear(freq_dim, hidden), nn.SiLU(),
                                 nn.Linear(hidden, hidden))

    def forward(self, t):
        half = self.freq_dim // 2
        freqs = torch.exp(-math.log(10000) *
                          torch.arange(half, dtype=torch.float32) / half)
        args = t[:, None].float() * freqs[None]
        emb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
        return self.mlp(emb)


class TorchT2IFinalLayer(nn.Module):
    """`dit/dit_models_xformers.py:62-85`."""

    def __init__(self, dim, out_ch):
        super().__init__()
        self.norm_final = nn.LayerNorm(dim, elementwise_affine=False,
                                       eps=1e-6)
        self.linear = nn.Linear(dim, out_ch)
        self.scale_shift_table = nn.Parameter(torch.randn(2, dim)
                                              / dim ** 0.5)

    def forward(self, x, t):
        shift, scale = (self.scale_shift_table[None] + t[:, None]).chunk(
            2, dim=1)
        return self.linear(t2i_modulate(self.norm_final(x), shift, scale))


class TorchClayBlock(nn.Module):
    """`ImageCondDiTBlockPixelArtRMSNormClayLRM`
    (`dit/dit_models_xformers.py:717-787`): CA(dino) → adaLN-gated SA →
    adaLN-gated FusedMLP, per-block scale_shift_table over a shared t0."""

    def __init__(self, dim, heads, ctx_dim):
        super().__init__()
        self.norm1 = RMSNorm(dim)
        self.norm2 = RMSNorm(dim)
        self.attn = PackedAttention(dim, heads)
        self.mlp = FusedMLP(dim, 4 * dim)
        self.scale_shift_table = nn.Parameter(torch.randn(6, dim)
                                              / dim ** 0.5)
        self.cross_attn_dino = MECA(dim, ctx_dim, heads=heads,
                                    dim_head=dim // heads, qk_norm=True)
        self.prenorm_ca_dino = RMSNorm(dim)
        # present in the state dict, unused at runtime
        # (`dit/dit_models_xformers.py:457-459`)
        self.attention_y_norm = RMSNorm(1024)

    def forward(self, x, t0, dino_tokens):
        B = x.shape[0]
        sh_a, sc_a, g_a, sh_m, sc_m, g_m = (
            self.scale_shift_table[None] + t0.reshape(B, 6, -1)).chunk(
                6, dim=1)
        x = x + self.cross_attn_dino(self.prenorm_ca_dino(x), dino_tokens)
        x = x + g_a * self.attn(t2i_modulate(self.norm1(x), sh_a, sc_a))
        x = x + g_m * self.mlp(t2i_modulate(self.norm2(x), sh_m, sc_m))
        return x


class TorchTextBlock(nn.Module):
    """`PixelArtTextCondDiTBlock` (`dit/dit_models_xformers.py:329-376`):
    adaLN-gated SA → CA(text) with prenorm_ca_text + attention_y_norm on
    the context → adaLN-gated FusedMLP."""

    def __init__(self, dim, heads, ctx_dim):
        super().__init__()
        self.norm1 = RMSNorm(dim)
        self.norm2 = RMSNorm(dim)
        self.attn = PackedAttention(dim, heads)
        self.mlp = FusedMLP(dim, 4 * dim)
        self.scale_shift_table = nn.Parameter(torch.randn(6, dim)
                                              / dim ** 0.5)
        self.cross_attn = MECA(dim, ctx_dim, heads=heads, dim_head=64,
                               qk_norm=True)
        self.attention_y_norm = RMSNorm(ctx_dim)
        self.prenorm_ca_text = RMSNorm(dim)

    def forward(self, x, t0, text_tokens):
        B = x.shape[0]
        sh_a, sc_a, g_a, sh_m, sc_m, g_m = (
            self.scale_shift_table[None] + t0.reshape(B, 6, -1)).chunk(
                6, dim=1)
        x = x + g_a * self.attn(t2i_modulate(self.norm1(x), sh_a, sc_a))
        x = x + self.cross_attn(self.prenorm_ca_text(x),
                                self.attention_y_norm(text_tokens))
        x = x + g_m * self.mlp(t2i_modulate(self.norm2(x), sh_m, sc_m))
        return x


class TorchTextDiT(nn.Module):
    """t23d `DiT_PCD_PixelArt[_tofeat]` mirror
    (`dit/dit_trilatent.py:262-420`) with the TRUE reference keys:
    cap_embedder pooled path, PixelArtTextCondDiTBlock trunk."""

    def __init__(self, in_channels=3, dim=1024, depth=24, heads=16,
                 ctx_dim=768, use_pe_cond=False):
        super().__init__()
        self.use_pe_cond = use_pe_cond
        self.x_embedder = TimmMlp(in_channels, dim, dim)
        self.t_embedder = TorchTimestepEmbedder(dim)
        self.cap_embedder = nn.Sequential(nn.LayerNorm(ctx_dim),
                                          nn.Linear(ctx_dim, dim))
        self.adaLN_modulation = nn.Sequential(nn.SiLU(),
                                              nn.Linear(dim, 6 * dim))
        self.blocks = nn.ModuleList(
            [TorchTextBlock(dim, heads, ctx_dim) for _ in range(depth)])
        self.final_layer = TorchT2IFinalLayer(dim, in_channels)
        if use_pe_cond:
            self.xyz_pos_embed = XYZPosEmbed(dim)

    def forward(self, x, t, text_tokens, text_vector, fps_xyz=None):
        tt = self.t_embedder(t) + self.cap_embedder(text_vector)
        t0 = self.adaLN_modulation(tt)
        x = self.x_embedder(x)
        if self.use_pe_cond:
            x = x + self.xyz_pos_embed(fps_xyz)
        for blk in self.blocks:
            x = blk(x, t0, text_tokens)
        return self.final_layer(x, tt).float()


class TorchClayDiT(nn.Module):
    """`DiT_I23D_PCD_PixelArt_noclip` (stage-1) /
    `…_clay_stage2` (stage-2, use_pe_cond) mirror with the TRUE reference
    state-dict keys (`dit/dit_i23d.py:437-567,664-753`)."""

    def __init__(self, in_channels=3, dim=1024, depth=24, heads=16,
                 ctx_dim=1024, use_pe_cond=False):
        super().__init__()
        self.use_pe_cond = use_pe_cond
        self.x_embedder = TimmMlp(in_channels, dim, dim)
        self.t_embedder = TorchTimestepEmbedder(dim)
        self.pooled_vec_embedder = nn.Sequential(
            nn.LayerNorm(ctx_dim), nn.Linear(ctx_dim, dim))
        self.adaLN_modulation = nn.Sequential(nn.SiLU(),
                                              nn.Linear(dim, 6 * dim))
        # created by the base class, unused in the noclip forward
        self.cap_embedder = nn.Sequential(nn.LayerNorm(768),
                                          nn.Linear(768, dim))
        self.blocks = nn.ModuleList(
            [TorchClayBlock(dim, heads, ctx_dim) for _ in range(depth)])
        self.final_layer = TorchT2IFinalLayer(dim, in_channels)
        if use_pe_cond:
            self.xyz_pos_embed = XYZPosEmbed(dim)

    def forward(self, x, t, dino_tokens, dino_vector, fps_xyz=None):
        tt = self.t_embedder(t) + self.pooled_vec_embedder(dino_vector)
        t0 = self.adaLN_modulation(tt)
        x = self.x_embedder(x)
        if self.use_pe_cond:
            x = x + self.xyz_pos_embed(fps_xyz)
        for blk in self.blocks:
            x = blk(x, t0, dino_tokens)
        return self.final_layer(x, tt).float()


class TorchReleaseVAE(nn.Module):
    """Top-level AE mirror: state-dict keys `encoder.*` / `decoder.*`."""

    def __init__(self, ch=64, num_tokens=768, dim=768, depth=12, heads=12,
                 z_channels=10, srt_depth=3, up_factors=(8, 4, 3),
                 up_depths=(2, 1, 1)):
        super().__init__()
        self.encoder = TorchHybridEncoder(ch=ch, z_channels=z_channels,
                                          srt_depth=srt_depth)
        self.decoder = TorchVAEDecoder(num_tokens=num_tokens, dim=dim,
                                       depth=depth, heads=heads,
                                       z_channels=z_channels,
                                       up_factors=up_factors,
                                       up_depths=up_depths)

    def encode_moments(self, images, anchors):
        h = self.encoder(images, anchors)
        return self.superres_quant(h)

    def superres_quant(self, h):
        return self.decoder.superresolution["quant_conv"](h)
