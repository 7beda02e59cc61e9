"""U²-Net salient-object matting — the `rembg` backbone.

The reference removes backgrounds from real conditioning images with
`rembg.remove` (`/root/reference/utils/infer_utils.py:4,27`), which runs a
pretrained U²-Net (Qin et al. 2020, xuebinqin/U-2-Net `u2net.py`). The
weights are not downloadable in this environment, so — like the DINOv2 /
OpenCLIP / VGG-LPIPS conditioners — we ship the same architecture in flax
plus a torch-state-dict name map (`utils/param_io.convert_u2net`), so a
real `u2net.pth` converts into a drop-in matting model for
`data/real.RealImageDataset`; the chroma-key heuristic stays as the
weightless fallback.

Inference-only: BatchNorm applies imported running statistics (held in the
param tree so conversion is a pure rename), there is no train mode.
TPU-first notes: NHWC layout throughout, static shapes (input must be a
multiple of 32 — rembg's canonical 320² satisfies this), bilinear
upsampling via `jax.image.resize` (matches `F.upsample(..., 'bilinear',
align_corners=False)`).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from gaussiananything_tpu.data.postprocess import (IMAGENET_MEAN,
                                                   IMAGENET_STD)

BN_EPS = 1e-5


class REBNCONV(nn.Module):
    """conv3x3(dilation d) + BatchNorm(frozen stats) + ReLU.

    Torch names: `conv_s1` / `bn_s1` (u2net.py REBNCONV).
    """

    out_ch: int
    dirate: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_ch, (3, 3),
                    kernel_dilation=(self.dirate, self.dirate),
                    padding="SAME", name="conv_s1")(x)
        scale = self.param("bn_scale", nn.initializers.ones, (self.out_ch,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.out_ch,))
        mean = self.param("bn_mean", nn.initializers.zeros, (self.out_ch,))
        var = self.param("bn_var", nn.initializers.ones, (self.out_ch,))
        x = (x - mean) * jax.lax.rsqrt(var + BN_EPS) * scale + bias
        return nn.relu(x)


def _pool2(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _upsample_like(src, tar):
    return jax.image.resize(
        src, tar.shape[:-1] + (src.shape[-1],), method="bilinear")


class RSU(nn.Module):
    """Residual U-block of height L (RSU7…RSU4 in the torch source).

    Encoder convs 1…L with 2× max-pools between 1…L−1; the deepest conv
    runs at dilation 2 on the coarsest grid; decoder convs (L−1)d…1d on
    concat(up(prev), skip). Returns hx1d + hxin.
    """

    height: int
    mid_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x):
        L = self.height
        hxin = REBNCONV(self.out_ch, name="rebnconvin")(x)

        enc = []
        h = hxin
        for i in range(1, L):
            h = REBNCONV(self.mid_ch, name=f"rebnconv{i}")(h)
            enc.append(h)
            if i < L - 1:
                h = _pool2(h)
        h = REBNCONV(self.mid_ch, dirate=2, name=f"rebnconv{L}")(h)

        for i in range(L - 1, 0, -1):
            skip = enc[i - 1]
            if i < L - 1:
                h = _upsample_like(h, skip)
            out_ch = self.out_ch if i == 1 else self.mid_ch
            h = REBNCONV(out_ch, name=f"rebnconv{i}d")(
                jnp.concatenate([h, skip], axis=-1))
        return h + hxin


class RSU4F(nn.Module):
    """Dilation-only residual block (no pooling): rates 1,2,4,8 down and
    4,2,1 up (u2net.py RSU4F)."""

    mid_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x):
        hxin = REBNCONV(self.out_ch, name="rebnconvin")(x)
        h1 = REBNCONV(self.mid_ch, dirate=1, name="rebnconv1")(hxin)
        h2 = REBNCONV(self.mid_ch, dirate=2, name="rebnconv2")(h1)
        h3 = REBNCONV(self.mid_ch, dirate=4, name="rebnconv3")(h2)
        h4 = REBNCONV(self.mid_ch, dirate=8, name="rebnconv4")(h3)
        h = REBNCONV(self.mid_ch, dirate=4, name="rebnconv3d")(
            jnp.concatenate([h4, h3], axis=-1))
        h = REBNCONV(self.mid_ch, dirate=2, name="rebnconv2d")(
            jnp.concatenate([h, h2], axis=-1))
        h = REBNCONV(self.out_ch, dirate=1, name="rebnconv1d")(
            jnp.concatenate([h, h1], axis=-1))
        return h + hxin


# (height|F, mid, out) per stage — torch U2NET(3,1) full config; the
# decoder mirrors it. u2netp (the small variant) uses mid 16 / out 64
# everywhere.
_U2NET_ENC = ((7, 32, 64), (6, 32, 128), (5, 64, 256), (4, 128, 512),
              (0, 256, 512), (0, 256, 512))
_U2NET_DEC = ((0, 256, 512), (4, 128, 256), (5, 64, 128), (6, 32, 64),
              (7, 16, 64))
_U2NETP_ENC = tuple((h, 16, 64) for h, _, _ in _U2NET_ENC)
_U2NETP_DEC = tuple((h, 16, 64) for h, _, _ in _U2NET_DEC)


def _make_rsu(cfg: Tuple[int, int, int], name: str) -> nn.Module:
    height, mid, out = cfg
    if height == 0:
        return RSU4F(mid_ch=mid, out_ch=out, name=name)
    return RSU(height=height, mid_ch=mid, out_ch=out, name=name)


class U2Net(nn.Module):
    """Full U²-Net: 6 encoder stages (2× pool between), 5 decoder stages,
    7 sigmoid side outputs fused by a 1×1 conv (torch `U2NET.forward`).

    Input (B, H, W, 3), H and W multiples of 32. Returns the fused
    saliency map (B, H, W, 1) in [0, 1] (d0 — what rembg thresholds);
    `side_outputs=True` additionally returns all 7 maps.
    """

    enc_cfg: Sequence[Tuple[int, int, int]] = _U2NET_ENC
    dec_cfg: Sequence[Tuple[int, int, int]] = _U2NET_DEC

    @nn.compact
    def __call__(self, x, side_outputs: bool = False):
        assert x.shape[1] % 32 == 0 and x.shape[2] % 32 == 0, x.shape

        feats = []
        h = x
        for i, cfg in enumerate(self.enc_cfg):
            h = _make_rsu(cfg, f"stage{i + 1}")(h)
            feats.append(h)
            if i < len(self.enc_cfg) - 1:
                h = _pool2(h)

        sides = [nn.Conv(1, (3, 3), padding="SAME", name="side6")(
            feats[-1])]
        h = feats[-1]
        for i, cfg in enumerate(self.dec_cfg):
            stage_idx = 5 - i                     # 5d, 4d, 3d, 2d, 1d
            skip = feats[stage_idx - 1]
            h = _make_rsu(cfg, f"stage{stage_idx}d")(
                jnp.concatenate([_upsample_like(h, skip), skip], axis=-1))
            sides.append(nn.Conv(1, (3, 3), padding="SAME",
                                 name=f"side{stage_idx}")(h))

        full = sides[-1]                          # d1 is already full-res
        maps = [_upsample_like(s, full) for s in sides[::-1]]  # d1…d6
        d0 = nn.Conv(1, (1, 1), name="outconv")(
            jnp.concatenate(maps, axis=-1))
        out = jax.nn.sigmoid(d0)
        if side_outputs:
            return out, [jax.nn.sigmoid(m) for m in maps]
        return out


def u2net() -> U2Net:
    return U2Net()


def u2netp() -> U2Net:
    return U2Net(enc_cfg=_U2NETP_ENC, dec_cfg=_U2NETP_DEC)


def matting_alpha(params, image: jnp.ndarray, res: int = 320,
                  net: U2Net | None = None) -> jnp.ndarray:
    """rembg-equivalent alpha: (H, W, 3) float [0,1] → (H, W) alpha [0,1].

    Resizes to `res`² for the net (rembg's canonical 320²), normalises by
    max (rembg's RescaleT), applies imagenet mean/std, min-max normalises
    the output map (rembg postprocessing), and resizes back.
    """
    H, W = image.shape[:2]
    x = jax.image.resize(image, (res, res, 3), method="bilinear")
    x = x / jnp.maximum(jnp.max(x), 1e-6)
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    x = (x - mean) / std
    a = (net or U2Net()).apply(params, x[None])[0, ..., 0]
    a = (a - a.min()) / jnp.maximum(a.max() - a.min(), 1e-6)
    return jax.image.resize(a, (H, W), method="bilinear")
