"""Loss stack for VAE training.

Capability parity with `E3DGELossClass` / `E3DGE_with_AdvLoss`
(`nsr/losses/builder.py:356,530-653,776-826,959-1100`):
  2D reconstruction (L1/MSE + foreground-masked), perceptual (LPIPS slot),
  alpha/mask loss, scale-invariant depth, KL with linear annealing,
  2DGS normal-consistency + depth-distortion regularisers
  (`nsr/train_nv_util.py:2158-2175`), scale/opacity regularisers
  (`:2143-2155`), PatchGAN hinge adversarial loss (`nsr/losses/disc.py`).

Perceptual loss note: the reference uses pretrained-VGG LPIPS (pip `lpips`).
Pretrained weights are not downloadable in this environment, so the
perceptual term uses a fixed randomly-initialised conv pyramid (a known
reasonable perceptual metric family); weights are deterministic from a seed
and can be swapped for converted VGG weights via `params`.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _masked_mean(d: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of `d` over elements where the (broadcastable) mask is on.

    Layout-agnostic: the element count is the sum of the mask broadcast to
    the full elementwise shape, so a (B, V, 1, H, W) mask against a
    (B, V, 3, H, W) image normalises correctly regardless of which axis is
    the channel.
    """
    shape = jnp.broadcast_shapes(d.shape, mask.shape)
    m = jnp.broadcast_to(mask, shape)
    return jnp.sum(d * m) / (jnp.sum(m) + 1e-8)


def l1(a, b, mask=None):
    d = jnp.abs(a - b)
    if mask is not None:
        return _masked_mean(d, mask)
    return jnp.mean(d)


def mse(a, b, mask=None):
    d = (a - b) ** 2
    if mask is not None:
        return _masked_mean(d, mask)
    return jnp.mean(d)


# ----------------------------------------------------------- perceptual

class _PerceptualNet(nn.Module):
    """Fixed conv pyramid: 4 stages of stride-2 convs, feature-normalised
    L2 distance per stage (LPIPS-style)."""

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, 3) in [0,1]
        feats = []
        ch = 32
        h = x * 2 - 1
        for i in range(4):
            h = nn.Conv(ch, (3, 3), strides=(2, 2), name=f"conv{i}a")(h)
            h = nn.relu(h)
            h = nn.Conv(ch, (3, 3), name=f"conv{i}b")(h)
            h = nn.relu(h)
            feats.append(h)
            ch *= 2
        return feats


@functools.lru_cache(maxsize=2)
def _perceptual_params(seed: int = 0):
    net = _PerceptualNet()
    # The fixed random params must be concrete (this is reached inside the
    # jit trace of the loss fn), and must be built WITHOUT touching the
    # accelerator: an eager on-device init mid-trace allocates while the
    # step's params/optimizer already fill HBM (observed RESOURCE_EXHAUSTED
    # tracing the 512² release-scale step on v5e). Conv params are
    # spatial-size independent, so init at a tiny dummy resolution on the
    # HOST CPU backend; jit moves the constants to device with the rest of
    # the executable's constant pool.
    cpu = jax.local_devices(backend="cpu")[0]
    # ensure_compile_time_eval ESCAPES any enclosing trace (a nested jit
    # would just inherit it and hand back tracers); default_device routes
    # the eager init to the host backend.
    with jax.ensure_compile_time_eval(), jax.default_device(cpu):
        params = net.init(jax.random.PRNGKey(seed),
                          jnp.zeros((1, 32, 32, 3)))
    params = jax.tree.map(np.asarray, params)
    return net, params


def perceptual_loss(a: jnp.ndarray, b: jnp.ndarray,
                    params=None) -> jnp.ndarray:
    """a, b: (B, 3, H, W) in [0,1]. Channel-first for parity with callers.

    `params=None` → fixed random pyramid (fallback). A converted VGG-LPIPS
    param tree (`utils/param_io.convert_lpips_vgg`) → reference-parity
    LPIPS (`nsr/losses/builder.py:530-653` uses pip `lpips` VGG).
    """
    if params is not None:
        inner = params.get("params", params)
        if any(str(k).startswith("lins.") for k in inner):
            return lpips_vgg(a, b, params)
    net, p = _perceptual_params()
    if params is not None:
        p = params
    fa = net.apply(p, jnp.moveaxis(a, 1, -1))
    fb = net.apply(p, jnp.moveaxis(b, 1, -1))
    total = 0.0
    for xa, xb in zip(fa, fb):
        na = xa / (jnp.linalg.norm(xa, axis=-1, keepdims=True) + 1e-8)
        nb = xb / (jnp.linalg.norm(xb, axis=-1, keepdims=True) + 1e-8)
        total = total + jnp.mean((na - nb) ** 2)
    return total


# ------------------------------------------------------ VGG16 LPIPS

# torchvision vgg16.features conv indices and channel widths; relu taps
# after convs 2/7/14/21/28 = relu{1_2,2_2,3_3,4_3,5_3} (the lpips slices).
_VGG_CONVS = ((0, 64), (2, 64), (5, 128), (7, 128), (10, 256), (12, 256),
              (14, 256), (17, 512), (19, 512), (21, 512), (24, 512),
              (26, 512), (28, 512))
_VGG_TAPS = (2, 7, 14, 21, 28)
_VGG_POOL_BEFORE = (5, 10, 17, 24)
LPIPS_CHANNELS = (64, 128, 256, 512, 512)


class VGG16Features(nn.Module):
    """torchvision VGG16 feature trunk (NHWC), conv names `features.N`
    matching the torch state-dict indices so conversion is a rename.

    Returns the 5 relu taps used by LPIPS.
    """

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3), already LPIPS-scaled
        feats = []
        h = x
        for idx, ch in _VGG_CONVS:
            if idx in _VGG_POOL_BEFORE:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            h = nn.Conv(ch, (3, 3), padding=1, name=f"features.{idx}")(h)
            h = nn.relu(h)
            if idx in _VGG_TAPS:
                feats.append(h)
        return feats


class VGGLPIPS(nn.Module):
    """LPIPS(net='vgg') parity: scaling layer → VGG taps → unit-normalise
    channels → squared diff → learned 1×1 `lin` convs → spatial mean → sum.

    Matches pip `lpips` semantics (`nsr/losses/builder.py:530` consumption);
    weights convert via `utils/param_io.convert_lpips_vgg`.
    """

    @nn.compact
    def __call__(self, a, b):  # (B, H, W, 3) in [-1, 1]
        shift = jnp.asarray([-0.030, -0.088, -0.188])
        scale = jnp.asarray([0.458, 0.448, 0.450])
        net = VGG16Features(name="net")
        fa = net((a - shift) / scale)
        fb = net((b - shift) / scale)
        total = 0.0
        for k, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa * jax.lax.rsqrt(
                jnp.sum(xa * xa, axis=-1, keepdims=True) + 1e-10)
            nb = xb * jax.lax.rsqrt(
                jnp.sum(xb * xb, axis=-1, keepdims=True) + 1e-10)
            d = (na - nb) ** 2
            w = nn.Conv(1, (1, 1), use_bias=False,
                        name=f"lins.{k}")(d)
            total = total + jnp.mean(w, axis=(1, 2, 3))
        return jnp.mean(total)


def lpips_vgg(a: jnp.ndarray, b: jnp.ndarray, params) -> jnp.ndarray:
    """a, b: (B, 3, H, W) in [0,1]; params from `convert_lpips_vgg`."""
    m = VGGLPIPS()
    return m.apply(params, jnp.moveaxis(a, 1, -1) * 2 - 1,
                   jnp.moveaxis(b, 1, -1) * 2 - 1)


def init_lpips_template(res: int = 64):
    """Template param tree for the converter (shapes only)."""
    with jax.ensure_compile_time_eval():
        return VGGLPIPS().init(jax.random.PRNGKey(0),
                               jnp.zeros((1, res, res, 3)),
                               jnp.zeros((1, res, res, 3)))


# ----------------------------------------------------------------- ssim

def ssim(a: jnp.ndarray, b: jnp.ndarray, window: int = 11,
         sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM over (B, C, H, W) images in [0,1]."""
    r = jnp.arange(window, dtype=jnp.float32) - (window - 1) / 2
    g = jnp.exp(-(r ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    k2d = jnp.outer(g, g)[None, None]  # (1,1,w,w)

    def blur(x):
        B, C, H, W = x.shape
        x = x.reshape(B * C, 1, H, W)
        out = jax.lax.conv_general_dilated(
            x, k2d, (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return out.reshape(B, C, H, W)

    c1, c2 = 0.01 ** 2, 0.03 ** 2
    mu_a, mu_b = blur(a), blur(b)
    # clamp: blur(x²) − µ² can go slightly NEGATIVE in fp32 on flat
    # regions (e.g. white backgrounds), collapsing the denominator and
    # blowing SSIM past 1 (observed eval/ssim up to 11.5 on early
    # dot-cloud renders)
    va = jnp.maximum(blur(a * a) - mu_a ** 2, 0.0)
    vb = jnp.maximum(blur(b * b) - mu_b ** 2, 0.0)
    cov = blur(a * b) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a ** 2 + mu_b ** 2 + c1) * (va + vb + c2))
    return jnp.mean(s)


# ------------------------------------------------------------ geometry

def depth_loss_scale_invariant(pred: jnp.ndarray, gt: jnp.ndarray,
                               mask: jnp.ndarray) -> jnp.ndarray:
    """Scale-invariant depth (`nsr/losses/builder.py:412`): solve per-image
    scale/shift in closed form on masked pixels, then L1."""
    B = pred.shape[0]
    p = pred.reshape(B, -1)
    g = gt.reshape(B, -1)
    m = mask.reshape(B, -1)
    n = jnp.maximum(m.sum(-1), 1.0)
    mp = (p * m).sum(-1) / n
    mg = (g * m).sum(-1) / n
    var_p = ((p - mp[:, None]) ** 2 * m).sum(-1) / n
    cov = ((p - mp[:, None]) * (g - mg[:, None]) * m).sum(-1) / n
    s = cov / (var_p + 1e-8)
    t = mg - s * mp
    aligned = s[:, None] * p + t[:, None]
    return jnp.sum(jnp.abs(aligned - g) * m) / jnp.maximum(m.sum(), 1.0)


def normal_consistency_loss(rend_normal: jnp.ndarray,
                            surf_normal: jnp.ndarray,
                            alpha: jnp.ndarray) -> jnp.ndarray:
    """2DGS normal regulariser: 1 − n·n̂ weighted by alpha
    (`nsr/train_nv_util.py:2158-2166`)."""
    # safe normalise (finite grad for zero background normals)
    rn = rend_normal * jax.lax.rsqrt(
        jnp.sum(rend_normal ** 2, axis=2, keepdims=True) + 1e-12)
    sn = surf_normal * jax.lax.rsqrt(
        jnp.sum(surf_normal ** 2, axis=2, keepdims=True) + 1e-12)
    dot = jnp.sum(rn * sn, axis=2, keepdims=True)
    return jnp.mean((1.0 - dot) * alpha)


def depth_to_normal(depth: jnp.ndarray, cam_view: jnp.ndarray,
                    tanfov: jnp.ndarray) -> jnp.ndarray:
    """Backproject (B,V,1,H,W) median depth to points, finite-difference
    cross product → pseudo surface normal in world space
    (parity `utils/point_utils.py:11,65`)."""
    B, V, _, H, W = depth.shape
    xs = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W * 2 - 1
    ys = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H * 2 - 1
    gx, gy = jnp.meshgrid(xs, ys)

    def one(d, cv, tf):
        # Componentwise on (H, W) planes: (H, W, 3) stacks/matmuls pad the
        # minor dim 3→128 under the TPU (8,128) tile layout and round MXU
        # inputs to bf16 at default precision; scalar fma chains are exact
        # fp32 and full-lane. Runs at 512² inside the release train step.
        z = d[0]
        x = gx * tf * z
        y = gy * tf * z
        R = cv[:3, :3]  # row-vector world→view (pure rotation: inv = .T)
        # world point: (p_view − t) @ R.T, per world component j
        pv = (x - cv[3, 0], y - cv[3, 1], z - cv[3, 2])
        pw = [pv[0] * R[j, 0] + pv[1] * R[j, 1] + pv[2] * R[j, 2]
              for j in range(3)]

        def diff_w(p):   # ∂/∂x (append-last: zero at the right edge)
            return jnp.diff(p, axis=1, append=p[:, -1:])

        def diff_h(p):
            return jnp.diff(p, axis=0, append=p[-1:])

        dx = [diff_w(p) for p in pw]
        dy = [diff_h(p) for p in pw]
        n0 = dx[1] * dy[2] - dx[2] * dy[1]
        n1 = dx[2] * dy[0] - dx[0] * dy[2]
        n2 = dx[0] * dy[1] - dx[1] * dy[0]
        inv = jax.lax.rsqrt(n0 * n0 + n1 * n1 + n2 * n2 + 1e-12)
        return jnp.stack([n0 * inv, n1 * inv, n2 * inv], 0)    # (3, H, W)

    out = jax.vmap(jax.vmap(one))(depth, cam_view,
                                  jnp.broadcast_to(tanfov, (B, V)))
    return out


# --------------------------------------------------------- regularisers

def scale_reg(gaussians: jnp.ndarray, max_scale: float = 0.05) -> jnp.ndarray:
    """Penalise splats growing beyond max_scale (`nsr/train_nv_util.py:2143`)."""
    return jnp.mean(nn.relu(gaussians[..., 4:6] - max_scale))


def opacity_reg(gaussians: jnp.ndarray) -> jnp.ndarray:
    """Push opacities towards {0,1} (beta-style regulariser,
    `nsr/train_nv_util.py:2149-2155`)."""
    o = jnp.clip(gaussians[..., 3], 1e-4, 1 - 1e-4)
    return -jnp.mean(o * jnp.log(o) + (1 - o) * jnp.log(1 - o))


# ------------------------------------------------------------------ GAN

class PatchDiscriminator(nn.Module):
    """PatchGAN `NLayerDiscriminator` parity (`nsr/losses/disc.py`):
    4 stride-2 conv layers, LeakyReLU, patch logits."""

    ch: int = 64
    layers: int = 3

    @nn.compact
    def __call__(self, x):  # (B, 3, H, W)
        h = jnp.moveaxis(x, 1, -1)
        h = nn.Conv(self.ch, (4, 4), strides=(2, 2))(h)
        h = nn.leaky_relu(h, 0.2)
        ch = self.ch
        for i in range(1, self.layers + 1):
            ch = min(self.ch * 2 ** i, 512)
            stride = (2, 2) if i < self.layers else (1, 1)
            h = nn.Conv(ch, (4, 4), strides=stride, use_bias=False)(h)
            h = nn.GroupNorm(num_groups=32)(h)
            h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (4, 4))(h)


def hinge_d_loss(logits_real, logits_fake):
    return 0.5 * (jnp.mean(nn.relu(1.0 - logits_real))
                  + jnp.mean(nn.relu(1.0 + logits_fake)))


def hinge_g_loss(logits_fake):
    return -jnp.mean(logits_fake)


def kl_coeff_schedule(step: jnp.ndarray, target: float = 1e-5,
                      anneal_steps: int = 5000) -> jnp.ndarray:
    """Linear KL annealing (`nsr/losses/builder.py:192-199`)."""
    return target * jnp.clip(step / anneal_steps, 0.0, 1.0)
