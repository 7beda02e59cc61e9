"""VGG16-LPIPS parity tests.

Pins `train/losses.VGGLPIPS` + `utils/param_io.convert_lpips_vgg` against a
torch-CPU reference forward implementing pip-`lpips` semantics
(`/root/reference/nsr/losses/builder.py:530-653` consumes lpips.LPIPS
(net='vgg')): scaling layer → VGG16 relu taps {1_2,2_2,3_3,4_3,5_3} →
channel-unit-normalise → squared diff → 1×1 lin convs → spatial mean → sum.

The state dict is synthesised with the pip-lpips names (`net.sliceS.I.*`,
`linK.model.1.weight`) so the converter's name handling is exercised on the
true layout.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gaussiananything_tpu.train import losses as L
from gaussiananything_tpu.utils import param_io

torch = pytest.importorskip("torch")

# (global torchvision conv index, in_ch, out_ch, lpips slice number)
_CONVS = [(0, 3, 64, 1), (2, 64, 64, 1),
          (5, 64, 128, 2), (7, 128, 128, 2),
          (10, 128, 256, 3), (12, 256, 256, 3), (14, 256, 256, 3),
          (17, 256, 512, 4), (19, 512, 512, 4), (21, 512, 512, 4),
          (24, 512, 512, 5), (26, 512, 512, 5), (28, 512, 512, 5)]
_POOL_BEFORE = {5, 10, 17, 24}
_TAPS = {2: 0, 7: 1, 14: 2, 21: 3, 28: 4}


def synth_lpips_state_dict(rng):
    sd = {
        "scaling_layer.shift": rng.standard_normal((1, 3, 1, 1)),
        "scaling_layer.scale": rng.standard_normal((1, 3, 1, 1)),
    }
    for idx, cin, cout, sl in _CONVS:
        sd[f"net.slice{sl}.{idx}.weight"] = \
            rng.standard_normal((cout, cin, 3, 3)).astype(np.float32) * 0.05
        sd[f"net.slice{sl}.{idx}.bias"] = \
            rng.standard_normal(cout).astype(np.float32) * 0.05
    for k, ch in enumerate(L.LPIPS_CHANNELS):
        sd[f"lin{k}.model.1.weight"] = np.abs(
            rng.standard_normal((1, ch, 1, 1)).astype(np.float32)) * 0.1
    return sd


def torch_lpips_forward(sd, a, b):
    """a, b: (B, 3, H, W) numpy in [-1, 1] (already 2x-1 scaled)."""
    import torch.nn.functional as F
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(x):
        h = (x - shift) / scale
        out = []
        for idx, cin, cout, sl in _CONVS:
            if idx in _POOL_BEFORE:
                h = F.max_pool2d(h, 2, 2)
            w = torch.from_numpy(sd[f"net.slice{sl}.{idx}.weight"])
            bia = torch.from_numpy(sd[f"net.slice{sl}.{idx}.bias"])
            h = F.relu(F.conv2d(h, w, bia, padding=1))
            if idx in _TAPS:
                out.append(h)
        return out

    fa = feats(torch.from_numpy(a))
    fb = feats(torch.from_numpy(b))
    total = 0.0
    for k, (xa, xb) in enumerate(zip(fa, fb)):
        na = xa / torch.sqrt((xa * xa).sum(1, keepdim=True) + 1e-10)
        nb = xb / torch.sqrt((xb * xb).sum(1, keepdim=True) + 1e-10)
        d = (na - nb) ** 2
        w = torch.from_numpy(sd[f"lin{k}.model.1.weight"])
        r = F.conv2d(d, w)
        total = total + r.mean(dim=(1, 2, 3))
    return total.mean().item()


class TestVGGLPIPS:
    def test_convert_and_match_torch(self):
        rng = np.random.default_rng(0)
        sd = synth_lpips_state_dict(rng)
        template = L.init_lpips_template(res=32)
        params = param_io.convert_lpips_vgg(sd, template)

        a01 = rng.random((2, 3, 32, 32)).astype(np.float32)
        b01 = rng.random((2, 3, 32, 32)).astype(np.float32)
        ours = float(L.lpips_vgg(jnp.asarray(a01), jnp.asarray(b01), params))
        ref = torch_lpips_forward(sd, a01 * 2 - 1, b01 * 2 - 1)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_identical_inputs_zero(self):
        rng = np.random.default_rng(1)
        sd = synth_lpips_state_dict(rng)
        params = param_io.convert_lpips_vgg(sd, L.init_lpips_template(32))
        a = jnp.asarray(rng.random((1, 3, 32, 32)), jnp.float32)
        assert abs(float(L.lpips_vgg(a, a, params))) < 1e-6

    def test_perceptual_loss_dispatch(self):
        """With converted params `perceptual_loss` routes to the VGG path;
        without, the random-pyramid fallback still works."""
        rng = np.random.default_rng(2)
        sd = synth_lpips_state_dict(rng)
        params = param_io.convert_lpips_vgg(sd, L.init_lpips_template(32))
        a = jnp.asarray(rng.random((1, 3, 32, 32)), jnp.float32)
        b = jnp.asarray(rng.random((1, 3, 32, 32)), jnp.float32)
        via_dispatch = float(L.perceptual_loss(a, b, params=params))
        direct = float(L.lpips_vgg(a, b, params))
        np.testing.assert_allclose(via_dispatch, direct, rtol=1e-6)
        fallback = float(L.perceptual_loss(a, b))
        assert np.isfinite(fallback) and fallback != via_dispatch

    def test_gradients_flow(self):
        rng = np.random.default_rng(3)
        sd = synth_lpips_state_dict(rng)
        params = param_io.convert_lpips_vgg(sd, L.init_lpips_template(32))
        a = jnp.asarray(rng.random((1, 3, 32, 32)), jnp.float32)
        b = jnp.asarray(rng.random((1, 3, 32, 32)), jnp.float32)
        g = jax.grad(lambda x: L.lpips_vgg(x, b, params))(a)
        assert bool(jnp.isfinite(g).all()) and float(jnp.abs(g).max()) > 0
