"""Golden import test for the official GaussianAnything flow-matching DiTs.

Synthesizes checkpoints with the TRUE reference parameter names/shapes via
`torch_mirror_ga.TorchClayDiT` (scaled-down depth/width, same structure:
`DiT_I23D_PCD_PixelArt_noclip[_clay_stage2]`, `dit/dit_i23d.py:437,664`),
converts them with `param_io.convert_gaussiananything_dit`, and asserts the
converted flax `PointDiT(release_parity=True)` reproduces the torch
velocity field for both stages. Executable proof that a user can load
`checkpoints/i23d/stage-1/model_joint_denoise_rec_model2990000.pt`
(README.md release table) into this framework.
"""
from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax                                                     # noqa: E402
import jax.numpy as jnp                                        # noqa: E402

from gaussiananything_tpu.models.dit import PointDiT           # noqa: E402
from gaussiananything_tpu.utils.param_io import (              # noqa: E402
    convert_gaussiananything_dit)

from torch_mirror_ga import TorchClayDiT, TorchTextDiT         # noqa: E402

DIM, DEPTH, HEADS, CTX = 128, 3, 2, 96
B, N, L = 2, 16, 11


def _randomize(model: torch.nn.Module, seed: int = 0):
    """Fan-in-scaled random weights keep activations O(1) (see
    test_release_import._randomize)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if p.ndim == 1 and name.endswith("weight"):
                p.copy_(1.0 + 0.05 * torch.randn(p.shape, generator=g))
            elif p.ndim >= 2:
                fan_in = int(np.prod(p.shape[1:]))
                p.copy_(torch.randn(p.shape, generator=g)
                        / max(fan_in, 1) ** 0.5)
            else:
                p.copy_(0.2 * torch.randn(p.shape, generator=g))


def _build(stage: int, variant: str = "clay"):
    in_ch = 3 if stage == 1 else 10
    mirror = TorchClayDiT if variant == "clay" else TorchTextDiT
    tm = mirror(in_channels=in_ch, dim=DIM, depth=DEPTH, heads=HEADS,
                ctx_dim=CTX, use_pe_cond=(stage == 2)).eval()
    _randomize(tm, seed=stage)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    fm = PointDiT(in_channels=in_ch, width=DIM, depth=DEPTH, heads=HEADS,
                  cond_dim=CTX, vector_dim=CTX, use_xyz_pe=(stage == 2),
                  release_parity=True, variant=variant)
    r = np.random.RandomState(stage)
    x = r.randn(B, N, in_ch).astype(np.float32)
    t = r.rand(B).astype(np.float32)
    tokens = r.randn(B, L, CTX).astype(np.float32) * 0.5
    vector = r.randn(B, CTX).astype(np.float32) * 0.5
    xyz = (r.rand(B, N, 3).astype(np.float32) - 0.5) * 0.9

    kw = dict(xyz=jnp.asarray(xyz)) if stage == 2 else {}
    params = fm.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t),
                     jnp.asarray(tokens), jnp.asarray(vector), **kw)
    params = convert_gaussiananything_dit(sd, params)

    out_f = fm.apply(params, jnp.asarray(x), jnp.asarray(t),
                     jnp.asarray(tokens), jnp.asarray(vector), **kw)
    with torch.no_grad():
        out_t = tm(torch.from_numpy(x), torch.from_numpy(t),
                   torch.from_numpy(tokens), torch.from_numpy(vector),
                   fps_xyz=torch.from_numpy(xyz) if stage == 2 else None)
    return np.asarray(out_f), out_t.numpy()


@pytest.mark.parametrize("stage", [1, 2])
@pytest.mark.parametrize("variant", ["clay", "text"])
def test_velocity_field_matches(stage, variant):
    """clay = i23d DiT-PixArt-PCD-CLAY-L; text = t23d DiT-PCD-L
    (`dit/dit_trilatent.py:262,335`)."""
    ours, ref = _build(stage, variant)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_unused_reference_params_ignored():
    """cap_embedder / attention_y_norm / clip_spatial_proj keys in the
    checkpoint must not break conversion (they are runtime-dead in the
    reference forward, `dit/dit_i23d.py:520-567`)."""
    tm = TorchClayDiT(in_channels=3, dim=DIM, depth=1, heads=HEADS,
                      ctx_dim=CTX)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    assert any("cap_embedder" in k for k in sd)
    assert any("attention_y_norm" in k for k in sd)
    fm = PointDiT(in_channels=3, width=DIM, depth=1, heads=HEADS,
                  cond_dim=CTX, vector_dim=CTX, release_parity=True)
    r = np.random.RandomState(0)
    params = fm.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, N, 3)), jnp.zeros((1,)),
                     jnp.zeros((1, L, CTX)), jnp.zeros((1, CTX)))
    out = convert_gaussiananything_dit(sd, params)
    assert out is not None
