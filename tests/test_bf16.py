"""bf16 mixed-precision path (reference trains BF16 AMP,
`nsr/train_util.py:119-127`).

Design contract: `dtype=bfloat16` switches matmul/activation COMPUTE to
bf16 while parameters, norms, latent statistics, and the activated
gaussians (rasterizer input) stay fp32.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussiananything_tpu.data.synthetic import make_batch
from gaussiananything_tpu.models.conditioner import ImageConditioner
from gaussiananything_tpu.models.dit import stage1_dit
from gaussiananything_tpu.models.vae import PointVAE
from gaussiananything_tpu.ops.gaussians import activate_gaussians
from gaussiananything_tpu.train.vae_trainer import VAELossConfig, vae_loss_fn


def tiny_vae(dtype):
    return PointVAE(latent_num=16, z_channels=4, encoder_width=64,
                    decoder_width=64, decoder_heads=4, decoder_depth=2,
                    up_factors=(4,), up_depths=(1,), dtype=dtype)


class TestActivationBoundary:
    def test_activate_gaussians_pins_fp32(self):
        raw = jnp.zeros((2, 8, 13), jnp.bfloat16)
        anchors = jnp.zeros((2, 8, 3), jnp.bfloat16)
        out = activate_gaussians(raw, anchors)
        assert out.dtype == jnp.float32

    def test_params_stay_fp32(self):
        model = tiny_vae(jnp.bfloat16)
        b = make_batch(seed=0, batch=1, n_views_in=2, n_views_sup=1,
                       res=32, n_pts=64, n_splats=128)
        rng = jax.random.PRNGKey(0)
        params = model.init(rng, b["images_in"], b["pcd"], rng)
        dtypes = {x.dtype for x in jax.tree.leaves(params)}
        assert dtypes == {jnp.dtype(jnp.float32)}


class TestVAEBf16:
    @pytest.fixture(scope="class")
    def batch(self):
        return make_batch(seed=0, batch=1, n_views_in=2, n_views_sup=2,
                          res=32, n_pts=64, n_splats=128)

    def test_forward_close_to_fp32(self, batch):
        rng = jax.random.PRNGKey(0)
        m32, m16 = tiny_vae(jnp.float32), tiny_vae(jnp.bfloat16)
        params = m32.init(rng, batch["images_in"], batch["pcd"], rng)
        o32 = m32.apply(params, batch["images_in"], batch["pcd"], rng)
        o16 = m16.apply(params, batch["images_in"], batch["pcd"], rng)
        g32, g16 = o32["lods"][-1], o16["lods"][-1]
        assert g16.dtype == jnp.float32          # activated gaussians fp32
        # bf16 has ~3 decimal digits; activations are bounded [0,1]-ish
        np.testing.assert_allclose(np.asarray(g16), np.asarray(g32),
                                   atol=0.05)

    def test_loss_and_grads_finite(self, batch):
        rng = jax.random.PRNGKey(0)
        model = tiny_vae(jnp.bfloat16)
        params = model.init(rng, batch["images_in"], batch["pcd"], rng)
        cfg = VAELossConfig(lod_resolutions=(16, 32), perceptual_weight=0.0)

        def loss(p):
            l, _ = vae_loss_fn(p, model, batch, rng,
                               jnp.asarray(0, jnp.int32), cfg)
            return l

        val, grads = jax.value_and_grad(loss)(params)
        assert np.isfinite(float(val))
        leaves = jax.tree.leaves(grads)
        assert all(x.dtype == jnp.float32 for x in leaves)
        assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)


class TestDiTBf16:
    def test_denoise_close_to_fp32(self):
        rng = jax.random.PRNGKey(0)
        kw = dict(depth=2, width=64, heads=4, cond_dim=32, vector_dim=32)
        d32 = stage1_dit("S", **kw)
        d16 = stage1_dit("S", dtype=jnp.bfloat16, **kw)
        x = jax.random.normal(rng, (2, 32, 3))
        t = jnp.full((2,), 0.3)
        ctx = jax.random.normal(jax.random.fold_in(rng, 1), (2, 5, 32))
        vec = jax.random.normal(jax.random.fold_in(rng, 2), (2, 32))
        params = d32.init(rng, x, t, ctx, vec)
        v32 = d32.apply(params, x, t, ctx, vec)
        v16 = d16.apply(params, x, t, ctx, vec)
        scale = float(jnp.abs(v32).max())
        np.testing.assert_allclose(np.asarray(v16, np.float32),
                                   np.asarray(v32),
                                   atol=0.05 * max(scale, 1.0))

    def test_conditioner_bf16(self):
        rng = jax.random.PRNGKey(0)
        cond = ImageConditioner(width=32, depth=1, heads=4, img_size=28,
                                dtype=jnp.bfloat16)
        imgs = jax.random.uniform(rng, (2, 3, 28, 28))
        params = cond.init(rng, imgs)
        c = cond.apply(params, imgs)
        assert np.all(np.isfinite(np.asarray(c.crossattn, np.float32)))
        assert np.all(np.isfinite(np.asarray(c.vector, np.float32)))


class TestConfigPlumbing:
    def test_compute_dtype_helper(self):
        from gaussiananything_tpu.config import compute_dtype
        assert compute_dtype("float32") == jnp.float32
        assert compute_dtype("bfloat16") == jnp.bfloat16
        with pytest.raises(ValueError):
            compute_dtype("float16")

    def test_json_roundtrip_carries_dtype(self):
        from gaussiananything_tpu.config import RunConfig
        c = RunConfig()
        c.vae.compute_dtype = "bfloat16"
        c2 = RunConfig.from_json(c.to_json())
        assert c2.vae.compute_dtype == "bfloat16"
