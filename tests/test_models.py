import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def rng():
    return jax.random.PRNGKey(0)


class TestVAE:
    @pytest.fixture(scope="class")
    def small_vae(self):
        from gaussiananything_tpu.models.vae import PointVAE
        return PointVAE(latent_num=16, z_channels=4, encoder_width=64,
                        decoder_width=64, decoder_depth=2, decoder_heads=4,
                        up_factors=(2, 2), up_depths=(1, 1))

    @pytest.fixture(scope="class")
    def inputs(self):
        r = np.random.default_rng(0)
        imgs = jnp.asarray(r.normal(size=(2, 2, 15, 32, 32)), jnp.float32)
        pcd = jnp.asarray(r.uniform(-0.4, 0.4, (2, 64, 3)), jnp.float32)
        return imgs, pcd

    def test_forward_shapes(self, small_vae, inputs, rng):
        imgs, pcd = inputs
        params = small_vae.init(rng, imgs, pcd, rng)
        out = small_vae.apply(params, imgs, pcd, rng)
        assert len(out["lods"]) == 3
        assert out["lods"][0].shape == (2, 16, 13)
        assert out["lods"][1].shape == (2, 32, 13)
        assert out["lods"][2].shape == (2, 64, 13)
        assert out["kl"].shape == (2,)
        assert np.isfinite(np.asarray(out["lods"][-1])).all()

    def test_activation_ranges(self, small_vae, inputs, rng):
        imgs, pcd = inputs
        params = small_vae.init(rng, imgs, pcd, rng)
        out = small_vae.apply(params, imgs, pcd, rng)
        g = np.asarray(out["lods"][-1])
        assert (np.abs(g[..., 0:3]) <= 0.45 + 1e-6).all()      # xyz bound
        assert ((g[..., 3:4] > 0) & (g[..., 3:4] < 1)).all()   # opacity
        assert (g[..., 4:6] > 0).all()                         # scale
        np.testing.assert_allclose(                            # unit quats
            np.linalg.norm(g[..., 6:10], axis=-1), 1.0, atol=1e-4)
        assert ((g[..., 10:13] >= 0) & (g[..., 10:13] <= 1)).all()

    def test_head_init_contract(self, small_vae, inputs, rng):
        # at init: opacity≈sigmoid(0)=0.5, scale≈softplus(-2.5)*gain,
        # xyz ≈ anchors (zero offsets)
        imgs, pcd = inputs
        params = small_vae.init(rng, imgs, pcd, rng)
        out = small_vae.apply(params, imgs, pcd, rng)
        g0 = np.asarray(out["lods"][0])
        anchors = np.asarray(out["anchors"])
        from gaussiananything_tpu.ops.gaussians import SCALE_GAIN
        # offsets are tanh(0)=0 at init modulo the head's rotation-row weights
        np.testing.assert_allclose(g0[..., 0:3], anchors, atol=0.03)
        expect_scale = np.log1p(np.exp(-2.5)) * SCALE_GAIN
        np.testing.assert_allclose(g0[..., 4:6].mean(), expect_scale,
                                   rtol=0.5)

    def test_latent_for_diffusion(self, small_vae, inputs, rng):
        imgs, pcd = inputs
        params = small_vae.init(rng, imgs, pcd, rng)
        lat = small_vae.apply(params, imgs, pcd, rng,
                              method=small_vae.latent_for_diffusion)
        assert lat.shape == (2, 16, 4 + 3)

    def test_kl_positive(self, small_vae, inputs, rng):
        imgs, pcd = inputs
        params = small_vae.init(rng, imgs, pcd, rng)
        out = small_vae.apply(params, imgs, pcd, rng)
        assert (np.asarray(out["kl"]) >= 0).all()


class TestDiT:
    def test_stage1_shapes(self, rng):
        from gaussiananything_tpu.models.dit import stage1_dit
        m = stage1_dit("S", cond_dim=64, vector_dim=64)
        x = jnp.zeros((2, 32, 3))
        t = jnp.array([0.1, 0.9])
        ctx = jnp.zeros((2, 10, 64))
        vec = jnp.zeros((2, 64))
        params = m.init(rng, x, t, ctx, vec)
        v = m.apply(params, x, t, ctx, vec)
        assert v.shape == (2, 32, 3)
        assert v.dtype == jnp.float32

    def test_stage2_needs_xyz(self, rng):
        from gaussiananything_tpu.models.dit import stage2_dit
        m = stage2_dit("S", z_channels=10, cond_dim=64, vector_dim=64)
        x = jnp.zeros((2, 32, 10))
        t = jnp.array([0.5, 0.5])
        ctx = jnp.zeros((2, 10, 64))
        vec = jnp.zeros((2, 64))
        xyz = jnp.zeros((2, 32, 3))
        params = m.init(rng, x, t, ctx, vec, xyz)
        v = m.apply(params, x, t, ctx, vec, xyz)
        assert v.shape == (2, 32, 10)
        # un-zero the output head so conditioning sensitivity is observable
        keys = iter(jax.random.split(jax.random.PRNGKey(1), 10000))
        params = jax.tree.map(
            lambda a: a + 0.01 * jax.random.normal(next(keys), a.shape),
            params)
        v = m.apply(params, x, t, ctx, vec, xyz)
        xyz2 = jnp.ones((2, 32, 3)) * 0.3
        v2 = m.apply(params, x, t, ctx, vec, xyz2)
        assert not np.allclose(np.asarray(v), np.asarray(v2), atol=1e-6)

    def test_zero_init_final(self, rng):
        # at init the velocity head is zero → output exactly 0
        from gaussiananything_tpu.models.dit import stage1_dit
        m = stage1_dit("S", cond_dim=32, vector_dim=32)
        x = jnp.ones((1, 8, 3))
        params = m.init(rng, x, jnp.array([0.3]), jnp.ones((1, 4, 32)),
                        jnp.ones((1, 32)))
        v = m.apply(params, x, jnp.array([0.3]), jnp.ones((1, 4, 32)),
                    jnp.ones((1, 32)))
        np.testing.assert_allclose(np.asarray(v), 0.0, atol=1e-6)


class TestConditioner:
    def test_image_conditioner(self, rng):
        from gaussiananything_tpu.models.conditioner import ImageConditioner
        c = ImageConditioner(width=64, depth=2, heads=4, img_size=28)
        imgs = jnp.zeros((2, 3, 28, 28))
        params = c.init(rng, imgs)
        cond = c.apply(params, imgs)
        assert cond.crossattn.shape == (2, 4 + 1 + 4, 64)  # 2x2 patches
        assert cond.vector.shape == (2, 64)
        uc = c.unconditional(2)
        assert uc.crossattn.shape == cond.crossattn.shape
        np.testing.assert_allclose(np.asarray(uc.vector), 0.0)

    def test_ucg_dropout(self, rng):
        from gaussiananything_tpu.models.conditioner import ImageConditioner
        c = ImageConditioner(width=32, depth=1, heads=4, img_size=28,
                             ucg_rate=1.0)
        imgs = jnp.ones((4, 3, 28, 28))
        params = c.init(rng, imgs)
        cond = c.apply(params, imgs, rng=rng, train=True)
        np.testing.assert_allclose(np.asarray(cond.crossattn), 0.0)

    def test_text_conditioner(self, rng):
        from gaussiananything_tpu.models.conditioner import (TextConditioner,
                                                             tokenize_bytes)
        c = TextConditioner(width=32, depth=1, heads=4)
        toks = jnp.asarray(tokenize_bytes(["a red chair", "a blue sofa"]))
        params = c.init(rng, toks)
        cond = c.apply(params, toks)
        assert cond.crossattn.shape == (2, 77, 32)
        assert cond.vector.shape == (2, 32)


class TestTransport:
    def test_gvp_boundaries(self):
        from gaussiananything_tpu.diffusion.transport import create_transport
        tr = create_transport("gvp")
        x1 = jnp.ones((2, 4, 3))
        x0 = jnp.zeros((2, 4, 3))
        xt, _ = tr.plan(x1, x0, jnp.array([0.0, 1.0]))
        np.testing.assert_allclose(np.asarray(xt[0]), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(xt[1]), 1.0, atol=1e-6)

    @pytest.mark.parametrize("path", ["linear", "gvp", "vp"])
    def test_velocity_is_time_derivative(self, path):
        from gaussiananything_tpu.diffusion.transport import create_transport
        tr = create_transport(path)
        x1 = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 3)))
        x0 = jnp.asarray(np.random.default_rng(1).normal(size=(1, 8, 3)))
        t = jnp.array([0.4])
        eps = 1e-3
        xt_p, _ = tr.plan(x1, x0, t + eps)
        xt_m, _ = tr.plan(x1, x0, t - eps)
        _, ut = tr.plan(x1, x0, t)
        fd = (np.asarray(xt_p) - np.asarray(xt_m)) / (2 * eps)
        np.testing.assert_allclose(fd, np.asarray(ut), atol=1e-3)

    def test_training_loss_zero_for_oracle(self):
        from gaussiananything_tpu.diffusion.transport import create_transport
        tr = create_transport("linear")
        x1 = jnp.asarray(np.random.default_rng(0).normal(size=(4, 8, 3)),
                         jnp.float32)

        rng = jax.random.PRNGKey(0)
        # oracle velocity for linear path: u = x1 - x0; from xt and t:
        # x0 = (xt - t*x1)/(1-t) → u = (x1 - xt)/(1 - t)
        def oracle(xt, t, **kw):
            tb = t.reshape(-1, 1, 1)
            return (x1 - xt) / (1 - tb)

        loss, _ = tr.training_loss(oracle, rng, x1)
        assert float(loss) < 1e-8

    def test_sample_ode_recovers_gaussian_shift(self):
        # velocity field of a pure translation: v = const → x1 = x0 + v
        from gaussiananything_tpu.diffusion.sampling import sample_ode
        shift = jnp.array([1.0, -2.0, 3.0])
        v_fn = lambda x, t: jnp.broadcast_to(shift, x.shape)  # noqa: E731
        x0 = jnp.zeros((2, 5, 3))
        x1 = sample_ode(v_fn, x0, num_steps=8, method="euler")
        np.testing.assert_allclose(np.asarray(x1),
                                   np.broadcast_to(shift, (2, 5, 3)),
                                   atol=1e-5)

    def test_cfg_mixing(self):
        from gaussiananything_tpu.diffusion.sampling import cfg_velocity_fn
        # cond-dependent constant field
        def vf(x, t, c):
            return jnp.broadcast_to(c["v"][:, None, None], x.shape)

        cond = {"v": jnp.array([2.0])}
        uncond = {"v": jnp.array([1.0])}
        guided = cfg_velocity_fn(vf, cond, uncond, cfg_scale=3.0)
        v = guided(jnp.zeros((1, 4, 3)), jnp.zeros((1,)))
        # 1 + 3*(2-1) = 4
        np.testing.assert_allclose(np.asarray(v), 4.0)


class TestSamplers:
    def test_sde_preserves_marginals(self):
        """Score-corrected SDE must reproduce the flow's marginals.

        Data = the single point mu under the linear path, so the true
        velocity field is v(x,t) = mu - (x - t*mu)/(1-t) and the marginal
        at time t is N(t*mu, (1-t)^2 I). After the EM integration to
        t1 = 1 - h and the "Mean" last step x += drift*h, the analytic
        output law is N(mu, (h*(1 + h/t1))^2 I). An SDE sampler whose
        noise is NOT balanced by the diffusion*score drift (the round-1
        bug) lands far over-dispersed — this pins the exact parity with
        `transport/transport.py:268-306`.
        """
        from gaussiananything_tpu.diffusion.sampling import sample_sde
        from gaussiananything_tpu.diffusion.transport import linear_path

        mu = jnp.array([1.0, -2.0, 3.0])

        def v_fn(x, t):
            tb = t.reshape((-1,) + (1,) * (x.ndim - 1))
            return mu - (x - tb * mu) / (1.0 - tb)

        x0 = jax.random.normal(jax.random.PRNGKey(1), (4096, 1, 3))
        h = 0.04
        x1 = sample_sde(v_fn, x0, jax.random.PRNGKey(0), path=linear_path(),
                        num_steps=256, last_step_size=h)
        x1 = np.asarray(x1).reshape(-1, 3)
        t1 = 1.0 - h
        sigma_final = h * (1.0 + h / t1)
        np.testing.assert_allclose(x1.mean(axis=0), np.asarray(mu), atol=0.01)
        np.testing.assert_allclose(x1.std(axis=0),
                                   sigma_final, rtol=0.2)

    def test_adaptive_matches_fixed_step(self):
        from gaussiananything_tpu.diffusion.sampling import (
            sample_ode, sample_ode_adaptive)

        # smooth linear velocity field: v = -x + c (analytic solution)
        c = jnp.array([0.5, -1.0, 2.0])

        def v_fn(x, t):
            return -x + c

        x0 = jnp.ones((2, 4, 3))
        fixed = sample_ode(v_fn, x0, num_steps=256, method="heun")
        adaptive = sample_ode_adaptive(v_fn, x0, rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(adaptive), np.asarray(fixed),
                                   atol=1e-3)
        # analytic: x(1) = c + (x0 - c) e^{-1}
        expect = np.asarray(c) + (1 - np.asarray(c)) * np.exp(-1)
        np.testing.assert_allclose(np.asarray(adaptive)[0, 0], expect,
                                   atol=1e-3)
