import jax.numpy as jnp
import numpy as np


class TestSynthetic:
    def test_batch_schema(self):
        from gaussiananything_tpu.data.synthetic import make_batch
        b = make_batch(seed=0, batch=2, n_views_in=2, n_views_sup=3, res=32,
                       n_pts=64, n_splats=128)
        assert b["images_in"].shape == (2, 2, 15, 32, 32)
        assert b["pcd"].shape == (2, 64, 3)
        assert b["cam_view"].shape == (2, 3, 4, 4)
        assert b["images_sup"].shape == (2, 3, 3, 32, 32)
        assert b["alpha_sup"].shape == (2, 3, 1, 32, 32)
        assert np.isfinite(np.asarray(b["images_in"])).all()

    def test_xyz_channel_consistency(self):
        """The xyz channels of the encoder input must match backprojected
        geometry: |xyz| <= object bound on foreground pixels."""
        from gaussiananything_tpu.data.synthetic import make_batch
        b = make_batch(seed=1, batch=1, n_views_in=2, n_views_sup=1, res=64,
                       n_pts=64, n_splats=512)
        xyz = np.asarray(b["images_in"][0, :, 12:15])    # (V, 3, H, W)
        fg = np.abs(xyz).sum(1) > 0
        assert fg.mean() > 0.05                           # object visible
        r = np.linalg.norm(xyz, axis=1)[fg]
        assert r.max() < 0.7, r.max()                     # near the object


class TestGBuffer:
    def test_pack_load_roundtrip(self, tmp_path):
        from gaussiananything_tpu.data.gbuffer import (export_synthetic_dataset,
                                                       MultiViewDataset)
        out = str(tmp_path / "ds")
        export_synthetic_dataset(out, n_instances=2, n_views=6, res=32,
                                 n_splats=128)
        ds = MultiViewDataset(out, n_views_in=2, n_views_sup=2, n_points=64)
        b = ds.batch(2)
        assert b["images_in"].shape == (2, 2, 15, 32, 32)
        assert b["pcd"].shape == (2, 64, 3)
        assert np.isfinite(np.asarray(b["images_in"])).all()

    def test_canonicalize_wiring(self, tmp_path):
        """frame_0_as_canonical in the batch pipeline: rebased cameras must
        keep seeing the same scene — the rebased pcd projected through the
        rebased supervision cameras lands on the same pixels as the
        original pcd through the original cameras."""
        from gaussiananything_tpu.data.gbuffer import (export_synthetic_dataset,
                                                       MultiViewDataset)
        out = str(tmp_path / "ds")
        export_synthetic_dataset(out, n_instances=2, n_views=6, res=32,
                                 n_splats=128)
        kw = dict(n_views_in=2, n_views_sup=2, n_points=64, seed=3)
        b0 = MultiViewDataset(out, **kw).batch(2)
        b1 = MultiViewDataset(out, canonicalize=True, **kw).batch(2)

        def project(pcd, cvp):
            h = np.concatenate([pcd, np.ones_like(pcd[..., :1])], -1)
            clip = np.einsum("bnj,bjk->bnk", h, np.asarray(cvp[:, 0]))
            return clip[..., :2] / np.clip(clip[..., 3:4], 1e-6, None)

        p0 = project(np.asarray(b0["pcd"]), np.asarray(b0["cam_view_proj"]))
        p1 = project(np.asarray(b1["pcd"]), np.asarray(b1["cam_view_proj"]))
        assert not np.allclose(np.asarray(b0["pcd"]),
                               np.asarray(b1["pcd"]))  # actually rebased
        np.testing.assert_allclose(p0, p1, atol=2e-4)

    def test_sharding(self, tmp_path):
        from gaussiananything_tpu.data.gbuffer import (export_synthetic_dataset,
                                                       MultiViewDataset)
        out = str(tmp_path / "ds")
        export_synthetic_dataset(out, n_instances=4, n_views=4, res=32,
                                 n_splats=64)
        d0 = MultiViewDataset(out, shard=(0, 2))
        d1 = MultiViewDataset(out, shard=(1, 2))
        assert len(d0.files) == 2 and len(d1.files) == 2
        assert set(d0.files).isdisjoint(d1.files)

    def test_prefetch_iterator(self, tmp_path):
        from gaussiananything_tpu.data.gbuffer import (export_synthetic_dataset,
                                                       MultiViewDataset)
        out = str(tmp_path / "ds")
        export_synthetic_dataset(out, n_instances=2, n_views=4, res=32,
                                 n_splats=64)
        it = MultiViewDataset(out, n_views_in=2, n_views_sup=2,
                              n_points=32).iterator(1)
        b1 = next(it)
        b2 = next(it)
        assert b1["images_in"].shape == b2["images_in"].shape


class TestConfig:
    def test_json_roundtrip(self):
        from gaussiananything_tpu.config import RunConfig, preset
        c = preset("demo-e2e")
        c2 = RunConfig.from_json(c.to_json())
        assert c2.vae.latent_num == c.vae.latent_num
        assert c2.render.lod_resolutions == c.render.lod_resolutions
        assert c2.transport.num_steps == c.transport.num_steps

    def test_presets_exist(self):
        from gaussiananything_tpu.config import preset
        for name in ["raster-demo", "render-512", "vae", "vae-small",
                     "stage1", "stage2", "t23d", "demo-e2e"]:
            c = preset(name)
            assert c.name == name


def test_train_vae_data_dir_holdout(tmp_path):
    """`cli.train_vae --data-dir/--holdout`: trains on a FIXED packed
    dataset with a held-out eval split — the quality-convergence harness
    (reference cadence: eval_novelview_loop, nsr/train_nv_util.py:2693)."""
    from gaussiananything_tpu.cli import train_vae
    from gaussiananything_tpu.config import (DataConfig, OptimConfig,
                                             RenderConfig, RunConfig,
                                             VAEModelConfig)
    from gaussiananything_tpu.data.gbuffer import export_synthetic_dataset

    ds = str(tmp_path / "ds")
    export_synthetic_dataset(ds, n_instances=3, n_views=4, res=32,
                             n_splats=128)
    cfg = RunConfig(
        name="tiny", logdir=str(tmp_path / "logs"),
        vae=VAEModelConfig(latent_num=8, z_channels=4, encoder_width=32,
                           decoder_width=32, decoder_depth=1,
                           decoder_heads=2, up_factors=(4,), up_depths=(1,)),
        render=RenderConfig(output_size=32, lod_resolutions=(16, 32)),
        data=DataConfig(resolution=32, n_views_in=2, n_views_sup=2,
                        n_points=64),
        optim=OptimConfig(lr=1e-4, warmup_steps=1, batch_size=2,
                          total_steps=2))
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(cfg.to_json())
    logdir = str(tmp_path / "run")
    train_vae.main(["--config", str(cfg_path), "--data-dir", ds,
                    "--holdout", "1", "--eval-every", "2", "--steps", "2",
                    "--logdir", logdir])
    import csv
    import glob as g
    rows = list(csv.DictReader(open(f"{logdir}/progress.csv")))
    assert any("eval/psnr" in r and r["eval/psnr"] for r in rows), rows
    assert g.glob(f"{logdir}/eval/eval_*.png")


def test_canonicalize_poses_and_pts():
    """Reference parity (datasets/g_buffer_objaverse.py:291,355): rebased
    canonical view sits at [0,0,-r] with identity rotation; points follow
    the same rigid transform (projection invariance)."""
    import jax.numpy as jnp
    import numpy as np

    from gaussiananything_tpu.data.postprocess import (canonicalize_poses,
                                                       canonicalize_pts)
    from gaussiananything_tpu.render import cameras

    poses = np.asarray(cameras.generate_input_camera(
        1.8, [(10, 30), (25, 140), (-10, 260)]))
    pcd = np.random.default_rng(0).normal(size=(64, 3)).astype(np.float32)

    new25 = np.asarray(canonicalize_poses(jnp.asarray(poses)))
    new_pcd = np.asarray(canonicalize_pts(jnp.asarray(poses),
                                          jnp.asarray(pcd)))

    # numpy transcription of the reference math
    c2w = poses[:, :16].reshape(-1, 4, 4)
    r = np.linalg.norm(c2w[0, :3, 3])
    F = np.eye(4); F[2, 3] = -r
    T = F @ np.linalg.inv(c2w[0])
    want = (T @ c2w).reshape(-1, 16)
    np.testing.assert_allclose(new25[:, :16], want, atol=1e-5)
    np.testing.assert_allclose(new25[:, 16:], poses[:, 16:], atol=0)
    hom = np.concatenate([pcd, np.ones((64, 1))], -1)
    np.testing.assert_allclose(new_pcd, (T @ hom.T).T[:, :3], atol=1e-5)

    # canonical view: identity rotation, camera at [0, 0, -r]
    nc = new25[0, :16].reshape(4, 4)
    np.testing.assert_allclose(nc[:3, :3], np.eye(3), atol=1e-5)
    np.testing.assert_allclose(nc[:3, 3], [0, 0, -r], atol=1e-5)

    # projection invariance: view-space points unchanged for every view
    for v in range(3):
        pv_old = (np.linalg.inv(c2w[v]) @ hom.T).T[:, :3]
        hom_new = np.concatenate([new_pcd, np.ones((64, 1))], -1)
        nv = new25[v, :16].reshape(4, 4)
        pv_new = (np.linalg.inv(nv) @ hom_new.T).T[:, :3]
        np.testing.assert_allclose(pv_new, pv_old, atol=1e-4)
