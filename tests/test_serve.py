"""Serving pipeline tests: the stdlib HTTP cascade server's model path
(`cli/serve.py::build_pipeline`) — stage-1 point cloud and the optional
stage-2 + VAE-decode cascade (`scripts/gradio_app_cascaded.py:229-235`
role) — driven directly, without sockets."""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from gaussiananything_tpu.cli.serve import build_pipeline
from gaussiananything_tpu.config import preset
from gaussiananything_tpu.models.vae import PointVAE
from gaussiananything_tpu.utils.param_io import save_params_npz


def _args(**kw):
    base = dict(preset="demo-e2e", release=False, stage1_ckpt=None,
                stage2_ckpt=None, vae_ckpt=None, cond_ckpt=None, steps=2)
    base.update(kw)
    return argparse.Namespace(**base)


def test_stage1_only(tmp_path):
    generate, cfg = build_pipeline(_args())
    img = (np.random.RandomState(0).rand(96, 96, 3) * 255).astype(np.uint8)
    out = generate(img, seed=1, out_dir=str(tmp_path))
    assert out["n_points"] == cfg.vae.latent_num
    assert (tmp_path / out["stage1_ply"].split("/")[-1]).exists()
    assert "gaussians_ply" not in out


def test_full_cascade_with_npz_vae(tmp_path):
    cfg = preset("demo-e2e")
    vae = PointVAE.from_config(cfg.vae)
    rng = jax.random.PRNGKey(0)
    K = cfg.vae.latent_num
    params = vae.init(rng, jnp.zeros((1, 1, 15, 64, 64)),
                      jnp.zeros((1, K, 3)), rng)
    ckpt = tmp_path / "vae.npz"
    save_params_npz(str(ckpt), params)

    generate, cfg = build_pipeline(_args(vae_ckpt=str(ckpt)))
    img = (np.random.RandomState(1).rand(96, 96, 3) * 255).astype(np.uint8)
    out = generate(img, seed=2, out_dir=str(tmp_path))
    assert "gaussians_ply" in out
    n_up = 1
    for f in cfg.vae.up_factors:
        n_up *= f
    assert out["n_gaussians"] == K * n_up
    assert (tmp_path / out["gaussians_ply"].split("/")[-1]).exists()


class TestMultipartParser:
    def test_payload_ending_in_special_bytes(self):
        """Regression: a byte-class rstrip(b'\\r\\n-') corrupted uploads
        whose file bytes end in CR, LF, or '-'."""
        from gaussiananything_tpu.cli.serve import parse_multipart_file
        for tail in (b"\r", b"\n", b"-", b"---", b"\r\n", b"ok"):
            payload = b"IMAGEBYTES" + tail
            body = (b"--BOUND\r\n"
                    b'Content-Disposition: form-data; name="file"; '
                    b'filename="x.png"\r\n'
                    b"Content-Type: image/png\r\n\r\n"
                    + payload + b"\r\n--BOUND--\r\n")
            got = parse_multipart_file(
                body, 'multipart/form-data; boundary=BOUND')
            assert got == payload, (tail, got)

    def test_quoted_boundary_and_missing_file(self):
        from gaussiananything_tpu.cli.serve import parse_multipart_file
        body = (b"--B1\r\n"
                b'Content-Disposition: form-data; name="file"; '
                b'filename="a"\r\n\r\nDATA\r\n--B1--\r\n')
        assert parse_multipart_file(
            body, 'multipart/form-data; boundary="B1"') == b"DATA"
        nofile = b"--B1\r\nContent-Disposition: form-data; " \
                 b'name="seed"\r\n\r\n7\r\n--B1--\r\n'
        assert parse_multipart_file(
            nofile, "multipart/form-data; boundary=B1") is None
