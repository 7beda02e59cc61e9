"""HTTP serving app for the cascaded image-to-3D pipeline.

Capability parity with `scripts/gradio_app_cascaded.py` (two-engine cascade
server: preprocess → stage-1 point cloud → stage-2 latent → VAE decode →
renders + meshes) without the gradio dependency (not in this image): a
stdlib http.server exposing

  GET  /            — minimal upload UI
  GET  /health      — liveness + model info
  POST /generate    — body: PNG/JPEG image → JSON with asset URLs
  GET  /assets/...  — generated ply/glb/png artifacts

    python -m gaussiananything_tpu.cli.serve --preset demo-e2e --port 7860
"""
from __future__ import annotations

import argparse
import io
import json
import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def parse_multipart_file(body: bytes, content_type: str):
    """Extract the first file part's raw bytes from a multipart/form-data
    body, or None if absent.

    Strips exactly ONE trailing CRLF (the protocol separator before the
    next boundary) — a byte-class rstrip would eat payload bytes that
    legitimately end in CR/LF/'-'. Handles quoted boundary= parameters.
    """
    bdry = content_type.split("boundary=")[-1].split(";")[0].strip()
    bdry = bdry.strip('"').encode()
    for part in body.split(b"--" + bdry):
        if b"filename=" in part:
            data = part.split(b"\r\n\r\n", 1)[-1]
            if data.endswith(b"\r\n"):
                data = data[:-2]
            return data
    return None


def build_pipeline(args):
    """Load models once; returns generate(image_array, seed) -> dict."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gaussiananything_tpu.config import preset
    from gaussiananything_tpu.models.conditioner import ImageConditioner
    from gaussiananything_tpu.models.dit import (stage1_dit,
                                                 stage1_dit_release,
                                                 stage2_dit,
                                                 stage2_dit_release)
    from gaussiananything_tpu.models.vae import PointVAE
    from gaussiananything_tpu.render.ply_io import (save_2dgs_ply,
                                                    save_pointcloud_glb,
                                                    save_pointcloud_ply)
    from gaussiananything_tpu.train.fm_trainer import (FMConfig, XYZ_SCALE,
                                                       make_sampler)
    from gaussiananything_tpu.train.state import (TrainState,
                                                  TrainStateConfig,
                                                  make_optimizer,
                                                  restore_checkpoint)

    cfg = preset(args.preset)
    if args.release:
        from gaussiananything_tpu.config import release_config
        cfg = release_config(cfg)
    rng = jax.random.PRNGKey(42)
    if args.release:
        dit = stage1_dit_release()
    else:
        dit = stage1_dit(cfg.dit.size, cond_dim=cfg.dit.cond_width,
                         vector_dim=cfg.dit.cond_width)
    cond = ImageConditioner(width=cfg.dit.cond_width,
                            depth=cfg.dit.cond_depth,
                            heads=cfg.dit.cond_heads,
                            img_size=cfg.dit.cond_img_size,
                            backbone="dinov2" if args.release else "scratch")
    K = cfg.vae.latent_num
    dummy = jnp.zeros((1, 3, cfg.dit.cond_img_size, cfg.dit.cond_img_size))
    cond_params = cond.init(rng, dummy)
    c0 = cond.apply(cond_params, dummy)
    dit_params = dit.init(rng, jnp.zeros((1, K, 3)), jnp.zeros((1,)),
                          c0.crossattn, c0.vector)
    tx = make_optimizer(TrainStateConfig())

    def _restore(ckpt, params):
        from gaussiananything_tpu.train.state import restore_inference_params
        return restore_inference_params(ckpt, params, tx)

    dit_params = _restore(args.stage1_ckpt, dit_params)
    cond_params = _restore(args.cond_ckpt, cond_params)

    fm = FMConfig(stage=1, cfg_scale=cfg.transport.cfg_scale,
                  num_steps=(args.steps if args.steps is not None
                             else cfg.transport.num_steps),
                  sampler=cfg.transport.sampler)
    sampler = make_sampler(dit, cond, fm, latent_shape=(K, 3))

    # optional stage-2 + VAE decode (the reference gradio app's second
    # engine, `scripts/gradio_app_cascaded.py:229-235`)
    sampler2 = dit2_params = vae = vae_params = None
    if args.stage2_ckpt or args.vae_ckpt:
        if args.release:
            dit2 = stage2_dit_release()
        else:
            dit2 = stage2_dit(cfg.dit.size, z_channels=cfg.vae.z_channels,
                              cond_dim=cfg.dit.cond_width,
                              vector_dim=cfg.dit.cond_width)
        dit2_params = dit2.init(rng, jnp.zeros((1, K, cfg.vae.z_channels)),
                                jnp.zeros((1,)), c0.crossattn, c0.vector,
                                jnp.zeros((1, K, 3)))
        dit2_params = _restore(args.stage2_ckpt, dit2_params)
        # separately-trained stage-2 conditioner (sample.py parity)
        cond2_params = (_restore(args.stage2_cond_ckpt, cond_params)
                        if getattr(args, "stage2_cond_ckpt", None)
                        else cond_params)
        fm2 = FMConfig(stage=2, cfg_scale=fm.cfg_scale,
                       num_steps=fm.num_steps, sampler=fm.sampler)
        sampler2 = make_sampler(dit2, cond, fm2,
                                latent_shape=(K, cfg.vae.z_channels))
        vae = PointVAE.from_config(cfg.vae)
        vae_params = vae.init(rng, jnp.zeros((1, 1, 15, 64, 64)),
                              jnp.zeros((1, K, 3)), rng)
        vae_params = _restore(args.vae_ckpt, vae_params)
    lock = threading.Lock()

    matting_params = None
    if getattr(args, "matting_ckpt", None):
        from gaussiananything_tpu.utils.param_io import (as_variables,
                                                         load_params_npz)
        # converter npz files are saved already wrapped as {"params": ...};
        # as_variables tolerates both (a blind wrap double-nests and flax
        # apply rejects the structure)
        matting_params = as_variables(load_params_npz(args.matting_ckpt))

    def preprocess(img: np.ndarray) -> jnp.ndarray:
        """The gradio app's preprocess (`scripts/gradio_app_cascaded.py:
        214-226`): remove background (U²-Net matting when --matting-ckpt
        is given, corner chroma key otherwise), crop + recenter the
        foreground at ratio 0.85, white background, resize."""
        from PIL import Image

        from gaussiananything_tpu.data.real import (remove_background,
                                                    resize_foreground)
        arr = np.asarray(Image.fromarray(img).convert("RGB"),
                         np.float32) / 255.0
        arr = remove_background(arr, matting_params=matting_params)
        arr = resize_foreground(arr)
        s = cfg.dit.cond_img_size
        arr = np.asarray(
            Image.fromarray((arr * 255).astype(np.uint8)).resize((s, s)),
            np.float32) / 255.0
        return jnp.asarray(np.moveaxis(arr, -1, 0))[None]

    def generate(img: np.ndarray, seed: int, out_dir: str) -> dict:
        with lock:
            t0 = time.time()
            x = preprocess(img)
            key = jax.random.PRNGKey(seed)
            xyz_n = sampler(dit_params, cond_params, x, key)
            # scene-extent clip before stage-2 conditioning
            # (`flow_matching_trainer.py:2131-2145`)
            xyz = np.clip(np.asarray(xyz_n[0]) * XYZ_SCALE, -0.45, 0.45)
            os.makedirs(out_dir, exist_ok=True)
            tag = f"{int(time.time() * 1000) % 10**9}"
            ply = f"pcd_{tag}.ply"
            glb = f"pcd_{tag}.glb"
            save_pointcloud_ply(os.path.join(out_dir, ply), xyz)
            save_pointcloud_glb(os.path.join(out_dir, glb), xyz)
            out = {"stage1_ply": f"/assets/{ply}",
                   "stage1_glb": f"/assets/{glb}",
                   "n_points": int(xyz.shape[0])}
            if sampler2 is not None:
                # release stage-2 conditions on fps-xyz / 0.45 (PCD_Scaler)
                xyz_cond = jnp.asarray(xyz)[None] / (0.45 if args.release
                                                     else 1.0)
                kl = sampler2(dit2_params, cond2_params, x, key,
                              xyz=xyz_cond)
                lods = vae.apply(vae_params, kl, jnp.asarray(xyz)[None],
                                 method=PointVAE.decode)
                gply = f"gaussians_{tag}.ply"
                save_2dgs_ply(os.path.join(out_dir, gply),
                              np.asarray(lods[-1][0]))
                out["gaussians_ply"] = f"/assets/{gply}"
                out["n_gaussians"] = int(lods[-1].shape[1])
            out["latency_s"] = round(time.time() - t0, 2)
            return out

    return generate, cfg


INDEX_HTML = """<!doctype html><title>GaussianAnything-TPU</title>
<h2>GaussianAnything-TPU: image &rarr; 3D</h2>
<form method=post enctype=multipart/form-data action=/generate>
<input type=file name=image accept=image/*>
<button type=submit>Generate</button></form>
<p>POST an image to /generate; JSON response links the generated assets.</p>
""".encode()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="demo-e2e")
    p.add_argument("--release", action="store_true",
                   help="official-checkpoint mode (npz from "
                        "cli.import_release)")
    p.add_argument("--stage1-ckpt", default=None)
    p.add_argument("--stage2-ckpt", default=None)
    p.add_argument("--stage2-cond-ckpt", default=None,
                   help="separately-trained stage-2 conditioner weights")
    p.add_argument("--vae-ckpt", default=None)
    p.add_argument("--cond-ckpt", default=None)
    p.add_argument("--matting-ckpt", default=None,
                   help="imported U2Net npz for background removal (rembg "
                        "role); corner chroma key otherwise")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--assets", default="/tmp/ga_serve_assets")
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    generate, cfg = build_pipeline(args)
    os.makedirs(args.assets, exist_ok=True)

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, body, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/":
                self._send(200, INDEX_HTML, "text/html")
            elif self.path == "/health":
                self._send(200, json.dumps(
                    {"status": "ok", "preset": cfg.name}).encode())
            elif self.path.startswith("/assets/"):
                name = os.path.basename(self.path)
                fp = os.path.join(args.assets, name)
                if os.path.exists(fp):
                    with open(fp, "rb") as f:
                        self._send(200, f.read(),
                                   "application/octet-stream")
                else:
                    self._send(404, b'{"error":"not found"}')
            else:
                self._send(404, b'{"error":"not found"}')

        def do_POST(self):
            from urllib.parse import parse_qs, urlparse
            url = urlparse(self.path)
            if url.path != "/generate":
                self._send(404, b'{"error":"not found"}')
                return
            length = int(self.headers.get("Content-Length", 0))
            if length == 0 or length > 64 * 1024 * 1024:
                self._send(400, b'{"error":"bad content length"}')
                return
            body = self.rfile.read(length)
            # accept either raw image bytes or multipart form
            ctype = self.headers.get("Content-Type", "")
            if "multipart" in ctype:
                data = parse_multipart_file(body, ctype)
                if data is None:
                    self._send(400, b'{"error":"no file in form"}')
                    return
                body = data
            try:
                import numpy as np
                from PIL import Image
                img = np.asarray(Image.open(io.BytesIO(body)).convert(
                    "RGB"))
            except Exception as e:  # noqa: BLE001
                self._send(400, json.dumps(
                    {"error": f"cannot decode image: {e}"}).encode())
                return
            # per-request seed: ?seed=N query param, else a fresh value per
            # request (the reference gradio app exposes seed; a hardcoded
            # one returned the identical sample for every upload)
            q = parse_qs(url.query)
            try:
                seed = int(q["seed"][0])
            except (KeyError, ValueError):
                seed = int.from_bytes(os.urandom(4), "little")
            out = generate(img, seed=seed, out_dir=args.assets)
            out["seed"] = seed
            self._send(200, json.dumps(out).encode())

        def log_message(self, fmt, *a):  # quiet
            pass

    srv = ThreadingHTTPServer(("0.0.0.0", args.port), Handler)
    print(f"serving on http://0.0.0.0:{args.port} (preset {cfg.name})",
          flush=True)
    srv.serve_forever()


if __name__ == "__main__":
    main()
