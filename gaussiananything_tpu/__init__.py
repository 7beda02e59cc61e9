"""GaussianAnything-TPU: a TPU-native (JAX/XLA/Pallas/pjit) native-3D generative
framework with the capabilities of NIRVANALAN/GaussianAnything (ICLR'25).

Built from scratch, TPU-first:
  * `ops`       — Pallas/XLA kernels: 2DGS surfel rasterizer (fwd+VJP), FPS,
                  chamfer, sinkhorn-EMD, attention wrappers.
  * `render`    — camera math, batched multi-view renderer, ply/obj IO, TSDF.
  * `models`    — flax modules: multi-view VAE encoder, DiT2 latent decoder,
                  cascaded gaussian upsamplers, flow-matching DiTs, conditioners.
  * `diffusion` — flow-matching transport (Linear/GVP/VP), ODE/SDE samplers, CFG.
  * `train`     — jitted train steps, optax states w/ EMA, loss stack, orbax ckpt.
  * `parallel`  — device-mesh construction and sharding rules (dp/tile axes).
  * `data`      — multi-view g-buffer pipeline, latent datasets, synthetic scenes.

Reference capability map: see SURVEY.md at the repo root (every module docstring
cites the reference file:line whose behaviour it reproduces).
"""

__version__ = "0.1.0"
