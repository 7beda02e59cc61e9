"""Jitted VAE training: multi-view reconstruction with per-LoD rendering,
KL annealing, 2DGS geometry regularisers and optional GAN.

Capability parity with `TrainLoop3DRecNVPatchSingleForwardMV_NoCrop(_adv)`
(`nsr/train_nv_util.py:1771-3048`):
  * batch carries input views (15-ch) + supervision views (rgb, alpha, depth)
    — the 4-input/4-novel split is done by the data pipeline
    (`:1900-1914`).
  * encode with FPS pcd anchors → decode all LoDs → render each LoD at its
    own resolution ({128,256,384,512} release ladder, `vit/vit_triplane.py:
    1605-1613`; `rand_base_render` picks ONE coarse LoD + the finest per
    step to bound compute, `:1550-1591`).
  * losses: per-LoD L1 + alpha + (perceptual on a random LoD) + KL (finest,
    linearly annealed) + 2DGS normal/distortion after warm-up steps
    (`:2158-2175`) + scale/opacity regs (`:2143-2155`) + optional chamfer
    point supervision (`:2244-2246`).
  * `_adv` subclass: alternating PatchGAN g/d steps (`:2877-3014`).

TPU-first: one jitted `train_step` (grad + optax update + EMA fused); data
parallel comes from compiling with batch sharded over the mesh `data` axis —
XLA inserts the grad psums (replaces DDP buckets / no_sync microbatching;
grad accumulation is a `lax.scan` over microbatches in `microbatch_step`).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from gaussiananything_tpu.ops.pointcloud import chamfer_distance
from gaussiananything_tpu.render.renderer import render_multiview
from gaussiananything_tpu.train import losses as L
from gaussiananything_tpu.train.state import TrainState, make_optimizer


@dataclasses.dataclass(frozen=True)
class VAELossConfig:
    l1_weight: float = 1.0
    perceptual_weight: float = 0.5
    alpha_weight: float = 1.0
    depth_weight: float = 0.5
    kl_target: float = 1e-5
    kl_anneal_steps: int = 5000
    normal_weight: float = 0.05
    normal_start_step: int = 3500      # reference: 35k of 100k (`:2158`)
    dist_weight: float = 100.0
    dist_start_step: int = 1500        # reference: 15k (`:2167`)
    scale_reg_weight: float = 1.0
    opacity_reg_weight: float = 0.01
    chamfer_weight: float = 0.0
    # render resolution per LoD, coarse→fine (scaled-down ladder by default;
    # set (128, 256, 384, 512) for release parity)
    lod_resolutions: Tuple[int, ...] = (64, 128, 192, 256)
    adv_weight: float = 0.0
    # reference GAN machinery (`nsr/train_nv_util.py:2877-3014`,
    # `dnnlib/util.py:41`): generator-side adversarial term is delayed and
    # balanced against the reconstruction gradient.
    adv_start_step: int = 0
    adaptive_adv: bool = True
    # rand_base_render parity (`vit/vit_triplane.py:1550-1591`): per step
    # supervise ONE random coarse LoD + the finest, instead of all LoDs —
    # bounds render compute like the reference. Off by default (small
    # ladders); enable for the release 4-LoD ladder.
    rand_coarse_lod: bool = False


def render_lods(lods, cam_view, cam_view_proj, tanfov, bg, resolutions,
                max_per_tile=1024, remat: bool = True, impl=None,
                mesh=None, chunk=None):
    """Render each LoD at its ladder resolution. Returns list of dicts.

    remat: wrap each render in `jax.checkpoint` so the backward recomputes
    the compositing instead of storing the per-chunk intermediates — the
    renders otherwise dominate training HBM (21 GB at vae-small/128²).

    chunk: None → the per-impl measured optimum (fused 128 / XLA 256,
    BENCH_NOTES r4 sweep); pass an explicit value to override.
    """
    from gaussiananything_tpu.render.renderer import default_impl
    if impl is None:
        impl = default_impl(grad=True)
    if chunk is None:
        chunk = 128 if impl.startswith("fused") else 256
    B, V = cam_view.shape[:2]
    tanfov = jnp.broadcast_to(jnp.asarray(tanfov, jnp.float32), (B, V))
    bg = jnp.broadcast_to(jnp.asarray(bg, jnp.float32), (B, V, 3))
    outs = []
    for g, res in zip(lods, resolutions):
        def _render(gg, res=res):
            return render_multiview(
                gg, cam_view, cam_view_proj, tanfov, bg, res,
                tile=16, max_per_tile=max_per_tile, chunk=chunk,
                tile_group=max(1, (res // 16) ** 2 // 16), impl=impl,
                mesh=mesh)

        outs.append(jax.checkpoint(_render)(g) if remat else _render(g))
    return outs


def _resize_to(x: jnp.ndarray, res: int) -> jnp.ndarray:
    """(B, V, C, H, W) → bilinear resize to (res, res)."""
    B, V, C, H, W = x.shape
    if H == res:
        return x
    return jax.image.resize(x, (B, V, C, res, res), "bilinear")


def vae_loss_fn(params, model, batch: Dict[str, jnp.ndarray], rng,
                step: jnp.ndarray, cfg: VAELossConfig,
                disc_params=None, disc_model=None, lpips_params=None,
                mesh=None):
    """batch keys:
      images_in   (B, V_in, 15, H, W)  — encoder input views
      pcd         (B, P, 3)            — FPS source point cloud
      cam_view / cam_view_proj (B, V_sup, 4, 4), tanfov scalar
      images_sup  (B, V_sup, 3, H, W), alpha_sup (B, V_sup, 1, H, W)
      depth_sup   (B, V_sup, 1, H, W)  (optional; zeros + mask off)
    """
    rng_s, rng_lpips, rng_coarse = jax.random.split(rng, 3)
    out = model.apply(params, batch["images_in"], batch["pcd"], rng_s)
    lods = out["lods"]
    n_lod = len(lods)
    bg = jnp.ones((3,), jnp.float32)

    logs: Dict[str, jnp.ndarray] = {}
    total = 0.0
    # random LoD gets the perceptual term (`:2015-2111` random-LoD LPIPS).
    # In rand_coarse mode only {coarse_idx, finest} are rendered, so the
    # draw must be between THOSE two — a draw over all n_lod LoDs would
    # silently drop the perceptual term whenever it landed on an
    # unrendered LoD (about half of all steps at 4 LoDs).
    if cfg.rand_coarse_lod and n_lod > 2:
        coarse_idx = jax.random.randint(rng_coarse, (), 0, n_lod - 1)
        lpips_lod = jnp.where(jax.random.bernoulli(rng_lpips),
                              n_lod - 1, coarse_idx)
    else:
        coarse_idx = None
        lpips_lod = jax.random.randint(rng_lpips, (), 0, n_lod)

    def lod_loss(rend, res, i, log=True):
        gt_img = _resize_to(batch["images_sup"], res)
        gt_alpha = _resize_to(batch["alpha_sup"], res)
        rec = L.l1(rend["image"], gt_img)
        al = L.mse(rend["alpha"], gt_alpha)
        sub = cfg.l1_weight * rec + cfg.alpha_weight * al
        if log:
            logs[f"l1_lod{i}"] = rec
            logs[f"alpha_lod{i}"] = al
        if cfg.perceptual_weight > 0:
            B, V = gt_img.shape[:2]

            # lax.cond (not a where-gate): the perceptual net fwd+bwd at up
            # to 512² is only EXECUTED for the selected LoD — a multiplied
            # zero weight still pays all n_lod VGG passes under XLA
            def _p(_):
                return L.perceptual_loss(
                    rend["image"].reshape(
                        (B * V,) + rend["image"].shape[2:]),
                    gt_img.reshape((B * V,) + gt_img.shape[2:]),
                    params=lpips_params)

            p = jax.lax.cond(lpips_lod == i, _p,
                             lambda _: jnp.zeros(()), None)
            sub += cfg.perceptual_weight * p
            if log:
                # zero when this LoD was not the drawn one
                logs[f"lpips_lod{i}"] = p
        if "depth_sup" in batch and cfg.depth_weight > 0:
            gt_d = _resize_to(batch["depth_sup"], res)
            dl = L.depth_loss_scale_invariant(
                rend["depth"], gt_d, _resize_to(batch["alpha_sup"], res))
            sub += cfg.depth_weight * dl
            if log:
                logs[f"depth_lod{i}"] = dl
        return sub

    def render_one(i):
        return render_lods(lods[i:i + 1], batch["cam_view"],
                           batch["cam_view_proj"], batch["tanfov"], bg,
                           cfg.lod_resolutions[i:i + 1], mesh=mesh)[0]

    if cfg.rand_coarse_lod and n_lod > 2:
        # one random coarse LoD (scalar loss via lax.switch — branch output
        # shapes must match, so each branch reduces to its own loss) + finest
        branches = [
            (lambda i=i: lod_loss(render_one(i), cfg.lod_resolutions[i], i,
                                  log=False))
            for i in range(n_lod - 1)
        ]
        coarse = jax.lax.switch(coarse_idx, branches)
        logs["coarse_lod_loss"] = coarse
        total += coarse
        renders = [render_one(n_lod - 1)]
        total += lod_loss(renders[-1], cfg.lod_resolutions[n_lod - 1],
                          n_lod - 1)
    else:
        renders = render_lods(lods, batch["cam_view"],
                              batch["cam_view_proj"], batch["tanfov"], bg,
                              cfg.lod_resolutions[:n_lod], mesh=mesh)
        for i, (rend, res) in enumerate(zip(renders, cfg.lod_resolutions)):
            total += lod_loss(rend, res, i)

    # KL on the bottleneck (finest-LoD step only in the reference; here the
    # single forward already covers it)
    kl = jnp.mean(out["kl"])
    kl_w = L.kl_coeff_schedule(step, cfg.kl_target, cfg.kl_anneal_steps)
    total += kl_w * kl
    logs["kl"] = kl

    # 2DGS geometry regularisers on the finest render, gated by step
    fin = renders[-1]
    dist_gate = (step >= cfg.dist_start_step).astype(jnp.float32)
    total += cfg.dist_weight * dist_gate * jnp.mean(fin["dist"])
    logs["dist"] = jnp.mean(fin["dist"])
    normal_gate = (step >= cfg.normal_start_step).astype(jnp.float32)
    # EXPECTED depth feeds the depth→normal surface, matching the reference
    # (`utils/point_utils.py:11,65` consumes allmap ch0/alpha, the
    # alpha-normalised expected depth — NOT the median). The depth L1/SI
    # supervision above stays on the median (`nsr/gs_surfel.py:137` exports
    # median as 'depth', which the reference's depth losses consume).
    surf_n = L.depth_to_normal(fin["depth_expected"], batch["cam_view"],
                               batch["tanfov"])
    nl = L.normal_consistency_loss(fin["rend_normal"], surf_n, fin["alpha"])
    total += cfg.normal_weight * normal_gate * nl
    logs["normal"] = nl

    total += cfg.scale_reg_weight * L.scale_reg(lods[-1])
    total += cfg.opacity_reg_weight * L.opacity_reg(lods[-1])
    # gaussian-statistics observability (the reference logs opacity/scale
    # histograms to TB, `nsr/train_nv_util.py:2117-2128`; we log summary
    # quantile stats CSV/TB-friendly)
    op = lods[-1][..., 3]
    sc = lods[-1][..., 4:6]
    logs["opacity_mean"] = jnp.mean(op)
    logs["opacity_p95"] = jnp.quantile(op, 0.95)
    logs["scale_mean"] = jnp.mean(sc)
    logs["scale_max"] = jnp.max(sc)

    if cfg.chamfer_weight > 0:
        cd = jnp.mean(chamfer_distance(lods[-1][..., :3], batch["pcd"]))
        total += cfg.chamfer_weight * cd
        logs["chamfer"] = cd

    if cfg.adv_weight > 0 and disc_params is not None:
        B, V = renders[-1]["image"].shape[:2]
        fake = renders[-1]["image"].reshape(
            (B * V,) + renders[-1]["image"].shape[2:])
        logits_fake = disc_model.apply(disc_params, fake)
        g_loss = L.hinge_g_loss(logits_fake)
        adv_gate = (step >= cfg.adv_start_step).astype(jnp.float32)
        if cfg.adaptive_adv:
            # calculate_adaptive_weight parity (`dnnlib/util.py:41`):
            # w = ‖∇rec‖ / (‖∇adv‖ + 1e-4) clipped to [0, 1e4]. The torch
            # version differentiates w.r.t. the decoder's LAST LAYER
            # weights; here we differentiate w.r.t. the finest gaussian
            # tensor (the decoder's output activations) — same balancing
            # signal, but the backward stops at the rasterizer instead of
            # re-entering the decoder. One extra finest render fwd + two
            # short backwards, only when the GAN is enabled.
            res_f = cfg.lod_resolutions[n_lod - 1]
            gt_f = _resize_to(batch["images_sup"], res_f)

            def heads(g):
                rend = render_lods([g], batch["cam_view"],
                                   batch["cam_view_proj"], batch["tanfov"],
                                   bg, [res_f], mesh=mesh)[0]
                img = rend["image"]
                rec = cfg.l1_weight * L.l1(img, gt_f)
                fk = img.reshape((B * V,) + img.shape[2:])
                adv = L.hinge_g_loss(disc_model.apply(disc_params, fk))
                return rec, adv

            _, vjp = jax.vjp(heads, jax.lax.stop_gradient(lods[-1]))
            one, zero = jnp.ones(()), jnp.zeros(())
            g_rec, = vjp((one, zero))
            g_adv, = vjp((zero, one))
            w_adapt = (jnp.linalg.norm(g_rec.reshape(-1))
                       / (jnp.linalg.norm(g_adv.reshape(-1)) + 1e-4))
            w_adapt = jax.lax.stop_gradient(jnp.clip(w_adapt, 0.0, 1e4))
            logs["adaptive_w"] = w_adapt
        else:
            w_adapt = 1.0
        total += cfg.adv_weight * adv_gate * w_adapt * g_loss
        logs["g_loss"] = g_loss

    logs["total"] = total
    return total, (logs, renders, lods)


def make_train_step(model, cfg: VAELossConfig, tx_cfg=None, donate=False,
                    disc_model=None, lpips_params=None, mesh=None):
    """Returns a jittable train_step(state, batch, rng) → (state, logs).

    `lpips_params`: optional converted VGG-LPIPS tree
    (`utils/param_io.convert_lpips_vgg`) — frozen, closed over the jit.
    `mesh`: optional data×tile Mesh — renders row-shard over its `tile`
    axis (see `render_multiview`); loss values are unchanged.
    """
    from gaussiananything_tpu.train.state import TrainStateConfig
    tx_cfg = tx_cfg or TrainStateConfig()
    tx = make_optimizer(tx_cfg)

    dec = (functools.partial(jax.jit, donate_argnums=(0,)) if donate
           else jax.jit)

    @dec
    def train_step(state: TrainState, batch, rng,
                   disc_params=None):
        def loss(p):
            return vae_loss_fn(p, model, batch, rng, state.step, cfg,
                               disc_params, disc_model, lpips_params,
                               mesh=mesh)

        (_, (logs, _, _)), grads = jax.value_and_grad(
            loss, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, tx,
                                          ema_decay=tx_cfg.ema_decay)
        logs["grad_norm"] = optax_global_norm(grads)
        return new_state, logs

    return train_step


def make_disc_step(model, disc_model, cfg: VAELossConfig, tx_cfg=None,
                   donate=False):
    """Discriminator step: hinge loss on real vs rendered images
    (`nsr/train_nv_util.py:2877-3014` d_step, every other run_loop)."""
    from gaussiananything_tpu.train.state import TrainStateConfig
    tx_cfg = tx_cfg or TrainStateConfig()
    tx = make_optimizer(tx_cfg)

    dec = (functools.partial(jax.jit, donate_argnums=(0,)) if donate
           else jax.jit)

    @dec
    def disc_step(disc_state: TrainState, gen_params, batch, rng):
        out = model.apply(gen_params, batch["images_in"], batch["pcd"], rng)
        fin = render_lods(
            out["lods"][-1:], batch["cam_view"], batch["cam_view_proj"],
            batch["tanfov"], jnp.ones((3,)), cfg.lod_resolutions[-1:])[0]
        B, V = fin["image"].shape[:2]
        fake = fin["image"].reshape((B * V,) + fin["image"].shape[2:])
        real = _resize_to(batch["images_sup"], cfg.lod_resolutions[-1])
        real = real.reshape((B * V,) + real.shape[2:])

        def loss(dp):
            lf = disc_model.apply(dp, jax.lax.stop_gradient(fake))
            lr = disc_model.apply(dp, real)
            return L.hinge_d_loss(lr, lf)

        d_loss, grads = jax.value_and_grad(loss)(disc_state.params)
        new_state = disc_state.apply_gradients(grads, tx,
                                               ema_decay=tx_cfg.ema_decay)
        return new_state, {"d_loss": d_loss}

    return disc_step


def make_accum_train_step(model, cfg: VAELossConfig, n_micro: int,
                          tx_cfg=None, disc_model=None, lpips_params=None,
                          donate=False, mesh=None):
    """TRUE gradient accumulation (the reference's microbatch loop,
    `nsr/train_util.py:95`): grads averaged over n_micro sequential
    micro-slices via `lax.scan`, ONE optimiser step. The batch's leading
    dim must be divisible by n_micro; peak memory is one micro-batch's
    activations (the scan re-uses buffers)."""
    from gaussiananything_tpu.train.state import TrainStateConfig
    tx_cfg = tx_cfg or TrainStateConfig()
    tx = make_optimizer(tx_cfg)

    dec = (functools.partial(jax.jit, donate_argnums=(0,)) if donate
           else jax.jit)

    @dec
    def train_step(state: TrainState, batch, rng, disc_params=None):
        def micro(b, key):
            def loss(p):
                return vae_loss_fn(p, model, b, key, state.step, cfg,
                                   disc_params, disc_model, lpips_params,
                                   mesh=mesh)

            (_, (logs, _, _)), grads = jax.value_and_grad(
                loss, has_aux=True)(state.params)
            return grads, logs

        def body(carry, i):
            acc = carry
            sub = jax.tree.map(
                lambda x: jax.lax.dynamic_slice_in_dim(
                    x, i * (x.shape[0] // n_micro),
                    x.shape[0] // n_micro, 0)
                if x.ndim > 0 else x, batch)
            g, logs = micro(sub, jax.random.fold_in(rng, i))
            acc = jax.tree.map(jnp.add, acc, g)
            return acc, logs

        zero = jax.tree.map(jnp.zeros_like, state.params)
        acc, logs_all = jax.lax.scan(body, zero, jnp.arange(n_micro))
        grads = jax.tree.map(lambda a: a / n_micro, acc)
        new_state = state.apply_gradients(grads, tx,
                                          ema_decay=tx_cfg.ema_decay)
        logs = jax.tree.map(lambda a: jnp.mean(a), logs_all)
        logs["grad_norm"] = optax_global_norm(grads)
        return new_state, logs

    return train_step


def optax_global_norm(tree) -> jnp.ndarray:
    return jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2)
                        for x in jax.tree.leaves(tree)))
