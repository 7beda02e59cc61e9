"""Flow-matching diffusion training on pre-extracted latents.

Capability parity with `FlowMatchingEngine(_gs)`
(`nsr/lsgm/flow_matching_trainer.py:156-572,887`):
  * latents come PRE-EXTRACTED (no VAE forward in diffusion training,
    `:536`; dataset `datasets/g_buffer_objaverse.py:3661-3687`).
  * stage-1 target = normalised fps-xyz (768×3, xyz/0.164);
    stage-2 target = KL latent (768×10) conditioned on stage-1 xyz.
  * conditioner forward with ucg dropout inside the loss
    (`sgm/modules/encoders/modules.py:130-174`); optional separate lr for
    the embedder group (0.5×, `:374-399`) via optax multi_transform.
  * loss = transport velocity MSE (`transport/transport.py:148-190`).

Sampling (`:701-744`): z ~ N(0,1) → CFG batch-doubled ODE integration →
unnormalise ×0.164 (stage-1) / split (kl, xyz) (stage-2).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from gaussiananything_tpu.diffusion.sampling import (cfg_velocity_fn,
                                                     sample_ode,
                                                     sample_ode_adaptive)
from gaussiananything_tpu.diffusion.transport import Transport
from gaussiananything_tpu.train.state import (TrainState, TrainStateConfig,
                                              make_optimizer)

XYZ_SCALE = 0.164   # `datasets/g_buffer_objaverse.py:3645`


@dataclasses.dataclass(frozen=True)
class FMConfig:
    stage: int = 1                      # 1: geometry xyz; 2: texture latent
    cfg_scale: float = 4.5              # release i23d-stage1.sh
    num_steps: int = 250
    sampler: str = "heun"               # 'euler'|'heun'|'dopri5'
    latent_divider: float = 1.0         # triplane_scaling_divider


def make_fm_train_step(dit_model, conditioner_model, transport: Transport,
                       cfg: FMConfig, tx_cfg: Optional[TrainStateConfig] = None,
                       train_conditioner: bool = True, accum: int = 1,
                       donate: bool = False):
    """Returns train_step(state, cond_state, batch, rng) → (state, cond_state, logs).

    batch keys: 'latent' (B, N, C) training target (already normalised);
    'cond' conditioner input (images (B,3,H,W) or token ids);
    stage-2 additionally 'xyz' (B, N, 3).

    `accum > 1` = TRUE gradient accumulation: the batch is split into
    `accum` microbatches scanned sequentially, grads averaged, ONE
    optimizer update — the reference's microbatch slicing loop
    (`nsr/lsgm/flow_matching_trainer.py:504-511`). This is the memory
    knob for release-batch training on one chip: activations scale with
    B/accum while the update still sees the full batch.
    """
    base = tx_cfg or TrainStateConfig()
    tx = make_optimizer(base)
    # embedder group at 0.5× lr (`flow_matching_trainer.py:374-399`)
    cond_tx = make_optimizer(dataclasses.replace(base, lr=base.lr * 0.5))

    def micro_grads(dit_params, cond_params, batch, rng):
        rng_c, rng_t = jax.random.split(rng)

        def loss(dp, cp, cond_pre=None):
            cond = (conditioner_model.apply(cp, batch["cond"],
                                            rng=rng_c, train=True)
                    if cond_pre is None else cond_pre)

            def velocity(xt, t):
                kwargs = {}
                if cfg.stage == 2:
                    kwargs["xyz"] = batch["xyz"]
                return dit_model.apply(dp, xt, t, cond.crossattn,
                                       cond.vector, **kwargs)

            x1 = batch["latent"] / cfg.latent_divider
            l, aux = transport.training_loss(
                lambda xt, t: velocity(xt, t), rng_t, x1)
            return l, aux

        if train_conditioner:
            (l, aux), grads = jax.value_and_grad(
                loss, argnums=(0, 1), has_aux=True)(dit_params, cond_params)
            return l, aux, grads[0], grads[1]
        # frozen conditioner: run its forward OUTSIDE the differentiated
        # function — inside it, the linearization pins the whole tower's
        # activations across the DiT fwd+bwd even under stop_gradient
        # (microbatch 32 OOM'd on f32[32,768,1024] ViT-L attention temps,
        # BENCH_NOTES r4). Hoisted, XLA frees them after the cond output;
        # only the (crossattn, vector) embeddings live into the backward.
        cond = conditioner_model.apply(
            jax.lax.stop_gradient(cond_params), batch["cond"],
            rng=rng_c, train=True)
        cond = jax.lax.stop_gradient(cond)
        (l, aux), g_dit = jax.value_and_grad(
            loss, argnums=0, has_aux=True)(
                dit_params, cond_params, cond_pre=cond)
        return l, aux, g_dit, None

    # donate=True aliases the states through the update: without it the
    # optimizer step holds old AND new params/moments/EMA simultaneously
    # (~2x parameter memory — the difference between fitting and OOMing
    # DiT-L batch 32 on 16 GB). Opt-in because a donated input state is
    # consumed — callers that reuse it (tests, comparisons) keep the
    # default.
    dec = (functools.partial(jax.jit, donate_argnums=(0, 1)) if donate
           else jax.jit)

    @dec
    def train_step(state: TrainState, cond_state: TrainState, batch, rng):
        if accum == 1:
            l, aux, g_dit, g_cond = micro_grads(state.params,
                                                cond_state.params, batch, rng)
            t_mean = jnp.mean(aux["t"])
        else:
            B = batch["latent"].shape[0]
            assert B % accum == 0, (B, accum)
            mb = B // accum

            def body(carry, i):
                g_d, g_c, l_acc, t_acc = carry
                sub = jax.tree.map(
                    lambda a: jax.lax.dynamic_slice_in_dim(a, i * mb, mb, 0),
                    batch)
                l, aux, gd, gc = micro_grads(state.params, cond_state.params,
                                             sub, jax.random.fold_in(rng, i))
                g_d = jax.tree.map(jnp.add, g_d, gd)
                if gc is not None:
                    g_c = jax.tree.map(jnp.add, g_c, gc)
                return (g_d, g_c, l_acc + l, t_acc + jnp.mean(aux["t"])), None

            zeros_d = jax.tree.map(jnp.zeros_like, state.params)
            # frozen conditioner → no grad accumulator (a full zero tree
            # in the scan carry would cost another |cond params| of HBM)
            zeros_c = (jax.tree.map(jnp.zeros_like, cond_state.params)
                       if train_conditioner else jnp.zeros(()))
            (g_dit, g_cond, l, t_sum), _ = jax.lax.scan(
                body, (zeros_d, zeros_c, 0.0, 0.0), jnp.arange(accum))
            inv = 1.0 / accum
            g_dit = jax.tree.map(lambda g: g * inv, g_dit)
            g_cond = (jax.tree.map(lambda g: g * inv, g_cond)
                      if train_conditioner else None)
            l = l * inv
            t_mean = t_sum * inv
        new_state = state.apply_gradients(g_dit, tx,
                                          ema_decay=base.ema_decay)
        if train_conditioner and g_cond is not None:
            new_cond = cond_state.apply_gradients(
                g_cond, cond_tx, ema_decay=base.ema_decay)
        else:
            new_cond = cond_state
        logs = {"fm_loss": l, "t_mean": t_mean}
        return new_state, new_cond, logs

    return train_step


def make_sampler(dit_model, conditioner_model, cfg: FMConfig,
                 latent_shape) -> Callable:
    """Returns sample(dit_params, cond_params, cond_input, rng, xyz=None) →
    latent samples. CFG via batch-doubling; the WHOLE sampling loop
    (conditioner forward + N velocity evals) is one jitted program — eager
    per-step dispatch costs ~100× on a tunneled TPU."""

    import functools as _ft

    @_ft.partial(jax.jit, static_argnames=("scale", "steps", "with_xyz"))
    def _sample_jit(dit_params, cond_params, cond_input, rng, xyz,
                    scale: float, steps: int, with_xyz: bool):
        B = jax.tree.leaves(cond_input)[0].shape[0]
        cond = conditioner_model.apply(cond_params, cond_input)
        uncond = jax.tree.map(jnp.zeros_like, cond)

        def velocity(x, t, c):
            kwargs = {}
            if with_xyz:
                kwargs["xyz"] = jnp.concatenate([xyz, xyz], 0) \
                    if x.shape[0] == 2 * B else xyz
            return dit_model.apply(dit_params, x, t, c.crossattn, c.vector,
                                   **kwargs)

        guided = cfg_velocity_fn(velocity, cond, uncond, scale)
        x0 = jax.random.normal(rng, (B,) + tuple(latent_shape))
        if cfg.sampler == "dopri5":
            x1 = sample_ode_adaptive(guided, x0)
        else:
            x1 = sample_ode(guided, x0, num_steps=steps, method=cfg.sampler)
        return x1 * cfg.latent_divider

    def sample(dit_params, cond_params, cond_input, rng,
               xyz: Optional[jnp.ndarray] = None,
               cfg_scale: Optional[float] = None,
               num_steps: Optional[int] = None):
        scale = cfg.cfg_scale if cfg_scale is None else cfg_scale
        steps = cfg.num_steps if num_steps is None else num_steps
        with_xyz = cfg.stage == 2
        if with_xyz:
            assert xyz is not None, "stage-2 sampling needs stage-1 xyz"
        else:
            B = jax.tree.leaves(cond_input)[0].shape[0]
            xyz = jnp.zeros((B,) + tuple(latent_shape[:-1]) + (3,))
        return _sample_jit(dit_params, cond_params, cond_input, rng, xyz,
                           scale=float(scale), steps=int(steps),
                           with_xyz=with_xyz)

    return sample


def unnormalize_stage1(xyz_latent: jnp.ndarray) -> jnp.ndarray:
    """sampled 768×3 → world xyz (×0.164, `flow_matching_trainer.py:987,999`)."""
    return xyz_latent * XYZ_SCALE


def split_stage2(latent: jnp.ndarray, z_channels: int = 10):
    """(B, N, z+3) → (kl latent, anchor xyz) (`:1421-1422`)."""
    return latent[..., :z_channels], latent[..., z_channels:] * XYZ_SCALE
