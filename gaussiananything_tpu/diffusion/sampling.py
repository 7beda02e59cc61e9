"""ODE / SDE samplers for flow matching, with classifier-free guidance.

Capability parity with `transport/transport.py:246-431` (`Sampler.sample_ode`:
dopri5 adaptive, 250 steps default, atol 1e-6 / rtol 1e-3) and
`transport/integrators.py:8-75` (Euler–Maruyama / Heun SDE).

TPU-first: the DEFAULT samplers are fixed-step Euler/Heun under `lax.scan`
(static shapes, fully jit-compiled); the adaptive dopri5 path is provided via
`jax.experimental.ode.odeint` for exact parity when requested — adaptive
stepping is jit-hostile but works under XLA's while_loop.

CFG (`VanillaCFG`, `sgm/modules/diffusionmodules/guiders.py:24-42` /
`forward_with_cfg`, `dit/dit_i23d.py:159-172`):
    v = v_uncond + scale · (v_cond − v_uncond)
implemented by batch-doubling a single model call per step.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def cfg_velocity_fn(velocity_fn: Callable, cond, uncond,
                    cfg_scale: float) -> Callable:
    """Wrap a velocity fn into a batch-doubled CFG velocity fn.

    `velocity_fn(x, t, cond)` where cond is a pytree with leading batch dim.
    """

    def guided(x, t):
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0) if t.ndim else t
        c2 = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), cond, uncond)
        v = velocity_fn(x2, t2, c2)
        v_c, v_u = jnp.split(v, 2, axis=0)
        return v_u + cfg_scale * (v_c - v_u)

    return guided


def sample_ode(velocity_fn: Callable, x0: jnp.ndarray, num_steps: int = 250,
               method: str = "heun") -> jnp.ndarray:
    """Fixed-step ODE integration from t=0 (noise) to t=1 (data).

    velocity_fn(x, t(batch,)) -> v. method: 'euler' | 'heun'.
    """
    B = x0.shape[0]
    dt = 1.0 / num_steps
    ts = jnp.arange(num_steps, dtype=jnp.float32) * dt

    def euler_step(x, t):
        tb = jnp.full((B,), t)
        return x + dt * velocity_fn(x, tb), None

    def heun_step(x, t):
        tb = jnp.full((B,), t)
        v1 = velocity_fn(x, tb)
        x_pred = x + dt * v1
        v2 = velocity_fn(x_pred, tb + dt)
        return x + 0.5 * dt * (v1 + v2), None

    step = {"euler": euler_step, "heun": heun_step}[method]
    x, _ = jax.lax.scan(step, x0, ts)
    return x


def sample_ode_adaptive(velocity_fn: Callable, x0: jnp.ndarray,
                        rtol: float = 1e-3, atol: float = 1e-6
                        ) -> jnp.ndarray:
    """Adaptive dopri5 (torchdiffeq-parity path: atol 1e-6, rtol 1e-3,
    `transport/transport.py:388-391`)."""
    from jax.experimental.ode import odeint

    B = x0.shape[0]

    def f(x, t):
        return velocity_fn(x, jnp.full((B,), t))

    ts = jnp.array([0.0, 1.0])
    out = odeint(f, x0, ts, rtol=rtol, atol=atol)
    return out[-1]


def sample_sde(velocity_fn: Callable, x0: jnp.ndarray, rng,
               path: Optional["Path"] = None, num_steps: int = 250,
               diffusion_form: str = "sbdm", diffusion_norm: float = 1.0,
               last_step_size: float = 0.04, t0: float = 4e-3) -> jnp.ndarray:
    """Euler–Maruyama SDE sampler with the exact score-corrected drift.

    Parity with `transport/transport.py:268-363` + `transport/integrators.py:29-37`:
      score = score_from_velocity(v, x, t)      (change of variables)
      drift = v + w(t)·score,  dx = drift·dt + √(2·w(t))·dW
    so the injected noise preserves the flow's marginals. Integrates
    t ∈ [t0, 1 − last_step_size] with num_steps−1 EM steps, then the
    reference's default "Mean" last step: x += drift·last_step_size
    (noise-free).
    """
    from gaussiananything_tpu.diffusion.transport import (
        Path, gvp_path, score_from_velocity, sde_diffusion)
    if path is None:
        path = gvp_path()

    B = x0.shape[0]
    t1 = 1.0 - last_step_size
    ts = jnp.linspace(t0, t1, num_steps)
    dt = (t1 - t0) / (num_steps - 1)

    def drift_fn(x, t):
        tb = jnp.full((B,), t)
        v = velocity_fn(x, tb)
        score = score_from_velocity(path, v, x, tb)
        w = sde_diffusion(path, t, form=diffusion_form, norm=diffusion_norm)
        return v + w * score, w

    def step(carry, t):
        x, key = carry
        key, sub = jax.random.split(key)
        drift, w = drift_fn(x, t)
        noise = jax.random.normal(sub, x.shape, x.dtype)
        x = x + dt * drift + jnp.sqrt(2.0 * w * dt) * noise
        return (x, key), None

    (x, _), _ = jax.lax.scan(step, (x0, rng), ts[:-1])
    # "Mean" last step (`transport/transport.py:303-306`).
    drift, _ = drift_fn(x, t1)
    return x + last_step_size * drift
