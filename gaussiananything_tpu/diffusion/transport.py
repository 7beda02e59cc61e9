"""Flow-matching transport: interpolant paths + training losses.

Capability parity with the reference's SiT `transport/` package
(`transport/transport.py:48-242`, `transport/path.py:18-191`):
  * paths: Linear (`ICPlan`), GVP (α=sin(πt/2), σ=cos(πt/2) —
    the release path, `transport/path.py:174-191`), VP.
  * convention: x_t = α_t·x1 + σ_t·x0 with x1=data, x0=noise;
    target velocity u_t = α̇_t·x1 + σ̇_t·x0; loss = ‖v̂ − u_t‖²
    (`transport/transport.py:148-190`).
  * t sampling: uniform or lognorm(0, 1) (`:127-146`).

Pure functions over a model-apply callable — trainers and samplers stay
jit-compiled end to end.
"""
from __future__ import annotations

import math
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class Path(NamedTuple):
    alpha: Callable[[jnp.ndarray], jnp.ndarray]
    sigma: Callable[[jnp.ndarray], jnp.ndarray]
    d_alpha: Callable[[jnp.ndarray], jnp.ndarray]
    d_sigma: Callable[[jnp.ndarray], jnp.ndarray]
    name: str


def linear_path() -> Path:
    return Path(alpha=lambda t: t, sigma=lambda t: 1 - t,
                d_alpha=lambda t: jnp.ones_like(t),
                d_sigma=lambda t: -jnp.ones_like(t), name="linear")


def gvp_path() -> Path:
    h = math.pi / 2
    return Path(alpha=lambda t: jnp.sin(h * t),
                sigma=lambda t: jnp.cos(h * t),
                d_alpha=lambda t: h * jnp.cos(h * t),
                d_sigma=lambda t: -h * jnp.sin(h * t), name="gvp")


def vp_path(beta_min: float = 0.1, beta_max: float = 20.0) -> Path:
    def log_alpha(t):
        # integrate β linearly in (1-t) — VP with data at t=1
        s = 1 - t
        return -0.25 * s ** 2 * (beta_max - beta_min) - 0.5 * s * beta_min

    alpha = lambda t: jnp.exp(log_alpha(t))  # noqa: E731
    sigma = lambda t: jnp.sqrt(jnp.maximum(1 - alpha(t) ** 2, 1e-12))  # noqa: E731
    d_log_alpha = lambda t: 0.5 * (1 - t) * (beta_max - beta_min) \
        + 0.5 * beta_min  # noqa: E731

    def d_alpha(t):
        return alpha(t) * d_log_alpha(t)

    def d_sigma(t):
        a = alpha(t)
        return -a * d_alpha(t) / sigma(t)

    return Path(alpha, sigma, d_alpha, d_sigma, name="vp")


PATHS = {"linear": linear_path, "gvp": gvp_path, "vp": vp_path}


class Transport(NamedTuple):
    path: Path
    t_sampler: str = "uniform"     # or "lognorm"

    def sample_t(self, rng, batch: int) -> jnp.ndarray:
        if self.t_sampler == "lognorm":
            # logit-normal(0,1): t = sigmoid(n), n~N(0,1)
            return jax.nn.sigmoid(jax.random.normal(rng, (batch,)))
        return jax.random.uniform(rng, (batch,), minval=1e-5, maxval=1 - 1e-5)

    def plan(self, x1: jnp.ndarray, x0: jnp.ndarray, t: jnp.ndarray
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (x_t, target velocity u_t). t broadcasts over batch."""
        bshape = (t.shape[0],) + (1,) * (x1.ndim - 1)
        a, s = self.path.alpha(t).reshape(bshape), self.path.sigma(t).reshape(bshape)
        da, ds = self.path.d_alpha(t).reshape(bshape), self.path.d_sigma(t).reshape(bshape)
        xt = a * x1 + s * x0
        ut = da * x1 + ds * x0
        return xt, ut

    def training_loss(self, velocity_fn: Callable, rng, x1: jnp.ndarray,
                      **model_kwargs) -> Tuple[jnp.ndarray, dict]:
        """velocity_fn(x_t, t, **kwargs) -> v̂. Returns (scalar loss, aux)."""
        rng_t, rng_n = jax.random.split(rng)
        t = self.sample_t(rng_t, x1.shape[0])
        x0 = jax.random.normal(rng_n, x1.shape, x1.dtype)
        xt, ut = self.plan(x1, x0, t)
        v = velocity_fn(xt, t, **model_kwargs)
        per_sample = jnp.mean((v - ut) ** 2,
                              axis=tuple(range(1, x1.ndim)))
        return jnp.mean(per_sample), {"t": t, "per_sample": per_sample}


def create_transport(path_type: str = "gvp", t_sampler: str = "uniform"
                     ) -> Transport:
    return Transport(path=PATHS[path_type](), t_sampler=t_sampler)


# ---------------------------------------------------------------------------
# Score / diffusion algebra for SDE sampling (exact parity with the
# reference's `transport/path.py:35-80` ICPlan methods).
# ---------------------------------------------------------------------------

def _expand_t(t: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    return t.reshape((t.shape[0],) + (1,) * (x.ndim - 1))


def score_from_velocity(path: Path, v: jnp.ndarray, x: jnp.ndarray,
                        t: jnp.ndarray) -> jnp.ndarray:
    """∇log p_t(x) from a velocity prediction.

    Exact change of variables (`transport/path.py:70-80`):
      x_t = α x1 + σ x0,  v = α̇ x1 + σ̇ x0, x0 ~ N(0, I)
      score = ((α/α̇)·v − x) / (σ² − (α/α̇)·σ̇·σ).
    For GVP the denominator is identically 1; for linear it is (1−t)/t·…
    — always finite for t ∈ (0, 1).
    """
    t = _expand_t(t, x)
    a, da = path.alpha(t), path.d_alpha(t)
    s, ds = path.sigma(t), path.d_sigma(t)
    rar = a / da                       # reverse alpha ratio
    var = s * s - rar * ds * s
    return (rar * v - x) / var


def sde_diffusion(path: Path, t: jnp.ndarray, form: str = "sbdm",
                  norm: float = 1.0) -> jnp.ndarray:
    """Diffusion coefficient w(t) of the marginal-preserving reverse SDE
    (`transport/path.py:45-68` `compute_diffusion`).

    'sbdm' (reference default): w = (α̇/α)·σ² − σ·σ̇ — the score weight for
    which dx = [v + w·score] dt + √(2w) dW preserves the flow's marginals.
    """
    a, da = path.alpha(t), path.d_alpha(t)
    s, ds = path.sigma(t), path.d_sigma(t)
    if form == "sbdm":
        return norm * ((da / a) * s * s - s * ds)
    if form == "sigma":
        return norm * s
    if form == "linear":
        return norm * (1.0 - t)
    if form == "constant":
        return jnp.full_like(t, norm)
    raise NotImplementedError(f"diffusion form {form!r}")
