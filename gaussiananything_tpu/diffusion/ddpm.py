"""Discrete-time Gaussian diffusion (DDPM/DDIM) — capability parity with the
reference's `guided_diffusion/gaussian_diffusion.py` + `respace.py` (the
ADM library kept for LN3Diff-era checkpoints; the release path is flow
matching, `diffusion/transport.py`).

Supports eps / x0 / v prediction, linear & cosine schedules, timestep
respacing, DDPM ancestral + DDIM sampling, all as lax.scan loops.
"""
from __future__ import annotations

import math
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def linear_betas(T: int, beta_start=1e-4, beta_end=0.02) -> np.ndarray:
    return np.linspace(beta_start, beta_end, T, dtype=np.float64)


def cosine_betas(T: int, s: float = 0.008) -> np.ndarray:
    f = np.cos((np.arange(T + 1) / T + s) / (1 + s) * math.pi / 2) ** 2
    betas = 1 - f[1:] / f[:-1]
    return np.clip(betas, 0, 0.999)


class GaussianDiffusion(NamedTuple):
    betas: jnp.ndarray              # (T,)
    alphas_cum: jnp.ndarray         # (T,)
    pred_type: str = "eps"          # eps | x0 | v

    @property
    def T(self) -> int:
        return self.betas.shape[0]

    def q_sample(self, x0: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
                 ) -> jnp.ndarray:
        shape = (t.shape[0],) + (1,) * (x0.ndim - 1)
        a = jnp.sqrt(self.alphas_cum[t]).reshape(shape)
        s = jnp.sqrt(1 - self.alphas_cum[t]).reshape(shape)
        return a * x0 + s * noise

    def target(self, x0, noise, t):
        if self.pred_type == "eps":
            return noise
        if self.pred_type == "x0":
            return x0
        shape = (t.shape[0],) + (1,) * (x0.ndim - 1)
        a = jnp.sqrt(self.alphas_cum[t]).reshape(shape)
        s = jnp.sqrt(1 - self.alphas_cum[t]).reshape(shape)
        return a * noise - s * x0           # v-prediction

    def pred_x0(self, model_out, x_t, t):
        shape = (t.shape[0],) + (1,) * (x_t.ndim - 1)
        a = jnp.sqrt(self.alphas_cum[t]).reshape(shape)
        s = jnp.sqrt(1 - self.alphas_cum[t]).reshape(shape)
        if self.pred_type == "eps":
            return (x_t - s * model_out) / a
        if self.pred_type == "x0":
            return model_out
        return a * x_t - s * model_out

    def training_loss(self, model: Callable, rng, x0: jnp.ndarray,
                      **kwargs) -> Tuple[jnp.ndarray, dict]:
        rng_t, rng_n = jax.random.split(rng)
        t = jax.random.randint(rng_t, (x0.shape[0],), 0, self.T)
        noise = jax.random.normal(rng_n, x0.shape, x0.dtype)
        x_t = self.q_sample(x0, t, noise)
        out = model(x_t, t, **kwargs)
        tgt = self.target(x0, noise, t)
        loss = jnp.mean((out - tgt) ** 2)
        return loss, {"t": t}

    def ddim_sample(self, model: Callable, rng, shape, num_steps: int = 50,
                    eta: float = 0.0, **kwargs) -> jnp.ndarray:
        """DDIM with respaced timesteps (parity `respace.py` + ddim loop)."""
        ts = jnp.linspace(self.T - 1, 0, num_steps).round().astype(jnp.int32)
        # split: drawing x from rng and carrying the same key into the scan
        # correlates the initial latent with the first ancestral noise
        rng_init, rng_loop = jax.random.split(rng)
        x = jax.random.normal(rng_init, shape)

        def step(carry, i):
            x, key = carry
            t = ts[i]
            t_next = jnp.where(i + 1 < num_steps, ts[jnp.minimum(
                i + 1, num_steps - 1)], -1)
            tb = jnp.full((shape[0],), t)
            out = model(x, tb, **kwargs)
            x0 = self.pred_x0(out, x, tb)
            a_t = self.alphas_cum[t]
            a_next = jnp.where(t_next >= 0, self.alphas_cum[
                jnp.maximum(t_next, 0)], 1.0)
            eps = (x - jnp.sqrt(a_t) * x0) / jnp.sqrt(1 - a_t)
            sigma = eta * jnp.sqrt((1 - a_next) / (1 - a_t)) * jnp.sqrt(
                1 - a_t / a_next)
            key, sub = jax.random.split(key)
            noise = jax.random.normal(sub, shape)
            dir_xt = jnp.sqrt(jnp.maximum(1 - a_next - sigma ** 2, 0.0)) * eps
            x = jnp.sqrt(a_next) * x0 + dir_xt + sigma * noise * (
                t_next >= 0)
            return (x, key), None

        (x, _), _ = jax.lax.scan(step, (x, rng_loop), jnp.arange(num_steps))
        return x

    def ddpm_sample(self, model: Callable, rng, shape, **kwargs
                    ) -> jnp.ndarray:
        """Full-T ancestral sampling."""
        rng_init, rng_loop = jax.random.split(rng)
        x = jax.random.normal(rng_init, shape)
        alphas = 1.0 - self.betas
        acum_prev = jnp.concatenate([jnp.ones(1), self.alphas_cum[:-1]])

        def step(carry, i):
            x, key = carry
            t = self.T - 1 - i
            tb = jnp.full((shape[0],), t)
            out = model(x, tb, **kwargs)
            x0 = jnp.clip(self.pred_x0(out, x, tb), -5, 5)
            coef1 = self.betas[t] * jnp.sqrt(acum_prev[t]) / (
                1 - self.alphas_cum[t])
            coef2 = (1 - acum_prev[t]) * jnp.sqrt(alphas[t]) / (
                1 - self.alphas_cum[t])
            mean = coef1 * x0 + coef2 * x
            var = self.betas[t] * (1 - acum_prev[t]) / (
                1 - self.alphas_cum[t])
            key, sub = jax.random.split(key)
            noise = jax.random.normal(sub, shape)
            x = mean + jnp.sqrt(jnp.maximum(var, 1e-20)) * noise * (t > 0)
            return (x, key), None

        (x, _), _ = jax.lax.scan(step, (x, rng_loop), jnp.arange(self.T))
        return x


def create_diffusion(T: int = 1000, schedule: str = "linear",
                     pred_type: str = "eps") -> GaussianDiffusion:
    betas = linear_betas(T) if schedule == "linear" else cosine_betas(T)
    alphas_cum = np.cumprod(1 - betas)
    return GaussianDiffusion(
        betas=jnp.asarray(betas, jnp.float32),
        alphas_cum=jnp.asarray(alphas_cum, jnp.float32),
        pred_type=pred_type)
