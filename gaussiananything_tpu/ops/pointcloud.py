"""Point-cloud losses: chamfer distance and Sinkhorn EMD.

TPU-native replacements for pytorch3d `chamfer_distance`
(`nsr/train_nv_util.py:2244`) and the reference's CUDA auction EMD
(`utils/emd/emd_module.py`, optional point supervision at
`nsr/train_nv_util.py:74-79,2356-2416`). Both are blocked all-pairs
computations that map straight onto the MXU as distance matmuls.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _sq_dists(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N,3),(M,3) -> (N,M) squared distances via the matmul expansion."""
    an = jnp.sum(a * a, -1)
    bn = jnp.sum(b * b, -1)
    ab = jnp.matmul(a, b.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(an[:, None] + bn[None, :] - 2 * ab, 0.0)


@jax.jit
def chamfer_distance(a: jnp.ndarray, b: jnp.ndarray,
                     a_mask: jnp.ndarray | None = None,
                     b_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Symmetric squared chamfer distance, batched over leading dims.

    a (..., N, 3), b (..., M, 3) -> scalar per batch (mean of both
    directions, matching pytorch3d's default point reduction 'mean').
    """

    def _single(x, y, xm, ym):
        d = _sq_dists(x, y)
        big = jnp.float32(1e10)
        if xm is not None:
            d = jnp.where(xm[:, None], d, big)
        if ym is not None:
            d = jnp.where(ym[None, :], d, big)
        d_xy = jnp.min(d, axis=1)
        d_yx = jnp.min(d, axis=0)
        if xm is not None:
            d_xy = jnp.sum(jnp.where(xm, d_xy, 0.0)) / jnp.maximum(jnp.sum(xm), 1)
        else:
            d_xy = jnp.mean(d_xy)
        if ym is not None:
            d_yx = jnp.sum(jnp.where(ym, d_yx, 0.0)) / jnp.maximum(jnp.sum(ym), 1)
        else:
            d_yx = jnp.mean(d_yx)
        return d_xy + d_yx

    batch = a.shape[:-2]
    af = a.reshape((-1,) + a.shape[-2:])
    bf = b.reshape((-1,) + b.shape[-2:])
    xm = a_mask.reshape((-1, a.shape[-2])) if a_mask is not None else None
    ym = b_mask.reshape((-1, b.shape[-2])) if b_mask is not None else None
    if xm is None and ym is None:
        out = jax.vmap(lambda x, y: _single(x, y, None, None))(af, bf)
    else:
        out = jax.vmap(_single)(af, bf,
                                xm if xm is not None else jnp.ones(af.shape[:2], bool),
                                ym if ym is not None else jnp.ones(bf.shape[:2], bool))
    return out.reshape(batch)


@functools.partial(jax.jit, static_argnames=("iters",))
def sinkhorn_emd(a: jnp.ndarray, b: jnp.ndarray, eps: float = 0.05,
                 iters: int = 200) -> jnp.ndarray:
    """Entropic-regularised EMD between (possibly different-size) point sets.

    Replaces the reference's auction-algorithm CUDA EMD with a fixed-iteration
    Sinkhorn loop (log-domain, jit/scan-friendly). a: (..., N, 3),
    b: (..., M, 3) with uniform marginals 1/N and 1/M; returns the
    transport cost per batch element.
    """

    def _single(x, y):
        n, m = x.shape[0], y.shape[0]
        C = _sq_dists(x, y)                                   # (n, m)
        log_mu = jnp.full((n,), -jnp.log(n))
        log_nu = jnp.full((m,), -jnp.log(m))
        f = jnp.zeros((n,))
        g = jnp.zeros((m,))

        def body(carry, _):
            f, g = carry
            f = eps * (log_mu - jax.nn.logsumexp((g[None, :] - C) / eps, axis=1))
            g = eps * (log_nu - jax.nn.logsumexp((f[:, None] - C) / eps, axis=0))
            return (f, g), None

        (f, g), _ = jax.lax.scan(body, (f, g), None, length=iters)
        P = jnp.exp((f[:, None] + g[None, :] - C) / eps)
        return jnp.sum(P * C)

    batch = a.shape[:-2]
    out = jax.vmap(_single)(a.reshape((-1,) + a.shape[-2:]),
                            b.reshape((-1,) + b.shape[-2:]))
    return out.reshape(batch)
