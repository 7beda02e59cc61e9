"""Multi-host initialisation and helpers.

TPU-native replacement for `guided_diffusion/dist_util.py` (NCCL process
groups, rank helpers, param broadcast): `jax.distributed.initialize()` plus
mesh construction is the entire backend. Parameter "sync" on resume is
automatic — orbax restores identically on every host; there is no broadcast
step. Collectives are compiled into the jitted step by XLA.
"""
from __future__ import annotations

import jax


def setup_dist(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialise multi-host JAX. No-op single-host (parity: `setup_dist`,
    `guided_diffusion/dist_util.py:57`). On TPU pods the arguments are
    auto-detected from the environment."""
    if num_processes is not None and num_processes > 1 or (
            coordinator_address is not None):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_main() -> bool:
    return jax.process_index() == 0


def synchronize() -> None:
    """Cross-host barrier (parity: `dist_util.synchronize`)."""
    if jax.process_count() > 1:
        # a tiny psum over all devices acts as a barrier
        import jax.numpy as jnp
        jax.block_until_ready(
            jax.pmap(lambda x: jax.lax.psum(x, "i"), axis_name="i")(
                jnp.ones((jax.local_device_count(),))))


def local_batch_slice(global_batch: int) -> slice:
    """Shard a host-level batch range (parity with InfiniteSampler
    rank-sharding, `dnnlib/util.py:548-586`)."""
    per = global_batch // jax.process_count()
    r = jax.process_index()
    return slice(r * per, (r + 1) * per)
