"""Device mesh construction and sharding rules.

TPU-native replacement for the reference's NCCL DDP stack
(`guided_diffusion/dist_util.py:57-132`, DDP wrap `nsr/train_util.py:185-195`):
there is no process-group code — `jax.distributed.initialize()` plus a mesh is
the entire backend. Gradients all-reduce over ICI because the jitted train
step is compiled with batch sharded over the `data` axis and params
replicated; XLA inserts and overlaps the psums (DDP-bucket equivalent, free).

Axes:
  * `data` — batch sharding (the only axis the reference uses, §2.7).
  * `tile` — optional second axis to shard rendered pixels/tiles per chip for
    the rays/s scaling north star; splats are replicated (≤73k fits HBM).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, tile: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // tile
    assert data * tile == n, f"mesh {data}x{tile} != {n} devices"
    arr = np.asarray(devices).reshape(data, tile)
    return Mesh(arr, ("data", "tile"))


def shard_batch(mesh: Mesh, tree):
    """Shard leading (batch) dim of every leaf over the data axis."""
    def _shard(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(_shard, tree)


def replicate(mesh: Mesh, tree):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def batch_spec(ndim: int) -> P:
    return P("data", *([None] * (ndim - 1)))
