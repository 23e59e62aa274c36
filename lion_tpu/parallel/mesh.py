"""Device mesh + sharding helpers.

Replaces the reference's NCCL data-parallel plumbing (process spawn +
manual flattened all-reduce, utils/utils.py:717-748,1129-1163) with a JAX
Mesh and NamedShardings: batch axes shard over 'data', params replicate,
and pjit inserts the gradient psum over ICI automatically (SURVEY.md
sections 2.9 / 5.8).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Batch dim sharded over the mesh; everything else replicated."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Place a host batch (pytree of arrays with a leading batch dim) onto
    the mesh, sharded over the batch axis."""
    sharding = data_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), batch)


def fold_rng_per_host(rng, seed_offset: int = 0):
    """Per-process RNG folding (replaces per-rank torch.manual_seed(rank +
    seed), utils/utils.py:465-468)."""
    return jax.random.fold_in(rng, jax.process_index() + seed_offset)
