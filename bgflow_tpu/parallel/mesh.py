"""Mesh and sharding helpers.

The reference has no distributed backend at all (multiprocessing queues to
OpenMM workers only, ``openmm.py:194-196``); here multi-chip scaling is
first-class: chains/samples shard over a ``("dp",)`` mesh, params replicate,
and XLA inserts the collectives.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate", "data_parallel_shardings"]


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "dp") -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=(axis_name,))


def shard_batch(mesh: Mesh, tree, axis_name: str = "dp"):
    """Place a pytree of (B, ...) arrays with B sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(tree, sharding)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params, optimizer state) over the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def data_parallel_shardings(mesh: Mesh, axis_name: str = "dp"):
    """(replicated, batch-sharded) NamedShardings for jit in/out specs."""
    return NamedSharding(mesh, P()), NamedSharding(mesh, P(axis_name))
