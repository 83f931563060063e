"""Mesh and sharding helpers — single-host SPMD and the multi-host entry.

The reference has no distributed backend at all (multiprocessing queues to
OpenMM workers only, ``openmm.py:194-196``); here multi-chip scaling is
first-class: chains/samples shard over a ``("dp",)`` mesh, params replicate,
and XLA inserts the collectives.

Multi-host (multi-process) runs are entered via
:func:`initialize_distributed` + :func:`make_multihost_mesh`: a
``(hosts, dp)`` mesh whose outer axis crosses DCN (one entry per process /
slice) and whose inner axis rides ICI within a slice.  **Traffic rules:**
collectives over the ``hosts`` axis cross DCN, so keep them to low-volume
reductions (the ``psum`` of a gradient average, scalar ESS/logZ terms);
population-sized traffic (``all_gather`` of particles, ``ppermute`` replica
swaps) must stay on the inner ``dp`` axis.  All samplers in
``bgflow_tpu.parallel`` take the axis name explicitly for exactly this
reason.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "data_parallel_shardings",
    "initialize_distributed",
    "make_multihost_mesh",
]


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
    platform: Optional[str] = None,
    num_local_cpu_devices: Optional[int] = None,
) -> None:
    """Join (or start) a multi-process JAX run.

    Thin wiring around ``jax.distributed.initialize`` — on TPU pods the
    arguments are auto-detected from the TPU metadata and everything may be
    left ``None``; on CPU (CI / the 2-process test) pass them explicitly.

    ``platform="cpu"`` additionally pins the CPU platform via ``jax.config``
    (which wins over ambient sitecustomize re-pins of ``JAX_PLATFORMS``),
    selects the gloo cross-process collectives implementation, and honors
    ``num_local_cpu_devices`` — the multi-process analogue of the
    ``xla_force_host_platform_device_count`` testing recipe.

    Must be called before any backend touch (device query, jit execution).
    Replaces, at pod scale, the reference's single-host worker pool
    (``bgflow/distribution/energy/openmm.py:194-196``).
    """
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        if num_local_cpu_devices is not None:
            jax.config.update("jax_num_cpu_devices", int(num_local_cpu_devices))
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)


def make_multihost_mesh(dcn_axis: str = "hosts", ici_axis: str = "dp") -> Mesh:
    """(n_processes, local-devices) mesh: ``dcn_axis`` crosses hosts/slices,
    ``ici_axis`` stays within one.

    On TPU pods the device order comes from
    ``mesh_utils.create_hybrid_device_mesh`` so the inner axis is contiguous
    on ICI; on backends without slice topology (CPU multi-process tests) the
    devices are grouped by ``process_index``, which is the same guarantee.
    Single-process, this degenerates to a ``(1, n_devices)`` mesh, so code
    written against the two-axis mesh runs unchanged at any scale.
    """
    n_proc = jax.process_count()
    devices = jax.devices()
    n_local = len(devices) // n_proc
    if n_proc > 1:
        try:
            from jax.experimental import mesh_utils

            dev_array = mesh_utils.create_hybrid_device_mesh(
                (1, n_local), (n_proc, 1), devices=devices
            )
            return Mesh(dev_array, axis_names=(dcn_axis, ici_axis))
        except (ImportError, ValueError, AssertionError, KeyError):
            # no slice topology exposed (e.g. CPU): group by process index
            ordered = sorted(devices, key=lambda d: (d.process_index, d.id))
            dev_array = np.asarray(ordered).reshape(n_proc, n_local)
            return Mesh(dev_array, axis_names=(dcn_axis, ici_axis))
    return Mesh(np.asarray(devices).reshape(1, -1), axis_names=(dcn_axis, ici_axis))


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


def make_sharded_sampler(mesh: Mesh, gen, n: int, axis_name: str = "dp",
                         **sample_kwargs):
    """Explicitly sharded BG sampling: each device draws its own sub-batch.

    Round-4's scaling bench ran ``gen.sample`` under a mesh context and
    trusted GSPMD to partition it — it did NOT: with replicated params and
    an unconstrained PRNG there is nothing tying the batch axis to the
    mesh, so the compiler replicated the ENTIRE computation on every
    device (verified: the compiled HLO contains zero collectives and no
    partition-id — every device computed all ``n`` samples).  Sampling is
    embarrassingly parallel; this helper makes that explicit with
    ``shard_map``: each shard folds its ``axis_index`` into the key and
    draws ``n // n_devices`` samples; outputs are batch-sharded.

    Returns ``fn(params, key) -> SampleOutput`` (jit-compatible).
    """
    from jax import shard_map

    n_dev = int(np.prod(mesh.devices.shape))
    if n % n_dev:
        raise ValueError(f"n={n} not divisible by mesh size {n_dev}")
    n_local = n // n_dev

    def local(params, key):
        idx = jax.lax.axis_index(axis_name)
        sub = jax.random.fold_in(key, idx)
        return gen.sample(params, sub, n_local, **sample_kwargs)

    return shard_map(
        local, mesh=mesh, in_specs=(P(), P()), out_specs=P(axis_name),
        check_vma=False,
    )
