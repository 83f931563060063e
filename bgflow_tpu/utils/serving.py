"""Ahead-of-time export of trained generators for serving.

Production deployment wants a sealed artifact, not a Python object graph:
``jax.export`` lowers a jitted sampling/energy function to serialized
StableHLO with the trained parameters baked in as constants, so a serving
process (same JAX version, any supported backend listed in ``platforms``)
can ``load`` and ``call`` it without importing bgflow_tpu, rebuilding the
flow, or retracing.

The reference has no serving story (models are pickled torch modules);
this is the TPU-native equivalent of a TorchScript/SavedModel export.

Notes
-----
* The artifact's only runtime input is the PRNG key (sampling) or the
  configuration batch (energy) — static batch size, as XLA requires.
* ``platforms=("tpu", "cpu")`` produces one artifact servable on both; the
  default exports for the platform JAX currently runs on.
* Pallas fast paths are device-specific custom calls; exports made for
  "cpu" must build the generator with the plain XLA paths (the numerics
  are identical).
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export

__all__ = [
    "export_sampler",
    "export_energy",
    "save_exported",
    "load_exported",
]

_KEY_STRUCT = jax.ShapeDtypeStruct((2,), jnp.uint32)


def _platform_kwargs(platforms):
    return {} if platforms is None else {"platforms": tuple(platforms)}


def export_sampler(
    gen,
    params,
    n_samples: int,
    temperature: float = 1.0,
    with_log_weights: bool = False,
    platforms: Optional[Sequence[str]] = None,
):
    """Seal ``key -> samples`` (optionally ``(samples..., log_weights)``).

    Returns a ``jax.export.Exported``; call it with ``.call(key)`` where
    ``key`` is a raw ``(2,) uint32`` key data array
    (``jax.random.key_data(jax.random.PRNGKey(...))``).
    """

    def sample(key_data):
        key = jax.random.wrap_key_data(key_data, impl="threefry2x32")
        out = gen.sample(
            params, key, n_samples, temperature=temperature,
            with_log_weights=with_log_weights,
        )
        if with_log_weights:
            return (*out.xs, out.log_weights)
        return out.xs

    return jax_export.export(jax.jit(sample), **_platform_kwargs(platforms))(_KEY_STRUCT)


def export_energy(
    gen,
    params,
    batch_size: int,
    temperature: float = 1.0,
    platforms: Optional[Sequence[str]] = None,
):
    """Seal ``x -> u_BG(x)`` (the generator's pushforward energy / NLL)."""
    structs = tuple(
        jax.ShapeDtypeStruct((batch_size, *shape), jnp.float32)
        for shape in gen.event_shapes
    )

    def energy(*xs):
        return gen.energy(params, *xs, temperature=temperature)

    return jax_export.export(jax.jit(energy), **_platform_kwargs(platforms))(*structs)


def save_exported(path: str, exported) -> str:
    """Serialize an ``Exported`` to ``path`` (creates parent dirs)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(exported.serialize())
    return path


def load_exported(path: str):
    """Load a serialized artifact; returns the ``Exported`` (use ``.call``)."""
    with open(path, "rb") as fh:
        return jax_export.deserialize(fh.read())
