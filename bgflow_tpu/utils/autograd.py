"""Jacobian helpers (the analysis/testing utilities of the reference).

Reference: ``bgflow/utils/autograd.py:14-152``.  In JAX these are thin
wrappers over jacfwd/jvp, provided for API parity and test ergonomics.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["brute_force_jacobian", "brute_force_jacobian_trace", "batch_jacobian"]


def brute_force_jacobian(fn: Callable, x: jax.Array) -> jax.Array:
    """Per-sample Jacobian of fn: (B, D_in) -> (B, D_out); returns
    (B, D_out, D_in)."""
    return jax.vmap(jax.jacfwd(lambda xi: fn(xi[None])[0]))(x)


batch_jacobian = brute_force_jacobian


def brute_force_jacobian_trace(fn: Callable, x: jax.Array) -> jax.Array:
    """Exact divergence tr(d fn/dx) per sample via D jvp passes."""
    dim = x.shape[-1]
    trace = jnp.zeros(x.shape[0], dtype=x.dtype)
    for i in range(dim):
        tangent = jnp.zeros_like(x).at[:, i].set(1.0)
        _, jv = jax.jvp(fn, (x,), (tangent,))
        trace = trace + jv[:, i]
    return trace
