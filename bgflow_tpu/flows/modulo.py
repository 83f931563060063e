"""Torsion-domain flows on the unit circle.

Reference: ``bgflow/nn/flow/modulo.py:5-74``.  ``IncreaseMultiplicity``
stochastically lifts a [0,1] variable onto one of m sheaves in forward and
projects mod 1/m in inverse (used for symmetric torsions); it consumes a
PRNG key.  ``CircularShift`` is a mod-1 translation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.flow import Flow, zero_ldj


class IncreaseMultiplicityFlow(Flow):
    def __init__(self, multiplicities):
        self.multiplicities = jnp.asarray(multiplicities)

    def _forward(self, params, xs, key=None, **kwargs):
        (x,) = xs
        if key is None:
            raise ValueError("IncreaseMultiplicityFlow requires a PRNG key in forward")
        m = jnp.broadcast_to(self.multiplicities, x.shape)
        sheaves = jnp.floor(jax.random.uniform(key, x.shape, dtype=x.dtype) * m)
        y = (x + sheaves) / m
        return (y,), zero_ldj(xs)

    def _inverse(self, params, xs, **kwargs):
        (x,) = xs
        m = jnp.broadcast_to(self.multiplicities, x.shape).astype(x.dtype)
        y = jnp.mod(x, 1.0 / m) * m
        return (y,), zero_ldj(xs)


class CircularShiftFlow(Flow):
    def __init__(self, shift):
        self.shift = jnp.asarray(shift)

    def _forward(self, params, xs, **kwargs):
        (x,) = xs
        return (jnp.mod(x + self.shift, 1.0),), zero_ldj(xs)

    def _inverse(self, params, xs, **kwargs):
        (x,) = xs
        return (jnp.mod(x - self.shift, 1.0),), zero_ldj(xs)
