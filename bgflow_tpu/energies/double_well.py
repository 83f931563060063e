"""Analytic toy energies: double wells, Mueller potential, Wolfe-Quapp.

Reference: ``bgflow/distribution/energy/double_well.py:10-102``.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from .base import Energy


class DoubleWellEnergy(Energy):
    """1D quartic double well in the first coordinate + harmonic rest.

    u(x) = a*x0 + b*x0^2 + c*x0^4 + 0.5*|x_rest|^2
    """

    def __init__(self, dim, a=0.0, b=-4.0, c=1.0):
        super().__init__(dim)
        self.a, self.b, self.c = a, b, c

    def _energy(self, x):
        d = x[..., 0]
        v = x[..., 1:]
        e1 = self.a * d + self.b * d**2 + self.c * d**4
        e2 = 0.5 * jnp.sum(v * v, axis=-1)
        return e1 + e2


class MultiDimensionalDoubleWell(Energy):
    """Independent double wells per dimension, optionally mixed by a linear map."""

    def __init__(self, dim, a=0.0, b=-4.0, c=1.0, transformer=None):
        super().__init__(dim)
        self.a = jnp.asarray(a)
        self.b = jnp.asarray(b)
        self.c = jnp.asarray(c)
        self.transformer = None if transformer is None else jnp.asarray(transformer)

    def _energy(self, x):
        if self.transformer is not None:
            x = jnp.dot(x, self.transformer, preferred_element_type=x.dtype)
        e = self.a * x + self.b * x**2 + self.c * x**4
        return jnp.sum(e, axis=-1)


class MuellerEnergy(Energy):
    """Mueller-Brown potential (2D) + harmonic extra dims."""

    def __init__(self, dim=2, scale1=0.15, scale2=15.0, beta=1.0):
        assert dim >= 2
        super().__init__(dim)
        self.scale1, self.scale2, self.beta = scale1, scale2, beta

    def _energy(self, x):
        xx = x[..., 0]
        yy = x[..., 1]
        e1 = -200.0 * jnp.exp(-((xx - 1) ** 2) - 10.0 * yy**2)
        e2 = -100.0 * jnp.exp(-(xx**2) - 10.0 * (yy - 0.5) ** 2)
        e3 = -170.0 * jnp.exp(
            -6.5 * (0.5 + xx) ** 2 + 11.0 * (xx + 0.5) * (yy - 1.5) - 6.5 * (yy - 1.5) ** 2
        )
        e4 = 15.0 * jnp.exp(0.7 * (1 + xx) ** 2 + 0.6 * (xx + 1) * (yy - 1) + 0.7 * (yy - 1) ** 2) + 146.7
        v = x[..., 2:]
        ev = self.scale2 * 0.5 * jnp.sum(v * v, axis=-1)
        return self.beta * (self.scale1 * (e1 + e2 + e3 + e4) + ev)


class ModifiedWolfeQuapp(Energy):
    """Rotated Wolfe-Quapp potential (2D) + harmonic extra dims."""

    def __init__(self, dim=2, theta=-0.3 * math.pi / 2, scale1=2.0, scale2=15.0, beta=1.0):
        assert dim >= 2
        super().__init__(dim)
        self.scale1, self.scale2, self.beta = scale1, scale2, beta
        self.c = math.cos(theta)
        self.s = math.sin(theta)

    def _energy(self, x):
        xx = self.c * x[..., 0] - self.s * x[..., 1]
        yy = self.s * x[..., 0] + self.c * x[..., 1]
        e4 = xx**4 + yy**4
        e2 = -2.0 * xx**2 - 4.0 * yy**2 + 2.0 * xx * yy
        e1 = 0.8 * xx + 0.1 * yy + 9.28
        v = x[..., 2:]
        ev = self.scale2 * 0.5 * jnp.sum(v * v, axis=-1)
        return self.beta * (self.scale1 * (e4 + e2 + e1) + ev)
