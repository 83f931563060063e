"""Elementwise parameter-free / constant-parameter flows.

Reference: ``bgflow/nn/flow/elementwise.py`` (BentIdentity) and the
``TorchTransform(AffineTransform)`` pattern used for chirality constraints
(``generator_builder.py:500-516``).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.flow import Flow


class ConstantAffineFlow(Flow):
    """y = loc + scale * x with static loc/scale (no trainable params)."""

    def __init__(self, loc=0.0, scale=1.0):
        self.loc = jnp.asarray(loc)
        self.scale = jnp.asarray(scale)

    def _ldj(self, x, sign):
        per_elem = jnp.log(jnp.abs(jnp.broadcast_to(self.scale, x.shape)))
        return sign * jnp.sum(per_elem.reshape(x.shape[0], -1), axis=-1)

    def _forward(self, params, xs, **kwargs):
        (x,) = xs
        return (self.loc + self.scale * x,), self._ldj(x, 1.0)

    def _inverse(self, params, xs, **kwargs):
        (x,) = xs
        return ((x - self.loc) / self.scale,), self._ldj(x, -1.0)


class BentIdentity(Flow):
    """y = x + (sqrt(x^2 + 1) - 1) / 2 — a smooth monotone elementwise map.

    Reference: ``elementwise.py``.  The inverse is closed-form.
    """

    def _forward(self, params, xs, **kwargs):
        (x,) = xs
        s = jnp.sqrt(x * x + 1.0)
        y = x + 0.5 * (s - 1.0)
        deriv = 1.0 + 0.5 * x / s
        ldj = jnp.sum(jnp.log(deriv).reshape(x.shape[0], -1), axis=-1)
        return (y,), ldj

    def _inverse(self, params, xs, **kwargs):
        (y,) = xs
        # solve x + (sqrt(x^2+1) - 1)/2 = y  =>  quadratic in x
        # 2y + 1 - 2x = sqrt(x^2 + 1); square and solve: 3x^2 - 4(2y+1)x/2 ...
        b = 2.0 * y + 1.0
        # (b - 2x)^2 = x^2 + 1 -> 3x^2 - 4bx + b^2 - 1 = 0
        x = (2.0 * b - jnp.sqrt(4.0 * b * b - 3.0 * (b * b - 1.0))) / 3.0
        s = jnp.sqrt(x * x + 1.0)
        deriv = 1.0 + 0.5 * x / s
        ldj = -jnp.sum(jnp.log(deriv).reshape(x.shape[0], -1), axis=-1)
        return (x,), ldj
