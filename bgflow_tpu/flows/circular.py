"""Standalone circular bump/mixture flows.

Reference: ``bgflow/nn/flow/circular.py:130-221`` (CircularTransformSimple /
ConditionalCircularTransformSimple: mixture-of-bumps circular CDF transforms
with bisection inverse).  Here both are built on the smooth-bijector library
(``flows/smooth.py``) — the same wrapped-mixture construction with implicit
inverse gradients.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.flow import Flow
from .smooth import (
    affine_sigmoid,
    elementwise_ldj,
    inverse_with_ldj,
    ramp_to_sigmoid,
    smooth_ramp,
    wrap_around,
)

__all__ = ["CircularTransform", "ConditionalCircularTransform"]


def _circular_bijector():
    base = affine_sigmoid(ramp_to_sigmoid(lambda x, la: smooth_ramp(x, la)))
    return wrap_around(base)


class CircularTransform(Flow):
    """Unconditional trainable circular transform on [0, 1]^D."""

    def __init__(self, dim: int, bisection_eps: float = 1e-8):
        self.dim = dim
        self._bij = _circular_bijector()
        self._fwd = elementwise_ldj(self._bij)
        self._inv = inverse_with_ldj(self._bij, domain=(0.0, 1.0), eps=bisection_eps)

    def init(self, key):
        k = jax.random.split(key, 4)
        return {
            "shift": 0.5 * jnp.ones(self.dim) + 0.01 * jax.random.normal(k[0], (self.dim,)),
            "log_slope": jnp.zeros(self.dim),
            "mix": jnp.zeros(self.dim),
            "logalpha": jnp.zeros(self.dim),
        }

    def _params(self, params, x):
        return tuple(
            jnp.broadcast_to(params[name], x.shape)
            for name in ("shift", "log_slope", "mix", "logalpha")
        )

    def _forward(self, params, xs, **kwargs):
        (x,) = xs
        y, ldj = self._fwd(x, *self._params(params, x))
        return (y,), jnp.sum(ldj, axis=-1)

    def _inverse(self, params, xs, **kwargs):
        (x,) = xs
        y, ldj = self._inv(x, *self._params(params, x))
        return (y,), jnp.sum(ldj, axis=-1)


class ConditionalCircularTransform(Flow):
    """Circular transform whose parameters come from a conditioner net.

    ``params_net(cond) -> (..., 4 * dim)`` raw params.  Used directly as a
    flow over (cond, y) tuples; for coupling layers prefer
    ``SmoothSigmoidTransformer(is_circular=True)``.
    """

    def __init__(self, params_net, dim: int, bisection_eps: float = 1e-8):
        self.params_net = params_net
        self.dim = dim
        self._bij = _circular_bijector()
        self._fwd = elementwise_ldj(self._bij)
        self._inv = inverse_with_ldj(self._bij, domain=(0.0, 1.0), eps=bisection_eps)

    def init(self, key):
        return self.params_net.init(key)

    def _params(self, params, cond):
        raw = self.params_net.apply(params, cond).reshape(*cond.shape[:-1], self.dim, 4)
        shift = jax.nn.sigmoid(raw[..., 0])
        log_slope = jnp.tanh(raw[..., 1]) * 2.0
        mix = raw[..., 2]
        logalpha = jnp.tanh(raw[..., 3])
        return shift, log_slope, mix, logalpha

    def _forward(self, params, xs, **kwargs):
        cond, y = xs
        y_out, ldj = self._fwd(y, *self._params(params, cond))
        return (cond, y_out), jnp.sum(ldj, axis=-1)

    def _inverse(self, params, xs, **kwargs):
        cond, y = xs
        y_out, ldj = self._inv(y, *self._params(params, cond))
        return (cond, y_out), jnp.sum(ldj, axis=-1)
