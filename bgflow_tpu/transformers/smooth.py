"""Smooth mixture-of-sigmoids transformer (coupling-compatible).

The native equivalent of the reference's JAX-bridge transformer stack
(``transformer/jax_bridge.py`` + ``jax.py``): a conditional mixture of
affine smooth-sigmoid bijectors on [0, 1], optionally circularly wrapped,
with bisection inverse + implicit gradients.  Durable alternative to
rational-quadratic splines with C-infinity smoothness (Koehler et al.,
Smooth Normalizing Flows, 2021).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..flows.smooth import (
    affine_sigmoid,
    elementwise_ldj,
    inverse_with_ldj,
    ramp_to_sigmoid,
    remap_to_unit,
    smooth_ramp,
    wrap_around,
)
from .base import Transformer

__all__ = ["SmoothSigmoidTransformer"]


class SmoothSigmoidTransformer(Transformer):
    """Conditional smooth bijector on [0, 1]^D.

    ``params_net`` emits ``5 * K * D`` raw params per sample
    (weights, shift, log_slope, mix, logalpha per component).
    """

    def __init__(self, params_net, n_components: int = 4, is_circular: bool = False,
                 ramp_power: int = 1, bisection_eps: float = 1e-8):
        self.params_net = params_net
        self.n_components = n_components
        self.is_circular = is_circular
        self.bisection_eps = bisection_eps

        base = affine_sigmoid(ramp_to_sigmoid(lambda x, la: smooth_ramp(x, la, power=ramp_power)))
        if is_circular:
            self._scalar = wrap_around(base)
        else:
            # mixture over components with unit-interval renormalization
            def _mix(x, weights, shift, log_slope, mix, logalpha):
                comps = base(x[..., None], shift, log_slope, mix, logalpha)
                return jnp.sum(jax.nn.softmax(weights, axis=-1) * comps, axis=-1)

            self._scalar = remap_to_unit(_mix)

        self._fwd = elementwise_ldj(self._scalar)
        self._inv = inverse_with_ldj(self._scalar, domain=(0.0, 1.0), eps=bisection_eps)

    def init(self, key):
        return self.params_net.init(key)

    def _compute_params(self, params, x, y_dim):
        raw = self.params_net.apply(params, x)
        k = self.n_components
        expected = 5 * k * y_dim
        if raw.shape[-1] != expected:
            raise ValueError(
                f"params_net output ({raw.shape[-1]}) != 5*n_components*y_dim = {expected}"
            )
        raw = raw.reshape(*raw.shape[:-1], y_dim, 5, k)
        weights = raw[..., 0, :]
        shift = jax.nn.sigmoid(raw[..., 1, :])  # shifts within [0,1]
        log_slope = jnp.tanh(raw[..., 2, :]) * 2.0  # bounded slopes
        mix = raw[..., 3, :]
        logalpha = jnp.tanh(raw[..., 4, :])
        return weights, shift, log_slope, mix, logalpha

    def _forward(self, params, x, y, **kwargs):
        p = self._compute_params(params, x, y.shape[-1])
        if self.is_circular:
            # wrap_around expects per-element scalar params; use component 0
            # of each param with mixture over sheaves
            p = tuple(q[..., 0] for q in p[1:])  # drop weights
            y_out, ldj = elementwise_ldj(self._scalar)(y, *p)
        else:
            y_out, ldj = self._fwd(y, *p)
        return y_out, jnp.sum(ldj, axis=-1)

    def _inverse(self, params, x, y, **kwargs):
        p = self._compute_params(params, x, y.shape[-1])
        if self.is_circular:
            p = tuple(q[..., 0] for q in p[1:])
            inv = inverse_with_ldj(self._scalar, domain=(0.0, 1.0), eps=self.bisection_eps)
            y_out, ldj = inv(y, *p)
        else:
            y_out, ldj = self._inv(y, *p)
        return y_out, jnp.sum(ldj, axis=-1)
