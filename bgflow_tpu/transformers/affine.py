"""Affine (RealNVP / NICE) transformer.

Math spec: reference ``bgflow/nn/flow/transformer/affine.py:35-70``:

    log_sigma = tanh(scale_net(x)) * exp(log_alpha)        (bounded log-scale)
    y'        = exp(log_sigma) * y + shift_net(x)
    ldj       = sum(log_sigma)

``log_alpha`` is a learned global damping initialized to ``-init_downscale``
so the flow starts near the identity.  The circular variant is shift-only with
a mod-1 wrap (volume preserving on the torus).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .base import Transformer


class AffineTransformer(Transformer):
    def __init__(
        self,
        shift_net=None,
        scale_net=None,
        init_downscale: float = 1.0,
        preserve_volume: bool = False,
        is_circular: bool = False,
        params_net=None,
        use_scaling: bool = True,
    ):
        """Two conditioner styles:

        * separate ``shift_net`` / ``scale_net`` (the reference's layout,
          ``affine.py:10-34``), or
        * a single ``params_net`` emitting ``concat(shift, raw_scale)``
          (or shift only when ``use_scaling=False`` / circular).  One net =
          one trunk: an expensive conditioner (e.g. a GNN) is computed once
          per coupling and shared across heads — the functional equivalent
          of the reference's GNN-output caching across conditioners
          (``conditioner_factory.py:139-154``).
        """
        if params_net is not None and (shift_net is not None or scale_net is not None):
            raise ValueError("Pass either params_net or shift_net/scale_net, not both.")
        if (scale_net is not None or (params_net is not None and use_scaling)) and is_circular:
            raise ValueError("Scaling is not compatible with periodicity.")
        self.shift_net = shift_net
        self.scale_net = scale_net
        self.params_net = params_net
        self.use_scaling = bool(use_scaling) and not is_circular
        self.init_downscale = float(init_downscale)
        self.preserve_volume = bool(preserve_volume)
        self.is_circular = bool(is_circular)

    def init(self, key):
        params = {}
        if self.params_net is not None:
            key, sub = jax.random.split(key)
            params["net"] = self.params_net.init(sub)
            if self.use_scaling:
                params["log_alpha"] = jnp.zeros(()) - self.init_downscale
            return params
        if self.shift_net is not None:
            key, sub = jax.random.split(key)
            params["shift"] = self.shift_net.init(sub)
        if self.scale_net is not None:
            key, sub = jax.random.split(key)
            params["scale"] = self.scale_net.init(sub)
            params["log_alpha"] = jnp.zeros(()) - self.init_downscale
        return params

    def _mu_log_sigma(self, params, x, y):
        if self.params_net is not None:
            raw = self.params_net.apply(params["net"], x)
            d = y.shape[-1]
            if self.use_scaling:
                mu, raw_scale = raw[..., :d], raw[..., d:]
                log_sigma = jnp.tanh(raw_scale) * jnp.exp(params["log_alpha"])
                if self.preserve_volume:
                    log_sigma = log_sigma - jnp.mean(log_sigma, axis=-1, keepdims=True)
            else:
                mu, log_sigma = raw, jnp.zeros_like(y)
            return mu, log_sigma
        if self.shift_net is not None:
            mu = self.shift_net.apply(params["shift"], x)
        else:
            mu = jnp.zeros_like(y)
        if self.scale_net is not None:
            alpha = jnp.exp(params["log_alpha"])
            log_sigma = jnp.tanh(self.scale_net.apply(params["scale"], x)) * alpha
            if self.preserve_volume:
                log_sigma = log_sigma - jnp.mean(log_sigma, axis=-1, keepdims=True)
        else:
            log_sigma = jnp.zeros_like(y)
        return mu, log_sigma

    def _forward(self, params, x, y, **kwargs):
        mu, log_sigma = self._mu_log_sigma(params, x, y)
        ldj = jnp.sum(log_sigma, axis=-1)
        y = jnp.exp(log_sigma) * y + mu
        if self.is_circular:
            y = jnp.mod(y, 1.0)
        return y, ldj

    def _inverse(self, params, x, y, **kwargs):
        mu, log_sigma = self._mu_log_sigma(params, x, y)
        ldj = -jnp.sum(log_sigma, axis=-1)
        y = jnp.exp(-log_sigma) * (y - mu)
        if self.is_circular:
            y = jnp.mod(y, 1.0)
        return y, ldj
