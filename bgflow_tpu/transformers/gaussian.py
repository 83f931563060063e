"""Truncated-Gaussian CDF transformer and entropy-scaling layers.

References: ``bgflow/nn/flow/transformer/gaussian.py:8-103`` and
``entropy_scaling.py:9-56``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import ndtri
from jax.scipy.stats import norm as _norm

from ..core.flow import Flow
from .affine import AffineTransformer

__all__ = ["TruncatedGaussianTransformer", "ScalingLayer", "EntropyScalingLayer"]


class TruncatedGaussianTransformer(AffineTransformer):
    """Conditional truncated-normal CDF transform between bounded intervals.

    Like ``CDFTransform(TruncatedNormalDistribution)`` but with mu/sigma
    conditioned on the coupling input: maps [lower_in, upper_in] ->
    [lower_out, upper_out].
    """

    def __init__(
        self,
        mu_net=None,
        sigma_net=None,
        lower_bound_in: float = 0.0,
        upper_bound_in: float = 1.0,
        lower_bound_out: float = 0.0,
        upper_bound_out: float = 1.0,
    ):
        super().__init__(shift_net=mu_net, scale_net=sigma_net)
        self.lower_in = lower_bound_in
        self.upper_in = upper_bound_in
        self.lower_out = lower_bound_out
        self.upper_out = upper_bound_out

    def _trunc_cdf_logprob(self, y, mu, sigma, inverse=False):
        alpha = (self.lower_in - mu) / sigma
        beta = (self.upper_in - mu) / sigma
        cdf_lo = _norm.cdf(jax.lax.stop_gradient(alpha))
        cdf_hi = _norm.cdf(jax.lax.stop_gradient(beta))
        z = cdf_hi - cdf_lo
        if inverse:
            y = ndtri(jnp.clip(z * y + cdf_lo, 1e-12, 1 - 1e-12)) * sigma + mu
            log_prob = _norm.logpdf((y - mu) / sigma) - jnp.log(z * sigma)
            return y, -log_prob
        log_prob = _norm.logpdf((y - mu) / sigma) - jnp.log(z * sigma)
        y = (_norm.cdf((y - mu) / sigma) - cdf_lo) / z
        return y, log_prob

    def _forward(self, params, x, y, **kwargs):
        y = jnp.clip(y, self.lower_in, self.upper_in)
        mu, log_sigma = self._mu_log_sigma(params, x, y)
        sigma = jnp.exp(log_sigma)
        y, ldj = self._trunc_cdf_logprob(y, mu, sigma, inverse=False)
        width = self.upper_out - self.lower_out
        y = self.lower_out + y * width
        ldj = ldj + jnp.log(width)
        y = jnp.clip(y, self.lower_out, self.upper_out)
        return y, jnp.sum(ldj, axis=-1)

    def _inverse(self, params, x, y, **kwargs):
        y = jnp.clip(y, self.lower_out, self.upper_out)
        mu, log_sigma = self._mu_log_sigma(params, x, y)
        sigma = jnp.exp(log_sigma)
        width = self.upper_out - self.lower_out
        y = (y - self.lower_out) / width
        ldj_scale = -jnp.log(width)
        y, ldj = self._trunc_cdf_logprob(y, mu, sigma, inverse=True)
        y = jnp.clip(y, self.lower_in, self.upper_in)
        return y, jnp.sum(ldj + ldj_scale, axis=-1)


class ScalingLayer(Flow):
    """Scale the first ``dim`` features by a learned global factor."""

    def __init__(self, init_factor: float = 1.0, dim: int = 1):
        self.init_factor = init_factor
        self.dim = dim

    def init(self, key=None):
        return {"scale": jnp.asarray(self.init_factor)}

    def _forward(self, params, xs, **kwargs):
        (x,) = xs
        s = params["scale"]
        y = jnp.concatenate([x[:, : self.dim] * s, x[:, self.dim :]], axis=-1)
        ldj = jnp.full(x.shape[0], self.dim * jnp.log(s), dtype=x.dtype)
        return (y,), ldj

    def _inverse(self, params, xs, **kwargs):
        (x,) = xs
        s = params["scale"]
        y = jnp.concatenate([x[:, : self.dim] / s, x[:, self.dim :]], axis=-1)
        ldj = jnp.full(x.shape[0], -self.dim * jnp.log(s), dtype=x.dtype)
        return (y,), ldj


class EntropyScalingLayer(Flow):
    """Scale the first tensor of a pair by a learned global factor."""

    def __init__(self, init_factor: float = 1.0, dim: int = 1):
        self.init_factor = init_factor
        self.dim = dim

    def init(self, key=None):
        return {"scale": jnp.asarray(self.init_factor)}

    def _forward(self, params, xs, **kwargs):
        x, y = xs
        s = params["scale"]
        ldj = jnp.full(x.shape[0], self.dim * jnp.log(s), dtype=x.dtype)
        return (s * x, y), ldj

    def _inverse(self, params, xs, **kwargs):
        x, y = xs
        s = params["scale"]
        ldj = jnp.full(x.shape[0], -self.dim * jnp.log(s), dtype=x.dtype)
        return (x / s, y), ldj
