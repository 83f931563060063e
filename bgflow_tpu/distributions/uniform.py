"""Uniform distribution with "sloppy" support tolerance.

Reference: ``bgflow/distribution/distributions.py:11-117`` (``SloppyUniform``,
``UniformDistribution``): torsion angles occasionally land an epsilon outside
[0, 1] due to float roundoff, so the energy tolerates ``tol`` overshoot before
going to +inf.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..energies.base import Energy
from ..samplers.base import Sampler


class UniformDistribution(Energy, Sampler):
    def __init__(self, low, high, tol: float = 1e-5):
        low = jnp.atleast_1d(jnp.asarray(low, dtype=jnp.result_type(float)))
        high = jnp.broadcast_to(jnp.asarray(high, dtype=low.dtype), low.shape)
        Energy.__init__(self, tuple(low.shape))
        Sampler.__init__(self)
        self.low = low
        self.high = high
        self.tol = float(tol)

    def _energy(self, x):
        inside = (x >= self.low - self.tol) & (x <= self.high + self.tol)
        logp = -jnp.log(self.high - self.low)
        e = jnp.where(inside, -logp, jnp.inf)
        return jnp.sum(e.reshape(e.shape[0], -1), axis=-1)

    def _sample(self, key, n_samples):
        u = jax.random.uniform(key, (n_samples, *self.event_shape), dtype=self.low.dtype)
        return self.low + (self.high - self.low) * u

    def _sample_with_temperature(self, key, n_samples, temperature=1.0):
        # temperature does not change a uniform distribution
        return self._sample(key, n_samples)

    # cdf/icdf/log_prob interface (for CDFTransform / marginal tables)
    def cdf(self, x):
        return jnp.clip((x - self.low) / (self.high - self.low), 0.0, 1.0)

    def icdf(self, x):
        return self.low + x * (self.high - self.low)

    def log_prob(self, x):
        inside = (x >= self.low - self.tol) & (x <= self.high + self.tol)
        return jnp.where(inside, -jnp.log(self.high - self.low), -jnp.inf)
