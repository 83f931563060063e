"""Mixture distribution with (optionally trainable) weights.

Reference: ``bgflow/distribution/mixture.py:12-47``.  Energy is the negative
logsumexp of component log-densities; sampling draws component indices from a
categorical and gathers — branchless, one pass per component (component count
is static and small).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..energies.base import Energy
from ..samplers.base import Sampler


class MixtureDistribution(Energy, Sampler):
    def __init__(self, components: Sequence, weights=None):
        Energy.__init__(self, [s for c in components for s in c.event_shapes])
        Sampler.__init__(self)
        self.components = tuple(components)
        n = len(self.components)
        if weights is None:
            weights = jnp.ones(n) / n
        self.log_weights = jnp.log(jnp.asarray(weights) / jnp.sum(jnp.asarray(weights)))

    def _energy(self, x):
        # component energies are normalized => -log p_i = u_i
        energies = jnp.stack([c.energy(x) for c in self.components], axis=-1)  # (B, n)
        return -jax.scipy.special.logsumexp(self.log_weights - energies, axis=-1)

    def _sample(self, key, n_samples):
        key_idx, *keys = jax.random.split(key, len(self.components) + 1)
        idx = jax.random.categorical(key_idx, self.log_weights, shape=(n_samples,))
        samples = jnp.stack(
            [c.sample(k, n_samples) for c, k in zip(self.components, keys)], axis=0
        )  # (n_components, B, ...)
        return jnp.take_along_axis(
            samples, idx[None, :, *([None] * (samples.ndim - 2))], axis=0
        )[0]
