"""Direct products of energies / samplers over multiple event tensors.

Reference: ``bgflow/distribution/product.py:13-139``.  The product
distribution is the prior of a multi-channel Boltzmann generator (one factor
per IC channel: bonds, angles, torsions, ...).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..energies.base import Energy
from ..samplers.base import Sampler


def _cat_dims(components):
    dims = []
    for c in components:
        shapes = c.event_shapes
        assert len(shapes) == 1, "cat_dim requires single-event components"
        assert len(shapes[0]) == 1, "cat_dim requires vector events"
        dims.append(shapes[0][0])
    return dims


class ProductEnergy(Energy):
    """Sum of independent energies; if ``cat_dim`` is given, the input is one
    concatenated tensor that is split among the factors."""

    def __init__(self, components: Sequence, cat_dim: Optional[int] = None):
        if cat_dim is None:
            shapes = [s for c in components for s in c.event_shapes]
        else:
            assert cat_dim in (-1,), "only cat_dim=-1 supported"
            shapes = [sum(_cat_dims(components))]
        super().__init__(shapes)
        self.components = tuple(components)
        self.cat_dim = cat_dim

    def _energy(self, *xs):
        if self.cat_dim is not None:
            (x,) = xs
            xs = []
            offset = 0
            for d in _cat_dims(self.components):
                xs.append(jax.lax.slice_in_dim(x, offset, offset + d, axis=-1))
                offset += d
        energies = []
        i = 0
        for c in self.components:
            n = len(c.event_shapes)
            energies.append(c.energy(*xs[i : i + n]))
            i += n
        return sum(energies)

    def energy(self, *xs, temperature=1.0):
        # delegate temperature to the components (they may scale log Z)
        if self.cat_dim is not None:
            (x,) = xs
            xs = []
            offset = 0
            for d in _cat_dims(self.components):
                xs.append(jax.lax.slice_in_dim(x, offset, offset + d, axis=-1))
                offset += d
        energies = []
        i = 0
        for c in self.components:
            n = len(c.event_shapes)
            energies.append(c.energy(*xs[i : i + n], temperature=temperature))
            i += n
        return sum(energies)


class ProductSampler(Sampler):
    def __init__(self, components: Sequence, cat_dim: Optional[int] = None):
        super().__init__()
        self.components = tuple(components)
        self.cat_dim = cat_dim

    def _sample_with_temperature(self, key, n_samples, temperature=1.0):
        keys = jax.random.split(key, len(self.components))
        samples = []
        for c, k in zip(self.components, keys):
            s = c.sample(k, n_samples, temperature=temperature)
            samples.extend(s if isinstance(s, tuple) else (s,))
        if self.cat_dim is not None:
            return jnp.concatenate(samples, axis=self.cat_dim)
        return tuple(samples)

    def _sample(self, key, n_samples):
        return self._sample_with_temperature(key, n_samples, 1.0)


class ProductDistribution(ProductEnergy, ProductSampler):
    """Energy + Sampler product.  Reference: ``product.py:13-57``."""

    def __init__(self, components: Sequence, cat_dim: Optional[int] = None):
        ProductEnergy.__init__(self, components, cat_dim=cat_dim)
        ProductSampler.__init__(self, components, cat_dim=cat_dim)
