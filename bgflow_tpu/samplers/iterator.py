"""Iterator-backed sampler (the DataLoaderSampler equivalent).

Reference: ``bgflow/distribution/sampling/dataset.py`` (DataLoaderSampler
wraps a torch DataLoader).  Here any Python iterable of batches (a host
data pipeline, a tf.data iterator, a file reader) becomes a Sampler; batches
are concatenated/sliced to the requested sample count and staged to device.
"""
from __future__ import annotations

from typing import Callable, Iterable, Iterator

import jax.numpy as jnp

from .base import Sampler

__all__ = ["IteratorSampler"]


class IteratorSampler(Sampler):
    def __init__(self, iterable_factory: Callable[[], Iterator]):
        """``iterable_factory()`` returns a fresh iterator over batches
        (arrays or tuples of arrays); exhausted iterators restart."""
        super().__init__()
        self.factory = iterable_factory
        self._it = iter(self.factory())

    def _next_batch(self):
        try:
            return next(self._it)
        except StopIteration:
            self._it = iter(self.factory())
            return next(self._it)

    def _sample(self, key, n_samples):
        chunks = []
        count = 0
        while count < n_samples:
            batch = self._next_batch()
            batch = batch if isinstance(batch, tuple) else (batch,)
            chunks.append(batch)
            count += batch[0].shape[0]
        n_fields = len(chunks[0])
        out = tuple(
            jnp.concatenate([jnp.asarray(c[i]) for c in chunks], axis=0)[:n_samples]
            for i in range(n_fields)
        )
        return out if len(out) > 1 else out[0]

    def _sample_with_temperature(self, key, n_samples, temperature=1.0):
        return self._sample(key, n_samples)
