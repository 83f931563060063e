"""Dataset-backed samplers.

Reference: ``bgflow/distribution/sampling/dataset.py:27-145``.  The torch
version reshuffles an epoch pointer; on TPU we draw random minibatch indices
with an explicit key — a single ``jax.random.choice`` gather per batch, which
jits and shards cleanly (the dataset lives in device memory once).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from .base import Sampler


class DataSetSampler(Sampler):
    """Present one or more aligned data tensors as a sampler.

    ``log_weights`` (optional, shape ``(n,)``): per-frame importance
    log-weights; minibatch indices are then drawn ∝ ``exp(log_weights)``
    via ``jax.random.categorical`` instead of uniformly.  Training an
    unweighted NLL on such batches equals weighted-NLL training in
    expectation — the TPU-native way to learn from a *reweighted*
    ensemble (e.g. umbrella-sampling frames unbiased by MBAR).
    """

    def __init__(self, *data: jax.Array, log_weights=None):
        super().__init__()
        self.data = tuple(jnp.asarray(d) for d in data)
        n = self.data[0].shape[0]
        assert all(d.shape[0] == n for d in self.data)
        self.n = n
        if log_weights is not None:
            log_weights = jnp.asarray(log_weights)
            assert log_weights.shape == (n,)
        self.log_weights = log_weights

    def __len__(self):
        return self.n

    def _sample(self, key, n_samples):
        if self.log_weights is None:
            idx = jax.random.randint(key, (n_samples,), 0, self.n)
        else:
            idx = jax.random.categorical(key, self.log_weights, shape=(n_samples,))
        out = tuple(jnp.take(d, idx, axis=0) for d in self.data)
        return out if len(out) > 1 else out[0]

    def _sample_with_temperature(self, key, n_samples, temperature=1.0):
        # data has no temperature; match reference behavior (ignores T)
        return self._sample(key, n_samples)
