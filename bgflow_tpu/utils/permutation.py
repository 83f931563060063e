"""Permutation removal for particle systems (Hungarian assignment).

Rebuild of the reference's legacy capability
(``distribution/sampling/_mcmc/permutation.py``, dead code there): map each
configuration onto a reference configuration's particle labeling by solving
the optimal assignment problem, removing the permutation symmetry from
sampled particle clusters.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

__all__ = ["HungarianMapper"]


class HungarianMapper:
    def __init__(self, reference: np.ndarray, n_dimensions: int = 2, identical_particles=None):
        """``reference``: (n_particles * n_dimensions,) reference configuration.
        ``identical_particles``: indices of interchangeable particles
        (default: all)."""
        self.reference = np.asarray(reference)
        self.n_dimensions = n_dimensions
        self.n_particles = self.reference.size // n_dimensions
        if identical_particles is None:
            identical_particles = np.arange(self.n_particles)
        self.identical = np.asarray(identical_particles)

    def map(self, x: np.ndarray) -> np.ndarray:
        """Permute particles of each sample to best match the reference."""
        x = np.asarray(x)
        out = x.copy().reshape(x.shape[0], self.n_particles, self.n_dimensions)
        ref = self.reference.reshape(self.n_particles, self.n_dimensions)[self.identical]
        for i in range(out.shape[0]):
            pts = out[i, self.identical]
            cost = ((ref[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
            _, cols = linear_sum_assignment(cost)
            out[i, self.identical] = pts[cols]
        return out.reshape(x.shape)

    def is_permuted(self, x: np.ndarray) -> np.ndarray:
        """Boolean per sample: would mapping change the particle order?"""
        mapped = self.map(x)
        return ~np.all(np.isclose(mapped, np.asarray(x)), axis=-1)
