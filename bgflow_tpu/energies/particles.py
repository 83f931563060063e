"""Many-particle toy energies: LJ clusters and pairwise multi-double-wells.

Reference: ``bgflow/distribution/energy/lennard_jones.py:9-72`` and
``bgflow/distribution/energy/multi_double_well_potential.py:7-43``.

Both are O(N^2) pairwise kernels expressed as dense broadcasts — for the
cluster sizes these models use (N <= a few hundred) the full (B, N, N) tensor
lives comfortably in VMEM and XLA fuses the pair energy into one pass.
"""
from __future__ import annotations

import jax.numpy as jnp

from .base import Energy
from ..ops.geometry import compute_distances, distance_vectors, distances_from_vectors, remove_mean


def lennard_jones_energy(r, eps=1.0, rm=1.0):
    """LJ pair energy at distance r with well depth eps and minimum rm."""
    inv6 = (rm / r) ** 6
    return eps * (inv6 * inv6 - 2.0 * inv6)


class LennardJonesPotential(Energy):
    def __init__(
        self,
        dim,
        n_particles,
        eps=1.0,
        rm=1.0,
        oscillator=True,
        oscillator_scale=1.0,
        two_event_dims=True,
    ):
        if two_event_dims:
            super().__init__([n_particles, dim // n_particles])
        else:
            super().__init__(dim)
        self.n_particles = n_particles
        self.n_dims = dim // n_particles
        self.eps = eps
        self.rm = rm
        self.oscillator = oscillator
        self.oscillator_scale = oscillator_scale

    def _energy(self, x):
        batch = x.shape[0]
        x = x.reshape(batch, self.n_particles, self.n_dims)
        dists = distances_from_vectors(distance_vectors(x))
        lj = lennard_jones_energy(dists, self.eps, self.rm)
        e = 0.5 * jnp.sum(lj.reshape(batch, -1), axis=-1)
        if self.oscillator:
            xm = remove_mean(x, self.n_particles, self.n_dims)
            e = e + 0.5 * self.oscillator_scale * jnp.sum(xm.reshape(batch, -1) ** 2, axis=-1)
        return e


class MultiDoubleWellPotential(Energy):
    """Pairwise quartic double well on all N(N-1)/2 distances.

    u = sum_pairs a*(d - offset)^4 + b*(d - offset)^2 + c
    """

    def __init__(self, dim, n_particles, a, b, c, offset, two_event_dims=True):
        if two_event_dims:
            super().__init__([n_particles, dim // n_particles])
        else:
            super().__init__(dim)
        self.n_particles = n_particles
        self.n_dims = dim // n_particles
        self.a, self.b, self.c, self.offset = a, b, c, offset

    def _energy(self, x):
        d = compute_distances(x, self.n_particles, self.n_dims) - self.offset
        e = self.a * d**4 + self.b * d**2 + self.c
        return jnp.sum(e, axis=-1)
