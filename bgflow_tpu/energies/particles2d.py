"""2D particle box: repulsive (r^-12) solvent + bistable dimer + box walls.

Reference: ``bgflow/distribution/energy/particles.py:51-381``
(RepulsiveParticles / HarmonicParticles).  Interleaved (x0,y0,x1,y1,...)
coordinate layout; the first two particles form the bistable dimer.  Forces
come from autograd (the reference's hand-coded forces are redundant under
JAX); the quadratic surrogate energy below the cutoff is kept for
HMC-style surrogate samplers.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .base import Energy

__all__ = ["RepulsiveParticles", "HarmonicParticles"]

DEFAULT_PARAMS = {
    "nsolvent": 36,
    "eps": 1.0,
    "rm": 1.1,
    "dimer_slope": -1.0,
    "dimer_a": 25.0,
    "dimer_b": 10.0,
    "dimer_dmid": 1.5,
    "dimer_k": 20.0,
    "box_halfsize": 3.0,
    "box_k": 100.0,
    "grid_k": 0.0,
    "rc": 0.9,
}


class RepulsiveParticles(Energy):
    def __init__(self, params: Optional[dict] = None):
        self.params = dict(DEFAULT_PARAMS if params is None else params)
        self.n_particles = self.params["nsolvent"] + 2
        super().__init__(2 * self.n_particles)
        mask = np.ones((self.n_particles, self.n_particles))
        mask[0, 1] = mask[1, 0] = 0.0  # dimer pair interacts via dimer term
        np.fill_diagonal(mask, 0.0)
        self.mask = jnp.asarray(mask)
        rc, rm = self.params["rc"], self.params["rm"]
        self._surr_a = 21.0 * rm**6 / rc**8
        self._surr_b = 6.0 * rm**6 / rc**7
        self._surr_c = rm**6 / rc**6

    # -- geometry ---------------------------------------------------------
    def _pair_d2(self, x):
        xc = x[:, 0::2]
        yc = x[:, 1::2]
        dx = xc[:, :, None] - xc[:, None, :]
        dy = yc[:, :, None] - yc[:, None, :]
        d2 = dx**2 + dy**2
        # masked pairs get unit distance to avoid inf^0 NaNs
        return jnp.where(self.mask > 0, d2, 1.0)

    def dimer_distance(self, x):
        return jnp.sqrt((x[:, 2] - x[:, 0]) ** 2 + (x[:, 3] - x[:, 1]) ** 2)

    # -- terms ------------------------------------------------------------
    def lj_energy(self, x):
        d2rel = self.params["rm"] ** 2 / self._pair_d2(x) * self.mask
        return 0.5 * self.params["eps"] * jnp.sum(d2rel**6, axis=(1, 2))

    def lj_energy_surrogate(self, x):
        """Quadratic continuation below rc (finite forces for HMC)."""
        rc = self.params["rc"]
        d2 = self._pair_d2(x)
        outside = d2 > rc**2
        d2rel = self.params["rm"] ** 2 / d2 * self.mask * outside
        e_lj = 0.5 * self.params["eps"] * jnp.sum(d2rel**6, axis=(1, 2))
        d = jnp.sqrt(d2)
        e_h = (
            self._surr_a * (d - rc) ** 2 - self._surr_b * (d - rc) + self._surr_c
        ) * (~outside) * self.mask
        return e_lj + 0.5 * jnp.sum(e_h, axis=(1, 2))

    def dimer_energy(self, x):
        p = self.params
        e_dx = p["dimer_k"] * (x[:, 0] + x[:, 2]) ** 2
        e_dy = p["dimer_k"] * x[:, 1] ** 2 + p["dimer_k"] * x[:, 3] ** 2
        d0 = 2.0 * (self.dimer_distance(x) - p["dimer_dmid"])
        return e_dx + e_dy + p["dimer_slope"] * d0 - p["dimer_a"] * d0**2 + p["dimer_b"] * d0**4

    def box_energy(self, x):
        p = self.params
        xc = x[:, 0::2]
        yc = x[:, 1::2]
        e = jnp.zeros(x.shape[0], dtype=x.dtype)
        for comp in (xc, yc):
            for sign in (1.0, -1.0):
                d = sign * comp - p["box_halfsize"]
                e = e + jnp.sum(jnp.where(d > 0, 2.0 * p["box_k"] * d**2, 0.0), axis=1)
        return e

    def _energy(self, x):
        return self.lj_energy(x) + self.dimer_energy(x) + self.box_energy(x)

    def surrogate_energy(self, x):
        return self.lj_energy_surrogate(x) + self.dimer_energy(x) + self.box_energy(x)

    def hamiltonian(self, mu):
        x = mu[:, : self.dim]
        p = mu[:, self.dim :]
        return self._energy(x) + 0.5 * jnp.sum(p**2, axis=1)


class HarmonicParticles(RepulsiveParticles):
    """Soft-core variant: harmonic repulsion below rc instead of r^-12."""

    def __init__(self, spring_constant: float = 200.0, params: Optional[dict] = None):
        super().__init__(params)
        self.spring_constant = spring_constant

    def harmonic_energy(self, x):
        rc = self.params["rc"]
        d2 = self._pair_d2(x)
        inside = d2 < rc**2
        d = jnp.sqrt(d2)
        e = self.spring_constant * (d - rc) ** 2 * inside * self.mask
        return 0.5 * jnp.sum(e, axis=(1, 2))

    def _energy(self, x):
        return self.harmonic_energy(x) + self.dimer_energy(x) + self.box_energy(x)
