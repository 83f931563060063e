"""Marginal distributions per internal-coordinate channel.

Reference: ``bgflow/factory/icmarginals.py:14-163``.  These marginals define
the inverse-CDF maps from the uniform prior cube onto physically sensible
IC domains (``builder.add_map_to_ic_domains``), either from defaults or
informed by data statistics.
"""
from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from .tensor_info import AUGMENTED, ANGLES, BONDS, FIXED, TORSIONS
from ..distributions.normal import DiagonalNormal, TruncatedNormalDistribution
from ..distributions.uniform import UniformDistribution

__all__ = ["InternalCoordinateMarginals"]


class InternalCoordinateMarginals(dict):
    def __init__(
        self,
        current_dims,
        bond_mu=1.0,
        bond_sigma=1.0,
        bond_lower=1e-5,
        bond_upper=np.inf,
        angle_mu=0.5,
        angle_sigma=1.0,
        angle_lower=1e-5,
        angle_upper=1.0,
        torsion_lower=0.0,
        torsion_upper=1.0,
        fixed_scale=20.0,
        bonds=BONDS,
        angles=ANGLES,
        torsions=TORSIONS,
        fixed=FIXED,
        augmented=AUGMENTED,
    ):
        super().__init__()
        self.current_dims = current_dims
        if bonds in current_dims:
            self[bonds] = TruncatedNormalDistribution(
                mu=jnp.full(current_dims[bonds], bond_mu),
                sigma=jnp.full(current_dims[bonds], bond_sigma),
                lower_bound=bond_lower,
                upper_bound=bond_upper,
            )
        if angles in current_dims:
            self[angles] = TruncatedNormalDistribution(
                mu=jnp.full(current_dims[angles], angle_mu),
                sigma=jnp.full(current_dims[angles], angle_sigma),
                lower_bound=angle_lower,
                upper_bound=angle_upper,
            )
        if torsions in current_dims:
            self[torsions] = UniformDistribution(
                low=jnp.full(current_dims[torsions], torsion_lower),
                high=jnp.full(current_dims[torsions], torsion_upper),
            )
        if fixed in current_dims:
            self[fixed] = DiagonalNormal(
                mu=jnp.zeros(current_dims[fixed]), sigma=fixed_scale
            )
        if augmented in current_dims:
            self[augmented] = DiagonalNormal(mu=jnp.zeros(current_dims[augmented]))

    def inform_with_force_field(
        self,
        force_field,
        coordinate_transform,
        temperature=None,
        bond_lower=1e-5,
        bond_upper=np.inf,
        angle_lower=1e-5,
        angle_upper=1.0,
        constrained_bond_indices=None,
        bonds=BONDS,
        angles=ANGLES,
    ):
        """Set bond/angle marginals from the force field's equilibrium
        geometry and force constants (no data needed): a harmonic term
        k/2 (r-r0)^2 at temperature T has the Boltzmann marginal
        N(r0, sqrt(kT/k)), truncated to the channel domain.  Angles use the
        transform's normalized theta/pi domain.

        Reference capability: ``bgflow/factory/icmarginals.py:82-105``
        (which requires bgmol + an OpenMM system); here the in-repo
        ``ClassicalForceField`` supplies (r0, k, theta0, k_theta) directly.
        """
        b = force_field.bonded
        kt = force_field.kt if temperature is None else (
            force_field.kt / force_field.temperature * temperature
        )
        bond_table = {}
        for (i, j), r0, k in zip(
            np.asarray(b.bond_idx), np.asarray(b.bond_r0), np.asarray(b.bond_k)
        ):
            bond_table[(min(i, j), max(i, j))] = (float(r0), float(k))
        angle_table = {}
        for (i, j, k_), t0, k in zip(
            np.asarray(b.angle_idx), np.asarray(b.angle_theta0), np.asarray(b.angle_k)
        ):
            lo, hi = sorted((int(i), int(k_)))
            angle_table[(lo, int(j), hi)] = (float(t0), float(k))

        if bonds in self.current_dims:
            mu, sigma = [], []
            for i, j in np.asarray(coordinate_transform.bond_indices):
                try:
                    r0, k = bond_table[(min(i, j), max(i, j))]
                except KeyError:
                    raise KeyError(
                        f"force field has no bond term for z-matrix bond ({i}, {j})"
                    ) from None
                mu.append(r0)
                sigma.append(math.sqrt(kt / k))
            mu, sigma = np.asarray(mu), np.asarray(sigma)
            if constrained_bond_indices is not None:
                keep = np.setdiff1d(np.arange(len(mu)), constrained_bond_indices)
                mu, sigma = mu[keep], sigma[keep]
            self[bonds] = TruncatedNormalDistribution(
                mu=jnp.asarray(mu),
                sigma=jnp.asarray(sigma),
                lower_bound=bond_lower,
                upper_bound=bond_upper,
            )
        if angles in self.current_dims:
            mu, sigma = [], []
            for i, j, k_ in np.asarray(coordinate_transform.angle_indices):
                lo, hi = sorted((int(i), int(k_)))
                try:
                    t0, k = angle_table[(lo, int(j), hi)]
                except KeyError:
                    raise KeyError(
                        f"force field has no angle term for z-matrix angle "
                        f"({i}, {j}, {k_})"
                    ) from None
                mu.append(t0 / math.pi)
                sigma.append(math.sqrt(kt / k) / math.pi)
            self[angles] = TruncatedNormalDistribution(
                mu=jnp.asarray(np.asarray(mu)),
                sigma=jnp.asarray(np.asarray(sigma)),
                lower_bound=angle_lower,
                upper_bound=angle_upper,
            )

    def inform_with_data(
        self,
        data,
        coordinate_transform,
        bond_lower=0.01,
        bond_upper=1.0,
        angle_lower=0.01,
        angle_upper=1.0,
        torsion_lower=0.0,
        torsion_upper=1.0,
        constrained_bond_indices=None,
        bonds=BONDS,
        angles=ANGLES,
        torsions=None,
        broadening=1.0,
    ):
        """Set bond/angle (and optionally torsion) marginals from data
        statistics measured through the coordinate transform.
        Reference: ``icmarginals.py:106-163``.
        """
        (bond_values, angle_values, torsion_values, *_), _ = coordinate_transform.forward(
            (), (jnp.asarray(data),)
        )
        if bonds in self.current_dims:
            assert bond_lower < float(bond_values.min()), "Set a smaller bond_lower"
            assert bond_upper > float(bond_values.max()), "Set a larger bond_upper"
            mu = jnp.mean(bond_values, axis=0)
            sigma = jnp.std(bond_values, axis=0)
            if constrained_bond_indices is not None:
                keep = np.setdiff1d(np.arange(mu.shape[-1]), constrained_bond_indices)
                mu, sigma = mu[keep], sigma[keep]
            self[bonds] = TruncatedNormalDistribution(
                mu=mu, sigma=broadening * sigma, lower_bound=bond_lower, upper_bound=bond_upper
            )
        if angles in self.current_dims:
            assert angle_lower < float(angle_values.min()), "Set a smaller angle_lower"
            assert angle_upper > float(angle_values.max()), "Set a larger angle_upper"
            self[angles] = TruncatedNormalDistribution(
                mu=jnp.mean(angle_values, axis=0),
                sigma=broadening * jnp.std(angle_values, axis=0),
                lower_bound=angle_lower,
                upper_bound=angle_upper,
            )
        if torsions is not None and torsions in self.current_dims:
            self[torsions] = TruncatedNormalDistribution(
                mu=jnp.mean(torsion_values, axis=0),
                sigma=broadening * jnp.std(torsion_values, axis=0),
                lower_bound=torsion_lower,
                upper_bound=torsion_upper,
            )
