"""Molecular-dynamics integrators (Langevin / BAOAB) as sampler steps.

The reference propagates MD through OpenMM integrators in worker processes
(``openmm.py:340-397``, ``snf_openmm.py:92-190``); here the integrator is a
``lax.scan`` over fused force evaluations of the in-repo force-field kernel,
batched over chains and differentiable end to end.

Conventions: positions in nm, the energy object returns u = U/kT, so the
dimensionless dynamics use reduced forces; masses in amu are absorbed into
a per-dof mass vector.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .iterative import SamplerState, SamplerStep

__all__ = ["BAOABStep", "LangevinStep", "maxwell_boltzmann_velocities", "baoab_run"]


def maxwell_boltzmann_velocities(key, shape, masses=1.0, dtype=jnp.float32):
    """v ~ N(0, 1/m) in reduced units (kT = 1)."""
    return jax.random.normal(key, shape, dtype=dtype) / jnp.sqrt(masses)


class BAOABStep(SamplerStep):
    """BAOAB-splitting Langevin integrator (Leimkuhler-Matthews).

    Works in reduced units: the ``energy`` is dimensionless u(x) = U/kT and
    forces are -du/dx, so the stationary distribution is exp(-u).
    ``timestep`` and ``friction`` are in matching reduced units.
    """

    def __init__(self, energy, timestep: float = 1e-3, friction: float = 1.0, masses=1.0, n_steps: int = 1):
        super().__init__(n_steps=n_steps)
        self.energy = energy
        self.timestep = timestep
        self.friction = friction
        self.masses = masses

    def _force(self, x):
        return -jax.grad(lambda xx: jnp.sum(self.energy.energy(xx)))(x)

    def _step(self, state: SamplerState, key) -> SamplerState:
        (x,) = state.samples
        dt = self.timestep
        m = self.masses
        if state.velocities is None:
            key, sub = jax.random.split(key)
            v = maxwell_boltzmann_velocities(sub, x.shape, m, x.dtype)
        else:
            (v,) = state.velocities
        f = self._force(x)
        # B
        v = v + 0.5 * dt * f / m
        # A
        x = x + 0.5 * dt * v
        # O
        c1 = jnp.exp(-self.friction * dt)
        c2 = jnp.sqrt((1.0 - c1**2) / m)
        v = c1 * v + c2 * jax.random.normal(key, v.shape, dtype=v.dtype)
        # A
        x = x + 0.5 * dt * v
        # B
        f = self._force(x)
        v = v + 0.5 * dt * f / m
        return state.replace(samples=(x,), velocities=(v,), energies=None)


class LangevinStep(BAOABStep):
    """Alias with OpenMM-like naming."""


def baoab_run(energy, x0, key, n_steps: int, timestep: float = 1e-3, friction: float = 1.0, masses=1.0, thin: int = 1):
    """Run BAOAB for ``n_steps`` and return thinned positions (n_out, B, D).

    One fused scan; useful for generating training data on-device.
    """
    step = BAOABStep(energy, timestep=timestep, friction=friction, masses=masses)
    key, sub = jax.random.split(key)
    v0 = maxwell_boltzmann_velocities(sub, x0.shape, masses, x0.dtype)
    state = SamplerState(samples=(x0,), velocities=(v0,))

    def body(state, key):
        state = step._step(state, key)
        return state, state.samples[0]

    _, xs = jax.lax.scan(body, state, jax.random.split(key, n_steps))
    return xs[::thin]
