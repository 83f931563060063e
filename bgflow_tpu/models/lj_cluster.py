"""Equivariant-flow Boltzmann generator for Lennard-Jones clusters.

Second model family (after the ala2 spline BG): a mean-free Gaussian prior
flowed through an E(n)-equivariant kernel-dynamics CNF onto an LJ-cluster
Boltzmann density — the Koehler et al. (2020) "equivariant flows" setup the
reference assembles from ``MeanFreeNormalDistribution`` +
``KernelDynamics`` + ``LennardJonesPotential``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..bg import BoltzmannGenerator
from ..distributions.normal import MeanFreeNormalDistribution
from ..energies.particles import LennardJonesPotential
from ..flows.cnf import DiffEqFlow, KernelDynamics

__all__ = ["LJClusterModel", "make_lj_cluster_generator"]


def make_lj_cluster_generator(
    n_particles: int = 13,
    n_dimensions: int = 3,
    n_kernels: int = 32,
    n_time_steps: int = 20,
    eps: float = 1.0,
    rm: float = 1.0,
    oscillator_scale: float = 1.0,
) -> BoltzmannGenerator:
    dim = n_particles * n_dimensions
    prior = MeanFreeNormalDistribution(dim, n_particles, two_event_dims=False)
    target = LennardJonesPotential(
        dim, n_particles, eps=eps, rm=rm, oscillator=True,
        oscillator_scale=oscillator_scale, two_event_dims=False,
    )
    mus = jnp.linspace(0.0, 4.0, n_kernels)
    gammas = 0.3 * jnp.ones(n_kernels)
    mus_time = jnp.linspace(0.0, 1.0, 8)
    gammas_time = 0.3 * jnp.ones(8)
    dynamics = KernelDynamics(
        n_particles, n_dimensions, mus, gammas, mus_time=mus_time, gammas_time=gammas_time
    )
    flow = DiffEqFlow(dynamics, n_time_steps=n_time_steps)
    return BoltzmannGenerator(prior, flow, target)


class LJClusterModel(NamedTuple):
    generator: BoltzmannGenerator
    params: object

    @staticmethod
    def create(key, **kwargs) -> "LJClusterModel":
        gen = make_lj_cluster_generator(**kwargs)
        return LJClusterModel(generator=gen, params=gen.init(key))
