"""Stochastic normalizing-flow layers (SNF).

Non-bijective layers returning the log forward/backward path-probability
ratio ("path work" dW) in place of an exact log-det.  Reference:
``bgflow/nn/flow/stochastic/{langevin,mcmc,augment}.py`` and the
OpenMM-integrator variants (``snf_openmm.py:92-190``), which are replaced
here by on-device integration over the in-repo energy kernels.

All layers consume an explicit PRNG key and compile into single
``lax.scan`` programs over their steps.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.flow import Flow

__all__ = ["BrownianFlow", "OverdampedLangevinFlow", "LangevinFlow", "MetropolisMCFlow", "StochasticAugmentation"]


class BrownianFlow(Flow):
    """Overdamped-Langevin (Brownian) SNF layer.

    Forward step: y = x + dt f(x) + sqrt(2 dt) w, with the accumulated
    log noise-ratio dW = 1/2 sum(w^2 - w_backward^2) where the backward
    noise is the one that would map y back to x (reference
    ``stochastic/langevin.py:17-51``).
    """

    def __init__(self, energy_model, n_steps: int = 1, stepsize: float = 0.01):
        self.energy_model = energy_model
        self.n_steps = n_steps
        self.stepsize = stepsize

    def _force(self, x):
        return -jax.grad(lambda xx: jnp.sum(self.energy_model.energy(xx)))(x)

    def _run(self, x, key):
        dt = self.stepsize
        sq = math.sqrt(2.0 * dt)

        def body(carry, key):
            x, dw = carry
            w = jax.random.normal(key, x.shape, dtype=x.dtype)
            y = x + dt * self._force(x) + sq * w
            w_back = (x - y - dt * self._force(y)) / sq
            dw = dw + 0.5 * jnp.sum(
                (w**2 - w_back**2).reshape(x.shape[0], -1), axis=-1
            )
            return (y, dw), None

        (x, dw), _ = jax.lax.scan(
            body, (x, jnp.zeros(x.shape[0], dtype=x.dtype)), jax.random.split(key, self.n_steps)
        )
        return x, dw

    def _forward(self, params, xs, key=None, **kwargs):
        (x,) = xs
        if key is None:
            raise ValueError("BrownianFlow requires a PRNG key")
        y, dw = self._run(x, key)
        return (y,), dw

    def _inverse(self, params, xs, key=None, **kwargs):
        return self._forward(params, xs, key=key, **kwargs)


OverdampedLangevinFlow = BrownianFlow


class LangevinFlow(Flow):
    """Full (q, v) Langevin SNF layer (reference ``langevin.py:54-122``)."""

    def __init__(self, energy_model, n_steps: int = 1, stepsize: float = 0.01,
                 mass: float = 1.0, gamma: float = 1.0, kT: float = 1.0):
        self.energy_model = energy_model
        self.n_steps = n_steps
        self.stepsize = stepsize
        self.mass = mass
        self.gamma = gamma
        self.kT = kT

    def _force(self, q):
        return -jax.grad(lambda qq: jnp.sum(self.energy_model.energy(qq)))(q)

    def _run(self, q, v, key):
        dt = self.stepsize
        gamma_m = self.gamma * self.mass
        fac1 = math.sqrt(4.0 * gamma_m * self.kT / dt)
        fac2 = math.sqrt(gamma_m * dt / self.kT)

        def body(carry, key):
            q1, v1, dw = carry
            k1, k2 = jax.random.split(key)
            w1 = jax.random.normal(k1, q1.shape, dtype=q1.dtype)
            w2 = jax.random.normal(k2, q1.shape, dtype=q1.dtype)
            vh = v1 + (dt / (2.0 * self.mass)) * (self._force(q1) - gamma_m * v1 + fac1 * w1)
            q2 = q1 + dt * vh
            v2 = (vh + (dt / (2.0 * self.mass)) * (self._force(q2) + fac1 * w2)) / (
                1.0 + self.gamma * dt / 2.0
            )
            w1_back = w2 - fac2 * v2
            w2_back = w1 - fac2 * v1
            dw = dw + 0.5 * jnp.sum(
                (w1**2 + w2**2 - w1_back**2 - w2_back**2).reshape(q1.shape[0], -1), axis=-1
            )
            return (q2, v2, dw), None

        (q, v, dw), _ = jax.lax.scan(
            body, (q, v, jnp.zeros(q.shape[0], dtype=q.dtype)), jax.random.split(key, self.n_steps)
        )
        return q, v, dw

    def _forward(self, params, xs, key=None, **kwargs):
        q, v = xs
        if key is None:
            raise ValueError("LangevinFlow requires a PRNG key")
        q, v, dw = self._run(q, v, key)
        return (q, v), dw

    def _inverse(self, params, xs, key=None, **kwargs):
        return self._forward(params, xs, key=key, **kwargs)


class MetropolisMCFlow(Flow):
    """Metropolis MC SNF layer; dW = E_final - E_initial (reference
    ``stochastic/mcmc.py:4-51``).

    ``temperature`` anneals the layer's target to ``exp(-u/T)``.  The
    AIS-style work accounting keeps the flow's importance weights exact
    for ANY layer temperature; note that a layer targeting exactly the
    final density (T = 1 as the last block) provably leaves the weights
    unchanged — ESS gains come from *annealed* intermediate layers
    (see ``examples/double_well_snf.py``).
    """

    def __init__(self, energy_model, n_steps: int = 1, stepsize: float = 0.01,
                 temperature: float = 1.0):
        self.energy_model = energy_model
        self.n_steps = n_steps
        self.stepsize = stepsize
        self.temperature = temperature

    def _run(self, x, key):
        e0 = self.energy_model.energy(x, temperature=self.temperature)

        def body(carry, key):
            x, e = carry
            k1, k2 = jax.random.split(key)
            dx = self.stepsize * jax.random.normal(k1, x.shape, dtype=x.dtype)
            x_prop = x + dx
            e_prop = self.energy_model.energy(x_prop, temperature=self.temperature)
            accept = jax.random.uniform(k2, e.shape) < jnp.exp(-(e_prop - e))
            x = jnp.where(accept.reshape(-1, *([1] * (x.ndim - 1))), x_prop, x)
            e = jnp.where(accept, e_prop, e)
            return (x, e), None

        (x, e), _ = jax.lax.scan(body, (x, e0), jax.random.split(key, self.n_steps))
        return x, e - e0

    def _forward(self, params, xs, key=None, **kwargs):
        (x,) = xs
        if key is None:
            raise ValueError("MetropolisMCFlow requires a PRNG key")
        x, dw = self._run(x, key)
        return (x,), dw

    def _inverse(self, params, xs, key=None, **kwargs):
        return self._forward(params, xs, key=key, **kwargs)


class StochasticAugmentation(Flow):
    """Momentum augmentation: forward samples p ~ distribution and appends
    it; inverse strips it.  dlogp carries the momentum energy (reference
    ``stochastic/augment.py:6-55``)."""

    def __init__(self, distribution):
        self.distribution = distribution

    def _forward(self, params, xs, key=None, temperature=1.0, **kwargs):
        (q,) = xs
        if key is None:
            raise ValueError("StochasticAugmentation requires a PRNG key")
        p = self.distribution.sample(key, q.shape[0], temperature=temperature)
        dlogp = self.distribution.energy(p, temperature=temperature)
        return (jnp.concatenate([q, p], axis=-1),), dlogp

    def _inverse(self, params, xs, temperature=1.0, **kwargs):
        (x,) = xs
        dim = self.distribution.dim
        q = x[:, : x.shape[-1] - dim]
        p = x[:, x.shape[-1] - dim :]
        dlogp = self.distribution.energy(p, temperature=temperature)
        return (q,), -dlogp
