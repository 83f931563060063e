"""Multi-walker (well-tempered) metadynamics on a collective-variable grid.

Capability extension over the reference (whose enhanced-sampling toolbox
stops at umbrella windows, ``_mcmc/umbrella_sampling.py``): a history-
dependent bias drives barrier crossing *adaptively*, which is what the
roadmap needs for stubborn-basin coverage (e.g. C7ax window seeding).

TPU-first design
----------------
* The bias potential lives on a **fixed grid** (1D or 2D CV), not as a
  growing list of hills — static shapes, O(n_bins) deposits, and the whole
  trajectory stays inside one ``lax.scan``.
* The grid is carried through the scan in ``SamplerState.aux`` (the
  framework's open-ended auxiliary carry), so bias history survives
  compilation — the same design that fixed replica-exchange parity.
* All B chains are **parallel walkers** sharing one bias (multiple-walker
  metadynamics): deposits from the whole batch are summed per step, so bias
  filling accelerates linearly with the batch size — batch is exactly what
  a TPU wants to scale.
* Well-tempered scaling ``h_eff = h exp(-V(s)/(gamma-1))`` (energies are
  dimensionless, kT = 1) gives convergent biases; the PMF estimate is then
  ``F(s) = -(gamma/(gamma-1)) V(s)``.  ``gamma=None`` selects standard
  (non-tempered) metadynamics with ``F(s) = -V(s)``.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..energies.base import Energy
from .iterative import IterativeSampler, SamplerState, SamplerStep
from .mcmc import GaussianProposal, metropolis_accept

__all__ = ["MetadynamicsStep", "Metadynamics"]

_AUX_KEY = "metadynamics_bias"


def _as_tuple(v, d):
    if np.ndim(v) == 0:
        return (float(v),) * d
    t = tuple(float(x) for x in v)
    assert len(t) == d
    return t


class _CVGrid:
    """Static helper: interpolation + Gaussian deposition on a 1D/2D grid."""

    def __init__(self, grid_min, grid_max, n_bins, sigma, periodic):
        self.d = 1 if np.ndim(grid_min) == 0 else len(grid_min)
        if self.d not in (1, 2):
            raise ValueError("metadynamics supports 1D or 2D CVs")
        self.lo = _as_tuple(grid_min, self.d)
        self.hi = _as_tuple(grid_max, self.d)
        self.n = tuple(int(x) for x in (
            (n_bins,) * self.d if np.ndim(n_bins) == 0 else n_bins))
        self.sigma = _as_tuple(sigma, self.d)
        self.periodic = tuple(
            bool(p) for p in ((periodic,) * self.d if np.ndim(periodic) == 0 else periodic)
        )
        # periodic dims: n points span [lo, hi) (node hi == node lo);
        # non-periodic: n points span [lo, hi] inclusive
        self.spacing = tuple(
            (h - l) / (n if p else n - 1)
            for l, h, n, p in zip(self.lo, self.hi, self.n, self.periodic)
        )
        self.nodes = tuple(
            jnp.asarray(l + s * np.arange(n))
            for l, s, n in zip(self.lo, self.spacing, self.n)
        )

    def zeros(self):
        return jnp.zeros(self.n)

    def _frac_index(self, c, dim):
        """Fractional grid index of CV values along one dim."""
        lo, sp, n = self.lo[dim], self.spacing[dim], self.n[dim]
        r = (c - lo) / sp
        if self.periodic[dim]:
            return jnp.mod(r, n)
        return jnp.clip(r, 0.0, n - 1.0)

    def _corners(self, r, dim):
        n = self.n[dim]
        i0 = jnp.floor(r).astype(jnp.int32)
        w = r - i0
        if self.periodic[dim]:
            i0 = jnp.mod(i0, n)
            i1 = jnp.mod(i0 + 1, n)
        else:
            i0 = jnp.clip(i0, 0, n - 2)
            w = r - i0
            i1 = i0 + 1
        return i0, i1, w

    def interp(self, bias, cv):
        """Linear/bilinear bias value at CV positions; cv: (B,) or (B, D)."""
        if self.d == 1:
            c = cv if cv.ndim == 1 else cv[:, 0]
            i0, i1, w = self._corners(self._frac_index(c, 0), 0)
            return bias[i0] * (1 - w) + bias[i1] * w
        i0, i1, wx = self._corners(self._frac_index(cv[:, 0], 0), 0)
        j0, j1, wy = self._corners(self._frac_index(cv[:, 1], 1), 1)
        return (
            bias[i0, j0] * (1 - wx) * (1 - wy)
            + bias[i1, j0] * wx * (1 - wy)
            + bias[i0, j1] * (1 - wx) * wy
            + bias[i1, j1] * wx * wy
        )

    def _node_kernel(self, c, dim):
        """exp(-d^2 / 2 sigma^2) of every node to every walker: (n, B)."""
        d = self.nodes[dim][:, None] - c[None, :]
        if self.periodic[dim]:
            period = self.hi[dim] - self.lo[dim]
            d = jnp.mod(d + 0.5 * period, period) - 0.5 * period
        return jnp.exp(-0.5 * (d / self.sigma[dim]) ** 2)

    def deposit(self, bias, cv, heights):
        """Add Gaussian hills of per-walker ``heights`` (B,) at ``cv``."""
        if self.d == 1:
            c = cv if cv.ndim == 1 else cv[:, 0]
            return bias + self._node_kernel(c, 0) @ heights
        kx = self._node_kernel(cv[:, 0], 0)  # (nx, B)
        ky = self._node_kernel(cv[:, 1], 1)  # (ny, B)
        return bias + jnp.einsum("xb,yb,b->xy", kx, ky, heights)


class MetadynamicsStep(SamplerStep):
    """Metropolis moves on ``u(x) + V(cv(x))`` with per-step hill deposits.

    The bias grid ``V`` is stored in ``state.aux["metadynamics_bias"]`` and
    updated every step from ALL walkers (multiple-walker metadynamics).
    ``state.energies`` caches the UNBIASED energies; the (cheap, grid-
    interpolated) bias is recomputed inside the acceptance, so stale caches
    are impossible as ``V`` grows.
    """

    def __init__(
        self,
        energy: Energy,
        cv: Callable,
        grid_min,
        grid_max,
        n_bins,
        sigma,
        height: float = 0.5,
        gamma: Optional[float] = 10.0,
        periodic=False,
        proposal=None,
        target_temperatures=1.0,
        n_steps: int = 1,
    ):
        super().__init__(n_steps=n_steps)
        self.energy = energy
        self.cv = cv
        self.grid = _CVGrid(grid_min, grid_max, n_bins, sigma, periodic)
        self.height = float(height)
        if gamma is not None and gamma <= 1.0:
            raise ValueError("well-tempered gamma must exceed 1")
        self.gamma = None if gamma is None else float(gamma)
        self.proposal = proposal if proposal is not None else GaussianProposal()
        self.target_temperatures = target_temperatures

    def _step(self, state: SamplerState, key) -> SamplerState:
        key_prop, key_accept = jax.random.split(key)
        aux = dict(state.aux or {})
        if _AUX_KEY not in aux:
            aux[_AUX_KEY] = self.grid.zeros()
        bias = aux[_AUX_KEY]
        if state.energies is None:
            state = state.replace(energies=self.energy.energy(*state.samples))

        cv_cur = self.cv(*state.samples)
        proposed, delta_log_prob = self.proposal.propose(state, key_prop)
        proposed_energies = self.energy.energy(*proposed.samples)
        cv_prop = self.cv(*proposed.samples)
        accept = metropolis_accept(
            key_accept,
            (state.energies + self.grid.interp(bias, cv_cur)) / self.target_temperatures,
            (proposed_energies + self.grid.interp(bias, cv_prop)) / self.target_temperatures,
            delta_log_prob,
        )
        merged = tuple(
            jnp.where(accept.reshape(-1, *([1] * (new.ndim - 1))), new, old)
            for new, old in zip(proposed.samples, state.samples)
        )
        energies = jnp.where(accept, proposed_energies, state.energies)
        cv_new = jnp.where(
            accept.reshape(-1, *([1] * (cv_prop.ndim - 1))), cv_prop, cv_cur
        )
        heights = jnp.full(energies.shape, self.height)
        if self.gamma is not None:
            heights = heights * jnp.exp(
                -self.grid.interp(bias, cv_new) / (self.gamma - 1.0)
            )
        aux[_AUX_KEY] = self.grid.deposit(bias, cv_new, heights)
        return state.replace(samples=merged, energies=energies, aux=aux)


class Metadynamics:
    """Convenience driver: run walkers, then read the PMF off the bias.

    ``run`` returns the collected samples (biased — use the PMF, not raw
    histograms, for free energies); ``pmf()`` converts the final bias grid
    to a free-energy surface estimate.
    """

    def __init__(
        self,
        energy: Energy,
        cv: Callable,
        grid_min,
        grid_max,
        n_bins=64,
        sigma=0.1,
        height=0.5,
        gamma: Optional[float] = 10.0,
        periodic=False,
        noise_std: float = 0.1,
        stride: int = 1,
        n_burnin: int = 0,
    ):
        self.step = MetadynamicsStep(
            energy, cv, grid_min, grid_max, n_bins, sigma, height, gamma,
            periodic, proposal=GaussianProposal(noise_std),
        )
        self.stride = stride
        self.n_burnin = n_burnin
        self._sampler = None

    def run(self, key, x0, n_iterations: int):
        self._sampler = IterativeSampler(
            SamplerState(samples=(x0,)), [self.step],
            stride=self.stride, n_burnin=self.n_burnin,
        )
        return self._sampler.sample(key, n_iterations)

    @property
    def bias(self):
        if self._sampler is None or self._sampler.state.aux is None:
            raise ValueError("run() first")
        return self._sampler.state.aux[_AUX_KEY]

    def pmf(self):
        """Free-energy surface on the grid nodes (kT units, min-shifted)."""
        g = self.step.gamma
        f = -self.bias if g is None else -(g / (g - 1.0)) * self.bias
        return f - jnp.min(f)

    @property
    def grid_nodes(self) -> Tuple[jax.Array, ...]:
        return self.step.grid.nodes
