"""Umbrella sampling with MBAR analysis.

Rebuild of the reference's legacy (dead-code) capability
(``distribution/sampling/_mcmc/umbrella_sampling.py``, numpy/Keras) as a
TPU-native workflow: all umbrella windows run as ONE batch of MCMC chains
(window index = batch index), and the window free energies come from the
in-repo MBAR estimator.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..energies.base import Energy
from ..utils.free_energy import mbar
from .iterative import IterativeSampler, SamplerState
from .mcmc import GaussianProposal, HMCStep, MCMCStep

__all__ = ["UmbrellaSampling", "BiasedEnergy"]


def _cv_displacement(c, centers, period):
    d = c - centers
    if period is None:
        return d
    # minimum-image displacement for periodic CVs (torsions); ``period`` may
    # be a scalar or a per-dimension array for vector CVs
    period = jnp.asarray(period)
    return jnp.mod(d + 0.5 * period, period) - 0.5 * period


class BiasedEnergy(Energy):
    """u(x) + 0.5 k |d(cv(x), center_b)|^2 with per-batch-element centers.

    Scalar CVs use ``cv(x) -> (B,)`` and ``centers`` of shape ``(K,)``;
    vector CVs (e.g. 2D (phi, psi) umbrellas) use ``cv(x) -> (B, D)`` and
    ``centers`` of shape ``(K, D)`` — the bias is then the sum of
    per-dimension harmonic terms (``k_umbrella`` may be scalar or ``(D,)``).

    ``cv_period`` makes the bias distance periodic (e.g. 2*pi for a
    dihedral CV) — without it an umbrella at phi = pi would pull chains the
    long way around the circle.

    ``cv_mask`` (K, D) restricts each window's bias to a subset of the CV
    components: window k biases ``sum_d mask[k, d] * harmonic(cv_d)``.  With
    one-hot rows this runs *independent per-component umbrella sweeps as a
    single batch* (e.g. one sweep over every backbone dihedral of a peptide
    in one compiled program), and MBAR stays exact because every window's
    bias energy is well-defined on every sample.
    """

    def __init__(self, energy: Energy, cv: Callable, centers, k_umbrella: float,
                 cv_period: Optional[float] = None, cv_mask=None):
        super().__init__([list(s) for s in energy.event_shapes])
        self.base = energy
        self.cv = cv
        self.centers = jnp.asarray(centers)
        self.k_umbrella = k_umbrella
        self.cv_period = cv_period
        self.cv_mask = None if cv_mask is None else jnp.asarray(cv_mask)

    def bias(self, *xs):
        d = _cv_displacement(self.cv(*xs), self.centers, self.cv_period)
        b = 0.5 * self.k_umbrella * d**2
        if self.cv_mask is not None:
            b = b * self.cv_mask
        if self.centers.ndim > 1:
            b = jnp.sum(b, axis=-1)
        return b

    def _energy(self, *xs):
        return self.base.energy(*xs) + self.bias(*xs)


class UmbrellaSampling:
    """Run K umbrella windows as one batch of chains; analyze with MBAR.

    Parameters
    ----------
    energy : the unbiased target (dimensionless).
    cv : callable mapping samples (B, ...) -> (B,) collective variable.
    centers : (K,) umbrella centers along the CV.
    k_umbrella : bias force constant.
    """

    def __init__(self, energy: Energy, cv: Callable, centers, k_umbrella: float,
                 noise_std: float = 0.1, stride: int = 10, n_burnin: int = 100,
                 cv_period: Optional[float] = None, mover: str = "gaussian",
                 hmc_step_size: float = 1e-3, hmc_leapfrog: int = 10, masses=1.0,
                 cv_mask=None):
        self.energy = energy
        self.cv = cv
        self.centers = jnp.asarray(centers)
        # scalar, per-dimension (D,), or per-window (K, 1) force constants
        # (per-window: e.g. softer springs for joint multi-CV windows)
        _k = jnp.asarray(k_umbrella)
        self.k_umbrella = float(_k) if _k.ndim == 0 else _k
        self.cv_period = cv_period
        self.cv_mask = None if cv_mask is None else jnp.asarray(cv_mask)
        self.biased = BiasedEnergy(
            energy, cv, self.centers, self.k_umbrella, cv_period, cv_mask=self.cv_mask
        )
        self.noise_std = noise_std
        self.stride = stride
        self.n_burnin = n_burnin
        # "hmc" movers mix vastly better on molecular windows (gradient
        # moves along the window's free valley); both are exact MCMC
        self.mover = mover
        self.hmc_step_size = hmc_step_size
        self.hmc_leapfrog = hmc_leapfrog
        self.masses = masses

    def run(self, key, x0, n_iterations: int):
        """x0: (K, ...) initial state per window; returns samples
        (n_iterations, K, ...)."""
        if self.mover == "hmc":
            step = HMCStep(
                self.biased,
                step_size=self.hmc_step_size,
                n_leapfrog=self.hmc_leapfrog,
                masses=self.masses,
            )
        else:
            step = MCMCStep(self.biased, proposal=GaussianProposal(self.noise_std))
        sampler = IterativeSampler(
            SamplerState(samples=(x0,)), [step], stride=self.stride, n_burnin=self.n_burnin
        )
        return sampler.sample(key, n_iterations)

    def _bias_matrix(self, cv_vals):
        """(K, N) umbrella bias of every pooled sample in every window."""
        if self.centers.ndim > 1:
            d = _cv_displacement(
                cv_vals[None, :, :], self.centers[:, None, :], self.cv_period
            )
            k = self.k_umbrella
            if isinstance(k, jnp.ndarray) and k.ndim == 2:
                k = k[:, None, :]  # per-window (K, 1) -> (K, 1, 1)
            b = 0.5 * k * d**2
            if self.cv_mask is not None:
                b = b * self.cv_mask[:, None, :]
            return jnp.sum(b, axis=-1)
        d = _cv_displacement(cv_vals[None, :], self.centers[:, None], self.cv_period)
        return 0.5 * self.k_umbrella * d**2

    def free_energies(self, samples):
        """MBAR window free energies from (n_iter, K, ...) samples.

        Returns (f_k (K,), cv_values (n_iter, K) or (n_iter, K, D)).
        """
        n_iter, k = samples.shape[0], samples.shape[1]
        flat = samples.reshape(n_iter * k, *samples.shape[2:])
        u_base = self.energy.energy(flat)  # (N,)
        cv_vals = self.cv(flat)  # (N,) or (N, D)
        # biased energies of all pooled samples in every window
        u_kn = u_base[None, :] + self._bias_matrix(cv_vals)
        n_k = jnp.full(k, n_iter)
        f_k = mbar(u_kn, n_k)
        return f_k, cv_vals.reshape(n_iter, k, *cv_vals.shape[1:])

    def unbiased_log_weights(self, samples):
        """Normalized MBAR log-weights of every pooled sample in the
        UNBIASED state; returns (cv_values (N,) or (N, D), log_w (N,))."""
        n_iter, k = samples.shape[0], samples.shape[1]
        flat = samples.reshape(n_iter * k, *samples.shape[2:])
        u_base = self.energy.energy(flat)
        cv_vals = self.cv(flat)
        u_kn = u_base[None, :] + self._bias_matrix(cv_vals)
        n_k = jnp.full(k, n_iter)
        f_k = mbar(u_kn, n_k)
        log_denom = jax.scipy.special.logsumexp(
            jnp.log(n_k)[:, None] + f_k[:, None] - u_kn, axis=0
        )
        log_w = -u_base - log_denom
        return cv_vals, log_w - jax.scipy.special.logsumexp(log_w)

    def pmf(self, samples, bins):
        """Unbiased potential of mean force over CV bins via MBAR weights."""
        cv_vals, log_w = self.unbiased_log_weights(samples)
        bins = jnp.asarray(bins)
        which = jnp.clip(jnp.searchsorted(bins, cv_vals) - 1, 0, bins.shape[0] - 2)
        w = jnp.exp(log_w)
        hist = jnp.zeros(bins.shape[0] - 1).at[which].add(w)
        return -jnp.log(jnp.maximum(hist, 1e-300))

    def pmf2d(self, samples, bins_x, bins_y):
        """2D PMF surface over a vector CV (e.g. the (phi, psi) Ramachandran
        map); returns a ``(len(bins_x)-1, len(bins_y)-1)`` free-energy grid."""
        cv_vals, log_w = self.unbiased_log_weights(samples)
        bins_x = jnp.asarray(bins_x)
        bins_y = jnp.asarray(bins_y)
        ix = jnp.clip(jnp.searchsorted(bins_x, cv_vals[:, 0]) - 1, 0, bins_x.shape[0] - 2)
        iy = jnp.clip(jnp.searchsorted(bins_y, cv_vals[:, 1]) - 1, 0, bins_y.shape[0] - 2)
        w = jnp.exp(log_w)
        hist = jnp.zeros((bins_x.shape[0] - 1, bins_y.shape[0] - 1)).at[ix, iy].add(w)
        return -jnp.log(jnp.maximum(hist, 1e-300))
