"""Gaussian priors: full/diagonal Normal, truncated Normal, mean-free Normal,
circular (von Mises) Normal.

Reference: ``bgflow/distribution/normal.py:17-324``.  All energies are
*normalized* (they include log Z) so BG log-weights agree with the reference
up to the same constants.
"""
from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import ndtri
from jax.scipy.stats import norm as _norm

from ..energies.base import Energy
from ..samplers.base import Sampler

_LOG_2PI = math.log(2.0 * math.pi)


class NormalDistribution(Energy, Sampler):
    """N(mean, cov) with temperature-scaled sampling and energy.

    ``cov`` is eigendecomposed once at construction (host-side); sampling and
    energy are then two matmuls — MXU-friendly for large dims.
    Reference: ``normal.py:17-92``.
    """

    def __init__(self, dim: int, mean: Optional[jax.Array] = None, cov: Optional[jax.Array] = None):
        Energy.__init__(self, dim)
        Sampler.__init__(self)
        self._mean = jnp.zeros(dim) if mean is None else jnp.asarray(mean)
        assert self._mean.shape == (dim,)
        self._has_cov = cov is not None
        if self._has_cov:
            cov = np.asarray(cov)
            assert cov.shape == (dim, dim)
            diag, rot = np.linalg.eigh(cov)
            assert np.all(diag > 0), "`cov` must be positive definite"
            self._log_diag = jnp.asarray(np.log(diag + 1e-6))
            self._rot = jnp.asarray(rot)

    def energy(self, x, temperature=1.0):
        z = x - self._mean
        if self._has_cov:
            z = jnp.dot(z, self._rot, preferred_element_type=z.dtype)
            z = z * jnp.exp(-0.5 * self._log_diag)
        temperature = jnp.asarray(temperature)
        if temperature.ndim == 1:  # per-sample (B,) temperatures
            z = z / jnp.sqrt(temperature)[:, None]
        else:
            z = z / jnp.sqrt(temperature)
        return 0.5 * jnp.sum(z * z, axis=-1) + self._log_z(temperature)

    def _energy(self, x):
        return self.energy(x, temperature=1.0)

    def _log_z(self, temperature=1.0):
        log_z = 0.5 * self.dim * (_LOG_2PI + jnp.log(jnp.asarray(temperature, dtype=self._mean.dtype)))
        if self._has_cov:
            log_z = log_z + 0.5 * jnp.sum(self._log_diag)
        return log_z

    def _sample_with_temperature(self, key, n_samples, temperature=1.0):
        z = jax.random.normal(key, (n_samples, self.dim), dtype=self._mean.dtype)
        if self._has_cov:
            z = z * jnp.exp(0.5 * self._log_diag)
            z = jnp.dot(z, self._rot.T, preferred_element_type=z.dtype)
        temperature = jnp.asarray(temperature)
        if temperature.ndim == 1:
            temperature = temperature[:, None]
        z = z * jnp.sqrt(temperature)
        return z + self._mean

    def _sample(self, key, n_samples):
        return self._sample_with_temperature(key, n_samples, 1.0)


class TruncatedNormalDistribution(Energy, Sampler):
    """Normal restricted to [lower_bound, upper_bound].

    Used to model bond/angle marginals.  Reference: ``normal.py:95-250``.
    Unlike the reference we recompute the cdf bounds with the
    temperature-scaled sigma, so T != 1 samples always stay in bounds.

    ``sampling_method``: ``"icdf"`` (default; one ``ndtri`` per sample) or
    ``"rejection"`` (reference ``normal.py:168-183``) — branchless masked
    rejection rounds under ``lax.fori_loop``; more accurate in far tails
    under f32 where the icdf route saturates, with an icdf fallback for any
    chain that never accepts.
    """

    def __init__(self, mu, sigma=1.0, lower_bound=0.0, upper_bound=np.inf,
                 assert_range=True, sampling_method="icdf", n_rejection_rounds=64):
        mu = jnp.atleast_1d(jnp.asarray(mu, dtype=jnp.result_type(float)))
        Energy.__init__(self, tuple(mu.shape))
        Sampler.__init__(self)
        self.mu = mu
        self.sigma = jnp.broadcast_to(jnp.asarray(sigma, dtype=mu.dtype), mu.shape)
        self.lower_bound = jnp.broadcast_to(jnp.asarray(lower_bound, dtype=mu.dtype), mu.shape)
        self.upper_bound = jnp.broadcast_to(jnp.asarray(upper_bound, dtype=mu.dtype), mu.shape)
        self.assert_range = assert_range
        if sampling_method not in ("icdf", "rejection"):
            raise ValueError(f"unknown sampling_method {sampling_method!r}")
        self.sampling_method = sampling_method
        self.n_rejection_rounds = int(n_rejection_rounds)

    def _cdf_bounds(self, sigma):
        alpha = (self.lower_bound - self.mu) / sigma
        beta = (self.upper_bound - self.mu) / sigma
        return _norm.cdf(alpha), _norm.cdf(beta)

    def _sample_with_temperature(self, key, n_samples, temperature=1.0):
        sigma = self.sigma * jnp.sqrt(temperature)
        if self.sampling_method == "rejection":
            return self._rejection_sample(key, n_samples, sigma)
        return self._icdf_sample(key, n_samples, sigma)

    def _icdf_sample(self, key, n_samples, sigma):
        cdf_lo, cdf_hi = self._cdf_bounds(sigma)
        u = jax.random.uniform(key, (n_samples, *self.event_shape), dtype=self.mu.dtype)
        r = (cdf_hi - cdf_lo) * u + cdf_lo
        # clip away exact 0/1 to keep ndtri finite
        r = jnp.clip(r, 1e-12, 1.0 - 1e-12)
        return ndtri(r) * sigma + self.mu

    def _rejection_sample(self, key, n_samples, sigma):
        """Masked rejection rounds with fixed trip count (static shapes).

        In the bulk (standardized bounds straddling the mode region) the
        proposal is the plain N(mu, sigma) draw of the reference
        (``bgflow/distribution/normal.py:168-183``).  When the truncation
        band sits in a far tail — where both the naive proposal and the
        f32/f64 icdf route fail — the proposal switches per element to the
        shifted-exponential tail sampler of Robert (1995), which keeps the
        acceptance rate O(1) at any distance from the mode.  Entries that
        never accept (measure-zero bands) fall back to the in-bounds clip
        of the icdf sample.
        """
        shape = (n_samples, *self.event_shape)
        key, fallback_key = jax.random.split(key)
        a = (self.lower_bound - self.mu) / sigma  # standardized bounds
        b = (self.upper_bound - self.mu) / sigma
        right_tail = a > 3.0     # band entirely in the upper tail
        left_tail = b < -3.0     # band entirely in the lower tail
        # mirror the left-tail case onto the right tail
        a_eff = jnp.where(left_tail, -b, a)
        b_eff = jnp.where(left_tail, -a, b)
        alpha = 0.5 * (a_eff + jnp.sqrt(a_eff**2 + 4.0))
        use_tail = right_tail | left_tail

        def round_body(i, carry):
            x, accepted, key = carry
            key, k1, k2, k3 = jax.random.split(key, 4)
            # bulk proposal: z ~ N(0, 1), accept if within [a, b]
            z_bulk = jax.random.normal(k1, shape, dtype=self.mu.dtype)
            ok_bulk = (z_bulk >= a) & (z_bulk <= b)
            # tail proposal: z = a_eff + Exp(alpha), accept w.p. e^{-(z-alpha)^2/2}
            e = jax.random.exponential(k2, shape, dtype=self.mu.dtype)
            z_tail = a_eff + e / alpha
            u = jax.random.uniform(k3, shape, dtype=self.mu.dtype, minval=1e-38)
            ok_tail = (z_tail <= b_eff) & (jnp.log(u) <= -0.5 * (z_tail - alpha) ** 2)
            z = jnp.where(use_tail, jnp.where(left_tail, -z_tail, z_tail), z_bulk)
            ok = jnp.where(use_tail, ok_tail, ok_bulk)
            x = jnp.where(~accepted & ok, z, x)
            return x, accepted | ok, key

        z0 = jnp.zeros(shape, dtype=self.mu.dtype)
        z, accepted, _ = jax.lax.fori_loop(
            0, self.n_rejection_rounds, round_body,
            (z0, jnp.zeros(shape, dtype=bool), key),
        )
        x = self.mu + sigma * z
        fallback = jnp.clip(
            self._icdf_sample(fallback_key, n_samples, sigma),
            self.lower_bound, self.upper_bound,
        )
        return jnp.where(accepted, x, fallback)

    def _sample(self, key, n_samples):
        return self._sample_with_temperature(key, n_samples, 1.0)

    def _energy(self, x):
        e = 0.5 * ((x - self.mu) / self.sigma) ** 2
        out_of_bounds = (x < self.lower_bound) | (x > self.upper_bound)
        e = jnp.where(out_of_bounds, jnp.inf, e)
        return jnp.sum(e.reshape(e.shape[0], -1), axis=-1)

    @property
    def Z(self):
        cdf_lo, cdf_hi = self._cdf_bounds(self.sigma)
        return cdf_hi - cdf_lo

    def cdf(self, x):
        cdf_lo, _ = self._cdf_bounds(self.sigma)
        return (_norm.cdf((x - self.mu) / self.sigma) - cdf_lo) / self.Z

    def icdf(self, x):
        cdf_lo, _ = self._cdf_bounds(self.sigma)
        r = jnp.clip(self.Z * x + cdf_lo, 1e-12, 1.0 - 1e-12)
        return ndtri(r) * self.sigma + self.mu

    def log_prob(self, x):
        return _norm.logpdf((x - self.mu) / self.sigma) - jnp.log(self.Z * self.sigma)


class MeanFreeNormalDistribution(Energy, Sampler):
    """Gaussian on the mean-free subspace of an n-particle system.

    Translation-invariant prior for equivariant flows.
    Reference: ``normal.py:253-283``.
    """

    def __init__(self, dim: int, n_particles: int, std: float = 1.0, two_event_dims: bool = True):
        self._spatial = dim // n_particles
        Energy.__init__(self, [n_particles, self._spatial] if two_event_dims else dim)
        Sampler.__init__(self)
        self._two_event_dims = two_event_dims
        self._flat_dim = dim
        self.n_particles = n_particles
        self.std = float(std)

    def _remove_mean(self, x):
        x = x.reshape(-1, self.n_particles, self._spatial)
        return x - jnp.mean(x, axis=1, keepdims=True)

    def _energy(self, x):
        x = self._remove_mean(x).reshape(-1, self._flat_dim)
        return 0.5 * jnp.sum(x * x, axis=-1) / self.std**2

    def _sample_with_temperature(self, key, n_samples, temperature=1.0):
        x = jax.random.normal(key, (n_samples, self.n_particles, self._spatial)) * (
            self.std * jnp.sqrt(temperature)
        )
        x = self._remove_mean(x)
        if not self._two_event_dims:
            x = x.reshape(-1, self._flat_dim)
        return x

    def _sample(self, key, n_samples):
        return self._sample_with_temperature(key, n_samples, 1.0)


class DiagonalNormal(Energy, Sampler):
    """Independent normal with per-dim mu/sigma, exposing cdf/icdf/log_prob
    (the interface ``CDFTransform`` needs).  The analogue of a
    ``torch.distributions.Normal`` used in the reference's marginal tables
    (``factory/icmarginals.py:66-77``)."""

    def __init__(self, mu, sigma=1.0):
        mu = jnp.atleast_1d(jnp.asarray(mu, dtype=jnp.result_type(float)))
        Energy.__init__(self, tuple(mu.shape))
        Sampler.__init__(self)
        self.mu = mu
        self.sigma = jnp.broadcast_to(jnp.asarray(sigma, dtype=mu.dtype), mu.shape)

    def cdf(self, x):
        return _norm.cdf((x - self.mu) / self.sigma)

    def icdf(self, x):
        return ndtri(jnp.clip(x, 1e-12, 1.0 - 1e-12)) * self.sigma + self.mu

    def log_prob(self, x):
        return _norm.logpdf((x - self.mu) / self.sigma) - jnp.log(self.sigma)

    def _energy(self, x):
        logp = self.log_prob(x)
        return -jnp.sum(logp.reshape(logp.shape[0], -1), axis=-1)

    def _sample_with_temperature(self, key, n_samples, temperature=1.0):
        eps = jax.random.normal(key, (n_samples, *self.event_shape), dtype=self.mu.dtype)
        return self.mu + self.sigma * jnp.sqrt(temperature) * eps

    def _sample(self, key, n_samples):
        return self._sample_with_temperature(key, n_samples, 1.0)


def sample_von_mises(key, loc, concentration, shape, n_rounds: int = 32):
    """Von Mises sampler (Best & Fisher 1979 rejection, fixed-shape).

    jax.random has no von Mises sampler; this runs ``n_rounds`` masked
    rejection rounds (acceptance is ~66% per round, so the miss
    probability after 32 rounds is ~1e-15) entirely branchlessly.
    """
    kappa = jnp.broadcast_to(jnp.asarray(concentration), shape)
    loc = jnp.broadcast_to(jnp.asarray(loc), shape)
    tau = 1.0 + jnp.sqrt(1.0 + 4.0 * kappa**2)
    rho = (tau - jnp.sqrt(2.0 * tau)) / (2.0 * jnp.maximum(kappa, 1e-12))
    r = (1.0 + rho**2) / (2.0 * rho)

    def round_body(i, carry):
        theta, accepted, key = carry
        key, k1, k2, k3 = jax.random.split(key, 4)
        u1 = jax.random.uniform(k1, shape)
        u2 = jax.random.uniform(k2, shape, minval=1e-12)
        u3 = jax.random.uniform(k3, shape)
        z = jnp.cos(jnp.pi * u1)
        f = (1.0 + r * z) / (r + z)
        c = kappa * (r - f)
        ok = (c * (2.0 - c) - u2 > 0.0) | (jnp.log(c / u2) + 1.0 - c >= 0.0)
        proposal = jnp.sign(u3 - 0.5) * jnp.arccos(jnp.clip(f, -1.0, 1.0))
        theta = jnp.where(~accepted & ok, proposal, theta)
        accepted = accepted | ok
        return theta, accepted, key

    theta0 = jnp.zeros(shape)
    theta, accepted, _ = jax.lax.fori_loop(
        0, n_rounds, round_body, (theta0, jnp.zeros(shape, dtype=bool), key)
    )
    # near-uniform fallback for the (astronomically unlikely) never-accepted
    theta = jnp.where(accepted, theta, 0.0)
    return jnp.mod(theta + loc + jnp.pi, 2.0 * jnp.pi) - jnp.pi


class CircularNormalDistribution(Energy, Sampler):
    """Von Mises wrapped to [0, 1].  Reference: ``normal.py:286-324``."""

    def __init__(self, mu, sigma):
        mu = jnp.atleast_1d(jnp.asarray(mu, dtype=jnp.result_type(float)))
        Energy.__init__(self, tuple(mu.shape))
        Sampler.__init__(self)
        self.loc = 2.0 * jnp.pi * (mu - 0.5)
        self.concentration = (2.0 * jnp.pi * jnp.asarray(sigma)) ** (-2.0)

    def _sample(self, key, n_samples):
        theta = sample_von_mises(
            key, self.loc, self.concentration, (n_samples, *self.event_shape)
        )
        return theta / (2.0 * jnp.pi) + 0.5

    def _energy(self, x):
        theta = 2.0 * jnp.pi * (x - 0.5)
        from jax.scipy.special import i0e

        # log p = kappa*cos(theta - loc) - log(2 pi I0(kappa))
        logp = (
            self.concentration * (jnp.cos(theta - self.loc) - 1.0)
            - jnp.log(2.0 * jnp.pi * i0e(self.concentration))
        )
        # + log(2 pi) Jacobian of the rescaling to [0,1]... matches reference
        # which evaluates the von Mises log_prob of the rescaled variable.
        return -jnp.sum(logp.reshape(logp.shape[0], -1), axis=-1)
