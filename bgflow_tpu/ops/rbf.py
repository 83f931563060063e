"""Radial-basis-function featurization of distance matrices.

Reference: ``bgflow/utils/rbf_kernels.py``.  Normalized Gaussian RBFs over
pair distances, with optional analytic derivative (used by the equivariant
kernel dynamics' closed-form divergence).
"""
from __future__ import annotations

import jax.numpy as jnp


def rbf_kernels(d, mu, neg_log_gamma, derivative: bool = False):
    """d: (..., 1) distances; mu, neg_log_gamma: (K,) kernel params.

    Returns (kernels (..., K), dkernels (..., K) or None).
    """
    inv_gamma = jnp.exp(neg_log_gamma)
    rbfs = jnp.exp(-((d - mu) ** 2) * inv_gamma**2)
    srbfs = jnp.sum(rbfs, axis=-1, keepdims=True)
    kernels = rbfs / (1e-6 + srbfs)
    if not derivative:
        return kernels, None
    drbfs = -2.0 * (d - mu) * inv_gamma**2 * rbfs
    sdrbfs = jnp.sum(drbfs, axis=-1, keepdims=True)
    dkernels = drbfs / (1e-6 + srbfs) - rbfs * sdrbfs / (1e-6 + srbfs**2)
    return kernels, dkernels


def kernelize_with_rbf(d, mu, gamma=1.0, eps: float = 1e-6):
    """Normalized RBF featurization (no derivative)."""
    rbfs = jnp.exp(-((d - mu) ** 2) / gamma**2) + eps
    return rbfs / jnp.sum(rbfs, axis=-1, keepdims=True)


def compute_gammas(mus, gain: float = 1.0):
    isize = mus[..., -1:] - mus[..., :1]
    n_kernels = sum(mus.shape)
    return jnp.ones_like(mus) * gain * isize / jnp.sqrt(float(n_kernels))
