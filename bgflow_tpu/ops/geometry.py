"""Particle-geometry primitives: distance vectors, pair distances, mean removal.

Reference: ``bgflow/utils/geometry.py:5-166``.  All functions are batched,
``vmap``-free (plain broadcasting), and fuse under jit.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def distance_vectors(x: jax.Array, remove_diagonal: bool = True) -> jax.Array:
    """All pairwise difference vectors r_ij = x_i - x_j.

    x: (B, N, D) -> (B, N, N, D) or (B, N, N-1, D) with the diagonal removed.
    """
    r = x[:, :, None, :] - x[:, None, :, :]
    if remove_diagonal:
        n = x.shape[1]
        mask = ~np.eye(n, dtype=bool)
        # static boolean mask -> static gather, shape (N, N-1)
        idx = np.nonzero(mask)[1].reshape(n, n - 1)
        r = jnp.take_along_axis(r, jnp.asarray(idx)[None, :, :, None], axis=2)
    return r


def distances_from_vectors(r: jax.Array, eps: float = 1e-6) -> jax.Array:
    """(B, N, M, D) difference vectors -> (B, N, M) regularized norms."""
    return jnp.sqrt(jnp.sum(r * r, axis=-1) + eps)


def compute_distances(
    x: jax.Array, n_particles: int, n_dimensions: int, remove_duplicates: bool = True
) -> jax.Array:
    """All pair distances of a configuration.

    Returns (B, N*(N-1)/2) upper-triangle distances (or the full (B, N, N)
    matrix when ``remove_duplicates=False``).
    """
    x = x.reshape(-1, n_particles, n_dimensions)
    diff = x[:, :, None, :] - x[:, None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    if not remove_duplicates:
        return jnp.sqrt(d2)
    iu, ju = np.triu_indices(n_particles, k=1)
    return jnp.sqrt(d2[:, iu, ju])


def kabsch_align(x: jax.Array, reference: jax.Array, atoms=None) -> jax.Array:
    """Rigidly superpose each frame onto a reference (Kabsch algorithm).

    x: (B, N, 3) frames; reference: (N, 3); ``atoms``: indices used for the
    fit (default all).  Returns the transformed frames (all atoms moved by
    the fitted rotation+translation).  Used to remove global pose from MD
    data before PCA whitening — unaligned data makes the whitened Gaussian
    mix pose with internal coordinates and Gaussian samples leave the
    rigid-body manifold.
    """
    x = jnp.asarray(x)
    reference = jnp.asarray(reference)
    fit_idx = jnp.arange(x.shape[1]) if atoms is None else jnp.asarray(atoms)
    x_fit = x[:, fit_idx]
    ref_fit = reference[fit_idx]
    x_mean = jnp.mean(x_fit, axis=1, keepdims=True)
    ref_mean = jnp.mean(ref_fit, axis=0, keepdims=True)
    p = x_fit - x_mean
    q = ref_fit - ref_mean
    h = jnp.einsum("bni,nj->bij", p, q)
    u, _, vt = jnp.linalg.svd(h)
    d = jnp.sign(jnp.linalg.det(jnp.einsum("bij,bjk->bik", u, vt)))
    s = jnp.stack([jnp.ones_like(d), jnp.ones_like(d), d], axis=-1)
    rot = jnp.einsum("bik,bk,bkj->bij", u, s, vt)  # per-frame rotation
    return jnp.einsum("bni,bij->bnj", x - x_mean, rot) + ref_mean


def remove_mean(samples: jax.Array, n_particles: int, n_dimensions: int) -> jax.Array:
    """Project particle positions onto the mean-free (translation-free) subspace."""
    shape = samples.shape
    x = samples.reshape(-1, n_particles, n_dimensions)
    x = x - jnp.mean(x, axis=1, keepdims=True)
    return x.reshape(shape)
