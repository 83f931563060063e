"""Geometry ops: distances, mean removal, Kabsch alignment."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bgflow_tpu.ops.geometry import (
    compute_distances,
    distance_vectors,
    distances_from_vectors,
    kabsch_align,
    remove_mean,
)
from tests.conftest import assert_close


def test_distance_vectors_and_norms(key):
    x = jax.random.normal(key, (3, 5, 3))
    r = distance_vectors(x, remove_diagonal=False)
    assert r.shape == (3, 5, 5, 3)
    assert_close(r[:, 0, 1], x[:, 0] - x[:, 1], 1e-6)
    r2 = distance_vectors(x, remove_diagonal=True)
    assert r2.shape == (3, 5, 4, 3)
    d = distances_from_vectors(r2)
    assert jnp.all(d > 0)


def test_compute_distances_matches_manual(key):
    x = jax.random.normal(key, (4, 3, 2))
    d = compute_distances(x, 3, 2)
    assert d.shape == (4, 3)
    manual = jnp.linalg.norm(x[:, 0] - x[:, 1], axis=-1)
    assert_close(d[:, 0], manual, 1e-5)


def test_remove_mean(key):
    x = jax.random.normal(key, (6, 12))
    y = remove_mean(x, 4, 3)
    assert_close(y.reshape(6, 4, 3).mean(axis=1), jnp.zeros((6, 3)), 1e-6)


def test_kabsch_align_recovers_rigid_transform(key):
    ref = jax.random.normal(key, (7, 3), dtype=jnp.float64)
    # random rotations + translations of the reference
    theta = 1.1
    rot = jnp.asarray([
        [jnp.cos(theta), -jnp.sin(theta), 0.0],
        [jnp.sin(theta), jnp.cos(theta), 0.0],
        [0.0, 0.0, 1.0],
    ], dtype=jnp.float64)
    shift = jnp.asarray([3.0, -2.0, 0.7], dtype=jnp.float64)
    frames = jnp.stack([ref @ rot.T + shift, ref @ rot + 2 * shift])
    aligned = kabsch_align(frames, ref)
    assert_close(aligned[0], ref, 1e-8)
    assert_close(aligned[1], ref, 1e-8)


def test_kabsch_align_subset_fit(key):
    ref = jax.random.normal(key, (6, 3), dtype=jnp.float64)
    noise = 0.01 * jax.random.normal(jax.random.PRNGKey(1), (2, 6, 3), dtype=jnp.float64)
    shift = jnp.asarray([5.0, 0.0, 0.0], dtype=jnp.float64)
    frames = ref[None] + noise + shift
    fit = np.array([0, 2, 4])
    aligned = kabsch_align(frames, ref, atoms=fit)
    # fit atoms land near the reference; all atoms moved rigidly
    assert float(jnp.abs(aligned[:, fit] - ref[fit]).max()) < 0.05
    # rigid transform preserves internal distances
    d_before = jnp.linalg.norm(frames[:, 0] - frames[:, 5], axis=-1)
    d_after = jnp.linalg.norm(aligned[:, 0] - aligned[:, 5], axis=-1)
    assert_close(d_before, d_after, 1e-8)


def test_kabsch_handles_reflection(key):
    """Proper rotation enforced (det +1) even for near-planar point sets."""
    ref = jnp.concatenate([
        jax.random.normal(key, (5, 2), dtype=jnp.float64),
        jnp.zeros((5, 1), dtype=jnp.float64),
    ], axis=1)
    mirrored = ref * jnp.asarray([1.0, 1.0, -1.0])
    aligned = kabsch_align(mirrored[None], ref)
    # a reflection cannot be fully undone by a proper rotation, but the
    # result must still be a rigid (distance-preserving) transform
    d0 = jnp.linalg.norm(mirrored[0] - mirrored[3])
    d1 = jnp.linalg.norm(aligned[0, 0] - aligned[0, 3])
    assert_close(d0, d1, 1e-8)
