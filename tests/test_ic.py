"""Internal-coordinate transform tests.

Mirrors the reference suite ``tests/nn/flow/crd_transform/test_ic.py``:
round trips at per-dtype tolerances, dlogp antisymmetry, dlogp vs brute-force
autodiff determinant, and the canonical 17-row alanine-dipeptide z-matrix
(``tests/conftest.py:45-110`` in the reference).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bgflow_tpu.flows.ic import (
    GlobalInternalCoordinateTransformation,
    MixedCoordinateTransformation,
    ReferenceSystemTransformation,
    RelativeInternalCoordinateTransformation,
    WhitenFlow,
    decompose_z_matrix,
)
from bgflow_tpu.ops import ic as icops
from tests.conftest import assert_close

# the canonical ala2 z-matrix (17 conditioned atoms, rigid block [6,8,9,10,14])
ALA2_Z_MATRIX = np.array([
    [0, 1, 4, 6],
    [1, 4, 6, 8],
    [2, 1, 4, 0],
    [3, 1, 4, 0],
    [4, 6, 8, 14],
    [5, 4, 6, 8],
    [7, 6, 8, 4],
    [11, 10, 8, 6],
    [12, 10, 8, 11],
    [13, 10, 8, 11],
    [15, 14, 8, 16],
    [16, 14, 8, 6],
    [17, 16, 14, 15],
    [18, 16, 14, 8],
    [19, 18, 16, 14],
    [20, 18, 16, 19],
    [21, 18, 16, 19],
])
ALA2_FIXED = np.array([6, 8, 9, 10, 14])

def _random_ala2_xyz(key, n_batch, dtype):
    """Plausible (non-clashing) random coordinates for 22 atoms."""
    # random but spread out: base positions on a grid + jitter
    base = jnp.arange(22, dtype=dtype)[:, None] * jnp.asarray([[0.15, 0.1, 0.12]], dtype=dtype)
    jitter = 0.05 * jax.random.normal(key, (n_batch, 22, 3), dtype=dtype)
    return (base[None] + jitter).reshape(n_batch, 66)


def test_decompose_z_matrix():
    blocks, index2atom, atom2index, index2order = decompose_z_matrix(ALA2_Z_MATRIX, ALA2_FIXED)
    placed = set(ALA2_FIXED.tolist())
    for block in blocks:
        for row in block:
            # all context atoms already placed
            assert set(row[1:].tolist()) <= placed
        placed |= set(block[:, 0].tolist())
    assert placed == set(range(22))
    # atom2index inverts index2atom
    assert np.array_equal(index2atom[atom2index], np.arange(22))


def test_ic_primitives_roundtrip(key, dtype, tol):
    """place -> measure recovers (bond, angle, torsion)."""
    k1, k2 = jax.random.split(key)
    p1 = jax.random.normal(k1, (32, 3), dtype=dtype)
    p2 = p1 + jax.random.normal(k2, (32, 3), dtype=dtype)
    p3 = p2 + jax.random.normal(jax.random.PRNGKey(7), (32, 3), dtype=dtype)
    b = jax.random.uniform(k1, (32,), dtype=dtype, minval=0.5, maxval=2.0)
    a = jax.random.uniform(k2, (32,), dtype=dtype, minval=0.2, maxval=3.0)
    t = jax.random.uniform(jax.random.PRNGKey(3), (32,), dtype=dtype, minval=-3.0, maxval=3.0)
    x = icops.ic_to_xyz(p1, p2, p3, b, a, t)
    b2 = icops.dist(x, p1)
    a2 = icops.angle(x, p1, p2)
    t2 = icops.torsion(x, p1, p2, p3)
    tt = 1e-3 if dtype == jnp.float32 else 1e-9
    assert_close(b, b2, tt)
    assert_close(a, a2, tt)
    assert_close(jnp.sin(t), jnp.sin(t2), tt)
    assert_close(jnp.cos(t), jnp.cos(t2), tt)


def test_relative_ic_roundtrip(key, dtype):
    flow = RelativeInternalCoordinateTransformation(ALA2_Z_MATRIX, ALA2_FIXED)
    x = _random_ala2_xyz(key, 8, dtype)
    (bonds, angles, torsions, fixed), dlogp = flow.forward((), (x,))
    assert bonds.shape == (8, 17)
    assert angles.shape == (8, 17)
    assert torsions.shape == (8, 17)
    assert fixed.shape == (8, 15)
    assert jnp.all((angles >= 0) & (angles <= 1))
    assert jnp.all((torsions >= 0) & (torsions <= 1))
    (x2,), dlogp_inv = flow.forward((), (bonds, angles, torsions, fixed), inverse=True)
    tol = 5e-3 if dtype == jnp.float32 else 1e-7
    assert_close(x, x2, tol)
    assert_close(dlogp, -dlogp_inv, 5e-2 if dtype == jnp.float32 else 1e-7)


def test_relative_ic_dlogp_vs_autodiff(key):
    """Analytic dlogp vs slogdet of the full 51x51 Jacobian (f64)."""
    dtype = jnp.float64
    flow = RelativeInternalCoordinateTransformation(ALA2_Z_MATRIX, ALA2_FIXED)
    x = _random_ala2_xyz(key, 2, dtype)

    def fwd_flat(xv):
        (b, a, t, f), _ = flow.forward((), (xv[None],))
        return jnp.concatenate([b[0], a[0], t[0], f[0]])

    for i in range(2):
        jac = jax.jacfwd(fwd_flat)(x[i])
        expected = jnp.linalg.slogdet(jac)[1]
        (_, _, _, _), dlogp = flow.forward((), (x[i : i + 1],))
        assert_close(dlogp[0], expected, 1e-6)


def test_reference_system_roundtrip(key, dtype):
    flow = ReferenceSystemTransformation()
    x0 = jax.random.normal(key, (6, 1, 3), dtype=dtype)
    x1 = x0 + jax.random.normal(jax.random.PRNGKey(1), (6, 1, 3), dtype=dtype)
    x2 = x1 + jax.random.normal(jax.random.PRNGKey(2), (6, 1, 3), dtype=dtype)
    (o, R, d01, d12, a012), dlogp = flow.forward((), (x0, x1, x2))
    (y0, y1, y2), dlogp_inv = flow.forward((), (o, R, d01, d12, a012), inverse=True)
    tol = 1e-3 if dtype == jnp.float32 else 1e-8
    assert_close(x0, y0, tol)
    assert_close(x1, y1, tol)
    assert_close(x2, y2, tol)
    assert_close(dlogp, -dlogp_inv, 1e-2 if dtype == jnp.float32 else 1e-7)


@pytest.mark.slow
def test_global_ic_roundtrip(key, dtype):
    zm = np.vstack([
        ALA2_Z_MATRIX,
        [[9, 8, 6, 14], [10, 8, 9, 6], [6, -1, -1, -1], [8, 6, -1, -1], [14, 8, 6, -1]],
    ])
    flow = GlobalInternalCoordinateTransformation(zm)
    x = _random_ala2_xyz(key, 4, dtype)
    (bonds, angles, torsions, x0, rot), dlogp = flow.forward((), (x,))
    assert bonds.shape == (4, 21)
    assert angles.shape == (4, 20)
    assert torsions.shape == (4, 19)
    assert x0.shape == (4, 1, 3)
    assert rot.shape == (4, 3)
    (x2,), dlogp_inv = flow.forward((), (bonds, angles, torsions, x0, rot), inverse=True)
    tol = 5e-3 if dtype == jnp.float32 else 1e-7
    assert_close(x, x2, tol)
    assert_close(dlogp, -dlogp_inv, 5e-2 if dtype == jnp.float32 else 1e-6)


def test_whiten_flow(key, dtype):
    data = np.random.RandomState(0).randn(500, 6) @ np.diag([3.0, 2.0, 1.0, 0.5, 0.2, 0.1])
    flow = WhitenFlow(data, whiten_inverse=False)
    x = jnp.asarray(data[:50], dtype=dtype)
    (z,), dlogp = flow.forward((), (x,))
    # whitened data has ~unit variance
    assert np.allclose(np.std(np.asarray(z), axis=0), 1.0, atol=0.2)
    (x2,), dlogp_inv = flow.forward((), (z,), inverse=True)
    assert_close(x, x2, 1e-3 if dtype == jnp.float32 else 1e-8)
    assert_close(dlogp, -dlogp_inv, 1e-4)


def test_mixed_ic_roundtrip(key, dtype):
    data = np.asarray(_random_ala2_xyz(jax.random.PRNGKey(42), 200, jnp.float64))
    flow = MixedCoordinateTransformation(data, ALA2_Z_MATRIX, ALA2_FIXED, keepdims=15)
    x = _random_ala2_xyz(key, 4, dtype)
    (bonds, angles, torsions, z_fixed), dlogp = flow.forward((), (x,))
    assert z_fixed.shape == (4, 15)
    (x2,), dlogp_inv = flow.forward((), (bonds, angles, torsions, z_fixed), inverse=True)
    tol = 5e-3 if dtype == jnp.float32 else 1e-6
    assert_close(x, x2, tol)
    assert_close(dlogp, -dlogp_inv, 5e-2 if dtype == jnp.float32 else 1e-6)
