"""Force-field kernel tests: analytic term values, force consistency,
exclusion topology, and the ala2 flagship system."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bgflow_tpu.energies.forcefield import (
    BondedTerms,
    ClassicalForceField,
    NonbondedTerms,
    enumerate_angles,
    enumerate_torsions,
    exclusion_scales,
    COULOMB_CONSTANT,
)
from bgflow_tpu.energies.ala2 import (
    ALA2_BONDS,
    ALA2_REFERENCE_XYZ,
    build_ala2_forcefield,
)
from tests.conftest import assert_close


def _empty_bonded(**kwargs):
    empty = dict(
        bond_idx=np.zeros((0, 2), dtype=np.int64),
        bond_r0=np.zeros(0),
        bond_k=np.zeros(0),
        angle_idx=np.zeros((0, 3), dtype=np.int64),
        angle_theta0=np.zeros(0),
        angle_k=np.zeros(0),
        torsion_idx=np.zeros((0, 4), dtype=np.int64),
        torsion_n=np.zeros(0),
        torsion_phase=np.zeros(0),
        torsion_k=np.zeros(0),
    )
    empty.update(kwargs)
    return BondedTerms(**empty)


def test_single_bond_analytic():
    # one bond k=1000 kJ/mol/nm^2, r0=0.15; atoms at distance 0.2
    bonded = _empty_bonded(
        bond_idx=np.array([[0, 1]]), bond_r0=np.array([0.15]), bond_k=np.array([1000.0])
    )
    ff = ClassicalForceField(2, bonded)
    x = jnp.array([[0.0, 0, 0, 0.2, 0, 0]])
    u = ff.potential_energy(x)
    assert_close(u, [0.5 * 1000 * 0.05**2], 1e-8)  # = 1.25 kJ/mol
    # energy() is in kT
    assert_close(ff.energy(x), u / ff.kt, 1e-8)
    # temperature halves the reduced energy at 2T
    assert_close(ff.energy(x, temperature=2.0), u / ff.kt / 2.0, 1e-8)


def test_single_angle_analytic():
    bonded = _empty_bonded(
        angle_idx=np.array([[0, 1, 2]]),
        angle_theta0=np.array([jnp.pi / 2]),
        angle_k=np.array([100.0]),
    )
    ff = ClassicalForceField(3, bonded)
    # 90 degree angle -> zero energy
    x = jnp.array([[0.1, 0, 0, 0, 0, 0, 0, 0.1, 0]])
    assert_close(ff.potential_energy(x), [0.0], 1e-10)
    # 120 degrees -> k/2 (2pi/3 - pi/2)^2
    c, s = float(jnp.cos(jnp.pi / 3)), float(jnp.sin(jnp.pi / 3))
    x = jnp.array([[-0.1, 0, 0, 0, 0, 0, 0.1 * c, 0.1 * s, 0]])
    assert_close(ff.potential_energy(x), [0.5 * 100 * (2 * jnp.pi / 3 - jnp.pi / 2) ** 2], 1e-5)


def test_single_torsion_analytic():
    bonded = _empty_bonded(
        torsion_idx=np.array([[0, 1, 2, 3]]),
        torsion_n=np.array([2.0]),
        torsion_phase=np.array([jnp.pi]),
        torsion_k=np.array([5.0]),
    )
    ff = ClassicalForceField(4, bonded)
    # planar cis: theta=0 -> E = k(1+cos(-pi)) = 0
    x = jnp.array([[0.1, 0.1, 0, 0, 0, 0, 0.1, 0, 0, 0.2, 0.1, 0]])
    u = ff.potential_energy(x)
    assert_close(u, [0.0], 1e-6)
    # perpendicular: theta=pi/2 -> E = k(1+cos(2*pi/2 - pi)) = 2k
    x = jnp.array([[0.1, 0.1, 0, 0, 0, 0, 0.1, 0, 0, 0.2, 0, 0.1]])
    assert_close(ff.potential_energy(x), [2 * 5.0], 1e-5)


def test_lj_coulomb_pair():
    nb = NonbondedTerms(
        charges=np.array([0.5, -0.5]),
        sigma=np.array([0.3, 0.3]),
        epsilon=np.array([1.0, 1.0]),
        scale_lj=1.0 - np.eye(2),
        scale_coulomb=1.0 - np.eye(2),
    )
    ff = ClassicalForceField(2, _empty_bonded(), nb)
    r = 0.4
    x = jnp.array([[0.0, 0, 0, r, 0, 0]])
    s6 = (0.3 / r) ** 6
    expected = 4 * 1.0 * (s6**2 - s6) + COULOMB_CONSTANT * 0.5 * (-0.5) / r
    assert_close(ff.potential_energy(x), [expected], 1e-4)


def test_exclusion_scales_chain():
    # linear chain 0-1-2-3-4
    bonds = np.array([[0, 1], [1, 2], [2, 3], [3, 4]])
    slj, scoul = exclusion_scales(5, bonds)
    assert slj[0, 1] == 0.0 and slj[0, 2] == 0.0  # 1-2, 1-3 excluded
    assert slj[0, 3] == 0.5  # 1-4 scaled
    assert abs(scoul[0, 3] - 1 / 1.2) < 1e-12
    assert slj[0, 4] == 1.0  # 1-5 full
    assert np.all(np.diag(slj) == 0)


def test_enumerate_topology():
    bonds = np.array([[0, 1], [1, 2], [2, 3]])
    angles = enumerate_angles(bonds)
    assert {tuple(a) for a in angles} == {(0, 1, 2), (1, 2, 3)}
    torsions = enumerate_torsions(bonds)
    assert {tuple(t) for t in torsions} == {(0, 1, 2, 3)}


def test_ala2_reference_energy_reasonable():
    ff = build_ala2_forcefield()
    x = jnp.asarray(ALA2_REFERENCE_XYZ).reshape(1, -1)
    u = ff.potential_energy(x)
    assert jnp.isfinite(u[0])
    # the PDB geometry is near-equilibrium: tens of kT, not thousands
    assert float(ff.energy(x)[0]) < 200.0


def test_ala2_per_term_regression_goldens():
    """Pin the per-term energy breakdown at the reference geometry.

    These are regression goldens for the amber parm99+ff99SB transcription
    (computed in f64 from the checked-in tables).  Any parameter-table edit
    shows up as a per-term diff here, and an external OpenMM validation can
    be compared term-by-term against exactly these numbers.
    """
    ff = build_ala2_forcefield()
    x = jnp.asarray(ALA2_REFERENCE_XYZ, dtype=jnp.float64).reshape(1, 22, 3)
    golden = {
        # amide CT-N-H angle k resolved to the published parm99 value
        # (38.0 kcal/mol/rad^2; see energies/ala2.py::_ANGLE_PARAMS)
        "bond_energy": 15.997559183799,
        "angle_energy": 11.850071679356,
        "torsion_energy": 39.813201379856,
        "nonbonded_energy": -128.627242264994,
    }
    for name, value in golden.items():
        assert_close(getattr(ff, name)(x)[0], value, 1e-6, msg=name)
    assert ff.bonded.torsion_idx.shape[0] == 40  # 36 propers + 4 impropers


def test_ala2_forces_minimize_energy():
    """Gradient descent on the force field must monotonically reduce U."""
    ff = build_ala2_forcefield()
    x = jnp.asarray(ALA2_REFERENCE_XYZ).reshape(1, -1)

    @jax.jit
    def gd_step(x):
        return x + 1e-6 * ff.force_kj(x)

    u0 = float(ff.potential_energy(x)[0])
    for _ in range(200):
        x = gd_step(x)
    u1 = float(ff.potential_energy(x)[0])
    assert u1 < u0


def test_ala2_force_matches_finite_difference():
    ff = build_ala2_forcefield()
    x = jnp.asarray(ALA2_REFERENCE_XYZ, dtype=jnp.float64).reshape(1, -1)
    f = ff.force_kj(x)
    eps = 1e-6
    for idx in [0, 13, 40, 65]:
        xp = x.at[0, idx].add(eps)
        xm = x.at[0, idx].add(-eps)
        fd = -(ff.potential_energy(xp)[0] - ff.potential_energy(xm)[0]) / (2 * eps)
        assert_close(f[0, idx], fd, 1e-4)


def test_ala2_batched_vectorization():
    ff = build_ala2_forcefield()
    key = jax.random.PRNGKey(0)
    x0 = jnp.asarray(ALA2_REFERENCE_XYZ).reshape(1, -1)
    xs = x0 + 0.01 * jax.random.normal(key, (16, 66))
    u = ff.energy(xs)
    assert u.shape == (16,)
    # batch result matches per-sample evaluation
    u_single = jnp.stack([ff.energy(xs[i : i + 1])[0] for i in range(4)])
    assert_close(u[:4], u_single, 1e-6)


def test_ala2_charge_neutrality():
    from bgflow_tpu.energies.ala2 import ALA2_ATOMS
    total = sum(q for _, _, q in ALA2_ATOMS)
    assert abs(total) < 1e-10
