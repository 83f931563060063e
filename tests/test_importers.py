"""Force-field importer tests: OpenMM System XML round trip, prmtop parsing
against a hand-computed fixture, and error paths."""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from bgflow_tpu.energies.ala2 import ALA2_REFERENCE_XYZ, build_ala2_forcefield
from bgflow_tpu.energies.forcefield import (
    BondedTerms,
    ClassicalForceField,
    NonbondedTerms,
)
from bgflow_tpu.energies.importers import (
    forcefield_from_openmm_system_xml,
    forcefield_from_prmtop,
    forcefield_to_openmm_system_xml,
)
from tests.conftest import assert_close


def _perturbed_ala2_configs(n=8, scale=0.01):
    rng = np.random.RandomState(0)
    x = ALA2_REFERENCE_XYZ.reshape(1, -1)
    return jnp.asarray(x + scale * rng.randn(n, 66))


def test_openmm_xml_roundtrip_exact():
    """serialize -> parse reproduces the ala2 energies to f64 precision,
    including the 1-4 fudge pairs (matrix scales -> explicit exceptions)."""
    ff = build_ala2_forcefield()
    xml = forcefield_to_openmm_system_xml(ff)
    ff2 = forcefield_from_openmm_system_xml(xml)
    xs = _perturbed_ala2_configs()
    assert_close(ff.potential_energy(xs), ff2.potential_energy(xs), 1e-9)
    # forces too (the kernels differ: dense-matrix 1-4 vs explicit pairs)
    assert_close(ff.force_kj(xs), ff2.force_kj(xs), 1e-6)


def test_openmm_xml_roundtrip_gbsa():
    ff = build_ala2_forcefield(implicit_solvent=True)
    ff2 = forcefield_from_openmm_system_xml(forcefield_to_openmm_system_xml(ff))
    xs = _perturbed_ala2_configs(4)
    assert_close(ff.potential_energy(xs), ff2.potential_energy(xs), 1e-9)


def test_openmm_xml_constraints_become_stiff_bonds():
    xml = """
<System type="System" version="1">
  <Particles><Particle mass="1"/><Particle mass="1"/></Particles>
  <Constraints><Constraint d="0.1" p1="0" p2="1"/></Constraints>
  <Forces></Forces>
</System>"""
    ff = forcefield_from_openmm_system_xml(xml, constraint_k=1000.0)
    x = jnp.array([[0.0, 0, 0, 0.15, 0, 0]])
    # E = k/2 (r - d)^2 = 500 * 0.05^2
    assert_close(ff.potential_energy(x), [0.5 * 1000 * 0.05**2], 1e-10)
    with pytest.raises(ValueError):
        forcefield_from_openmm_system_xml(xml, constraint_k=None)


def test_openmm_xml_unknown_force_raises():
    xml = """
<System type="System" version="1">
  <Particles><Particle mass="1"/></Particles>
  <Forces><Force type="CustomBondForce" version="1"/></Forces>
</System>"""
    with pytest.raises(ValueError, match="unsupported force"):
        forcefield_from_openmm_system_xml(xml)


# ---------------------------------------------------------------------------
# prmtop fixture: a 4-atom chain with one angle/dihedral and a 1-4 pair.
# Amber units: kcal/mol, Angstrom; charges in units of 18.2223.
# ---------------------------------------------------------------------------

def _fmt(vals, width, per_line, spec):
    lines = []
    for off in range(0, len(vals), per_line):
        lines.append("".join(spec % v for v in vals[off : off + per_line]))
    return "\n".join(lines) if lines else ""


def _tiny_prmtop():
    # 4 atoms: types [1, 2, 2, 1]; charges 0.1, -0.1, -0.1, 0.1 e
    charges = [0.1 * 18.2223, -0.1 * 18.2223, -0.1 * 18.2223, 0.1 * 18.2223]
    # LJ: type1 rmin/2=1.5 A eps=0.1; type2 rmin/2=2.0 A eps=0.2
    def ab(rm, eps):
        rmin6 = (2 * rm) ** 6
        return eps * rmin6 * rmin6, 2 * eps * rmin6

    a11, b11 = ab(1.5, 0.1)
    rm12, e12 = 1.75, math.sqrt(0.1 * 0.2)
    a12, b12 = ab(rm12, e12)
    a22, b22 = ab(2.0, 0.2)
    sections = f"""%VERSION  VERSION_STAMP = V0001.000  DATE = 01/01/26
%FLAG TITLE
%FORMAT(20a4)
tiny
%FLAG POINTERS
%FORMAT(10I8)
{_fmt([4, 2, 0, 3, 0, 2, 0, 1, 0, 0], 8, 10, "%8d")}
{_fmt([6, 1, 3, 2, 1, 1, 1, 1, 2, 0], 8, 10, "%8d")}
{_fmt([0] * 10, 8, 10, "%8d")}
{_fmt([0], 8, 10, "%8d")}
%FLAG CHARGE
%FORMAT(5E16.8)
{_fmt(charges, 16, 5, "%16.8E")}
%FLAG ATOM_TYPE_INDEX
%FORMAT(10I8)
{_fmt([1, 2, 2, 1], 8, 10, "%8d")}
%FLAG NONBONDED_PARM_INDEX
%FORMAT(10I8)
{_fmt([1, 2, 2, 3], 8, 10, "%8d")}
%FLAG LENNARD_JONES_ACOEF
%FORMAT(5E16.8)
{_fmt([a11, a12, a22], 16, 5, "%16.8E")}
%FLAG LENNARD_JONES_BCOEF
%FORMAT(5E16.8)
{_fmt([b11, b12, b22], 16, 5, "%16.8E")}
%FLAG BOND_FORCE_CONSTANT
%FORMAT(5E16.8)
{_fmt([300.0], 16, 5, "%16.8E")}
%FLAG BOND_EQUIL_VALUE
%FORMAT(5E16.8)
{_fmt([1.5], 16, 5, "%16.8E")}
%FLAG ANGLE_FORCE_CONSTANT
%FORMAT(5E16.8)
{_fmt([60.0], 16, 5, "%16.8E")}
%FLAG ANGLE_EQUIL_VALUE
%FORMAT(5E16.8)
{_fmt([1.9], 16, 5, "%16.8E")}
%FLAG DIHEDRAL_FORCE_CONSTANT
%FORMAT(5E16.8)
{_fmt([1.4], 16, 5, "%16.8E")}
%FLAG DIHEDRAL_PERIODICITY
%FORMAT(5E16.8)
{_fmt([3.0], 16, 5, "%16.8E")}
%FLAG DIHEDRAL_PHASE
%FORMAT(5E16.8)
{_fmt([0.0], 16, 5, "%16.8E")}
%FLAG SCEE_SCALE_FACTOR
%FORMAT(5E16.8)
{_fmt([1.2], 16, 5, "%16.8E")}
%FLAG SCNB_SCALE_FACTOR
%FORMAT(5E16.8)
{_fmt([2.0], 16, 5, "%16.8E")}
%FLAG BONDS_INC_HYDROGEN
%FORMAT(10I8)
{_fmt([], 8, 10, "%8d")}
%FLAG BONDS_WITHOUT_HYDROGEN
%FORMAT(10I8)
{_fmt([0, 3, 1, 3, 6, 1, 6, 9, 1], 8, 10, "%8d")}
%FLAG ANGLES_INC_HYDROGEN
%FORMAT(10I8)
{_fmt([], 8, 10, "%8d")}
%FLAG ANGLES_WITHOUT_HYDROGEN
%FORMAT(10I8)
{_fmt([0, 3, 6, 1, 3, 6, 9, 1], 8, 10, "%8d")}
%FLAG DIHEDRALS_INC_HYDROGEN
%FORMAT(10I8)
{_fmt([], 8, 10, "%8d")}
%FLAG DIHEDRALS_WITHOUT_HYDROGEN
%FORMAT(10I8)
{_fmt([0, 3, 6, 9, 1], 8, 10, "%8d")}
%FLAG NUMBER_EXCLUDED_ATOMS
%FORMAT(10I8)
{_fmt([3, 2, 1, 1], 8, 10, "%8d")}
%FLAG EXCLUDED_ATOMS_LIST
%FORMAT(10I8)
{_fmt([2, 3, 4, 3, 4, 4, 0], 8, 10, "%8d")}
"""
    return sections


def test_prmtop_against_hand_built_tables():
    ff = forcefield_from_prmtop(_tiny_prmtop())
    assert ff.n_atoms == 4

    kcal = 4.184
    rm1, rm2 = 0.15, 0.20  # nm
    sig1 = 2 * rm1 * 2 ** (-1 / 6)
    sig2 = 2 * rm2 * 2 ** (-1 / 6)
    scale = np.ones((4, 4)) - np.eye(4)
    # all pairs excluded except 1-4 (0,3), which is an explicit pair term
    scale[0, 1] = scale[1, 0] = 0.0
    scale[0, 2] = scale[2, 0] = 0.0
    scale[1, 2] = scale[2, 1] = 0.0
    scale[1, 3] = scale[3, 1] = 0.0
    scale[2, 3] = scale[3, 2] = 0.0
    scale[0, 3] = scale[3, 0] = 0.0
    # the 1-4 pair (0, 3) is type1-type1: rmin = 2 * 1.5 A
    sig14 = 2 * rm1 * 2 ** (-1 / 6)
    eps14 = 0.1 * kcal
    expected = ClassicalForceField(
        4,
        BondedTerms(
            bond_idx=np.array([[0, 1], [1, 2], [2, 3]]),
            bond_r0=np.array([0.15] * 3),
            bond_k=np.array([2 * 300.0 * kcal * 100] * 3),
            angle_idx=np.array([[0, 1, 2], [1, 2, 3]]),
            angle_theta0=np.array([1.9, 1.9]),
            angle_k=np.array([2 * 60.0 * kcal] * 2),
            torsion_idx=np.array([[0, 1, 2, 3]]),
            torsion_n=np.array([3.0]),
            torsion_phase=np.array([0.0]),
            torsion_k=np.array([1.4 * kcal]),
        ),
        NonbondedTerms(
            charges=np.array([0.1, -0.1, -0.1, 0.1]),
            sigma=np.array([sig1, sig2, sig2, sig1]),
            epsilon=np.array([0.1 * kcal, 0.2 * kcal, 0.2 * kcal, 0.1 * kcal]),
            scale_lj=scale,
            scale_coulomb=scale,
            pair_idx=np.array([[0, 3]]),
            pair_qq=np.array([0.1 * 0.1 / 1.2]),
            pair_sigma=np.array([sig14]),
            pair_epsilon=np.array([eps14 / 2.0]),
        ),
    )
    rng = np.random.RandomState(1)
    xs = jnp.asarray(
        np.array([[0.0, 0, 0, 0.15, 0, 0, 0.25, 0.12, 0, 0.30, 0.15, 0.14]])
        + 0.01 * rng.randn(6, 12)
    )
    assert_close(ff.potential_energy(xs), expected.potential_energy(xs), 1e-9)
    assert_close(ff.force_kj(xs), expected.force_kj(xs), 1e-7)


def test_prmtop_improper_and_multiterm_skip_14():
    """negative 3rd index (multi-term) and negative 4th (improper) must not
    create 1-4 pairs; the improper still contributes torsion energy."""
    text = _tiny_prmtop().replace(
        """%FLAG DIHEDRALS_WITHOUT_HYDROGEN
%FORMAT(10I8)
       0       3       6       9       1""",
        """%FLAG DIHEDRALS_WITHOUT_HYDROGEN
%FORMAT(10I8)
       0       3       6       9       1       0       3      -6       9       1
       3       0      -6      -9       1""",
    )
    ff = forcefield_from_prmtop(text)
    assert ff.nonbonded.pair_idx.shape[0] == 1  # only one 1-4 pair
    assert ff.bonded.torsion_idx.shape[0] == 3  # all three terms kept
