"""Parity against the external ala2 structural artifact.

``tests/data/alanine-dipeptide-nowater.pdb`` is the checked-in PDB the
reference's de-facto integration harness builds its amber99sbildn system
from (``/root/reference/tests/conftest.py:45-60``).  It is EXTERNAL data —
not derived from this repo's transcription — so these tests anchor the
in-repo topology to an independent source: atom count/order/names/residues
must match ``ALA2_ATOMS`` exactly, the bonded topology must reproduce the
PDB's implied connectivity (every bonded pair at a chemically sane
distance, every non-bonded pair well separated), and the force field must
evaluate a finite, modest energy at the PDB geometry.

(A full OpenMM-serialized System XML golden additionally needs OpenMM to
generate it; not installed in this container, and the container has no
network egress — the parameter tables are instead resolved against the
published parm99/ff99SB values, with per-term regression pins in
``test_forcefield.py``.)
"""
import os

import pytest

import numpy as np
import jax.numpy as jnp

from bgflow_tpu.energies.ala2 import (
    ALA2_ATOMS,
    ALA2_BONDS,
    build_ala2_forcefield,
)

PDB = os.path.join(os.path.dirname(__file__), "data", "alanine-dipeptide-nowater.pdb")


def parse_pdb(path):
    names, residues, xyz = [], [], []
    with open(path) as fh:
        for line in fh:
            if line.startswith(("ATOM", "HETATM")):
                names.append(line[12:16].strip())
                residues.append(line[17:20].strip())
                xyz.append([float(line[30:38]), float(line[38:46]), float(line[46:54])])
    return names, residues, np.asarray(xyz) / 10.0  # Angstrom -> nm


def test_atom_order_matches_external_pdb():
    names, residues, xyz = parse_pdb(PDB)
    assert len(names) == len(ALA2_ATOMS) == 22
    assert names == [a[0] for a in ALA2_ATOMS]
    assert residues == ["ACE"] * 6 + ["ALA"] * 10 + ["NME"] * 6
    assert xyz.shape == (22, 3)


def test_bond_topology_matches_pdb_geometry():
    """Every bonded pair sits at a covalent distance in the external
    geometry; every non-bonded pair is farther than any covalent bond —
    i.e. the transcribed connectivity is the one the PDB implies."""
    _, _, xyz = parse_pdb(PDB)
    d = np.linalg.norm(xyz[:, None, :] - xyz[None, :, :], axis=-1)
    bonded = {tuple(sorted(b)) for b in np.asarray(ALA2_BONDS).tolist()}
    for i, j in bonded:
        assert 0.09 < d[i, j] < 0.17, (i, j, d[i, j])
    n = len(xyz)
    for i in range(n):
        for j in range(i + 1, n):
            if (i, j) not in bonded:
                assert d[i, j] > 0.17, (i, j, d[i, j])


def test_forcefield_per_term_goldens_at_external_geometry():
    """Per-term energies at the external PDB geometry match the values
    independently computed from the published-parameter artifact
    (tests/test_ff_artifact_parity.py derives these from
    ``tests/data/parm99_ff99sb_ala2_extract.dat`` alone — not from the code
    under test).  kJ/mol, float64."""
    _, _, xyz = parse_pdb(PDB)
    ff = build_ala2_forcefield()
    x = jnp.asarray(xyz.reshape(1, -1, 3), jnp.float64)
    golden = {
        "bond": 15.998,
        "angle": 11.850,
        "torsion": 39.813,
        "nonbonded": -128.627,
    }
    assert float(ff.bond_energy(x)[0]) == pytest.approx(golden["bond"], abs=2e-3)
    assert float(ff.angle_energy(x)[0]) == pytest.approx(golden["angle"], abs=2e-3)
    assert float(ff.torsion_energy(x)[0]) == pytest.approx(golden["torsion"], abs=2e-3)
    assert float(ff.nonbonded_energy(x)[0]) == pytest.approx(
        golden["nonbonded"], abs=2e-3
    )
    # reduced total = sum of terms / kT
    u = float(ff.energy(jnp.asarray(xyz.reshape(1, -1), jnp.float64))[0])
    assert u == pytest.approx(sum(golden.values()) / ff.kt, rel=1e-4)
