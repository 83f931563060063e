"""Exactness of the in-code amber tables against the checked-in published
parameter artifact, and per-term energy goldens at the external PDB geometry.

``tests/data/parm99_ff99sb_ala2_extract.dat`` is a second, independent
transcription of the published parm99.dat / frcmod.ff99SB / ff94-library
blocks (line-faithful AMBER format).  These tests

  1. assert the code tables in ``bgflow_tpu/energies/ala2.py`` match the
     artifact ENTRY BY ENTRY (both directions — no extra, no missing);
  2. recompute every force-field term at the external PDB geometry
     (``tests/data/alanine-dipeptide-nowater.pdb``) from the ARTIFACT with
     an independent numpy evaluation (own angle/torsion math, own
     exclusion logic, own unit conversions) and require the
     ``ClassicalForceField`` per-term energies to agree to float64
     precision.

This is the in-container substitute for the reference's external-oracle
harness (``/root/reference/tests/conftest.py:45-60`` builds the OpenMM
amber99sbildn system from the same PDB): OpenMM cannot be installed here,
so the oracle is an independent evaluation of the published parameters.
"""
import math
import os

import numpy as np
import jax.numpy as jnp
import pytest

from bgflow_tpu.energies import ala2 as A

DATA = os.path.join(os.path.dirname(__file__), "data")
ARTIFACT = os.path.join(DATA, "parm99_ff99sb_ala2_extract.dat")
PDB = os.path.join(DATA, "alanine-dipeptide-nowater.pdb")

KCAL = 4.184
COULOMB_KCAL = 332.0637133  # kcal mol^-1 A e^-2 (published amber constant)


# ---------- artifact parsing (AMBER-native units kept) ----------

def _types(field):
    return tuple(t.strip() for t in field.split("-"))


def parse_artifact():
    sections = {}
    current = None
    with open(ARTIFACT) as fh:
        for raw in fh:
            line = raw.rstrip("\n")
            if not line.strip() or line.lstrip().startswith("#"):
                continue
            if line.strip() in ("BOND", "ANGLE", "DIHE", "IMPROPER", "NONBON", "CHARGE"):
                current = line.strip()
                sections[current] = []
                continue
            sections[current].append(line)
    art = {"bond": {}, "angle": {}, "dihe": {}, "improper": {}, "nonbon": {}, "charge": []}
    for line in sections["BOND"]:
        k, r0 = map(float, line[6:].split())
        art["bond"][_types(line[:5])] = (k, r0)
    for line in sections["ANGLE"]:
        k, t0 = map(float, line[9:].split())
        art["angle"][_types(line[:8])] = (k, t0)
    for line in sections["DIHE"]:
        idivf, pk, phase, pn = map(float, line[12:].split())
        art["dihe"].setdefault(_types(line[:11]), []).append(
            (idivf, pk, phase, abs(pn))
        )
    for line in sections["IMPROPER"]:
        pk, phase, pn = map(float, line[12:].split())
        art["improper"][_types(line[:11])] = (pk, phase, pn)
    for line in sections["NONBON"]:
        t, rmin2, eps = line.split()
        art["nonbon"][t] = (float(rmin2), float(eps))
    for line in sections["CHARGE"]:
        res, name, t, q = line.split()
        art["charge"].append((res, name, t, float(q)))
    return art


@pytest.fixture(scope="module")
def art():
    return parse_artifact()


def parse_pdb():
    xyz = []
    with open(PDB) as fh:
        for line in fh:
            if line.startswith(("ATOM", "HETATM")):
                xyz.append([float(line[30:38]), float(line[38:46]), float(line[46:54])])
    return np.asarray(xyz, np.float64)  # Angstrom


# ---------- 1. entry-by-entry table parity ----------

def test_bond_table_matches_artifact(art):
    code = {frozenset(k) if k[0] != k[1] else k: v for k, v in A._BOND_PARAMS.items()}
    arti = {frozenset(k) if k[0] != k[1] else k: v for k, v in art["bond"].items()}
    assert code.keys() == arti.keys()
    for k in arti:
        assert code[k] == pytest.approx(arti[k], abs=0), k


def test_angle_table_matches_artifact(art):
    def canon(k):
        return min(k, k[::-1])

    code = {canon(k): v for k, v in A._ANGLE_PARAMS.items()}
    arti = {canon(k): v for k, v in art["angle"].items()}
    assert code.keys() == arti.keys()
    for k in arti:
        assert code[k] == pytest.approx(arti[k], abs=0), k


def test_torsion_table_matches_artifact(art):
    def canon(k):
        return min(k, k[::-1])

    # artifact rows -> per-path (periodicity, phase, k/idivf), zero-k dropped
    arti = {}
    for key, rows in art["dihe"].items():
        terms = []
        idivf = rows[0][0]
        for _, pk, phase, pn in rows:
            if pk != 0.0:
                terms.append((int(pn), phase, pk / idivf))
        arti[canon(key)] = sorted(terms)
    code = {}
    for key, rows in A._TORSION_PARAMS.items():
        terms = sorted((int(n), ph, k) for n, ph, k in rows if k != 0.0)
        code[canon(key)] = terms
    assert code.keys() == arti.keys()
    for k in arti:
        assert len(code[k]) == len(arti[k]), k
        for (n1, p1, k1), (n2, p2, k2) in zip(code[k], arti[k]):
            assert n1 == n2 and p1 == p2, k
            assert k1 == pytest.approx(k2, rel=1e-12), k


def test_improper_table_matches_artifact(art):
    assert set(A._IMPROPER_PARAMS) == set(art["improper"])
    for k, (per, phase, kk) in A._IMPROPER_PARAMS.items():
        pk, ph, pn = art["improper"][k]
        assert (per, phase, kk) == (int(pn), ph, pk), k


def test_lj_table_matches_artifact(art):
    assert set(A._LJ_PARAMS) == set(art["nonbon"])
    for t, v in art["nonbon"].items():
        assert A._LJ_PARAMS[t] == pytest.approx(v, abs=0), t


def test_charges_match_artifact(art):
    assert len(art["charge"]) == len(A.ALA2_ATOMS)
    residues = ["ACE"] * 6 + ["ALA"] * 10 + ["NME"] * 6
    for (res, name, t, q), (cname, ct, cq), cres in zip(
        art["charge"], A.ALA2_ATOMS, residues
    ):
        assert (res, name, t) == (cres, cname, ct)
        assert q == cq, name


# ---------- 2. independent per-term evaluation at the PDB geometry ----------

def _angle(p, i, j, k):
    a, b = p[i] - p[j], p[k] - p[j]
    cos = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
    return math.acos(max(-1.0, min(1.0, cos)))


def _dihedral(p, i, j, k, l):
    b1, b2, b3 = p[j] - p[i], p[k] - p[j], p[l] - p[k]
    n1, n2 = np.cross(b1, b2), np.cross(b2, b3)
    m1 = np.cross(n1, b2 / np.linalg.norm(b2))
    return math.atan2(np.dot(m1, n2), np.dot(n1, n2))


def _graph(bonds, n):
    adj = [set() for _ in range(n)]
    for i, j in bonds:
        adj[int(i)].add(int(j))
        adj[int(j)].add(int(i))
    return adj


@pytest.fixture(scope="module")
def independent_terms(art):
    """Per-term energies (kJ/mol) computed from the artifact alone."""
    xyz = parse_pdb()  # Angstrom — artifact units are Angstrom/kcal
    n = len(xyz)
    names = [a for a, _, _ in A.ALA2_ATOMS]
    types = [t for _, t, _ in A.ALA2_ATOMS]
    charges = [q for _, _, _, q in art["charge"]]
    bonds = [tuple(b) for b in np.asarray(A.ALA2_BONDS)]
    adj = _graph(bonds, n)

    def bond_lookup(ti, tj):
        return art["bond"].get((ti, tj)) or art["bond"][(tj, ti)]

    e_bond = 0.0
    for i, j in bonds:
        k, r0 = bond_lookup(types[i], types[j])
        e_bond += k * (np.linalg.norm(xyz[i] - xyz[j]) - r0) ** 2

    # angles: unique j-centered i<k triples from the bond graph
    e_angle = 0.0
    n_angles = 0
    for j in range(n):
        nb = sorted(adj[j])
        for ai in range(len(nb)):
            for ak in range(ai + 1, len(nb)):
                i, k_ = nb[ai], nb[ak]
                key = (types[i], types[j], types[k_])
                par = art["angle"].get(key) or art["angle"].get(key[::-1])
                assert par is not None, key
                kf, t0 = par
                e_angle += kf * (_angle(xyz, i, j, k_) - math.radians(t0)) ** 2
                n_angles += 1

    # proper torsions: every i-j-k-l bond path, specific beats wildcard
    def torsion_lookup(t):
        for key in (t, t[::-1]):
            if key in art["dihe"]:
                return art["dihe"][key]
        for key in (("X", t[1], t[2], "X"), ("X", t[2], t[1], "X")):
            if key in art["dihe"]:
                return art["dihe"][key]
        raise KeyError(t)

    e_tor = 0.0
    seen = set()
    for j, k_ in [(j, k_) for j in range(n) for k_ in adj[j] if j < k_]:
        for i in adj[j] - {k_}:
            for l in adj[k_] - {j, i}:
                if (l, k_, j, i) in seen:
                    continue
                seen.add((i, j, k_, l))
                phi = _dihedral(xyz, i, j, k_, l)
                for idivf, pk, phase, pn in torsion_lookup(
                    (types[i], types[j], types[k_], types[l])
                ):
                    e_tor += (pk / idivf) * (
                        1.0 + math.cos(pn * phi - math.radians(phase))
                    )

    # impropers, amber-style: sp2 center with 3 neighbors, wildcard X-X-c-l
    for center in range(n):
        if len(adj[center]) != 3:
            continue
        for (xi, xj, pc, pl), (pk, phase, pn) in art["improper"].items():
            if types[center] != pc:
                continue
            subs = sorted(adj[center])
            lasts = [a for a in subs if types[a] == pl]
            if not lasts:
                continue
            last = lasts[0]
            o = [a for a in subs if a != last]
            phi = _dihedral(xyz, o[0], o[1], center, last)
            e_tor += pk * (1.0 + math.cos(pn * phi - math.radians(phase)))

    # nonbonded: 1-2/1-3 excluded, 1-4 scaled (LJ /2, Coulomb /1.2)
    excl, pairs14 = set(), set()
    for a in range(n):
        for b in adj[a]:
            excl.add(frozenset((a, b)))
            for c in adj[b] - {a}:
                excl.add(frozenset((a, c)))
                for d in adj[c] - {a, b}:
                    if d != a and frozenset((a, d)) not in excl:
                        pairs14.add(frozenset((a, d)))
    pairs14 -= excl
    e_lj = e_coul = 0.0
    for i in range(n):
        for j in range(i + 1, n):
            key = frozenset((i, j))
            if key in excl:
                continue
            r = np.linalg.norm(xyz[i] - xyz[j])
            rmin = art["nonbon"][types[i]][0] + art["nonbon"][types[j]][0]
            epsij = math.sqrt(art["nonbon"][types[i]][1] * art["nonbon"][types[j]][1])
            s6 = (rmin / r) ** 6
            lj = epsij * (s6 * s6 - 2.0 * s6)
            cl = COULOMB_KCAL * charges[i] * charges[j] / r
            if key in pairs14:
                lj /= 2.0
                cl /= 1.2
            e_lj += lj
            e_coul += cl

    return {
        "bond": e_bond * KCAL,
        "angle": e_angle * KCAL,
        "torsion": e_tor * KCAL,
        "nonbonded": (e_lj + e_coul) * KCAL,
        "n_angles": n_angles,
    }


def test_per_term_energies_match_independent_evaluation(independent_terms):
    """Every ClassicalForceField term equals the artifact-side computation
    at the external PDB geometry (kJ/mol, float64)."""
    xyz_nm = parse_pdb() / 10.0
    x = jnp.asarray(xyz_nm.reshape(1, -1), jnp.float64)
    ff = A.build_ala2_forcefield()
    got = {
        "bond": float(ff.bond_energy(x.reshape(1, -1, 3))[0]),
        "angle": float(ff.angle_energy(x.reshape(1, -1, 3))[0]),
        "torsion": float(ff.torsion_energy(x.reshape(1, -1, 3))[0]),
        "nonbonded": float(ff.nonbonded_energy(x.reshape(1, -1, 3))[0]),
    }
    for term in ("bond", "angle", "torsion"):
        np.testing.assert_allclose(
            got[term], independent_terms[term], rtol=1e-9, err_msg=term
        )
    # Coulomb constants differ in the 8th digit between the published
    # kcal-based constant and the kJ one the code uses — allow that slack
    np.testing.assert_allclose(
        got["nonbonded"], independent_terms["nonbonded"], rtol=1e-6
    )


def test_per_term_goldens_at_pdb_geometry(independent_terms):
    """Regression-pin the independently computed per-term values (kJ/mol).

    These are properties of the published parameters + the external
    geometry, not of any code in this repo; if either transcription drifts
    these move.  (Values recorded from the float64 artifact evaluation.)"""
    assert independent_terms["n_angles"] == 36
    golden = {
        "bond": 15.998,
        "angle": 11.850,
        "torsion": 39.813,
        "nonbonded": -128.627,
    }
    for term, val in golden.items():
        assert independent_terms[term] == pytest.approx(val, abs=0.002), term
