"""Alanine dipeptide (ACE-ALA-NME) in vacuum — the framework's flagship system.

Topology and amber-99SB-style parameters for the canonical 22-atom system
used throughout the reference's tests and notebooks (atom ordering follows
``tests/data/alanine-dipeptide-nowater.pdb``; the rigid block [6,8,9,10,14]
and the 17-row z-matrix in the reference ``tests/conftest.py:45-110`` refer
to this ordering).

The parameter values are a careful transcription of amber parm99 +
frcmod.ff99SB (the published force field the reference evaluates through
OpenMM): charges from the ff94/ff99 residue library (Cornell et al. 1995),
bonds/angles/LJ from parm99.dat, backbone phi/psi/phi'/psi' torsions
exactly as in frcmod.ff99SB (Hornak et al. 2006).  Per-table provenance is
recorded inline; the two amide-H angle force constants are the only entries
with residual transcription uncertainty (flagged below).  With no OpenMM in
this environment there is no in-container golden oracle; tests validate
each functional form analytically, check the totals for internal
consistency, and regression-pin a per-term energy breakdown at the
reference geometry.  For guaranteed exactness, import tables straight from
a user-supplied artifact instead: ``energies/importers.py`` parses an
OpenMM-serialized System XML or an Amber prmtop into the same
``ClassicalForceField`` structure (a data-only swap).
"""
from __future__ import annotations

import math

import numpy as np

from .forcefield import (
    BondedTerms,
    ClassicalForceField,
    NonbondedTerms,
    enumerate_angles,
    enumerate_torsions,
    exclusion_scales,
)

# kcal -> kJ
_KCAL = 4.184
_DEG = math.pi / 180.0

# atom ordering of the 22-atom ACE-ALA-NME system (name, amber type, charge)
ALA2_ATOMS = [
    ("HH31", "HC", 0.1123),
    ("CH3", "CT", -0.3662),
    ("HH32", "HC", 0.1123),
    ("HH33", "HC", 0.1123),
    ("C", "C", 0.5972),
    ("O", "O", -0.5679),
    ("N", "N", -0.4157),
    ("H", "H", 0.2719),
    ("CA", "CT", 0.0337),
    ("HA", "H1", 0.0823),
    ("CB", "CT", -0.1825),
    ("HB1", "HC", 0.0603),
    ("HB2", "HC", 0.0603),
    ("HB3", "HC", 0.0603),
    ("C", "C", 0.5973),
    ("O", "O", -0.5679),
    ("N", "N", -0.4157),
    ("H", "H", 0.2719),
    ("CH3", "CT", -0.1490),
    ("HH31", "H1", 0.0976),
    ("HH32", "H1", 0.0976),
    ("HH33", "H1", 0.0976),
]

ALA2_BONDS = np.array([
    (0, 1), (1, 2), (1, 3), (1, 4),   # ACE methyl + C
    (4, 5), (4, 6),                   # C=O, C-N
    (6, 7), (6, 8),                   # N-H, N-CA
    (8, 9), (8, 10), (8, 14),         # CA-HA, CA-CB, CA-C
    (10, 11), (10, 12), (10, 13),     # CB hydrogens
    (14, 15), (14, 16),               # C=O, C-N
    (16, 17), (16, 18),               # N-H, N-CH3
    (18, 19), (18, 20), (18, 21),     # NME methyl hydrogens
])

# amber parm99 bond parameters: (type pair) -> (k kcal/mol/A^2, r0 A)
_BOND_PARAMS = {
    ("CT", "HC"): (340.0, 1.090),
    ("CT", "H1"): (340.0, 1.090),
    ("CT", "C"): (317.0, 1.522),
    ("C", "O"): (570.0, 1.229),
    ("C", "N"): (490.0, 1.335),
    ("N", "H"): (434.0, 1.010),
    ("N", "CT"): (337.0, 1.449),
    ("CT", "CT"): (310.0, 1.526),
}

# amber parm99 angle parameters: (t1, t2, t3) -> (k kcal/mol/rad^2, theta0 deg)
# All values from parm99.dat's ANGL block.  The two amide-H entries were
# flagged for transcription risk in earlier revisions and are now resolved
# against the published parameter set: parm99.dat lists ``C -N -H  50.0
# 120.00`` and ``CT-N -H  38.0  118.04`` (the latter equals the distinctive
# k="317.984" kJ entry of OpenMM's amber99sb ffxml: 2 * 38.0 * 4.184).
# These affect only the stiff H-placement marginals, not the phi/psi
# surface.
_ANGLE_PARAMS = {
    ("HC", "CT", "HC"): (35.0, 109.50),
    ("H1", "CT", "H1"): (35.0, 109.50),
    ("HC", "CT", "C"): (50.0, 109.50),
    ("H1", "CT", "N"): (50.0, 109.50),
    ("H1", "CT", "C"): (50.0, 109.50),
    ("H1", "CT", "CT"): (50.0, 109.50),
    ("HC", "CT", "CT"): (50.0, 109.50),
    ("CT", "C", "O"): (80.0, 120.40),
    ("CT", "C", "N"): (70.0, 116.60),
    ("O", "C", "N"): (80.0, 122.90),
    ("C", "N", "H"): (50.0, 120.00),
    ("C", "N", "CT"): (50.0, 121.90),
    ("H", "N", "CT"): (38.0, 118.04),
    ("N", "CT", "C"): (63.0, 110.10),
    ("N", "CT", "CT"): (80.0, 109.70),
    ("CT", "CT", "C"): (63.0, 111.10),
}

# proper torsions: (t1,t2,t3,t4) or ("X",t2,t3,"X") -> list of
# (periodicity, phase deg, k kcal/mol) — k already divided by idivf.
# A specific (non-wildcard) entry REPLACES the wildcard entirely (amber
# semantics).  Sources: parm99.dat DIHE block; backbone phi/psi/phi'/psi'
# from frcmod.ff99SB (Hornak et al., Proteins 65:712, 2006).  ff99SB-ILDN
# only touches Ile/Leu/Asp/Asn side chains, so these tables are equally
# valid for the amber99sbildn target the reference tests build.
_TORSION_PARAMS = {
    # parm99 wildcards: "X -C -N -X  4  10.00  180.0  2." etc.
    ("X", "C", "N", "X"): [(2, 180.0, 10.0 / 4)],
    ("X", "CT", "N", "X"): [(2, 0.0, 0.0)],
    ("X", "CT", "C", "X"): [(2, 180.0, 0.0)],
    ("X", "CT", "CT", "X"): [(3, 0.0, 1.40 / 9)],
    # parm99 specific: "H -N -C -O  1 2.50 180.0 -2." / "1 2.00 0.0 1."
    ("H", "N", "C", "O"): [(2, 180.0, 2.50), (1, 0.0, 2.00)],
    # parm99 specific (Junmei et al. 1999 additions):
    # "HC-CT-C -O  1 0.80 0.0 -1." / "1 0.00 0.0 -2." / "1 0.08 180.0 3."
    ("HC", "CT", "C", "O"): [(1, 0.0, 0.80), (3, 180.0, 0.08)],
    # frcmod.ff99SB backbone terms (k, phase) exactly as published:
    # phi  C -N -CT-C :  n=2 k=0.27 ph=0   | n=3 k=0.42 ph=180
    ("C", "N", "CT", "C"): [(2, 0.0, 0.27), (3, 180.0, 0.42)],
    # psi  N -CT-C -N :  n=1 0.45@180 | n=2 1.58@180 | n=3 0.55@180
    ("N", "CT", "C", "N"): [(1, 180.0, 0.45), (2, 180.0, 1.58), (3, 180.0, 0.55)],
    # phi' CT-CT-N -C :  n=1 2.00@0 | n=2 2.00@180 | n=3 0.40@180
    ("CT", "CT", "N", "C"): [(1, 0.0, 2.00), (2, 180.0, 2.00), (3, 180.0, 0.40)],
    # psi' CT-CT-C -N :  n=1 0.20@180 | n=2 0.20@180 | n=3 0.40@0
    ("CT", "CT", "C", "N"): [(1, 180.0, 0.20), (2, 180.0, 0.20), (3, 0.0, 0.40)],
}

# impropers (centered on third atom): (i, j, center, l) -> (per, phase, k)
_IMPROPER_PARAMS = {
    ("X", "X", "C", "O"): (2, 180.0, 10.5),
    ("X", "X", "N", "H"): (2, 180.0, 1.0),
}

# amber LJ: type -> (rmin/2 A, eps kcal/mol)
_LJ_PARAMS = {
    "CT": (1.9080, 0.1094),
    "C": (1.9080, 0.0860),
    "N": (1.8240, 0.1700),
    "O": (1.6612, 0.2100),
    "H": (0.6000, 0.0157),
    "HC": (1.4870, 0.0157),
    "H1": (1.3870, 0.0157),
}


def _lookup_symmetric(table, key):
    if key in table:
        return table[key]
    if key[::-1] in table:
        return table[key[::-1]]
    raise KeyError(f"no parameters for {key}")


def _lookup_torsion(types):
    t1, t2, t3, t4 = types
    for key in [(t1, t2, t3, t4), (t4, t3, t2, t1)]:
        if key in _TORSION_PARAMS:
            return _TORSION_PARAMS[key]
    for key in [("X", t2, t3, "X"), ("X", t3, t2, "X")]:
        if key in _TORSION_PARAMS:
            return _TORSION_PARAMS[key]
    raise KeyError(f"no torsion parameters for {types}")


def build_ala2_forcefield(
    temperature: float = 300.0,
    two_event_dims: bool = False,
    implicit_solvent: bool = False,
) -> ClassicalForceField:
    """Assemble the ala2 force field (22 atoms, amber-99SB-style).

    ``implicit_solvent`` adds the OBC II GBSA terms (the reference's ala2
    notebooks run OpenMM with implicit solvent; vacuum remains the default
    to keep existing benchmarks comparable).
    """
    types = [t for _, t, _ in ALA2_ATOMS]
    charges = np.array([q for _, _, q in ALA2_ATOMS])
    n = len(types)

    # bonds: kcal/mol/A^2 (E = k (r-r0)^2) -> kJ/mol/nm^2 with E = k/2 (...)^2
    bond_r0, bond_k = [], []
    for i, j in ALA2_BONDS:
        k, r0 = _lookup_symmetric(_BOND_PARAMS, (types[i], types[j]))
        bond_r0.append(r0 / 10.0)
        bond_k.append(2.0 * k * _KCAL * 100.0)

    angle_idx = enumerate_angles(ALA2_BONDS)
    angle_t0, angle_k = [], []
    for i, j, k_ in angle_idx:
        k, t0 = _lookup_symmetric(_ANGLE_PARAMS, (types[i], types[j], types[k_]))
        angle_t0.append(t0 * _DEG)
        angle_k.append(2.0 * k * _KCAL)

    torsion_rows = []
    for i, j, k_, l in enumerate_torsions(ALA2_BONDS):
        for per, phase, kk in _lookup_torsion((types[i], types[j], types[k_], types[l])):
            if kk != 0.0:
                torsion_rows.append(((i, j, k_, l), per, phase * _DEG, kk * _KCAL))
    # impropers: keep sp2 centers planar (C with O substituent, N with H)
    adj = [[] for _ in range(n)]
    for i, j in ALA2_BONDS:
        adj[int(i)].append(int(j))
        adj[int(j)].append(int(i))
    for center in range(n):
        if len(adj[center]) != 3:
            continue
        for (pi, pj, pc, pl), (per, phase, kk) in _IMPROPER_PARAMS.items():
            if types[center] == pc:
                subs = sorted(adj[center])
                lasts = [a for a in subs if types[a] == pl]
                if not lasts:
                    continue
                last = lasts[0]
                others = [a for a in subs if a != last]
                torsion_rows.append(((others[0], others[1], center, last), per, phase * _DEG, kk * _KCAL))

    t_idx = np.array([r[0] for r in torsion_rows], dtype=np.int64)
    t_n = np.array([r[1] for r in torsion_rows], dtype=np.float64)
    t_phase = np.array([r[2] for r in torsion_rows])
    t_k = np.array([r[3] for r in torsion_rows])

    bonded = BondedTerms(
        bond_idx=np.asarray(ALA2_BONDS, dtype=np.int64),
        bond_r0=np.asarray(bond_r0),
        bond_k=np.asarray(bond_k),
        angle_idx=angle_idx,
        angle_theta0=np.asarray(angle_t0),
        angle_k=np.asarray(angle_k),
        torsion_idx=t_idx,
        torsion_n=t_n,
        torsion_phase=t_phase,
        torsion_k=t_k,
    )

    sigma = np.array([2.0 * _LJ_PARAMS[t][0] * 2 ** (-1 / 6) / 10.0 for t in types])
    epsilon = np.array([_LJ_PARAMS[t][1] * _KCAL for t in types])
    scale_lj, scale_coul = exclusion_scales(n, ALA2_BONDS)
    nonbonded = NonbondedTerms(
        charges=charges, sigma=sigma, epsilon=epsilon,
        scale_lj=scale_lj, scale_coulomb=scale_coul,
    )
    gbsa = None
    if implicit_solvent:
        from .gbsa import ala2_gbsa_terms

        gbsa = ala2_gbsa_terms()
    return ClassicalForceField(
        n_atoms=n, bonded=bonded, nonbonded=nonbonded, gbsa=gbsa,
        temperature=temperature, two_event_dims=two_event_dims,
    )


# canonical z-matrix + rigid block for the 22-atom system
# (reference tests/conftest.py:82-110)
ALA2_Z_MATRIX = np.array([
    [0, 1, 4, 6], [1, 4, 6, 8], [2, 1, 4, 0], [3, 1, 4, 0], [4, 6, 8, 14],
    [5, 4, 6, 8], [7, 6, 8, 4], [11, 10, 8, 6], [12, 10, 8, 11],
    [13, 10, 8, 11], [15, 14, 8, 16], [16, 14, 8, 6], [17, 16, 14, 15],
    [18, 16, 14, 8], [19, 18, 16, 14], [20, 18, 16, 19], [21, 18, 16, 19],
])
ALA2_FIXED_ATOMS = np.array([6, 8, 9, 10, 14])
ALA2_GLOBAL_Z_MATRIX = np.vstack([
    ALA2_Z_MATRIX,
    [[9, 8, 6, 14], [10, 8, 9, 6], [6, -1, -1, -1], [8, 6, -1, -1], [14, 8, 6, -1]],
])

# reference geometry (nm), from the canonical PDB (positions are data, used
# only to seed tests and MD)
ALA2_REFERENCE_XYZ = 0.1 * np.array([
    [3.225, 27.427, 2.566], [3.720, 26.570, 2.110], [4.088, 25.905, 2.891],
    [4.557, 26.914, 1.502], [2.770, 25.800, 1.230], [1.600, 26.150, 1.090],
    [3.270, 24.640, 0.690], [4.259, 24.471, 0.810], [2.480, 23.690, -0.190],
    [1.733, 24.315, -0.679], [3.470, 23.160, -1.270], [4.219, 22.525, -0.797],
    [2.922, 22.582, -2.014], [3.963, 24.002, -1.756], [1.730, 22.590, 0.490],
    [2.340, 21.880, 1.280], [0.400, 22.430, 0.210], [-0.008, 23.118, -0.407],
    [-0.470, 21.350, 0.730], [0.112, 20.693, 1.376], [-1.290, 21.786, 1.300],
    [-0.873, 20.775, -0.103],
])
