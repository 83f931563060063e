"""Template-based peptide topologies: capped poly-alanine at any length.

The reference reaches systems beyond alanine dipeptide only through OpenMM
topologies built by external tooling (bgmol); here the topology machinery is
in-repo: residue templates (extracted from the validated 22-atom ala2 tables
in ``energies/ala2.py`` — no new parameter transcription) are chained into
ACE-(ALA)_n-NME molecules, force-field terms are enumerated generically from
the bond graph, and a z-matrix for the internal-coordinate flow is derived
from the same graph.  This is the scale-up path the cell-list nonbonded
kernel (``energies/neighborlist.py``) exists for.

Reference anchors: topology/z-matrix roles of
``bgflow/factory/tensor_info.py`` + bgmol's z-matrix builders (external to
the reference repo); force-field assembly parity with
``energies/ala2.py::build_ala2_forcefield``.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import numpy as np

from .ala2 import (
    ALA2_ATOMS,
    _ANGLE_PARAMS,
    _BOND_PARAMS,
    _IMPROPER_PARAMS,
    _KCAL,
    _LJ_PARAMS,
    _lookup_symmetric,
    _lookup_torsion,
)
from .forcefield import (
    BondedTerms,
    ClassicalForceField,
    NonbondedTerms,
    enumerate_angles,
    enumerate_torsions,
    exclusion_scales,
)

__all__ = [
    "build_peptide_topology",
    "build_forcefield_from_topology",
    "build_polyala_forcefield",
    "backbone_dihedrals",
    "zmatrix_from_bonds",
    "polyala_z_matrix",
    "polyala_reference_xyz",
    "PEPTIDE_MASSES",
]

_DEG = math.pi / 180.0

# residue templates: (atoms [(name, amber type, charge)], local bonds,
# head local index or None, tail local index or None).  Extracted from the
# validated ala2 atom table so a 1-residue chain reproduces it exactly.
_ACE_ATOMS = ALA2_ATOMS[0:6]
_ALA_ATOMS = ALA2_ATOMS[6:16]
_NME_ATOMS = ALA2_ATOMS[16:22]

RESIDUE_TEMPLATES = {
    "ACE": {
        "atoms": _ACE_ATOMS,
        "bonds": [(0, 1), (1, 2), (1, 3), (1, 4), (4, 5)],
        "head": None,
        "tail": 4,  # carbonyl C
    },
    "ALA": {
        "atoms": _ALA_ATOMS,
        # N-H, N-CA, CA-HA, CA-CB, CA-C, CB-HB1..3, C-O (ala2 ordering)
        "bonds": [(0, 1), (0, 2), (2, 3), (2, 4), (2, 8), (4, 5), (4, 6), (4, 7), (8, 9)],
        "head": 0,  # N
        "tail": 8,  # C
    },
    "NME": {
        "atoms": _NME_ATOMS,
        "bonds": [(0, 1), (0, 2), (2, 3), (2, 4), (2, 5)],
        "head": 0,
        "tail": None,
    },
}

_MASS = {"H": 1.008, "C": 12.011, "N": 14.007, "O": 15.999}


def build_peptide_topology(sequence: Sequence[str]):
    """Chain residue templates into (atoms, bonds).

    ``sequence``: residue names, e.g. ["ACE", "ALA", "ALA", "NME"].  Each
    residue's tail atom bonds to the next residue's head atom.
    """
    atoms = []
    bonds = []
    prev_tail = None
    for res in sequence:
        tpl = RESIDUE_TEMPLATES[res]
        off = len(atoms)
        atoms.extend(tpl["atoms"])
        if prev_tail is not None:
            if tpl["head"] is None:
                raise ValueError(f"residue {res} cannot continue a chain")
            bonds.append((prev_tail, off + tpl["head"]))
        bonds.extend((off + i, off + j) for i, j in tpl["bonds"])
        prev_tail = None if tpl["tail"] is None else off + tpl["tail"]
    return atoms, np.asarray(bonds, dtype=np.int64)


def backbone_dihedrals(sequence: Sequence[str]):
    """Backbone (phi, psi) atom quadruples for each chain residue.

    phi_i = C_{i-1}-N_i-CA_i-C_i, psi_i = N_i-CA_i-C_i-N_{i+1}.  Returns a
    list of dicts ``{"residue": i, "phi": (4 ints), "psi": (4 ints)}`` over
    the non-cap residues.  For ACE-ALA-NME this reproduces the canonical
    ala2 quadruples phi=(4,6,8,14), psi=(6,8,14,16) (reference notebook
    ``alanine_dipeptide_basics.py`` CV definitions).
    """
    offsets = []
    off = 0
    for res in sequence:
        offsets.append(off)
        off += len(RESIDUE_TEMPLATES[res]["atoms"])
    out = []
    for i, res in enumerate(sequence):
        tpl = RESIDUE_TEMPLATES[res]
        if tpl["head"] is None or tpl["tail"] is None:
            continue  # caps have no phi/psi
        prev_tpl = RESIDUE_TEMPLATES[sequence[i - 1]]
        next_tpl = RESIDUE_TEMPLATES[sequence[i + 1]]
        c_prev = offsets[i - 1] + prev_tpl["tail"]
        n_i = offsets[i] + tpl["head"]
        # CA is the atom bonded to both head (N) and tail (C) in the template
        nbrs_head = {b for a, b in tpl["bonds"] if a == tpl["head"]} | {
            a for a, b in tpl["bonds"] if b == tpl["head"]
        }
        nbrs_tail = {b for a, b in tpl["bonds"] if a == tpl["tail"]} | {
            a for a, b in tpl["bonds"] if b == tpl["tail"]
        }
        (ca_local,) = nbrs_head & nbrs_tail
        ca_i = offsets[i] + ca_local
        c_i = offsets[i] + tpl["tail"]
        n_next = offsets[i + 1] + next_tpl["head"]
        out.append(
            {"residue": i, "phi": (c_prev, n_i, ca_i, c_i), "psi": (n_i, ca_i, c_i, n_next)}
        )
    return out


def build_forcefield_from_topology(
    atoms,
    bonds,
    temperature: float = 300.0,
    two_event_dims: bool = False,
    cutoff: Optional[float] = None,
    box=None,
    cell_capacity: int = 32,
    implicit_solvent: bool = False,
) -> ClassicalForceField:
    """Assemble a ClassicalForceField from (atoms, bonds) using the
    parm99/ff99SB type tables (same logic as ``build_ala2_forcefield``,
    generalized over the topology).

    ``implicit_solvent`` adds the GBSA OBC-II term (``energies/gbsa.py``,
    per-type mbondi2 radii from the bond graph) — the configuration the
    reference's canonical ala2 workflow uses through OpenMM
    (``notebooks/alanine_dipeptide_basics.py``: bgmol "implicit" system).
    Gas-phase electrostatics make peptides beyond ala2 collapse into a deep
    compact-basin trap (see artifacts/polyala3_logw_diag_r3b.json); solvated
    chains stay in Ramachandran-like ensembles.

    With ``cutoff`` (nm) the nonbonded part switches from the dense (N, N)
    sum to the O(N) cell-list path (``energies/neighborlist.py``) — the
    scale-up configuration for chains beyond a few hundred atoms.  ``box``
    is the (lower, upper) binning window; default ±2.5 nm around the origin
    (open boundaries: atoms outside are clamped into the binning box, which
    never drops in-cutoff pairs).  The GBSA term always stays dense O(N^2)
    and non-periodic (Born radii need every pair); combining it with an
    explicit periodic ``box`` raises."""
    types = [t for _, t, _ in atoms]
    charges = np.array([q for _, _, q in atoms])
    n = len(types)
    bonds = np.asarray(bonds, dtype=np.int64)

    bond_r0, bond_k = [], []
    for i, j in bonds:
        k, r0 = _lookup_symmetric(_BOND_PARAMS, (types[i], types[j]))
        bond_r0.append(r0 / 10.0)
        bond_k.append(2.0 * k * _KCAL * 100.0)

    angle_idx = enumerate_angles(bonds)
    angle_t0, angle_k = [], []
    for i, j, k_ in angle_idx:
        k, t0 = _lookup_symmetric(_ANGLE_PARAMS, (types[i], types[j], types[k_]))
        angle_t0.append(t0 * _DEG)
        angle_k.append(2.0 * k * _KCAL)

    torsion_rows = []
    for i, j, k_, l in enumerate_torsions(bonds):
        for per, phase, kk in _lookup_torsion((types[i], types[j], types[k_], types[l])):
            if kk != 0.0:
                torsion_rows.append(((i, j, k_, l), per, phase * _DEG, kk * _KCAL))
    adj = [[] for _ in range(n)]
    for i, j in bonds:
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
                torsion_rows.append(
                    ((others[0], others[1], center, last), per, phase * _DEG, kk * _KCAL)
                )

    bonded = BondedTerms(
        bond_idx=bonds,
        bond_r0=np.asarray(bond_r0),
        bond_k=np.asarray(bond_k),
        angle_idx=angle_idx,
        angle_theta0=np.asarray(angle_t0),
        angle_k=np.asarray(angle_k),
        torsion_idx=np.array([r[0] for r in torsion_rows], dtype=np.int64),
        torsion_n=np.array([r[1] for r in torsion_rows], dtype=np.float64),
        torsion_phase=np.array([r[2] for r in torsion_rows]),
        torsion_k=np.array([r[3] for r in torsion_rows]),
    )
    sigma = np.array([2.0 * _LJ_PARAMS[t][0] * 2 ** (-1 / 6) / 10.0 for t in types])
    epsilon = np.array([_LJ_PARAMS[t][1] * _KCAL for t in types])
    gbsa = None
    if implicit_solvent:
        from .gbsa import peptide_gbsa_terms

        if box is not None:
            raise ValueError(
                "implicit_solvent uses raw (non-minimum-image) distances and "
                "cannot be combined with a periodic box; drop `box` or the "
                "GBSA term"
            )
        gbsa = peptide_gbsa_terms(atoms, bonds)
    if cutoff is not None:
        from .neighborlist import (
            CutoffNonbondedEnergy,
            exclusions_from_bonds,
            make_cell_grid,
        )

        terms = exclusions_from_bonds(n, bonds, charges, sigma, epsilon)
        if box is None:
            half = 2.5
            box = (np.full(3, -half), np.full(3, half))
        grid = make_cell_grid(box[0], box[1], cutoff, capacity=cell_capacity)
        nb_cut = CutoffNonbondedEnergy(
            n, terms, grid, cutoff, temperature=temperature
        )
        return ClassicalForceField(
            n_atoms=n, bonded=bonded, nonbonded=None, nonbonded_cutoff=nb_cut,
            gbsa=gbsa, temperature=temperature, two_event_dims=two_event_dims,
        )
    scale_lj, scale_coul = exclusion_scales(n, bonds)
    nonbonded = NonbondedTerms(
        charges=charges, sigma=sigma, epsilon=epsilon,
        scale_lj=scale_lj, scale_coulomb=scale_coul,
    )
    return ClassicalForceField(
        n_atoms=n, bonded=bonded, nonbonded=nonbonded,
        gbsa=gbsa, temperature=temperature, two_event_dims=two_event_dims,
    )


def build_polyala_forcefield(
    n_res: int, temperature: float = 300.0, two_event_dims: bool = False,
    cutoff: Optional[float] = None, box=None, cell_capacity: int = 32,
    implicit_solvent: bool = False,
) -> ClassicalForceField:
    """ACE-(ALA)_n-NME force field (n_res=1 reproduces ala2).

    ``cutoff`` switches nonbonded to the O(N) cell-list path; the default
    binning box scales with the chain's extended length.  ``implicit_solvent``
    adds the GBSA OBC-II term (see ``build_forcefield_from_topology``)."""
    atoms, bonds = build_peptide_topology(["ACE"] + ["ALA"] * n_res + ["NME"])
    if cutoff is not None and box is None:
        half = max(2.5, 0.4 * n_res + 1.5)
        box = (np.full(3, -half), np.full(3, half))
    return build_forcefield_from_topology(
        atoms, bonds, temperature=temperature, two_event_dims=two_event_dims,
        cutoff=cutoff, box=box, cell_capacity=cell_capacity,
        implicit_solvent=implicit_solvent,
    )


def PEPTIDE_MASSES(atoms) -> np.ndarray:
    """amu per atom from the element (first letter of the amber type)."""
    return np.array([_MASS[t[0]] for _, t, _ in atoms])


# ------------------------------------------------------------- z-matrix --


def zmatrix_from_bonds(n_atoms: int, bonds, fixed_atoms, priority=None) -> np.ndarray:
    """Derive z-matrix rows [atom, bond_ref, angle_ref, torsion_ref] from
    the bond graph, growing outward from ``fixed_atoms``.

    Each placed atom bonds to its bond_ref; angle_ref is a placed neighbor
    of bond_ref; torsion_ref is a placed neighbor of angle_ref (preferred,
    giving a proper dihedral) or of bond_ref (improper fallback).  Row
    order is a valid reconstruction order (every reference appears before
    its dependents).  ``priority`` (lower first) orders the sweep — e.g.
    heavy atoms before hydrogens, so backbone geometry is anchored by
    heavy-atom references.
    """
    adj = [[] for _ in range(n_atoms)]
    for i, j in np.asarray(bonds):
        adj[int(i)].append(int(j))
        adj[int(j)].append(int(i))
    placed = list(int(a) for a in fixed_atoms)
    placed_set = set(placed)
    rows = []
    if priority is None:
        priority = np.zeros(n_atoms)
    sweep = sorted(range(n_atoms), key=lambda a: (priority[a], a))
    while len(placed_set) < n_atoms:
        progressed = False
        # deterministic sweep: atoms adjacent to placed ones, priority order
        for a in sweep:
            if a in placed_set:
                continue
            by_prio = lambda lst: sorted(lst, key=lambda i: (priority[i], i))
            ps = by_prio([p for p in adj[a] if p in placed_set])
            if not ps:
                continue
            p = ps[0]
            qs = by_prio([q for q in adj[p] if q in placed_set and q != a])
            if not qs:
                continue
            q = qs[0]
            rs = by_prio([r for r in adj[q] if r in placed_set and r not in (a, p)])
            if not rs:
                rs = by_prio([r for r in adj[p] if r in placed_set and r not in (a, q)])
            if not rs:
                rs = by_prio([r for r in placed if r not in (a, p, q)])
            if not rs:
                raise ValueError("need at least 3 placed reference atoms")
            rows.append([a, p, q, rs[0]])
            placed.append(a)
            placed_set.add(a)
            progressed = True
        if not progressed:
            raise ValueError("disconnected bond graph: cannot place all atoms")
    return np.asarray(rows, dtype=np.int64)


def polyala_z_matrix(n_res: int) -> Tuple[np.ndarray, np.ndarray]:
    """(z_matrix, fixed_atoms) for ACE-(ALA)_n-NME.

    The rigid block is the middle residue's [N, CA, HA, CB, C] (the ala2
    convention, ``energies/ala2.py::ALA2_FIXED_ATOMS``, generalized)."""
    atoms, bonds = build_peptide_topology(["ACE"] + ["ALA"] * n_res + ["NME"])
    mid = (n_res - 1) // 2
    off = 6 + 10 * mid  # ACE is 6 atoms, each ALA 10
    fixed = np.array([off + 0, off + 2, off + 3, off + 4, off + 8])
    # heavy atoms first (and preferred as references): hydrogen-anchored
    # angle/torsion references condition the reconstruction badly
    prio = np.array([1 if t.startswith("H") else 0 for _, t, _ in atoms])
    z = zmatrix_from_bonds(len(atoms), bonds, fixed, priority=prio)
    return z, fixed


def polyala_reference_xyz(n_res: int, minimize_steps: int = 200) -> np.ndarray:
    """Extended-chain starting coordinates (nm) for ACE-(ALA)_n-NME.

    Atoms are placed by NeRF walking a z-matrix rooted at the first three
    heavy atoms, with equilibrium bond lengths/angles from the parm99
    tables and heuristic torsions (backbone trans, staggered hydrogens),
    then relaxed by a few steepest-descent steps on the force field.
    """
    import jax
    import jax.numpy as jnp

    from ..ops import ic as icops

    atoms, bonds = build_peptide_topology(["ACE"] + ["ALA"] * n_res + ["NME"])
    ff = build_forcefield_from_topology(atoms, bonds)
    types = [t for _, t, _ in atoms]
    n = len(atoms)

    # seed: ACE HH31 (0) at origin, CH3 (1) along x, C (4) in the xy plane
    r01 = _lookup_symmetric(_BOND_PARAMS, (types[0], types[1]))[1] / 10.0
    r14 = _lookup_symmetric(_BOND_PARAMS, (types[1], types[4]))[1] / 10.0
    th = _lookup_symmetric(_ANGLE_PARAMS, (types[0], types[1], types[4]))[1] * _DEG
    pos = np.zeros((n, 3))
    pos[1] = [r01, 0.0, 0.0]
    # angle 0-1-4 = th with atom 0 at the origin: direction from 1 makes
    # angle th with the (1 -> 0) direction (-1, 0, 0)
    pos[4] = pos[1] + r14 * np.array([-math.cos(th), math.sin(th), 0.0])
    # heavy atoms first: the backbone is laid out trans before hydrogens
    # consume torsion slots on shared axes
    prio = np.array([1 if t.startswith("H") else 0 for t in types])
    z = zmatrix_from_bonds(n, bonds, [0, 1, 4], priority=prio)

    rng = np.random.RandomState(17)
    # greedy steric placement: try several torsion slots and keep the one
    # with the largest clearance from everything already placed (trans
    # first, so unhindered backbone atoms extend the chain)
    candidates = [math.pi, 2 * math.pi / 3, -2 * math.pi / 3, math.pi / 3, -math.pi / 3, 0.0]
    placed_idx = [0, 1, 4]
    for a, p, q, r in z:
        r0 = _lookup_symmetric(_BOND_PARAMS, (types[a], types[p]))[1] / 10.0
        t0 = _lookup_symmetric(_ANGLE_PARAMS, (types[a], types[p], types[q]))[1] * _DEG
        p1 = jnp.asarray(pos[p])[None, None]
        p2 = jnp.asarray(pos[q])[None, None]
        p3 = jnp.asarray(pos[r])[None, None]
        others = np.asarray([pos[i] for i in placed_idx if i != p])
        best, best_score = None, -1.0
        for tor in candidates:
            pt = np.asarray(
                icops.ic_to_xyz(
                    p1, p2, p3,
                    jnp.full((1, 1), r0), jnp.full((1, 1), t0),
                    jnp.full((1, 1), tor + 0.03 * rng.randn()),
                )
            ).reshape(3)
            score = float(np.min(np.linalg.norm(others - pt, axis=-1)))
            if score > best_score:
                best, best_score = pt, score
        pos[a] = best
        placed_idx.append(int(a))

    # short backtracking steepest descent to clean template-placement strain
    x = jnp.asarray(pos.reshape(1, -1))
    energy = jax.jit(lambda x: ff.energy(x)[0])
    force = jax.jit(ff.force)
    u = float(energy(x))
    step = 1e-7
    for _ in range(minimize_steps):
        x_new = x + step * force(x)
        u_new = float(energy(x_new))
        if np.isfinite(u_new) and u_new < u:
            x, u = x_new, u_new
            step *= 1.5
        else:
            step *= 0.5
            if step < 1e-12:
                break
    return np.asarray(x).reshape(n, 3)
