"""Force-field importers: OpenMM System XML and Amber prmtop -> tables.

The reference reaches exact amber force fields through live OpenMM Contexts
(``bgflow/distribution/energy/openmm.py:18-533``).  This framework instead
evaluates the force field on-device (``energies/forcefield.py``), so
exactness is a *data* problem: these importers parse the two standard
serialized forms into ``BondedTerms``/``NonbondedTerms``/``GBSATerms``.

* ``forcefield_from_openmm_system_xml`` — an OpenMM **System** serialized
  with ``openmm.XmlSerializer.serialize(system)``.  This is the highest-
  fidelity source: every term is listed explicitly with final parameters
  (kJ/mol, nm, OpenMM's E = k/2 (r-r0)^2 conventions match ours directly),
  and nonbonded exceptions are imported as explicit per-pair terms, exact
  even when they deviate from Lorentz-Berthelot combination.
* ``forcefield_from_prmtop`` — an AmberTools topology file.  Amber
  conventions (kcal, Angstrom, E = k (r-r0)^2, charges in sqrt(kcal/mol A),
  1-4 scaling via SCEE/SCNB) are converted; 1-4 pairs become explicit pair
  terms using the type-pair A/B coefficients, so modified off-diagonal LJ
  also imports exactly.
* ``forcefield_to_openmm_system_xml`` — the inverse writer, used for
  round-trip tests and for handing tables back to OpenMM users.

Neither parser needs OpenMM/AmberTools installed — they read the file
formats, not the libraries.
"""
from __future__ import annotations

import io
import math
import os
import xml.etree.ElementTree as ET
from typing import Optional, Union

import numpy as np

from .forcefield import BondedTerms, ClassicalForceField, NonbondedTerms

__all__ = [
    "forcefield_from_openmm_system_xml",
    "forcefield_from_prmtop",
    "forcefield_to_openmm_system_xml",
]


def _read_text(source: Union[str, os.PathLike, io.IOBase]) -> str:
    if hasattr(source, "read"):
        return source.read()
    text = str(source)
    if "\n" in text or text.lstrip().startswith("<") or text.lstrip().startswith("%"):
        return text
    with open(text) as fh:
        return fh.read()


# ---------------------------------------------------------------------------
# OpenMM System XML
# ---------------------------------------------------------------------------

def forcefield_from_openmm_system_xml(
    source,
    temperature: float = 300.0,
    two_event_dims: bool = False,
    constraint_k: Optional[float] = 418400.0,
) -> ClassicalForceField:
    """Parse an OpenMM-serialized System into a ``ClassicalForceField``.

    Supported forces: HarmonicBondForce, HarmonicAngleForce,
    PeriodicTorsionForce, NonbondedForce (NoCutoff semantics), GBSAOBCForce.
    CMMotionRemover is ignored (our kernels never inject momentum).

    Distance constraints (``<Constraint>``) have no exact flexible-FF
    equivalent; they are converted to stiff harmonic bonds with force
    constant ``constraint_k`` (kJ/mol/nm^2; pass ``None`` to refuse
    constrained systems instead).
    """
    root = ET.fromstring(_read_text(source))
    if root.tag != "System":
        raise ValueError(f"expected a serialized <System>, got <{root.tag}>")
    particles = root.find("Particles")
    n_atoms = len(list(particles)) if particles is not None else 0

    bond_rows = []  # (i, j, r0, k)
    constraints = root.find("Constraints")
    if constraints is not None and len(list(constraints)):
        if constraint_k is None:
            raise ValueError(
                "System contains distance constraints; pass constraint_k to "
                "convert them to stiff harmonic bonds"
            )
        for c in constraints:
            bond_rows.append(
                (int(c.get("p1")), int(c.get("p2")), float(c.get("d")), float(constraint_k))
            )

    angle_rows = []  # (i, j, k_atom, theta0, k)
    torsion_rows = []  # (i, j, k_atom, l, n, phase, k)
    nonbonded = None
    gbsa = None

    supported_noop = {"CMMotionRemover", "MonteCarloBarostat", "AndersenThermostat"}
    forces = root.find("Forces")
    for force in forces if forces is not None else []:
        ftype = force.get("type")
        if ftype == "HarmonicBondForce":
            for b in force.find("Bonds"):
                # OpenMM E = k/2 (r - d)^2 == our convention
                bond_rows.append(
                    (int(b.get("p1")), int(b.get("p2")), float(b.get("d")), float(b.get("k")))
                )
        elif ftype == "HarmonicAngleForce":
            for a in force.find("Angles"):
                angle_rows.append(
                    (
                        int(a.get("p1")), int(a.get("p2")), int(a.get("p3")),
                        float(a.get("a")), float(a.get("k")),
                    )
                )
        elif ftype == "PeriodicTorsionForce":
            for t in force.find("Torsions"):
                torsion_rows.append(
                    (
                        int(t.get("p1")), int(t.get("p2")), int(t.get("p3")), int(t.get("p4")),
                        float(t.get("periodicity")), float(t.get("phase")), float(t.get("k")),
                    )
                )
        elif ftype == "NonbondedForce":
            charges, sigma, epsilon = [], [], []
            for p in force.find("Particles"):
                charges.append(float(p.get("q")))
                sigma.append(float(p.get("sig")))
                epsilon.append(float(p.get("eps")))
            charges = np.asarray(charges)
            sigma = np.asarray(sigma)
            epsilon = np.asarray(epsilon)
            scale_lj = np.ones((n_atoms, n_atoms))
            scale_coul = np.ones((n_atoms, n_atoms))
            np.fill_diagonal(scale_lj, 0.0)
            np.fill_diagonal(scale_coul, 0.0)
            pair_idx, pair_qq, pair_sig, pair_eps = [], [], [], []
            exceptions = force.find("Exceptions")
            for e in exceptions if exceptions is not None else []:
                i, j = int(e.get("p1")), int(e.get("p2"))
                # an exception REPLACES the regular pair interaction
                scale_lj[i, j] = scale_lj[j, i] = 0.0
                scale_coul[i, j] = scale_coul[j, i] = 0.0
                q = float(e.get("q"))  # chargeprod, e^2
                eps_ij = float(e.get("eps"))
                if q != 0.0 or eps_ij != 0.0:
                    pair_idx.append((i, j))
                    pair_qq.append(q)
                    pair_sig.append(float(e.get("sig")))
                    pair_eps.append(eps_ij)
            nonbonded = NonbondedTerms(
                charges=charges,
                sigma=sigma,
                epsilon=epsilon,
                scale_lj=scale_lj,
                scale_coulomb=scale_coul,
                pair_idx=np.asarray(pair_idx, dtype=np.int64).reshape(-1, 2),
                pair_qq=np.asarray(pair_qq),
                pair_sigma=np.asarray(pair_sig),
                pair_epsilon=np.asarray(pair_eps),
            )
        elif ftype == "GBSAOBCForce":
            from .gbsa import GBSATerms

            q, r, s = [], [], []
            for p in force.find("Particles"):
                q.append(float(p.get("q")))
                r.append(float(p.get("r")))
                s.append(float(p.get("scale")))
            gbsa = GBSATerms(
                charges=np.asarray(q),
                radii=np.asarray(r),
                scales=np.asarray(s),
                solute_dielectric=float(force.get("soluteDielectric", 1.0)),
                solvent_dielectric=float(force.get("solventDielectric", 78.3)),
            )
        elif ftype in supported_noop:
            continue
        else:
            raise ValueError(
                f"unsupported force type {ftype!r}; the on-device kernel covers "
                "bond/angle/torsion/nonbonded/GBSAOBC terms"
            )

    bonded = _bonded_from_rows(bond_rows, angle_rows, torsion_rows)
    return ClassicalForceField(
        n_atoms=n_atoms,
        bonded=bonded,
        nonbonded=nonbonded,
        gbsa=gbsa,
        temperature=temperature,
        two_event_dims=two_event_dims,
    )


def _bonded_from_rows(bond_rows, angle_rows, torsion_rows) -> BondedTerms:
    bond_rows = list(bond_rows)
    return BondedTerms(
        bond_idx=np.asarray([r[:2] for r in bond_rows], dtype=np.int64).reshape(-1, 2),
        bond_r0=np.asarray([r[2] for r in bond_rows]),
        bond_k=np.asarray([r[3] for r in bond_rows]),
        angle_idx=np.asarray([r[:3] for r in angle_rows], dtype=np.int64).reshape(-1, 3),
        angle_theta0=np.asarray([r[3] for r in angle_rows]),
        angle_k=np.asarray([r[4] for r in angle_rows]),
        torsion_idx=np.asarray([r[:4] for r in torsion_rows], dtype=np.int64).reshape(-1, 4),
        torsion_n=np.asarray([r[4] for r in torsion_rows]),
        torsion_phase=np.asarray([r[5] for r in torsion_rows]),
        torsion_k=np.asarray([r[6] for r in torsion_rows]),
    )


def forcefield_to_openmm_system_xml(ff: ClassicalForceField) -> str:
    """Serialize a ``ClassicalForceField`` in OpenMM System XML form.

    The output round-trips through ``forcefield_from_openmm_system_xml`` and
    deserializes with ``openmm.XmlSerializer`` (masses are written as zero —
    OpenMM users re-attach masses from a topology; our energies never use
    them).  Pair exceptions are emitted from the explicit pair list plus
    zero-entries for every excluded pair.
    """
    b = ff.bonded
    nb = ff.nonbonded
    out = []
    out.append('<System openmmVersion="8.1" type="System" version="1">')
    out.append(
        '  <PeriodicBoxVectors>'
        '<A x="2" y="0" z="0"/><B x="0" y="2" z="0"/><C x="0" y="0" z="2"/>'
        "</PeriodicBoxVectors>"
    )
    out.append("  <Particles>")
    for _ in range(ff.n_atoms):
        out.append('    <Particle mass="0"/>')
    out.append("  </Particles>")
    out.append("  <Constraints/>")
    out.append("  <Forces>")
    out.append(
        '    <Force forceGroup="0" name="HarmonicBondForce" type="HarmonicBondForce"'
        ' usesPeriodic="0" version="2">'
    )
    out.append("      <Bonds>")
    for (i, j), r0, k in zip(
        np.asarray(b.bond_idx).tolist(), np.asarray(b.bond_r0).tolist(), np.asarray(b.bond_k).tolist()
    ):
        out.append(f'        <Bond d="{r0!r}" k="{k!r}" p1="{i}" p2="{j}"/>')
    out.append("      </Bonds>")
    out.append("    </Force>")
    out.append(
        '    <Force forceGroup="0" name="HarmonicAngleForce" type="HarmonicAngleForce"'
        ' usesPeriodic="0" version="2">'
    )
    out.append("      <Angles>")
    for (i, j, k_), t0, k in zip(
        np.asarray(b.angle_idx).tolist(), np.asarray(b.angle_theta0).tolist(), np.asarray(b.angle_k).tolist()
    ):
        out.append(f'        <Angle a="{t0!r}" k="{k!r}" p1="{i}" p2="{j}" p3="{k_}"/>')
    out.append("      </Angles>")
    out.append("    </Force>")
    out.append(
        '    <Force forceGroup="0" name="PeriodicTorsionForce" type="PeriodicTorsionForce"'
        ' usesPeriodic="0" version="2">'
    )
    out.append("      <Torsions>")
    for (i, j, k_, l), n, ph, k in zip(
        np.asarray(b.torsion_idx).tolist(),
        np.asarray(b.torsion_n).tolist(),
        np.asarray(b.torsion_phase).tolist(),
        np.asarray(b.torsion_k).tolist(),
    ):
        out.append(
            f'        <Torsion k="{k!r}" p1="{i}" p2="{j}" p3="{k_}" p4="{l}"'
            f' periodicity="{int(n)}" phase="{ph!r}"/>'
        )
    out.append("      </Torsions>")
    out.append("    </Force>")
    if nb is not None:
        out.append(
            '    <Force alpha="0" cutoff="1" dispersionCorrection="1" ewaldTolerance=".0005"'
            ' exceptionsUsePeriodic="0" forceGroup="0" includeDirectSpace="1"'
            ' ljAlpha="0" method="0" name="NonbondedForce" nx="0" ny="0" nz="0"'
            ' recipForceGroup="-1" rfDielectric="78.3" switchingDistance="-1"'
            ' type="NonbondedForce" useSwitchingFunction="0" version="4">'
        )
        out.append("      <GlobalParameters/>")
        out.append("      <ParticleOffsets/>")
        out.append("      <ExceptionOffsets/>")
        out.append("      <Particles>")
        charges = np.asarray(nb.charges).tolist()
        sigma = np.asarray(nb.sigma).tolist()
        epsilon = np.asarray(nb.epsilon).tolist()
        for q, s, e in zip(charges, sigma, epsilon):
            out.append(f'        <Particle eps="{e!r}" q="{q!r}" sig="{s!r}"/>')
        out.append("      </Particles>")
        out.append("      <Exceptions>")
        scale_lj = np.asarray(nb.scale_lj)
        scale_coul = np.asarray(nb.scale_coulomb)
        pair_map = {}
        if nb.pair_idx is not None:
            for (i, j), qq, s, e in zip(
                np.asarray(nb.pair_idx).tolist(),
                np.asarray(nb.pair_qq).tolist(),
                np.asarray(nb.pair_sigma).tolist(),
                np.asarray(nb.pair_epsilon).tolist(),
            ):
                pair_map[(min(i, j), max(i, j))] = (qq, s, e)
        for i in range(ff.n_atoms):
            for j in range(i + 1, ff.n_atoms):
                full = scale_lj[i, j] == 1.0 and scale_coul[i, j] == 1.0
                if full and (i, j) not in pair_map:
                    continue
                # fold fractional in-matrix scales (amber 1-4 fudges kept in
                # the dense matrices) into an explicit exception
                qq = float(scale_coul[i, j]) * charges[i] * charges[j]
                s = 0.5 * (sigma[i] + sigma[j])
                e = float(scale_lj[i, j]) * math.sqrt(epsilon[i] * epsilon[j])
                if (i, j) in pair_map:
                    qq, s, e = pair_map[(i, j)]
                out.append(
                    f'        <Exception eps="{e!r}" p1="{i}" p2="{j}" q="{qq!r}" sig="{s!r}"/>'
                )
        out.append("      </Exceptions>")
        out.append("    </Force>")
    if ff.gbsa is not None:
        g = ff.gbsa
        out.append(
            f'    <Force cutoff="1" forceGroup="0" method="0" name="GBSAOBCForce"'
            f' soluteDielectric="{float(g.solute_dielectric)!r}"'
            f' solventDielectric="{float(g.solvent_dielectric)!r}"'
            ' surfaceAreaEnergy="2.25936" type="GBSAOBCForce" version="1">'
        )
        out.append("      <Particles>")
        for q, r, s in zip(
            np.asarray(g.charges).tolist(),
            np.asarray(g.radii).tolist(),
            np.asarray(g.scales).tolist(),
        ):
            out.append(f'        <Particle q="{q!r}" r="{r!r}" scale="{s!r}"/>')
        out.append("      </Particles>")
        out.append("    </Force>")
    out.append("  </Forces>")
    out.append("</System>")
    return "\n".join(out)


# ---------------------------------------------------------------------------
# Amber prmtop
# ---------------------------------------------------------------------------

_AMBER_CHARGE_UNIT = 18.2223  # prmtop charges are q * sqrt(k_e) in kcal units
_KCAL = 4.184


def _parse_prmtop_sections(text: str):
    """Split a prmtop into {FLAG: [raw tokens]} honoring FORMAT widths."""
    sections = {}
    flag = None
    fmt_width = None
    fmt_kind = None
    for line in text.splitlines():
        if line.startswith("%FLAG"):
            flag = line.split()[1]
            sections[flag] = []
            fmt_width = None
        elif line.startswith("%FORMAT"):
            # e.g. %FORMAT(10I8), %FORMAT(5E16.8), %FORMAT(20a4)
            spec = line[line.index("(") + 1 : line.rindex(")")]
            num = ""
            for ch in spec:
                if ch.isdigit():
                    num += ch
                else:
                    break
            kind = spec[len(num)]
            width = ""
            for ch in spec[len(num) + 1 :]:
                if ch.isdigit():
                    width += ch
                else:
                    break
            fmt_width = int(width)
            fmt_kind = kind.lower()
        elif line.startswith("%"):
            continue
        elif flag is not None and fmt_width:
            # fixed-width split (tokens can run together for a4 fields)
            row = [
                line[i : i + fmt_width]
                for i in range(0, len(line.rstrip("\n")), fmt_width)
            ]
            vals = [t for t in (s.strip() for s in row) if t != ""]
            if fmt_kind in ("i",):
                sections[flag].extend(int(v) for v in vals)
            elif fmt_kind in ("e", "f"):
                sections[flag].extend(float(v) for v in vals)
            else:
                sections[flag].extend(vals)
    return sections


def forcefield_from_prmtop(
    source,
    temperature: float = 300.0,
    two_event_dims: bool = False,
) -> ClassicalForceField:
    """Parse an Amber prmtop (AmberTools LEaP/parmed output) into a
    ``ClassicalForceField``.

    Exact conversions: charges / 18.2223 -> e; bond E = k_amber (r-r0)^2 ->
    our k = 2 k_amber (kcal->kJ, A->nm); dihedral 1-4 pairs use the
    per-dihedral SCEE/SCNB factors and the type-pair A/B coefficients
    (explicit pair terms, so off-diagonal LJ edits import exactly);
    exclusions come from the file's own EXCLUDED_ATOMS_LIST.
    """
    s = _parse_prmtop_sections(_read_text(source))
    ptr = s["POINTERS"]
    natom, ntypes = ptr[0], ptr[1]

    charges = np.asarray(s["CHARGE"][:natom]) / _AMBER_CHARGE_UNIT
    type_idx = np.asarray(s["ATOM_TYPE_INDEX"][:natom], dtype=np.int64) - 1
    nb_parm = np.asarray(s["NONBONDED_PARM_INDEX"], dtype=np.int64)
    acoef = np.asarray(s["LENNARD_JONES_ACOEF"])
    bcoef = np.asarray(s["LENNARD_JONES_BCOEF"])

    def ab_for(ti, tj):
        k = nb_parm[ntypes * ti + tj] - 1
        if k < 0:  # 10-12 hydrogen-bond types are obsolete in ff99SB-era files
            raise ValueError("10-12 (HBOND) nonbonded types are not supported")
        return acoef[k], bcoef[k]

    def sig_eps(a, b_):
        if a == 0.0 or b_ == 0.0:
            return 0.1, 0.0  # typeless H (HO/HW): zero epsilon, dummy sigma
        sig6 = a / b_
        sigma = sig6 ** (1.0 / 6.0) / 10.0  # A -> nm
        eps = (b_ * b_ / (4.0 * a)) * _KCAL
        return sigma, eps

    per_atom = [sig_eps(*ab_for(t, t)) for t in type_idx]
    sigma = np.asarray([p[0] for p in per_atom])
    epsilon = np.asarray([p[1] for p in per_atom])

    # bonds: amber E = k (r - r0)^2 -> ours E = K/2 (...)^2, K = 2k
    bond_k_tab = np.asarray(s["BOND_FORCE_CONSTANT"])
    bond_r_tab = np.asarray(s["BOND_EQUIL_VALUE"])
    bond_rows = []
    for arr_name in ("BONDS_INC_HYDROGEN", "BONDS_WITHOUT_HYDROGEN"):
        rec = s.get(arr_name, [])
        for off in range(0, len(rec), 3):
            i, j, t = rec[off] // 3, rec[off + 1] // 3, rec[off + 2] - 1
            bond_rows.append(
                (i, j, bond_r_tab[t] / 10.0, 2.0 * bond_k_tab[t] * _KCAL * 100.0)
            )

    angle_k_tab = np.asarray(s["ANGLE_FORCE_CONSTANT"])
    angle_t_tab = np.asarray(s["ANGLE_EQUIL_VALUE"])  # radians already
    angle_rows = []
    for arr_name in ("ANGLES_INC_HYDROGEN", "ANGLES_WITHOUT_HYDROGEN"):
        rec = s.get(arr_name, [])
        for off in range(0, len(rec), 4):
            i, j, k_, t = (
                rec[off] // 3, rec[off + 1] // 3, rec[off + 2] // 3, rec[off + 3] - 1,
            )
            angle_rows.append((i, j, k_, angle_t_tab[t], 2.0 * angle_k_tab[t] * _KCAL))

    dih_k = np.asarray(s["DIHEDRAL_FORCE_CONSTANT"])
    dih_n = np.asarray(s["DIHEDRAL_PERIODICITY"])
    dih_ph = np.asarray(s["DIHEDRAL_PHASE"])  # radians
    n_dih_types = len(dih_k)
    scee = np.asarray(s.get("SCEE_SCALE_FACTOR", [1.2] * n_dih_types))
    scnb = np.asarray(s.get("SCNB_SCALE_FACTOR", [2.0] * n_dih_types))
    torsion_rows = []
    pair_idx, pair_qq, pair_sig, pair_eps = [], [], [], []
    seen_pairs = set()
    for arr_name in ("DIHEDRALS_INC_HYDROGEN", "DIHEDRALS_WITHOUT_HYDROGEN"):
        rec = s.get(arr_name, [])
        for off in range(0, len(rec), 5):
            i = rec[off] // 3
            j = rec[off + 1] // 3
            k_raw, l_raw, t = rec[off + 2], rec[off + 3], rec[off + 4] - 1
            k_ = abs(k_raw) // 3
            l = abs(l_raw) // 3
            if dih_k[t] != 0.0:
                torsion_rows.append((i, j, k_, l, dih_n[t], dih_ph[t], dih_k[t] * _KCAL))
            # third index negative: 1-4 pair already counted (multi-term
            # dihedral); fourth negative: improper (no 1-4 pair at all)
            if k_raw >= 0 and l_raw >= 0:
                key = (min(i, l), max(i, l))
                if key not in seen_pairs:
                    seen_pairs.add(key)
                    a, b_ = ab_for(type_idx[i], type_idx[l])
                    sg, ep = sig_eps(a, b_)
                    sc_e = scee[t] if scee[t] != 0 else 1.2
                    sc_n = scnb[t] if scnb[t] != 0 else 2.0
                    pair_idx.append(key)
                    pair_qq.append(charges[i] * charges[l] / sc_e)
                    pair_sig.append(sg)
                    pair_eps.append(ep / sc_n)

    # exclusions from the file's own list (1-based; a lone 0 means "none")
    scale_lj = np.ones((natom, natom))
    scale_coul = np.ones((natom, natom))
    np.fill_diagonal(scale_lj, 0.0)
    np.fill_diagonal(scale_coul, 0.0)
    n_excl = s["NUMBER_EXCLUDED_ATOMS"][:natom]
    excl = s["EXCLUDED_ATOMS_LIST"]
    pos = 0
    for i in range(natom):
        for e in excl[pos : pos + n_excl[i]]:
            if e > 0:
                j = e - 1
                scale_lj[i, j] = scale_lj[j, i] = 0.0
                scale_coul[i, j] = scale_coul[j, i] = 0.0
        pos += n_excl[i]
    # 1-4 pairs are part of the exclusion list; their interaction comes from
    # the explicit pair terms built above

    bonded = _bonded_from_rows(bond_rows, angle_rows, torsion_rows)
    nonbonded = NonbondedTerms(
        charges=charges,
        sigma=sigma,
        epsilon=epsilon,
        scale_lj=scale_lj,
        scale_coulomb=scale_coul,
        pair_idx=np.asarray(pair_idx, dtype=np.int64).reshape(-1, 2),
        pair_qq=np.asarray(pair_qq),
        pair_sigma=np.asarray(pair_sig),
        pair_epsilon=np.asarray(pair_eps),
    )
    return ClassicalForceField(
        n_atoms=natom,
        bonded=bonded,
        nonbonded=nonbonded,
        temperature=temperature,
        two_event_dims=two_event_dims,
    )
