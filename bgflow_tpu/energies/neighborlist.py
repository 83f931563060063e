"""O(N) cutoff nonbonded energies via fixed-capacity cell lists.

The dense ``(N, N)`` pair tensor in ``forcefield.py`` is optimal for
peptide-scale systems, but its memory/FLOP cost grows as N^2.  This module is
the documented scale-up path (systems beyond ~2k atoms, e.g. solvated boxes):
spatial binning into cells of edge >= cutoff, then masked dense interactions
against the 27 neighboring cells.

Reference capability anchor: the reference delegates large systems to OpenMM
(``bgflow/distribution/energy/openmm.py``), whose CPU/CUDA platforms use
Verlet neighbor lists.  A pointer-chasing neighbor list is hostile to XLA, so
the TPU-native design is different:

* **Static shapes everywhere.**  The cell grid (``n_cells`` per axis) and the
  per-cell capacity ``K`` are fixed at construction; atoms scatter into a
  ``(n_cells, K)`` table padded with a sentinel.  Overflow is detected and
  reported through ``overflow_flag`` (energy remains finite but approximate;
  callers can re-bin with larger capacity), never a dynamic reallocation.
* **Contraction binning for open boundaries.**  Atoms are clamped into the
  (fixed) binning box before cell assignment.  ``clamp`` is 1-Lipschitz per
  axis, so any pair within the cutoff stays within the cutoff after clamping
  and is never missed — stray atoms cost extra masked candidates, not
  correctness.
* **Masked dense tiles, not gathers per pair.**  Each atom reads the 27
  candidate cells as one ``(27 K,)`` index vector; energies are computed on
  the full ``(N, 27 K)`` candidate block with distance/sentinel/exclusion
  masks.  This keeps the inner loop a fused VPU pass, exactly like the dense
  kernel, just on a bounded candidate set.
* **Exclusions as short per-atom lists** (``(N, E)``), not ``(N, N)`` scale
  matrices — the scale-matrix representation is itself O(N^2).  1-4 pairs are
  evaluated exactly via the explicit exception-pair path (same convention as
  ``NonbondedTerms.pair_idx``).

Periodic boundary conditions (orthorhombic) use the minimum-image convention;
the box must be at least 3 cells per axis so the 27-cell stencil never
double-counts an image.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .base import Energy
from .forcefield import COULOMB_CONSTANT, KB_KJ_PER_MOL_K


class CellGrid(NamedTuple):
    """Static description of the binning grid (all Python ints/floats)."""

    lower: tuple  # (3,) box lower corner, nm
    cell_size: tuple  # (3,) cell edge per axis, >= cutoff
    n_cells: tuple  # (3,) cells per axis
    capacity: int  # max atoms per cell
    periodic: bool


def make_cell_grid(
    box_lower,
    box_upper,
    cutoff: float,
    capacity: int,
    periodic: bool = False,
) -> CellGrid:
    """Choose a cell grid for a (fixed) binning box.

    For ``periodic=True`` the box IS the periodic cell and the grid divides it
    exactly; cells then have edge >= cutoff (required for a 27-stencil to see
    all images once).  For open boundaries the box is just the binning window
    (atoms outside are clamped in; see module docstring).
    """
    lower = np.asarray(box_lower, dtype=np.float64)
    upper = np.asarray(box_upper, dtype=np.float64)
    extent = upper - lower
    if np.any(extent <= 0):
        raise ValueError("box_upper must exceed box_lower on every axis")
    n_cells = np.maximum(np.floor(extent / cutoff).astype(int), 1)
    if periodic:
        if np.any(n_cells < 3):
            raise ValueError(
                "periodic box must fit >= 3 cells of edge >= cutoff per axis "
                f"(got {tuple(n_cells)}); shrink the cutoff or grow the box"
            )
    cell_size = extent / n_cells
    return CellGrid(
        lower=tuple(float(v) for v in lower),
        cell_size=tuple(float(v) for v in cell_size),
        n_cells=tuple(int(v) for v in n_cells),
        capacity=int(capacity),
        periodic=bool(periodic),
    )


def _cell_ids(x, grid: CellGrid):
    """Flat cell index per atom; x: (N, 3)."""
    lower = jnp.asarray(grid.lower, dtype=x.dtype)
    size = jnp.asarray(grid.cell_size, dtype=x.dtype)
    n = jnp.asarray(grid.n_cells)
    rel = (x - lower) / size
    if grid.periodic:
        idx = jnp.mod(jnp.floor(rel).astype(jnp.int32), n)
    else:
        idx = jnp.clip(jnp.floor(rel).astype(jnp.int32), 0, n - 1)
    return (idx[:, 0] * n[1] + idx[:, 1]) * n[2] + idx[:, 2], idx


def build_cell_table(x, grid: CellGrid):
    """Scatter atom indices into a (n_cells_total, K) table.

    Returns ``(table, overflow)``: table entries are atom indices, padded with
    the sentinel ``N``; ``overflow`` is True if any cell received more than
    ``K`` atoms (those atoms are dropped from the table — detect and re-bin).
    """
    n_atoms = x.shape[0]
    n_total = int(np.prod(grid.n_cells))
    k = grid.capacity
    cell_id, _ = _cell_ids(x, grid)
    # stable sort by cell id; rank within cell = position - first position
    order = jnp.argsort(cell_id)
    sorted_ids = cell_id[order]
    # first occurrence index of each sorted id via searchsorted on itself
    first = jnp.searchsorted(sorted_ids, sorted_ids, side="left")
    rank = jnp.arange(n_atoms, dtype=jnp.int32) - first.astype(jnp.int32)
    overflow = jnp.any(rank >= k)
    slot = sorted_ids * k + jnp.minimum(rank, k - 1)
    # later writes win on duplicate slots, but only under overflow (flagged)
    table = jnp.full((n_total * k,), n_atoms, dtype=jnp.int32)
    table = table.at[slot].set(order.astype(jnp.int32), mode="drop")
    return table.reshape(n_total, k), overflow


def _stencil_offsets():
    o = np.arange(-1, 2)
    return np.stack(np.meshgrid(o, o, o, indexing="ij"), axis=-1).reshape(27, 3)


def candidate_indices(x, grid: CellGrid):
    """Per-atom candidate neighbor indices, shape (N, 27*K), sentinel-padded.

    Also returns the overflow flag from the underlying cell table.
    """
    table, overflow = build_cell_table(x, grid)
    _, idx3 = _cell_ids(x, grid)
    n = np.asarray(grid.n_cells)
    offs = _stencil_offsets()  # (27, 3)
    neigh = idx3[:, None, :] + offs[None, :, :]  # (N, 27, 3)
    if grid.periodic:
        neigh = jnp.mod(neigh, jnp.asarray(n))
        valid = jnp.ones(neigh.shape[:2], dtype=bool)
    else:
        valid = jnp.all((neigh >= 0) & (neigh < jnp.asarray(n)), axis=-1)
        neigh = jnp.clip(neigh, 0, jnp.asarray(n) - 1)
    flat = (neigh[..., 0] * n[1] + neigh[..., 1]) * n[2] + neigh[..., 2]
    cand = table[flat]  # (N, 27, K)
    n_atoms = x.shape[0]
    cand = jnp.where(valid[..., None], cand, n_atoms)
    return cand.reshape(n_atoms, -1), overflow


class CutoffNonbondedTerms(NamedTuple):
    charges: np.ndarray  # (N,) e
    sigma: np.ndarray  # (N,) nm
    epsilon: np.ndarray  # (N,) kJ/mol
    excl_idx: np.ndarray  # (N, E) int, sentinel N — pairs with NO interaction
    # explicit exception pairs (1-4 with fudged/custom parameters), exact:
    pair_idx: Optional[np.ndarray] = None  # (P, 2)
    pair_qq: Optional[np.ndarray] = None  # (P,)
    pair_sigma: Optional[np.ndarray] = None  # (P,)
    pair_epsilon: Optional[np.ndarray] = None  # (P,)


def exclusions_from_bonds(
    n_atoms: int,
    bond_idx,
    charges,
    sigma,
    epsilon,
    lj_fudge: float = 0.5,
    coulomb_fudge: float = 1.0 / 1.2,
) -> CutoffNonbondedTerms:
    """Amber-convention terms: exclude 1-2/1-3/1-4; 1-4 as fudged exceptions.

    The O(N)-representation analogue of ``forcefield.exclusion_scales``
    (which builds dense (N, N) matrices).
    """
    adj = [set() for _ in range(n_atoms)]
    for i, j in np.asarray(bond_idx):
        adj[int(i)].add(int(j))
        adj[int(j)].add(int(i))
    excl = [set() for _ in range(n_atoms)]
    pairs14 = set()
    for a in range(n_atoms):
        for b in adj[a]:
            excl[a].add(b)
            for c in adj[b]:
                if c != a:
                    excl[a].add(c)
    for a in range(n_atoms):
        for b in adj[a]:
            for c in adj[b]:
                if c == a:
                    continue
                for d in adj[c]:
                    if d in (a, b) or d == a or d in excl[a]:
                        continue
                    pairs14.add((min(a, d), max(a, d)))
    # 1-4 pairs are excluded from the cutoff sum and handled as exceptions
    for a, d in pairs14:
        excl[a].add(d)
        excl[d].add(a)
    e_max = max((len(s) for s in excl), default=0)
    excl_idx = np.full((n_atoms, max(e_max, 1)), n_atoms, dtype=np.int64)
    for a, s in enumerate(excl):
        for col, b in enumerate(sorted(s)):
            excl_idx[a, col] = b
    charges = np.asarray(charges, dtype=np.float64)
    sigma = np.asarray(sigma, dtype=np.float64)
    epsilon = np.asarray(epsilon, dtype=np.float64)
    if pairs14:
        p = np.asarray(sorted(pairs14), dtype=np.int64)
        psig = 0.5 * (sigma[p[:, 0]] + sigma[p[:, 1]])
        peps = lj_fudge * np.sqrt(epsilon[p[:, 0]] * epsilon[p[:, 1]])
        pqq = coulomb_fudge * charges[p[:, 0]] * charges[p[:, 1]]
    else:
        p = np.zeros((0, 2), dtype=np.int64)
        psig = np.zeros((0,))
        peps = np.zeros((0,))
        pqq = np.zeros((0,))
    return CutoffNonbondedTerms(
        charges=charges,
        sigma=sigma,
        epsilon=epsilon,
        excl_idx=excl_idx,
        pair_idx=p,
        pair_qq=pqq,
        pair_sigma=psig,
        pair_epsilon=peps,
    )


class CutoffNonbondedEnergy(Energy):
    """LJ + Coulomb truncated at ``cutoff`` via the cell-list candidate set.

    ``u(x) = U/kT`` for ``x`` of shape ``(B, N*3)`` (nm).  With
    ``shift=True`` the LJ term is shifted to zero at the cutoff (continuous
    energies for MD); ``shift=False`` reproduces plain truncation, which is
    what a cutoff-masked dense sum computes — used by the parity tests.

    Coulomb uses the reaction-field form when ``periodic=True`` (standard for
    cutoff electrostatics in a condensed phase) and plain ``1/r`` truncation
    otherwise.
    """

    def __init__(
        self,
        n_atoms: int,
        terms: CutoffNonbondedTerms,
        grid: CellGrid,
        cutoff: float,
        temperature: float = 300.0,
        shift: bool = False,
        reaction_field: Optional[bool] = None,
        eps: float = 1e-7,
    ):
        super().__init__(n_atoms * 3)
        self.n_atoms = int(n_atoms)
        self.terms = CutoffNonbondedTerms(
            *(None if a is None else jnp.asarray(a) for a in terms)
        )
        self.grid = grid
        self.cutoff = float(cutoff)
        self.temperature = float(temperature)
        self.kt = KB_KJ_PER_MOL_K * self.temperature
        self.shift = bool(shift)
        self.reaction_field = grid.periodic if reaction_field is None else bool(reaction_field)
        self.eps = float(eps)
        # reaction-field constants (conducting boundary, eps_rf -> inf)
        rc = self.cutoff
        self._krf = 1.0 / (2.0 * rc**3)
        self._crf = 3.0 / (2.0 * rc)

    def _min_image(self, diff):
        if not self.grid.periodic:
            return diff
        box = jnp.asarray(
            [n * s for n, s in zip(self.grid.n_cells, self.grid.cell_size)],
            dtype=diff.dtype,
        )
        return diff - box * jnp.round(diff / box)

    def _energy_single(self, x):
        """Potential (kJ/mol) of one configuration x: (N, 3)."""
        t = self.terms
        n = self.n_atoms
        cand, overflow = candidate_indices(x, self.grid)  # (N, C)
        # sentinel row so index n gathers a harmless coordinate
        xp = jnp.concatenate([x, jnp.zeros((1, 3), dtype=x.dtype)], axis=0)
        xc = xp[cand]  # (N, C, 3)
        diff = self._min_image(x[:, None, :] - xc)
        r2 = jnp.sum(diff * diff, axis=-1) + self.eps**2

        iota = jnp.arange(n, dtype=cand.dtype)[:, None]
        mask = (cand < n) & (cand != iota) & (r2 < self.cutoff**2)
        # exclusions: candidate equal to any entry of this atom's short list
        excl = t.excl_idx[:, None, :]  # (N, 1, E)
        mask &= ~jnp.any(cand[:, :, None] == excl, axis=-1)

        r2 = jnp.where(mask, r2, 1.0)
        inv_r = jax.lax.rsqrt(r2)
        sig = 0.5 * (t.sigma[:, None] + t.sigma[cand])
        eps_ij = jnp.sqrt(t.epsilon[:, None] * t.epsilon[cand])
        s2 = (sig * inv_r) ** 2
        s6 = s2 * s2 * s2
        lj = 4.0 * eps_ij * (s6 * s6 - s6)
        if self.shift:
            sc2 = (sig / self.cutoff) ** 2
            sc6 = sc2 * sc2 * sc2
            lj = lj - 4.0 * eps_ij * (sc6 * sc6 - sc6)
        qq = COULOMB_CONSTANT * t.charges[:, None] * t.charges[cand]
        if self.reaction_field:
            coul = qq * (inv_r + self._krf * r2 - self._crf)
        else:
            coul = qq * inv_r
        pair_e = jnp.where(mask, lj + coul, 0.0)
        total = 0.5 * jnp.sum(pair_e)

        if t.pair_idx is not None and t.pair_idx.shape[0] > 0:
            d = self._min_image(x[t.pair_idx[:, 0]] - x[t.pair_idx[:, 1]])
            pr2 = jnp.sum(d * d, axis=-1) + self.eps**2
            pinv = jax.lax.rsqrt(pr2)
            ps2 = (t.pair_sigma * pinv) ** 2
            ps6 = ps2 * ps2 * ps2
            pe = 4.0 * t.pair_epsilon * (ps6 * ps6 - ps6)
            pe = pe + COULOMB_CONSTANT * t.pair_qq * pinv
            total = total + jnp.sum(pe)
        # overflow poisons the energy to +inf rather than silently dropping
        # interactions; re-bin with a larger capacity if this fires
        return jnp.where(overflow, jnp.inf, total)

    def potential_energy(self, x):
        x = x.reshape(x.shape[0], self.n_atoms, 3)
        return jax.vmap(self._energy_single)(x)

    def _energy(self, x):
        return self.potential_energy(x) / self.kt

    def check_capacity(self, x) -> bool:
        """True if any sample overflows the cell capacity (host-side check)."""
        x = jnp.asarray(x).reshape(-1, self.n_atoms, 3)

        def one(xi):
            _, ov = build_cell_table(xi, self.grid)
            return ov

        return bool(jnp.any(jax.vmap(one)(x)))
