"""Cell-list cutoff nonbonded vs brute-force references."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bgflow_tpu.energies.neighborlist import (
    CellGrid,
    CutoffNonbondedEnergy,
    CutoffNonbondedTerms,
    build_cell_table,
    candidate_indices,
    exclusions_from_bonds,
    make_cell_grid,
)
from bgflow_tpu.energies.forcefield import COULOMB_CONSTANT


def _random_system(n_atoms, box, seed=0, chain=True):
    rng = np.random.RandomState(seed)
    x = rng.uniform(0, box, size=(n_atoms, 3))
    charges = rng.uniform(-0.3, 0.3, n_atoms)
    charges -= charges.mean()
    sigma = rng.uniform(0.25, 0.35, n_atoms)
    epsilon = rng.uniform(0.3, 0.8, n_atoms)
    bonds = (
        np.stack([np.arange(n_atoms - 1), np.arange(1, n_atoms)], axis=1)
        if chain
        else np.zeros((0, 2), dtype=np.int64)
    )
    return x, charges, sigma, epsilon, bonds


def _brute_force(x, terms, cutoff, periodic_box=None, reaction_field=False):
    """Truncated LJ+Coulomb over all pairs (numpy, minimum image if box)."""
    n = len(x)
    excl = {(a, int(b)) for a in range(n) for b in np.asarray(terms.excl_idx[a]) if b < n}
    krf = 1.0 / (2 * cutoff**3)
    crf = 3.0 / (2 * cutoff)
    e = 0.0
    for i in range(n):
        for j in range(i + 1, n):
            if (i, j) in excl or (j, i) in excl:
                continue
            d = x[i] - x[j]
            if periodic_box is not None:
                d = d - periodic_box * np.round(d / periodic_box)
            r = np.sqrt(np.sum(d * d) + 1e-14)
            if r >= cutoff:
                continue
            sig = 0.5 * (terms.sigma[i] + terms.sigma[j])
            epsij = np.sqrt(terms.epsilon[i] * terms.epsilon[j])
            s6 = (sig / r) ** 6
            e += 4 * epsij * (s6 * s6 - s6)
            qq = COULOMB_CONSTANT * terms.charges[i] * terms.charges[j]
            if reaction_field:
                e += qq * (1 / r + krf * r * r - crf)
            else:
                e += qq / r
    if terms.pair_idx is not None:
        for (i, j), qq, sig, epsij in zip(
            np.asarray(terms.pair_idx),
            np.asarray(terms.pair_qq),
            np.asarray(terms.pair_sigma),
            np.asarray(terms.pair_epsilon),
        ):
            d = x[i] - x[j]
            if periodic_box is not None:
                d = d - periodic_box * np.round(d / periodic_box)
            r = np.sqrt(np.sum(d * d) + 1e-14)
            s6 = (sig / r) ** 6
            e += 4 * epsij * (s6 * s6 - s6) + COULOMB_CONSTANT * qq / r
    return e


def test_cell_table_bins_every_atom():
    x, *_ = _random_system(100, 3.0, seed=1)
    grid = make_cell_grid([0, 0, 0], [3, 3, 3], cutoff=1.0, capacity=64)
    table, overflow = build_cell_table(jnp.asarray(x), grid)
    assert not bool(overflow)
    binned = np.asarray(table).ravel()
    assert sorted(binned[binned < 100]) == list(range(100))


def test_candidates_contain_all_cutoff_pairs():
    x, *_ = _random_system(150, 3.0, seed=2)
    grid = make_cell_grid([0, 0, 0], [3, 3, 3], cutoff=0.8, capacity=64)
    cand, overflow = candidate_indices(jnp.asarray(x), grid)
    assert not bool(overflow)
    cand = np.asarray(cand)
    d = np.linalg.norm(x[:, None] - x[None, :], axis=-1)
    for i in range(150):
        within = set(np.nonzero((d[i] < 0.8) & (np.arange(150) != i))[0])
        assert within <= set(cand[i]), f"atom {i} missing neighbors"


def test_open_boundary_matches_brute_force():
    n = 120
    x, q, s, e, bonds = _random_system(n, 2.5, seed=3)
    terms = exclusions_from_bonds(n, bonds, q, s, e)
    grid = make_cell_grid([0, 0, 0], [2.5, 2.5, 2.5], cutoff=0.9, capacity=96)
    en = CutoffNonbondedEnergy(n, terms, grid, cutoff=0.9, reaction_field=False)
    got = float(en.potential_energy(jnp.asarray(x.reshape(1, -1)))[0])
    want = _brute_force(x, terms, 0.9)
    assert got == pytest.approx(want, rel=1e-5)


def test_atoms_outside_binning_box_not_missed():
    # contraction-clamp correctness: shift atoms so some leave the box
    n = 80
    x, q, s, e, bonds = _random_system(n, 2.0, seed=4)
    x = x + np.array([1.5, -0.7, 0.0])  # some atoms now outside [0, 2]^3
    terms = exclusions_from_bonds(n, bonds, q, s, e)
    grid = make_cell_grid([0, 0, 0], [2.0, 2.0, 2.0], cutoff=0.7, capacity=96)
    en = CutoffNonbondedEnergy(n, terms, grid, cutoff=0.7, reaction_field=False)
    got = float(en.potential_energy(jnp.asarray(x.reshape(1, -1)))[0])
    want = _brute_force(x, terms, 0.7)
    assert got == pytest.approx(want, rel=1e-5)


def test_periodic_minimum_image_matches_brute_force():
    n = 100
    box = 3.0
    x, q, s, e, bonds = _random_system(n, box, seed=5)
    terms = exclusions_from_bonds(n, bonds, q, s, e)
    grid = make_cell_grid([0, 0, 0], [box] * 3, cutoff=0.9, capacity=96, periodic=True)
    en = CutoffNonbondedEnergy(n, terms, grid, cutoff=0.9)
    assert en.reaction_field  # periodic default
    got = float(en.potential_energy(jnp.asarray(x.reshape(1, -1)))[0])
    want = _brute_force(x, terms, 0.9, periodic_box=np.full(3, box), reaction_field=True)
    assert got == pytest.approx(want, rel=1e-5)


def test_periodic_wrapped_coordinates_invariant():
    n = 60
    box = 3.0
    x, q, s, e, _ = _random_system(n, box, seed=6, chain=False)
    terms = exclusions_from_bonds(n, np.zeros((0, 2), int), q, s, e)
    grid = make_cell_grid([0, 0, 0], [box] * 3, cutoff=0.9, capacity=96, periodic=True)
    en = CutoffNonbondedEnergy(n, terms, grid, cutoff=0.9)
    e0 = float(en.potential_energy(jnp.asarray(x.reshape(1, -1)))[0])
    shift = np.array([1.2, -2.1, 0.4])
    e1 = float(en.potential_energy(jnp.asarray((x + shift).reshape(1, -1)))[0])
    assert e1 == pytest.approx(e0, rel=1e-5)


def test_overflow_flag_and_poisoned_energy():
    n = 40
    x = np.zeros((n, 3)) + 0.01 * np.arange(n)[:, None]  # all in one cell
    q = np.zeros(n)
    s = np.full(n, 0.3)
    e = np.full(n, 0.5)
    terms = exclusions_from_bonds(n, np.zeros((0, 2), int), q, s, e)
    grid = make_cell_grid([0, 0, 0], [3, 3, 3], cutoff=1.0, capacity=8)
    en = CutoffNonbondedEnergy(n, terms, grid, cutoff=1.0, reaction_field=False)
    assert en.check_capacity(x.reshape(1, -1))
    assert not np.isfinite(float(en.potential_energy(jnp.asarray(x.reshape(1, -1)))[0]))


def test_gradients_finite_and_match_fd():
    n = 50
    x, q, s, e, bonds = _random_system(n, 2.0, seed=7)
    terms = exclusions_from_bonds(n, bonds, q, s, e)
    grid = make_cell_grid([0, 0, 0], [2.0] * 3, cutoff=0.8, capacity=96)
    en = CutoffNonbondedEnergy(n, terms, grid, cutoff=0.8, reaction_field=False, shift=True)
    xf = jnp.asarray(x.reshape(1, -1))
    g = jax.grad(lambda xx: jnp.sum(en.energy(xx)))(xf)
    assert np.all(np.isfinite(np.asarray(g)))
    # finite-difference check on a few coordinates (shifted LJ is continuous
    # at the cutoff, so central differences converge)
    f = lambda xx: float(jnp.sum(en.energy(xx)))
    rng = np.random.RandomState(0)
    for idx in rng.choice(n * 3, 5, replace=False):
        h = 1e-4
        xp = np.array(x.reshape(-1))
        xm = xp.copy()
        xp[idx] += h
        xm[idx] -= h
        fd = (f(jnp.asarray(xp.reshape(1, -1))) - f(jnp.asarray(xm.reshape(1, -1)))) / (2 * h)
        assert fd == pytest.approx(float(g[0, idx]), rel=2e-3, abs=2e-3)


def test_batched_vmap_consistency():
    n = 64
    terms_list = _random_system(n, 2.0, seed=8)
    x, q, s, e, bonds = terms_list
    terms = exclusions_from_bonds(n, bonds, q, s, e)
    grid = make_cell_grid([0, 0, 0], [2.0] * 3, cutoff=0.8, capacity=96)
    en = CutoffNonbondedEnergy(n, terms, grid, cutoff=0.8, reaction_field=False)
    rng = np.random.RandomState(1)
    batch = np.stack([x + 0.01 * rng.randn(*x.shape) for _ in range(4)])
    eb = np.asarray(en.potential_energy(jnp.asarray(batch.reshape(4, -1))))
    for b in range(4):
        e1 = float(en.potential_energy(jnp.asarray(batch[b].reshape(1, -1)))[0])
        assert eb[b] == pytest.approx(e1, rel=1e-6)


def test_polyala_cutoff_forcefield_matches_dense():
    """build_polyala_forcefield(cutoff=big) == the dense path on compact
    conformations (every pair inside the cutoff; identical 1-4 exceptions)."""
    from bgflow_tpu.energies.peptide import build_polyala_forcefield, polyala_reference_xyz

    n_res = 3
    ff_dense = build_polyala_forcefield(n_res)
    ff_cut = build_polyala_forcefield(n_res, cutoff=2.0)
    assert ff_cut.nonbonded is None and ff_cut.nonbonded_cutoff is not None
    ref = polyala_reference_xyz(n_res).reshape(1, -1)
    rng = np.random.RandomState(3)
    batch = jnp.asarray(
        np.concatenate([ref + 0.01 * rng.randn(4, ref.shape[-1]) for _ in range(1)]),
        jnp.float64,
    )
    e_dense = np.asarray(ff_dense.potential_energy(batch))
    e_cut = np.asarray(ff_cut.potential_energy(batch))
    # reaction-field off for open boundaries; plain truncation at 2 nm sees
    # every pair of the ~1.2 nm chain -> exact agreement
    np.testing.assert_allclose(e_cut, e_dense, rtol=5e-5)
    # forces agree too (the MD/HMC path uses grad of the total)
    g_dense = np.asarray(ff_dense.force_kj(batch))
    g_cut = np.asarray(ff_cut.force_kj(batch))
    np.testing.assert_allclose(g_cut, g_dense, rtol=1e-3, atol=5e-2)
