"""GBSA/OBC implicit solvent: Born-radius limits, burial, solvation physics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bgflow_tpu.energies.forcefield import COULOMB_CONSTANT
from bgflow_tpu.energies.gbsa import (
    GBSATerms,
    _DIELECTRIC_OFFSET,
    born_radii,
    gbsa_energy,
)
from bgflow_tpu.energies.ala2 import build_ala2_forcefield, ALA2_REFERENCE_XYZ
import bgflow_tpu as bg
from tests.conftest import assert_close


def _single_ion(q=1.0, radius=0.15):
    return GBSATerms(
        charges=np.array([q]), radii=np.array([radius]), scales=np.array([0.8])
    )


def test_isolated_atom_born_radius():
    terms = _single_ion()
    x = jnp.zeros((1, 1, 3))
    b = born_radii(x, terms)
    # no neighbors -> Born radius equals the reduced intrinsic radius
    assert_close(b[0, 0], 0.15 - _DIELECTRIC_OFFSET, 1e-6)


def test_isolated_ion_born_energy():
    """Self energy matches the exact Born formula for an isolated ion."""
    q, radius = 1.0, 0.15
    terms = _single_ion(q, radius)
    x = jnp.zeros((1, 1, 3))
    b = float(born_radii(x, terms)[0, 0])
    expected_pol = -0.5 * COULOMB_CONSTANT * (1.0 - 1.0 / 78.5) * q**2 / b
    e = float(gbsa_energy(x, terms)[0])
    # subtract the ACE surface term to isolate the polarization part
    sa = 28.3919551 * (radius + 0.14) ** 2 * (radius / b) ** 6
    assert_close(e - sa, expected_pol, 1e-4)


def test_burial_increases_born_radius():
    """Surrounding an atom with neighbors descreen it -> larger Born radius."""
    terms = GBSATerms(
        charges=np.zeros(7),
        radii=np.full(7, 0.15),
        scales=np.full(7, 0.8),
    )
    # central atom alone vs surrounded by an octahedron of neighbors
    center = jnp.zeros((1, 7, 3)).at[0, 1:, :].set(100.0)  # neighbors far away
    b_free = born_radii(center, terms)[0, 0]
    def octa(d):
        return jnp.asarray([
            [0, 0, 0], [d, 0, 0], [-d, 0, 0], [0, d, 0],
            [0, -d, 0], [0, 0, d], [0, 0, -d],
        ])[None]

    b_03 = born_radii(octa(0.3), terms)[0, 0]
    b_02 = born_radii(octa(0.2), terms)[0, 0]
    assert float(b_03) > float(b_free) * 1.02
    # closer neighbors bury more
    assert float(b_02) > float(b_03)


def test_opposite_charges_screened_in_solvent():
    """GB reduces the attraction of an ion pair (solvent screening):
    the polarization energy of a +/- pair is positive (destabilizes the
    vacuum Coulomb attraction) and decays with distance."""
    terms = GBSATerms(
        charges=np.array([1.0, -1.0]), radii=np.full(2, 0.15), scales=np.full(2, 0.8)
    )
    def pol(r):
        x = jnp.asarray([[[0, 0, 0], [r, 0, 0]]], dtype=jnp.float64)
        return float(gbsa_energy(x, terms)[0])
    # cross term: -0.5 k (1 - 1/78.5) * 2 q1 q2 / f_gb > 0 for opposite signs
    e_near, e_far = pol(0.3), pol(3.0)
    self_e = pol(1000.0)
    assert e_near - self_e > 0
    assert e_near - self_e > e_far - self_e


def test_mbondi2_per_type_radii():
    """Real mbondi2 is per-type: H bonded to N gets 0.13 nm, every other H
    0.12 nm (the radii OpenMM's amber99_obc ala2 system assigns — the
    reference's implicit-solvent configuration)."""
    from bgflow_tpu.energies.ala2 import ALA2_ATOMS, ALA2_BONDS
    from bgflow_tpu.energies.gbsa import gbsa_terms_from_topology

    terms = gbsa_terms_from_topology(ALA2_ATOMS, ALA2_BONDS)
    names = [name for name, _, _ in ALA2_ATOMS]
    # the two amide hydrogens of ala2 are the atoms literally named "H"
    for idx, name in enumerate(names):
        if name == "H":
            assert terms.radii[idx] == pytest.approx(0.13)
        elif name.startswith("H"):
            assert terms.radii[idx] == pytest.approx(0.12)
    # exactly 2 amide hydrogens in ACE-ALA-NME
    assert int(np.sum(terms.radii == 0.13)) == 2


def test_unmapped_element_raises():
    from bgflow_tpu.energies.gbsa import gbsa_terms_from_topology

    with pytest.raises(ValueError, match="no GB .* radius"):
        gbsa_terms_from_topology([("XX1", "XX", 0.0)], np.zeros((0, 2)))


def test_obc2_independent_transcription():
    """Pin gbsa_energy against an independent scalar transcription of the
    OBC-II equations (Onufriev, Bashford & Case 2004: HCT descreening
    integral eq. 9, tanh rescaling eq. 6, still-equation polarization, ACE
    surface term) written in plain Python floats — a second, code-path-
    independent derivation from the published formulas."""
    import math

    # 3 atoms at hand-picked positions/parameters (an N-H-O-like triangle)
    pos = [(0.0, 0.0, 0.0), (0.10, 0.02, -0.01), (0.15, 0.25, 0.05)]
    radii = [0.155, 0.13, 0.15]
    scales = [0.79, 0.85, 0.85]
    charges = [-0.4157, 0.2719, -0.5679]
    off, alpha, beta, gamma = 0.009, 1.0, 0.8, 4.85

    def dist(a, b):
        return math.sqrt(sum((pa - pb) ** 2 for pa, pb in zip(a, b)))

    born = []
    for i in range(3):
        rho_i = radii[i] - off
        s = 0.0
        for j in range(3):
            if j == i:
                continue
            r = dist(pos[i], pos[j])
            srj = scales[j] * (radii[j] - off)
            if rho_i >= r + srj:
                continue
            L = max(abs(r - srj), rho_i)
            U = r + srj
            term = (
                1.0 / L
                - 1.0 / U
                + r / 4.0 * (1.0 / U**2 - 1.0 / L**2)
                + 1.0 / (2.0 * r) * math.log(L / U)
                + srj**2 / (4.0 * r) * (1.0 / L**2 - 1.0 / U**2)
            )
            if rho_i < srj - r:
                term += 2.0 * (1.0 / rho_i - 1.0 / L)
            s += term
        psi = 0.5 * s * rho_i
        inv_b = 1.0 / rho_i - math.tanh(alpha * psi - beta * psi**2 + gamma * psi**3) / radii[i]
        born.append(1.0 / inv_b)

    pref = -0.5 * float(COULOMB_CONSTANT) * (1.0 - 1.0 / 78.5)
    e_pol = 0.0
    for i in range(3):
        for j in range(3):
            if i == j:
                f = born[i]
            else:
                r2 = dist(pos[i], pos[j]) ** 2
                bb = born[i] * born[j]
                f = math.sqrt(r2 + bb * math.exp(-r2 / (4.0 * bb)))
            e_pol += pref * charges[i] * charges[j] / f
    e_np = sum(
        28.3919551 * (radii[i] + 0.14) ** 2 * (radii[i] / born[i]) ** 6 for i in range(3)
    )
    expected = e_pol + e_np

    terms = GBSATerms(
        charges=np.asarray(charges), radii=np.asarray(radii), scales=np.asarray(scales)
    )
    x = jnp.asarray(pos, dtype=jnp.float64)[None]
    b = born_radii(x, terms, eps=0.0)
    np.testing.assert_allclose(np.asarray(b[0]), born, rtol=1e-10)
    np.testing.assert_allclose(float(gbsa_energy(x, terms, eps=0.0)[0]), expected, rtol=1e-10)


@pytest.mark.slow
def test_ala2_with_implicit_solvent(key):
    ff_vac = build_ala2_forcefield()
    ff_gb = build_ala2_forcefield(implicit_solvent=True)
    x = jnp.asarray(ALA2_REFERENCE_XYZ, dtype=jnp.float64).reshape(1, -1)
    u_vac = float(ff_vac.energy(x)[0])
    u_gb = float(ff_gb.energy(x)[0])
    # solvation stabilizes the polar peptide: GB polarization is negative
    assert u_gb < u_vac
    assert jnp.isfinite(u_gb)
    # forces remain finite with the GB term
    f = ff_gb.force_kj(x)
    assert jnp.all(jnp.isfinite(f))
    # batch consistency
    xs = x + 0.005 * jax.random.normal(key, (8, 66))
    u = ff_gb.energy(xs)
    assert u.shape == (8,) and jnp.all(jnp.isfinite(u))


@pytest.mark.slow
def test_ala2_implicit_solvent_flagship_trains(key):
    """GBSA in the end-to-end flagship: build the spline BG against the
    implicit-solvent target and take mixed NLL/KL training steps (reverse-KL
    gradients flow through the Born-radius kernel)."""
    import numpy as np
    from bgflow_tpu.models.ala2 import generate_ala2_data, make_ala2_generator

    data = generate_ala2_data(key, n_samples=256, n_chains=16, n_equilibration=200)
    gen = make_ala2_generator(
        np.asarray(data), hidden=(16,), num_bins=4, implicit_solvent=True
    )
    params = gen.init(jax.random.PRNGKey(1))
    trainer = bg.KLTrainer(gen)
    step = trainer.make_train_step(batchsize_likelihood=64, batchsize_energy=64)
    opt_state = trainer.init(params)
    d = jnp.asarray(data)
    losses = []
    for i in range(8):
        k1, k2 = jax.random.split(jax.random.fold_in(key, i))
        idx = jax.random.randint(k1, (64,), 0, d.shape[0])
        params, opt_state, m = step(params, opt_state, k2, (d[idx],))
        losses.append(float(m["loss"]))
        assert not bool(m["skipped"])
    assert all(np.isfinite(l) for l in losses)


def test_peptide_implicit_solvent_matches_ala2_terms():
    """build_polyala_forcefield(1, implicit_solvent=True) == vacuum + the
    ala2 GBSA term (peptide_gbsa_terms generalizes ala2_gbsa_terms)."""
    from bgflow_tpu.energies.gbsa import ala2_gbsa_terms, peptide_gbsa_terms
    from bgflow_tpu.energies.peptide import (
        build_peptide_topology,
        build_polyala_forcefield,
        polyala_reference_xyz,
    )

    atoms, bonds = build_peptide_topology(["ACE", "ALA", "NME"])
    t_gen, t_ala2 = peptide_gbsa_terms(atoms, bonds), ala2_gbsa_terms()
    np.testing.assert_allclose(t_gen.charges, t_ala2.charges)
    np.testing.assert_allclose(t_gen.radii, t_ala2.radii)
    np.testing.assert_allclose(t_gen.scales, t_ala2.scales)

    ff_v = build_polyala_forcefield(1)
    ff_s = build_polyala_forcefield(1, implicit_solvent=True)
    x = jnp.asarray(polyala_reference_xyz(1), jnp.float32).reshape(1, -1)
    x = x + 0.002 * jax.random.normal(jax.random.PRNGKey(3), x.shape)
    expected = ff_v.energy(x) + gbsa_energy(x.reshape(1, -1, 3), t_ala2) / ff_v.kt
    assert_close(ff_s.energy(x), expected, 1e-4)
    g = jax.grad(lambda v: jnp.sum(ff_s.energy(v)))(x)
    assert bool(jnp.isfinite(g).all())
