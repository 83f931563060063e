"""Template-based poly-alanine topologies, force fields, and generators.

Reference scope: the reference reaches beyond ala2 only via bgmol/OpenMM
topologies; these tests pin the in-repo equivalent to the validated ala2
tables and exercise the generic z-matrix + BG assembly at several chain
lengths."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import assert_close


def test_polyala1_reproduces_ala2():
    """ACE-ALA-NME through the template machinery == the ala2 tables."""
    from bgflow_tpu.energies.ala2 import ALA2_ATOMS, ALA2_BONDS, ALA2_REFERENCE_XYZ, build_ala2_forcefield
    from bgflow_tpu.energies.peptide import build_peptide_topology, build_polyala_forcefield

    atoms, bonds = build_peptide_topology(["ACE", "ALA", "NME"])
    assert atoms == ALA2_ATOMS
    assert set(map(tuple, bonds)) == set(map(tuple, np.asarray(ALA2_BONDS)))
    x = jnp.asarray(
        0.08 * np.random.RandomState(0).randn(8, 66)
        + np.asarray(ALA2_REFERENCE_XYZ).reshape(1, -1)
    )
    u1 = build_ala2_forcefield().energy(x)
    u2 = build_polyala_forcefield(1).energy(x)
    assert_close(u1, u2, 1e-5)


def test_polyala_reference_geometry_reasonable():
    from bgflow_tpu.energies.peptide import build_polyala_forcefield, polyala_reference_xyz

    for n in (1, 3):
        xyz = polyala_reference_xyz(n, minimize_steps=120)
        ff = build_polyala_forcefield(n)
        u = float(ff.energy(jnp.asarray(xyz.reshape(1, -1)))[0])
        assert np.isfinite(u) and u < 50.0 * ff.n_atoms, (n, u)
        d = np.linalg.norm(xyz[:, None] - xyz[None, :], axis=-1)
        np.fill_diagonal(d, 10.0)
        assert d.min() > 0.07, (n, d.min())


def test_polyala_zmatrix_roundtrip(key):
    """The bond-graph z-matrix supports an exact IC round trip at ALA3."""
    from bgflow_tpu.energies.peptide import polyala_reference_xyz, polyala_z_matrix
    from bgflow_tpu.flows.ic import RelativeInternalCoordinateTransformation

    n_res = 3
    z, fixed = polyala_z_matrix(n_res)
    flow = RelativeInternalCoordinateTransformation(z, fixed)
    ref = polyala_reference_xyz(n_res, minimize_steps=50).reshape(1, -1)
    x = jnp.asarray(ref + 0.01 * np.random.RandomState(1).randn(6, ref.shape[-1]))
    ics, dlogp = flow.forward((), (x,))
    (x2,), dlogp_inv = flow.forward((), ics, inverse=True)
    assert_close(x2, x, 2e-4)
    assert_close(dlogp, -dlogp_inv, 1e-2)


@pytest.mark.slow
def test_polyala_generator_end_to_end(key):
    """ALA3 BG: build from short MD data, sample, evaluate, one train step."""
    import bgflow_tpu as bg
    from bgflow_tpu.models.polyala import generate_polyala_data, make_polyala_generator

    n_res = 3
    data = generate_polyala_data(
        key, n_res, n_samples=256, n_chains=16, n_equilibration=200
    )
    assert bool(jnp.all(jnp.isfinite(data)))
    gen = make_polyala_generator(n_res, data, hidden=(32, 32), num_bins=4)
    params = gen.init(jax.random.PRNGKey(1))
    out = gen.sample(params, jax.random.PRNGKey(2), 128, with_log_weights=True)
    assert out.xs[0].shape == (128, data.shape[-1])
    assert bool(jnp.all(jnp.isfinite(out.xs[0])))
    nll = gen.energy(params, jnp.asarray(data[:64]))
    assert bool(jnp.all(jnp.isfinite(nll)))
    trainer = bg.KLTrainer(gen)
    step = trainer.make_train_step(batchsize_likelihood=32, batchsize_energy=32)
    opt = trainer.init(params)
    p2, o2, m = step(params, opt, jax.random.PRNGKey(3), (jnp.asarray(data[:32]),))
    assert np.isfinite(float(m["loss"]))

    # learnable marginal layers: identity at init, trainable thereafter
    gen_m = make_polyala_generator(
        n_res, data, hidden=(32, 32), num_bins=4, learnable_marginals=True
    )
    params_m = gen_m.init(jax.random.PRNGKey(1))
    nll_m = gen_m.energy(params_m, jnp.asarray(data[:64]))
    assert_close(nll_m, nll, 1e-3)
    step_m = bg.KLTrainer(gen_m).make_train_step(
        batchsize_likelihood=32, batchsize_energy=32
    )
    p3, _, m3 = step_m(
        params_m, bg.KLTrainer(gen_m).init(params_m),
        jax.random.PRNGKey(3), (jnp.asarray(data[:32]),),
    )
    assert np.isfinite(float(m3["loss"]))
    # the marginal layers' params received gradient
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), p3, params_m
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0.0

    # residue-autoregressive torsion couplings: exact inverse
    gen_ar = make_polyala_generator(
        n_res, data, hidden=(32, 32), num_bins=4,
        torsion_scheme="residue_ar", torsion_cross_couplings=2,
    )
    params_ar = gen_ar.init(jax.random.PRNGKey(4))
    out_ar = gen_ar.sample(params_ar, jax.random.PRNGKey(5), 64, with_energy=True)
    assert bool(jnp.all(jnp.isfinite(out_ar.xs[0])))
    nll_ar = gen_ar.energy(params_ar, out_ar.xs[0])
    assert_close(nll_ar, out_ar.energy, 5e-3)


def test_polyala_statistics_roundtrip(key):
    """The generator's data-derived constants (whitening PCA + IC marginal
    mu/sigma) are exposed as a checkpointable pytree; rebuilding from that
    pytree WITHOUT the dataset reproduces the model exactly.  Guards against
    pairing a restored checkpoint with refit constants from regenerated data
    (eigenvector sign/order flips change the latent basis silently)."""
    from bgflow_tpu.models.polyala import make_polyala_generator

    n_res = 2
    # synthetic but valid frames: jittered reference geometry
    from bgflow_tpu.energies.peptide import polyala_reference_xyz

    ref = jnp.asarray(polyala_reference_xyz(n_res), jnp.float32).reshape(1, -1)
    data = ref + 0.01 * jax.random.normal(key, (256, ref.shape[-1]))
    gen = make_polyala_generator(
        n_res, data, hidden=(16,), num_bins=4, marginals_from="data"
    )
    stats = gen.data_statistics
    # simulate a fresh session with REGENERATED (different) data: only the
    # stats pytree is carried over
    stats = jax.tree_util.tree_map(np.asarray, stats)  # checkpoint round-trip
    gen2 = make_polyala_generator(
        n_res, None, hidden=(16,), num_bins=4, marginals_from="data",
        statistics=stats,
    )
    params = gen.init(jax.random.PRNGKey(1))
    out = gen.sample(params, jax.random.PRNGKey(2), 64, with_log_weights=True)
    out2 = gen2.sample(params, jax.random.PRNGKey(2), 64, with_log_weights=True)
    assert_close(out.xs[0], out2.xs[0], 1e-6)
    assert_close(out.log_weights, out2.log_weights, 1e-5)


@pytest.mark.slow
def test_polyala_all_rung_mbar_weights(key):
    """return_all_rungs: MBAR weights unbias the whole ladder to T=1 —
    weights are finite/normalized and cold rungs carry more weight than
    the hottest rungs on average."""
    from bgflow_tpu.models.polyala import generate_polyala_data_exact

    temps = (1.0, 2.0, 4.0)
    frames, log_w = generate_polyala_data_exact(
        key, 1, n_samples=128, n_ladders=8, temperatures=temps,
        n_burnin=20, stride=2, return_all_rungs=True,
    )
    n = frames.shape[0]
    assert log_w.shape == (n,)
    assert bool(jnp.all(jnp.isfinite(log_w)))
    # frames interleave [T0, T1, T2] per ladder slot
    k = len(temps)
    w = np.exp(np.asarray(log_w))
    cold_mean = w[0::k].mean()
    hot_mean = w[k - 1 :: k].mean()
    assert cold_mean > hot_mean
    # effective sample size of the pooled-weighted set is a useful chunk
    ess = 1.0 / np.sum((w / w.sum()) ** 2)
    assert ess > 0.02 * n, ess
