"""Sharded sampling: replica exchange, SMC resampling, DP training — all on
the 8-device virtual CPU mesh (the multi-device genre the reference lacks,
SURVEY.md section 4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bgflow_tpu as bg
from bgflow_tpu.parallel.mesh import data_parallel_shardings, make_mesh, replicate, shard_batch
from bgflow_tpu.parallel.smc import (
    normalize_log_weights,
    resample,
    sharded_smc_step,
    sharded_smc_step_hierarchical,
    systematic_resampling_indices,
)
from bgflow_tpu.parallel.tempering import ReplicaExchangeStep, sharded_replica_exchange
from bgflow_tpu.samplers.iterative import SamplerState
from tests.conftest import assert_close


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.shape["dp"] == 8


@pytest.mark.slow
def test_replica_exchange_batched(key):
    """Exchange + MCMC on a double well: cold chains cross the barrier via
    the ladder (the point of parallel tempering)."""
    target = bg.DoubleWellEnergy(1)
    k_temps = 4
    n_ladders = 16
    temps = jnp.asarray([1.0, 2.0, 4.0, 8.0])
    temps_flat = jnp.tile(temps, n_ladders)
    # all chains start in the left well
    x0 = -1.4 * jnp.ones((n_ladders * k_temps, 1))
    mcmc = bg.MCMCStep(target, proposal=bg.GaussianProposal(0.3), target_temperatures=temps_flat)
    rex = ReplicaExchangeStep(target, temps)
    sampler = bg.IterativeSampler(SamplerState(samples=(x0,)), [mcmc, rex], stride=5, n_burnin=20)
    samples = sampler.sample(key, 200)  # (200, B, 1)
    cold = samples[:, 0::k_temps, 0]  # T=1 chains
    frac_right = float(jnp.mean(cold > 0))
    # without exchange, cold chains essentially never cross in this time;
    # with exchange they should mix substantially
    assert frac_right > 0.15


def test_replica_exchange_preserves_marginals(key):
    """Exchange moves must preserve the per-temperature stationary dist:
    energies only permute within a ladder."""
    target = bg.DoubleWellEnergy(1)
    temps = jnp.asarray([1.0, 4.0])
    x = jax.random.normal(key, (8, 1))
    state = SamplerState(samples=(x,))
    rex = ReplicaExchangeStep(target, temps)
    new_state = rex.step(state, jax.random.PRNGKey(1))
    # the multiset of samples is unchanged (swaps only permute)
    assert_close(jnp.sort(new_state.samples[0].ravel()), jnp.sort(x.ravel()), 1e-6)


def test_replica_exchange_parity_alternates_under_scan():
    """Even/odd pairings must alternate across lax.scan iterations (the
    parity is carried in state.step_count; Python-attribute parity would be
    frozen at trace time and the boundary replica would never swap)."""
    target = bg.DoubleWellEnergy(1)
    temps = jnp.asarray([1.0, 2.0, 4.0])
    x = jnp.arange(3.0)[:, None]
    # equal energies -> every proposed swap accepts deterministically
    state = SamplerState(samples=(x,), energies=jnp.zeros(3))
    rex = ReplicaExchangeStep(target, temps, n_steps=4)
    new = rex.step(state, jax.random.PRNGKey(0))
    assert int(new.step_count) == 4
    # parity-0 only permutes (0,1); replica 2 changes only when the odd
    # pairing (1,2) fires inside the scanned sub-steps
    assert float(new.samples[0][2, 0]) != 2.0
    # same property across IterativeSampler's outer scan (n_steps=1)
    sampler = bg.IterativeSampler(
        SamplerState(samples=(x,), energies=jnp.zeros(3)),
        [ReplicaExchangeStep(target, temps)],
    )
    samples = sampler.sample(jax.random.PRNGKey(1), 4)  # (4, 3, 1)
    assert float(samples[-1][2, 0]) != 2.0


def test_sharded_replica_exchange_runs(key):
    mesh = make_mesh()
    k_total = 16
    temps = jnp.logspace(0, 1, k_total)
    samples = jax.random.normal(key, (k_total, 2))
    target = bg.DoubleWellEnergy(2)
    energies = target.energy(samples)
    step = sharded_replica_exchange(mesh, target, temps)
    s0, e0 = samples, energies
    for parity in [0, 1, 0, 1]:
        s0, e0 = step(s0, e0, jax.random.PRNGKey(parity), parity)
    # energy multiset preserved (pure permutation)
    assert_close(jnp.sort(e0), jnp.sort(energies), 1e-6)
    assert s0.shape == samples.shape


def test_systematic_resampling_unbiased(key):
    logw = jnp.log(jnp.asarray([0.1, 0.2, 0.3, 0.4]))
    counts = jnp.zeros(4)
    for i in range(200):
        idx = systematic_resampling_indices(jax.random.PRNGKey(i), logw, 4)
        counts = counts.at[idx].add(1.0)
    freq = counts / counts.sum()
    assert_close(freq, jnp.exp(normalize_log_weights(logw)), 5e-2)


def test_resample_pytree(key):
    samples = {"x": jnp.arange(8.0)[:, None], "v": jnp.arange(8.0)[:, None] * 2}
    logw = jnp.where(jnp.arange(8) < 2, 0.0, -jnp.inf)  # only first two survive
    new, idx = resample(key, samples, logw)
    assert jnp.all(idx < 2)
    assert jnp.all(new["x"] < 2)
    assert_close(new["v"], 2 * new["x"], 1e-6)


def test_sharded_smc_matches_single_device(key):
    mesh = make_mesh()
    b = 64
    samples = jax.random.normal(key, (b, 3))
    logw = jax.random.normal(jax.random.PRNGKey(1), (b,))
    smc = sharded_smc_step(mesh)
    new_samples, ess = smc(jax.random.PRNGKey(2), samples, logw)
    assert new_samples.shape == samples.shape
    # distributed Kish ESS equals the single-device formula
    ess_ref = bg.effective_sample_size(logw)
    assert_close(ess, ess_ref, 1e-4)
    # resampled set only contains original particles
    d = jnp.abs(new_samples[:, None, :] - samples[None, :, :]).sum(-1).min(1)
    assert float(d.max()) < 1e-6


def test_hierarchical_smc_resamples_from_population(key):
    """The ppermute-routed resampler returns only original particles and the
    exact global Kish ESS — without ever all-gathering the population."""
    mesh = make_mesh()
    b = 64
    samples = jax.random.normal(key, (b, 3))
    logw = jax.random.normal(jax.random.PRNGKey(1), (b,))
    smc = sharded_smc_step_hierarchical(mesh)
    new_samples, ess = smc(jax.random.PRNGKey(2), samples, logw)
    assert new_samples.shape == samples.shape
    assert_close(ess, bg.effective_sample_size(logw), 1e-4)
    d = jnp.abs(new_samples[:, None, :] - samples[None, :, :]).sum(-1).min(1)
    assert float(d.max()) < 1e-6


def test_hierarchical_smc_unbiased():
    """Expected replication frequency of every particle equals its normalized
    weight (two-level mixture resampling is marginally exact)."""
    mesh = make_mesh()
    b = 16  # 2 per shard
    rng = np.random.default_rng(0)
    logw = jnp.asarray(rng.normal(size=b))
    ids = jnp.arange(b, dtype=jnp.float32)[:, None]
    smc = sharded_smc_step_hierarchical(mesh)
    counts = np.zeros(b)
    n_rep = 400
    for i in range(n_rep):
        new_ids, _ = smc(jax.random.PRNGKey(i), ids, logw)
        np.add.at(counts, np.asarray(new_ids[:, 0], dtype=int), 1.0)
    freq = counts / counts.sum()
    w = np.exp(np.asarray(normalize_log_weights(logw)))
    assert np.abs(freq - w).max() < 0.03


def test_hierarchical_smc_kills_zero_weight_particles(key):
    mesh = make_mesh()
    samples = jnp.arange(16.0)[:, None]
    logw = jnp.where(jnp.arange(16) < 2, 0.0, -1e30)
    smc = sharded_smc_step_hierarchical(mesh)
    new_samples, _ = smc(key, samples, logw)
    assert jnp.all(new_samples < 2)


def test_data_parallel_training_matches_single_device(key):
    """DP train step over the mesh gives the same result as unsharded."""
    import optax

    mesh = make_mesh()
    prior = bg.NormalDistribution(2)
    target = bg.DoubleWellEnergy(2)
    shift = bg.DenseNet([1, 16, 1])
    scale = bg.DenseNet([1, 16, 1])
    flow = bg.Chain([bg.Split(1, axis=-1), bg.Coupling(bg.AffineTransformer(shift, scale)), bg.Merge(1, axis=-1)])
    gen = bg.BoltzmannGenerator(prior, flow, target)
    params = gen.init(key)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    batch = jax.random.normal(jax.random.PRNGKey(1), (64, 2))

    def loss(p, x):
        return jnp.mean(gen.energy(p, x))

    @jax.jit
    def step(p, s, x):
        l, g = jax.value_and_grad(loss)(p, x)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s, l

    # unsharded
    p1, _, l1 = step(params, opt_state, batch)
    # sharded
    rep, shard = data_parallel_shardings(mesh)
    p_r = replicate(mesh, params)
    s_r = replicate(mesh, opt_state)
    x_s = shard_batch(mesh, batch)
    with mesh:
        p2, _, l2 = step(p_r, s_r, x_s)
    assert_close(l1, l2, 1e-6)
    for a, b_ in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        assert_close(a, b_, 1e-6)


def test_mesh_sharded_flagship_numerics_match(key):
    """The flagship molecular path (spline couplings + inverse-CDF maps +
    IC reconstruction) gives identical numerics with the batch sharded over
    the 8-device mesh vs unsharded single-device execution."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tests.test_ic import ALA2_FIXED, ALA2_Z_MATRIX, _random_ala2_xyz

    data = np.asarray(_random_ala2_xyz(jax.random.PRNGKey(42), 128, jnp.float64))
    crd = bg.MixedCoordinateTransformation(data, ALA2_Z_MATRIX, ALA2_FIXED, keepdims=15)
    info = bg.ShapeDictionary.from_coordinate_transform(crd)
    builder = bg.BoltzmannGeneratorBuilder(info)
    for what, on in [(bg.TORSIONS, bg.FIXED), (bg.BONDS, (bg.ANGLES, bg.TORSIONS))]:
        builder.add_condition(what, on=on, hidden=(16,), num_bins=4)
    builder.add_map_to_ic_domains()
    builder.add_map_to_cartesian(crd)
    gen = builder.build_generator(check_target=False)
    params = gen.init(key)
    mesh = make_mesh()
    b = 64

    # energy path, batch-sharded input vs unsharded
    x = gen.sample(params, jax.random.PRNGKey(3), b).xs[0]
    e_fn = jax.jit(lambda p, xx: gen.energy(p, xx))
    e1 = e_fn(params, x)
    x_sharded = jax.device_put(x, NamedSharding(mesh, P("dp")))
    p_repl = jax.device_put(params, NamedSharding(mesh, P()))
    with mesh:
        e2 = e_fn(p_repl, x_sharded)
    assert_close(e1, e2, 1e-8)

    # sampling path with sharded outputs (same program partitioned by GSPMD)
    sample_fn = jax.jit(
        lambda p, k: gen.sample(p, k, b, with_dlogp=True),
        out_shardings=NamedSharding(mesh, P("dp")),
    )
    with mesh:
        out = sample_fn(p_repl, jax.random.PRNGKey(4))
    ref = gen.sample(params, jax.random.PRNGKey(4), b, with_dlogp=True)
    assert_close(out.xs[0], ref.xs[0], 1e-8)
    assert_close(out.dlogp, ref.dlogp, 1e-8)


def test_sharded_sampler_partitions_and_matches_local(key):
    """make_sharded_sampler: each device draws its own sub-batch (round-4's
    mesh-context gen.sample was silently replicated — zero collectives in
    the HLO); shard i's output must equal a local sample with fold_in(i)."""
    from bgflow_tpu.parallel.mesh import make_sharded_sampler

    prior = bg.NormalDistribution(2)
    target = bg.DoubleWellEnergy(2)
    flow = bg.Chain([
        bg.Split(1, axis=-1),
        bg.Coupling(bg.AffineTransformer(bg.DenseNet([1, 8, 1]), bg.DenseNet([1, 8, 1]))),
        bg.Merge(1, axis=-1),
    ])
    gen = bg.BoltzmannGenerator(prior, flow, target)
    params = gen.init(key)
    mesh = make_mesh()
    n_dev = len(jax.devices())
    n = 64 * n_dev
    sampler = make_sharded_sampler(mesh, gen, n)
    out = sampler(params, key)
    assert out.xs[0].shape == (n, 2)
    # shard 0's block equals an unsharded draw with the same folded key
    local = gen.sample(params, jax.random.fold_in(key, 0), 64)
    np.testing.assert_allclose(np.asarray(out.xs[0][:64]), np.asarray(local.xs[0]), atol=1e-5)
    # distinct shards drew distinct samples
    assert not np.allclose(np.asarray(out.xs[0][:64]), np.asarray(out.xs[0][64:128]))


def test_sharded_sampler_rejects_indivisible():
    from bgflow_tpu.parallel.mesh import make_sharded_sampler

    prior = bg.NormalDistribution(2)
    gen = bg.BoltzmannGenerator(prior, bg.Chain([]), bg.DoubleWellEnergy(2))
    with pytest.raises(ValueError):
        make_sharded_sampler(make_mesh(), gen, 7)
