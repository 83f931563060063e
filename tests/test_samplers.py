"""Sampler tests: iterative semantics, MCMC correctness, MD, replay buffer.

Mirrors the reference genres (``tests/distribution/sampling/test_iterative.py``,
``test_mcmc`` statistics, ``test_buffer.py``).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bgflow_tpu as bg
from bgflow_tpu.samplers.iterative import SamplerState, SamplerStep
from tests.conftest import assert_close


class AddOne(SamplerStep):
    """Deterministic step for iteration arithmetic (reference test_iterative)."""

    def _step(self, state, key):
        return state.replace(samples=tuple(x + 1.0 for x in state.samples))


def test_primary_cell_wrapping(key):
    """States carrying box_vectors wrap samples into the periodic cell on
    every iteration (reference _iterative_helpers.py:60-97)."""
    from bgflow_tpu.samplers.iterative import map_to_primary_cell

    box = 2.0 * jnp.eye(3)
    # helper: fractional reduction mod the box
    x = jnp.array([[2.5, -0.5, 1.0, 4.1, 0.0, -3.9]])
    wrapped = map_to_primary_cell(x, box)
    assert_close(wrapped, jnp.array([[0.5, 1.5, 1.0, 0.1, 0.0, 0.1]]), 1e-5)
    # triclinic box: wrapped fractional coords are in [0, 1)
    tri = jnp.array([[2.0, 0.0, 0.0], [0.5, 2.0, 0.0], [0.3, 0.4, 2.0]])
    y = map_to_primary_cell(10.0 * jax.random.normal(key, (5, 6)), tri)
    frac = y.reshape(5, 2, 3) @ jnp.linalg.inv(tri)
    assert jnp.all((frac >= -1e-5) & (frac < 1.0 + 1e-5))
    # the sampler applies the wrap after each iteration
    init = SamplerState(samples=(jnp.zeros((2, 3)),), box_vectors=box)
    sampler = bg.IterativeSampler(init, [AddOne()], stride=3)
    out = sampler.sample(key, 2)
    # 3 strides add 3.0 -> wraps to 1.0; next iteration: 1+3 = 4 -> 0.0
    assert_close(out[:, 0, 0], jnp.array([1.0, 0.0]), 1e-6)
    # wrap can be disabled
    sampler2 = bg.IterativeSampler(
        SamplerState(samples=(jnp.zeros((2, 3)),), box_vectors=box),
        [AddOne()], stride=3, wrap_into_primary_cell=False)
    out2 = sampler2.sample(key, 2)
    assert_close(out2[:, 0, 0], jnp.array([3.0, 6.0]), 1e-6)


def test_iterative_stride_arithmetic(key):
    init = SamplerState(samples=(jnp.zeros((2, 1)),))
    sampler = bg.IterativeSampler(init, [AddOne()], stride=3, n_burnin=2)
    out = sampler.sample(key, 4)
    # burn-in: 2 iterations * 3 strides = 6; then samples at 9, 12, 15, 18
    assert out.shape == (4, 2, 1)
    assert_close(out[:, 0, 0], jnp.array([9.0, 12.0, 15.0, 18.0]), 1e-6)
    # subsequent call continues from the current state
    out2 = sampler.sample(jax.random.PRNGKey(1), 2)
    assert_close(out2[:, 0, 0], jnp.array([21.0, 24.0]), 1e-6)


def test_mcmc_samples_gaussian(key):
    """Gaussian random-walk MCMC reproduces a 1D standard normal."""
    target = bg.NormalDistribution(1)
    init = jnp.zeros((64, 1))
    sampler = bg.GaussianMCMCSampler(target, init, noise_std=0.8, n_burnin=100)
    samples = sampler.sample(key, 200)  # (200*64, 1) flattened by return hook
    assert samples.shape == (200 * 64, 1)
    assert abs(float(samples.mean())) < 0.1
    assert abs(float(samples.std()) - 1.0) < 0.1


def test_mcmc_parallel_tempering_temperatures(key):
    """Per-chain temperatures: high-T chains have wider marginals."""
    target = bg.DoubleWellEnergy(1, b=-4.0, c=1.0)
    temps = jnp.concatenate([jnp.ones(32), 8.0 * jnp.ones(32)])
    step = bg.MCMCStep(target, proposal=bg.GaussianProposal(0.4), target_temperatures=temps)
    state = SamplerState(samples=(jnp.zeros((64, 1)),))
    sampler = bg.IterativeSampler(state, [step], stride=10, n_burnin=20)
    samples = sampler.sample(key, 100)  # (100, 64, 1)
    # higher temperature flattens the barrier: occupancy near x=0 grows
    cold_barrier = jnp.mean(jnp.abs(samples[:, :32]) < 0.5)
    hot_barrier = jnp.mean(jnp.abs(samples[:, 32:]) < 0.5)
    assert float(hot_barrier) > 2.0 * float(cold_barrier)


def test_latent_proposal_perfect_flow_accepts_everything(key):
    """With an exact transport flow, latent MCMC accepts every move."""
    dim = 2
    sigma = 3.0
    target = bg.NormalDistribution(dim, cov=sigma**2 * jnp.eye(dim))
    flow = bg.Lambda(
        fn=lambda z: (sigma * z, jnp.full(z.shape[:1], dim * jnp.log(sigma))),
        ifn=lambda x: (x / sigma, jnp.full(x.shape[:1], -dim * jnp.log(sigma))),
    )
    # the base proposal resamples latents independently from the prior:
    class PriorResample:
        def propose(self, state, key):
            z_new = jax.random.normal(key, state.samples[0].shape)
            z_old = state.samples[0]
            # delta = log g(z'|z) - log g(z|z') = log p(z') - log p(z)
            delta = 0.5 * jnp.sum(z_old**2, -1) - 0.5 * jnp.sum(z_new**2, -1)
            return state.replace(samples=(z_new,), energies=None), delta

    proposal = bg.LatentProposal(flow, (), base_proposal=PriorResample())
    step = bg.MCMCStep(target, proposal=proposal)
    state = SamplerState(samples=(sigma * jax.random.normal(key, (128, dim)),))
    state = state.replace(energies=target.energy(*state.samples))
    new_state = step.step(state, jax.random.PRNGKey(5))
    # all moves accepted -> all energies updated and samples changed
    changed = jnp.mean(jnp.any(new_state.samples[0] != state.samples[0], axis=-1))
    assert float(changed) > 0.99


def test_baoab_harmonic_distribution(key):
    """BAOAB on a harmonic well samples the right marginal variance."""
    target = bg.NormalDistribution(2)
    x0 = jnp.zeros((32, 2))
    xs = bg.baoab_run(target, x0, key, n_steps=4000, timestep=0.05, friction=1.0)
    samples = xs[1000:].reshape(-1, 2)
    assert abs(float(samples.std()) - 1.0) < 0.1


def test_brownian_flow_work(key):
    """BrownianFlow returns finite work; at equilibrium mean exp(-W) ~ 1."""
    target = bg.NormalDistribution(2)
    flow = bg.BrownianFlow(target, n_steps=10, stepsize=0.01)
    x = jax.random.normal(key, (4096, 2))
    (y,), dw = flow.forward((), (x,), key=jax.random.PRNGKey(1))
    assert y.shape == x.shape
    assert jnp.all(jnp.isfinite(dw))
    # Jarzynski at equilibrium: <exp(-dW)> = 1 (loose statistical check)
    est = jnp.exp(jax.scipy.special.logsumexp(-dw) - jnp.log(dw.shape[0]))
    assert 0.8 < float(est) < 1.2


def test_metropolis_flow_work(key):
    target = bg.NormalDistribution(2)
    flow = bg.MetropolisMCFlow(target, n_steps=5, stepsize=0.5)
    x = jax.random.normal(key, (256, 2))
    (y,), dw = flow.forward((), (x,), key=jax.random.PRNGKey(1))
    assert jnp.all(jnp.isfinite(dw))


def test_stochastic_augmentation(key):
    dist = bg.NormalDistribution(3)
    aug = bg.StochasticAugmentation(dist)
    q = jax.random.normal(key, (8, 5))
    (x,), dlogp = aug.forward((), (q,), key=jax.random.PRNGKey(1))
    assert x.shape == (8, 8)
    (q2,), dlogp_inv = aug.forward((), (x,), inverse=True)
    assert_close(q, q2, 1e-6)
    assert_close(dlogp, -dlogp_inv, 1e-5)


def test_langevin_flow(key):
    target = bg.NormalDistribution(2)
    flow = bg.LangevinFlow(target, n_steps=5, stepsize=0.01)
    q = jax.random.normal(key, (16, 2))
    v = jax.random.normal(jax.random.PRNGKey(1), (16, 2))
    (q2, v2), dw = flow.forward((), (q, v), key=jax.random.PRNGKey(2))
    assert q2.shape == q.shape and v2.shape == v.shape
    assert jnp.all(jnp.isfinite(dw))


def test_replay_buffer_update(key, tmp_path):
    target = bg.DoubleWellEnergy(2)
    proposal = bg.NormalDistribution(2)
    data = jax.random.normal(key, (128, 2))
    reporter = bg.ReplayBufferHDF5Reporter(str(tmp_path / "buffer.h5"))
    buffer = bg.MetropolizedReplayBuffer(
        data, target_energy=target, proposal_energy=proposal, reporter=reporter
    )
    proposals = jax.random.normal(jax.random.PRNGKey(1), (32, 2))
    n_acc = buffer.update(jax.random.PRNGKey(2), proposals)
    assert 0 <= n_acc <= 32
    # forced update accepts everything
    n_forced = buffer.update(jax.random.PRNGKey(3), proposals, forced_update=True)
    assert n_forced == 32
    # buffer still samples
    s = buffer.sample(jax.random.PRNGKey(4), 16)
    assert s.shape == (16, 2)
    stats = reporter.stats
    assert stats["n_accepted"][-1] == 32
    reporter.close()


def test_bridge_energy_roundtrip(key):
    """Host-callback bridge: energy values and injected force gradients."""

    def host_eval(x):
        # harmonic potential evaluated "externally" with numpy
        e = 0.5 * np.sum(x**2, axis=-1)
        f = -x
        return e, f

    bridge = bg.BridgeEnergy(3, bg.CallbackBridge(host_eval))
    x = jax.random.normal(key, (5, 3))
    e = bridge.energy(x)
    assert_close(e, 0.5 * jnp.sum(x**2, -1), 1e-6)
    # gradient comes from the injected force
    g = jax.grad(lambda xx: jnp.sum(bridge.energy(xx)))(x)
    assert_close(g, x, 1e-6)
    # works under jit as well
    e_jit = jax.jit(bridge.energy)(x)
    assert_close(e_jit, e, 1e-6)


def test_hmc_samples_gaussian_exactly(key):
    """HMC on a standard normal: moments match to MC error even at a large
    step size (the Metropolis correction removes discretization bias)."""
    target = bg.NormalDistribution(3)
    x0 = jnp.zeros((256, 3))
    hmc = bg.HMCStep(target, step_size=0.5, n_leapfrog=8)
    sampler = bg.IterativeSampler(SamplerState(samples=(x0,)), [hmc], n_burnin=50)
    frames = sampler.sample(jax.random.PRNGKey(0), 200)  # (200, 256, 3)
    xs = frames.reshape(-1, 3)
    assert float(jnp.abs(jnp.mean(xs))) < 0.02
    assert abs(float(jnp.var(xs)) - 1.0) < 0.05


def test_hmc_per_chain_temperatures(key):
    """Chains at temperature T sample variance T on a Gaussian."""
    target = bg.NormalDistribution(2)
    temps = jnp.tile(jnp.asarray([1.0, 4.0]), 128)
    x0 = jnp.zeros((256, 2))
    hmc = bg.HMCStep(target, step_size=0.4, n_leapfrog=8, target_temperatures=temps)
    sampler = bg.IterativeSampler(SamplerState(samples=(x0,)), [hmc], n_burnin=50)
    frames = sampler.sample(jax.random.PRNGKey(1), 150)
    cold = frames[:, 0::2].reshape(-1, 2)
    hot = frames[:, 1::2].reshape(-1, 2)
    assert abs(float(jnp.var(cold)) - 1.0) < 0.08
    assert abs(float(jnp.var(hot)) - 4.0) < 0.7


def test_hmc_rejects_nonfinite(key):
    class BadEnergy(bg.Energy):
        def __init__(self):
            super().__init__(2)

        def _energy(self, x):
            return jnp.where(jnp.abs(x[:, 0]) > 0.0, jnp.inf, 0.0)

    x0 = jnp.zeros((4, 2))
    hmc = bg.HMCStep(BadEnergy(), step_size=0.1, n_leapfrog=2)
    state = SamplerState(samples=(x0,))
    new = hmc.step(state, key)
    # all proposals land at infinite energy -> everything rejected
    assert bool(jnp.all(new.samples[0] == 0.0))


def test_dataset_sampler_weighted(key):
    # frames 0..3; weights heavily favor frame 3
    data = jnp.arange(4.0).reshape(4, 1)
    lw = jnp.log(jnp.asarray([0.1, 0.1, 0.1, 0.7]))
    ds = bg.DataSetSampler(data, log_weights=lw)
    out = ds.sample(key, 4000)
    frac3 = float(jnp.mean(out[:, 0] == 3.0))
    assert abs(frac3 - 0.7) < 0.05
    # uniform path unchanged
    ds_u = bg.DataSetSampler(data)
    out_u = ds_u.sample(key, 4000)
    frac3_u = float(jnp.mean(out_u[:, 0] == 3.0))
    assert abs(frac3_u - 0.25) < 0.05


def test_tune_hmc_step_size(key):
    """The tuner lands near the target acceptance on a Gaussian target
    starting from a badly mistuned step size."""
    import numpy as np
    from bgflow_tpu.samplers.mcmc import tune_hmc_step_size

    target = bg.NormalDistribution(24)
    x0 = jax.random.normal(key, (128, 24))
    step, acc = tune_hmc_step_size(
        target, x0, jax.random.PRNGKey(3), target_accept=0.7,
        step_size=25.0,  # absurdly large: ~0% acceptance initially
        n_leapfrog=5, n_rounds=14,
    )
    assert 0.45 < acc < 0.95, (step, acc)
    assert step < 25.0


def test_hmc_multi_tensor_state(key):
    """HMCStep on a 2-tensor product target (the augmented-(x, v) /
    product-space case): both marginals reach their target moments."""
    import bgflow_tpu as bg
    from bgflow_tpu.samplers.iterative import SamplerState
    from bgflow_tpu.samplers.mcmc import HMCStep

    target = bg.ProductEnergy([
        bg.NormalDistribution(3, mean=jnp.asarray([1.0, -1.0, 0.0])),
        bg.NormalDistribution(2, cov=jnp.diag(jnp.asarray([4.0, 0.25]))),
    ])
    x0 = (jnp.zeros((256, 3)), jnp.zeros((256, 2)))
    hmc = HMCStep(target, step_size=0.2, n_leapfrog=8, masses=(1.0, jnp.asarray([1.0, 4.0])))
    state = SamplerState(samples=x0, energies=target.energy(*x0))
    k = key
    for _ in range(150):
        k, sub = jax.random.split(k)
        state = hmc._step(state, sub)
    a, b = state.samples
    np.testing.assert_allclose(np.mean(np.asarray(a), axis=0), [1.0, -1.0, 0.0], atol=0.3)
    np.testing.assert_allclose(np.std(np.asarray(b), axis=0), [2.0, 0.5], atol=0.4)
