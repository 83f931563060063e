"""Flow-preconditioned (NeuTra) HMC via PushforwardEnergy.

Two properties:
* exactness — the latent chain targets exactly the pushforward density, so
  mapped samples reproduce the target for any flow (here: an affine flow
  with a nontrivial log-det);
* preconditioning — with a trained flow, latent HMC crosses double-well
  barriers that x-space HMC at the same budget cannot.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bgflow_tpu as bg
from bgflow_tpu.samplers.iterative import SamplerState
from bgflow_tpu.samplers.mcmc import HMCStep


def _run_hmc(energy, x0, key, n_steps, step_size, n_leapfrog=10):
    hmc = HMCStep(energy, step_size=step_size, n_leapfrog=n_leapfrog, n_steps=n_steps)
    state = SamplerState(samples=(x0,), energies=energy.energy(x0))
    return hmc.step(state, key).samples[0]


def test_pushforward_hmc_exact_moments(key):
    """Affine flow (scale+shift, log-det != 0) onto a shifted Gaussian
    target: latent HMC + push reproduces the target's moments."""
    d = 3
    mu = jnp.asarray([1.0, -2.0, 0.5])
    sigma = jnp.asarray([0.5, 2.0, 1.0])
    target = bg.NormalDistribution(d, mean=mu, cov=jnp.diag(sigma**2))
    flow = bg.AffineFlow(d)
    params = flow.init(key)
    # a deliberately IMPERFECT flow (half the shift, part of the scale):
    # exactness must not depend on flow quality
    params = {
        "log_sigma": 0.5 * jnp.log(sigma),
        "mu": 0.5 * mu,
    }
    u_z = bg.PushforwardEnergy(flow, params, target, [(d,)])

    z0 = jax.random.normal(jax.random.fold_in(key, 1), (512, d))
    z = _run_hmc(u_z, z0, jax.random.fold_in(key, 2), n_steps=300, step_size=0.25)
    x = u_z.push(z)
    assert x.shape == (512, d)
    np.testing.assert_allclose(np.mean(np.asarray(x), axis=0), np.asarray(mu), atol=0.25)
    np.testing.assert_allclose(np.std(np.asarray(x), axis=0), np.asarray(sigma), atol=0.35)


def test_latent_energy_matches_kl_integrand(key):
    """u_z(z) equals the reverse-KL integrand u(F(z)) - dlogp."""
    target = bg.DoubleWellEnergy(2)
    prior = bg.NormalDistribution(2)
    flow = bg.AffineFlow(2)
    gen = bg.BoltzmannGenerator(prior, flow, target)
    params = gen.init(key)
    u_z = gen.latent_energy(params)
    z = jax.random.normal(jax.random.fold_in(key, 3), (64, 2))
    x, dlogp = flow.forward(params, (z,))
    np.testing.assert_allclose(
        np.asarray(u_z.energy(z)),
        np.asarray(target.energy(*x) - dlogp),
        rtol=1e-6,
    )


def test_neutra_hmc_preconditions_ill_scaled_target(key):
    """The canonical preconditioning case: a Gaussian target with a 1000:1
    scale split.  x-space HMC's step size is pinned by the stiff direction,
    so the soft direction barely moves; latent HMC through the exact
    affine transport sees an isotropic pushforward and mixes both."""
    sig_soft, sig_stiff = 50.0, 0.05
    d = 2
    target = bg.NormalDistribution(
        d, cov=jnp.diag(jnp.asarray([sig_soft, sig_stiff]) ** 2)
    )
    flow = bg.AffineFlow(d)
    params = {
        "log_sigma": jnp.log(jnp.asarray([sig_soft, sig_stiff])),
        "mu": jnp.zeros(d),
    }
    u_z = bg.PushforwardEnergy(flow, params, target, [(d,)])

    # all chains start at the origin; step size at the x-space stability
    # limit of the STIFF direction
    x0 = jnp.zeros((256, d))
    n_steps, step_size = 40, 0.04

    x_chain = _run_hmc(target, x0, jax.random.fold_in(key, 9), n_steps, step_size)
    spread_x = float(jnp.std(x_chain[:, 0]))

    z0, _ = flow.forward(params, (x0,), inverse=True)
    # latent pushforward is isotropic N(0, I): unit step size is fine
    z = _run_hmc(u_z, z0[0], jax.random.fold_in(key, 10), n_steps, step_size=1.0)
    spread_neutra = float(jnp.std(u_z.push(z)[:, 0]))

    # latent HMC equilibrates the soft direction (std -> sig_soft);
    # x-space HMC at the same budget explores a tiny fraction of it
    assert spread_neutra > 0.5 * sig_soft, spread_neutra
    assert spread_x < 0.2 * sig_soft, spread_x


def test_neutra_sample_exact_moments(key):
    """High-level driver: neutra_sample through an imperfect affine flow
    reproduces the target's moments, tunes its own step size, and returns
    frames + target energies of the right shapes."""
    d = 3
    mu = jnp.asarray([1.0, -2.0, 0.5])
    sigma = jnp.asarray([0.5, 2.0, 1.0])
    target = bg.NormalDistribution(d, mean=mu, cov=jnp.diag(sigma**2))
    prior = bg.NormalDistribution(d)
    flow = bg.AffineFlow(d)
    gen = bg.BoltzmannGenerator(prior, flow, target)
    params = {"log_sigma": 0.5 * jnp.log(sigma), "mu": 0.5 * mu}

    res = bg.neutra_sample(
        gen, params, key, n_samples=4096, n_chains=256,
        gaussianize=False, n_burnin=120, stride=2, n_leapfrog=10,
    )
    assert len(res.xs) == 1 and res.xs[0].shape == (4096, d)
    assert res.energies.shape == (4096,)
    assert 0.2 < res.acceptance <= 1.0
    x = np.asarray(res.xs[0])
    np.testing.assert_allclose(x.mean(axis=0), np.asarray(mu), atol=0.25)
    np.testing.assert_allclose(x.std(axis=0), np.asarray(sigma), atol=0.35)
    # frames are Boltzmann draws: their mean target energy matches the
    # analytic expectation <u> = -log Z + d/2 ... use direct draws instead
    direct = target.sample(jax.random.fold_in(key, 5), 4096)
    np.testing.assert_allclose(
        float(res.energies.mean()),
        float(target.energy(direct).mean()),
        atol=0.3,
    )


def test_tune_hmc_step_size_multi_tensor(key):
    """Step-size tuning accepts tuple states (product-space targets)."""
    from bgflow_tpu.samplers.mcmc import tune_hmc_step_size

    target = bg.ProductEnergy(
        [bg.NormalDistribution(2), bg.NormalDistribution(3)]
    )
    x0 = (
        jax.random.normal(jax.random.fold_in(key, 0), (64, 2)),
        jax.random.normal(jax.random.fold_in(key, 1), (64, 3)),
    )
    step, accept = tune_hmc_step_size(
        target, x0, jax.random.fold_in(key, 2), step_size=0.3, n_rounds=6
    )
    assert step > 0 and 0.3 < accept <= 1.0


@pytest.mark.slow
def test_gaussianized_latent_energy_on_builder_generator(key):
    """NeuTra on a builder-made molecular generator: the gaussianized
    latent energy is finite on N(0,1) draws, HMC chains move, and pushed
    states are valid configurations (finite target energy)."""
    from bgflow_tpu.energies.ala2 import ALA2_REFERENCE_XYZ
    from bgflow_tpu.models.ala2 import make_ala2_generator
    from bgflow_tpu.samplers.iterative import SamplerState
    from bgflow_tpu.samplers.mcmc import HMCStep

    base = jnp.asarray(ALA2_REFERENCE_XYZ, dtype=jnp.float32).reshape(1, 66)
    data = base + 0.005 * jax.random.normal(jax.random.fold_in(key, 0), (128, 66))
    gen = make_ala2_generator(data, hidden=(16, 16), num_bins=4)
    params = gen.init(jax.random.fold_in(key, 1))

    u_z = gen.latent_energy(params, gaussianize=True)
    zs = tuple(
        0.5 * jax.random.normal(jax.random.fold_in(key, 2 + i), (8, *s))
        for i, s in enumerate(gen.prior.event_shapes)
    )
    e0 = u_z.energy(*zs)
    assert np.isfinite(np.asarray(e0)).all(), e0

    hmc = HMCStep(u_z, step_size=2e-2, n_leapfrog=5)
    state = SamplerState(samples=zs, energies=e0)
    k = key
    for _ in range(10):
        k, sub = jax.random.split(k)
        state = hmc._step(state, sub)
    moved = any(
        bool(jnp.any(jnp.abs(a - b) > 1e-9)) for a, b in zip(state.samples, zs)
    )
    assert moved, "no HMC move accepted in 10 steps"
    x = u_z.push(*state.samples)
    assert np.isfinite(np.asarray(gen.target.energy(x))).all()


@pytest.mark.slow
def test_neutra_sample_on_builder_generator(key):
    """The one-call driver works end-to-end on a molecular generator:
    gaussianized latents, tuned step, pushed frames with finite target
    energies, correct pooled shape."""
    from bgflow_tpu.energies.ala2 import ALA2_REFERENCE_XYZ
    from bgflow_tpu.models.ala2 import make_ala2_generator

    base = jnp.asarray(ALA2_REFERENCE_XYZ, dtype=jnp.float32).reshape(1, 66)
    data = base + 0.005 * jax.random.normal(jax.random.fold_in(key, 0), (128, 66))
    gen = make_ala2_generator(data, hidden=(16, 16), num_bins=4)
    params = gen.init(jax.random.fold_in(key, 1))

    res = bg.neutra_sample(
        gen, params, jax.random.fold_in(key, 2), n_samples=48, n_chains=16,
        x0=data[:16], n_burnin=4, stride=2, n_leapfrog=3, tune_rounds=3,
    )
    assert res.xs[0].shape == (48, 66)
    assert np.isfinite(np.asarray(res.energies)).all()
    assert res.step_size > 0
