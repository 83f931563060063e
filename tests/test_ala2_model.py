"""Flagship ala2 model: end-to-end creation, training step, reweighting."""
import jax
import jax.numpy as jnp
import optax
import pytest

import bgflow_tpu as bg
from bgflow_tpu.models.ala2 import Ala2Model, generate_ala2_data, make_ala2_generator


@pytest.fixture(scope="module")
def model():
    return Ala2Model.create(jax.random.PRNGKey(0), n_data=512, hidden=(32, 32), num_bins=4)


def test_ala2_data_generation(model):
    assert model.data.shape == (512, 66)
    assert jnp.all(jnp.isfinite(model.data))
    ff = bg.build_ala2_forcefield()
    u = ff.energy(model.data)
    # thermalized configurations: bounded reduced energies
    assert float(jnp.max(u)) < 200.0


@pytest.mark.slow
def test_ala2_sample_and_energy(model):
    gen, params = model.generator, model.params
    out = gen.sample(params, jax.random.PRNGKey(1), 32, with_log_weights=True, with_dlogp=True)
    assert out.xs[0].shape == (32, 66)
    assert jnp.all(jnp.isfinite(out.xs[0]))
    assert jnp.all(jnp.isfinite(out.log_weights))
    nll = gen.energy(params, model.data[:32])
    assert jnp.all(jnp.isfinite(nll))


@pytest.mark.slow
def test_ala2_mixed_training_improves_nll(model):
    gen, params = model.generator, model.params
    trainer = bg.KLTrainer(gen, optimizer=optax.adam(5e-4))
    data = bg.DataSetSampler(model.data)
    step = trainer.make_train_step(batchsize_likelihood=64, batchsize_energy=64,
                                   w_likelihood=1.0, w_energy=0.1)
    opt_state = trainer.init(params)
    key = jax.random.PRNGKey(2)
    nll_before = float(jnp.mean(gen.energy(params, model.data[:256])))
    for _ in range(30):
        key, k1, k2 = jax.random.split(key, 3)
        batch = (data.sample(k1, 64),)
        params, opt_state, metrics = step(params, opt_state, k2, batch)
        assert not bool(metrics["skipped"])
    nll_after = float(jnp.mean(gen.energy(params, model.data[:256])))
    assert nll_after < nll_before


@pytest.mark.slow
def test_exact_data_generation_runs():
    """HMC + replica-exchange data generator: finite, aligned, reasonable
    energies (scaled down; the full run is scripts/ala2_science.py)."""
    from bgflow_tpu.models.ala2 import generate_ala2_data_exact
    from bgflow_tpu.energies.ala2 import build_ala2_forcefield

    data = generate_ala2_data_exact(
        jax.random.PRNGKey(0), n_samples=512, n_ladders=16,
        n_burnin=40, stride=4, n_leapfrog=10, step_size=2.5e-3,
    )
    assert data.shape == (512, 66)
    assert bool(jnp.all(jnp.isfinite(data)))
    u = build_ala2_forcefield().energy(data)
    # equilibrated vacuum ala2 sits at tens of negative kT
    assert float(jnp.median(u)) < 10.0
    assert float(jnp.max(u)) < 100.0
