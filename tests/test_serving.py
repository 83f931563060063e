"""AOT export round-trips: sealed artifacts match the live generator."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bgflow_tpu as bg
from bgflow_tpu.utils.serving import (
    export_energy,
    export_sampler,
    load_exported,
    save_exported,
)


@pytest.fixture
def gen_and_params():
    prior = bg.NormalDistribution(2)
    target = bg.DoubleWellEnergy(2)
    flow = bg.Chain([
        bg.Split(1, axis=-1),
        bg.Coupling(bg.AffineTransformer(bg.DenseNet([1, 32, 1]), bg.DenseNet([1, 32, 1]))),
        bg.Merge(1, axis=-1),
    ])
    gen = bg.BoltzmannGenerator(prior, flow, target)
    return gen, gen.init(jax.random.PRNGKey(0))


def test_export_sampler_roundtrip(tmp_path, gen_and_params):
    gen, params = gen_and_params
    exp = export_sampler(gen, params, n_samples=256, with_log_weights=True)
    path = save_exported(str(tmp_path / "sampler.bin"), exp)
    served = load_exported(path)

    key = jax.random.PRNGKey(7)
    x_served, logw_served = served.call(jax.random.key_data(key))
    out = gen.sample(params, key, 256, with_log_weights=True)
    np.testing.assert_allclose(np.asarray(x_served), np.asarray(out.xs[0]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(logw_served), np.asarray(out.log_weights), rtol=1e-5, atol=1e-5
    )


def test_export_energy_roundtrip(tmp_path, gen_and_params):
    gen, params = gen_and_params
    exp = export_energy(gen, params, batch_size=64)
    path = save_exported(str(tmp_path / "energy.bin"), exp)
    served = load_exported(path)
    x = jax.random.normal(jax.random.PRNGKey(3), (64, 2), dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(served.call(x)),
        np.asarray(gen.energy(params, x)),
        rtol=1e-5, atol=1e-5,
    )


def test_export_temperature_baked(gen_and_params):
    gen, params = gen_and_params
    exp_hot = export_sampler(gen, params, n_samples=512, temperature=4.0)
    key = jax.random.PRNGKey(1)
    (x_hot,) = exp_hot.call(jax.random.key_data(key))
    out_hot = gen.sample(params, key, 512, temperature=4.0)
    np.testing.assert_allclose(np.asarray(x_hot), np.asarray(out_hot.xs[0]), rtol=1e-6)
