"""Temperature axis of the model distribution (VERDICT r3 item 7).

Uniform torsion priors make an IC-flow model temperature-independent; the
``temperature_feature`` coupling option injects log(T) as a conditioner
input so the learned conditional densities (and hence q(x | T)) genuinely
depend on temperature, including per-sample (B,) temperature vectors for
replica-ladder NLL training.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bgflow_tpu as bg
from tests.conftest import assert_close


def _noisy(params, key, scale=0.5):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef,
        [l + scale * jax.random.normal(k, l.shape, l.dtype) for l, k in zip(leaves, keys)],
    )


def _coupling(temperature_feature):
    dim_in = 3 + (1 if temperature_feature else 0)
    return bg.Coupling(
        bg.AffineTransformer(
            bg.DenseNet([dim_in, 16, 2]), bg.DenseNet([dim_in, 16, 2])
        ),
        transformed=(1,),
        on=(0,),
        temperature_feature=temperature_feature,
    )


def test_coupling_temperature_feature_roundtrip():
    flow = _coupling(True)
    params = _noisy(flow.init(jax.random.PRNGKey(0)), jax.random.PRNGKey(1))
    x = (
        jax.random.normal(jax.random.PRNGKey(2), (8, 3)),
        jax.random.normal(jax.random.PRNGKey(3), (8, 2)),
    )
    for T in (1.0, 2.5, jnp.full((8,), 1.7), jnp.linspace(0.5, 3.0, 8)):
        ys, ldj = flow.forward(params, x, temperature=T)
        xs, ldj_inv = flow.forward(params, ys, inverse=True, temperature=T)
        for a, b in zip(x, xs):
            assert_close(a, b, 1e-5)
        assert_close(ldj, -ldj_inv, 1e-5)


def test_coupling_temperature_changes_output():
    flow = _coupling(True)
    params = _noisy(flow.init(jax.random.PRNGKey(0)), jax.random.PRNGKey(1))
    x = (
        jax.random.normal(jax.random.PRNGKey(2), (8, 3)),
        jax.random.normal(jax.random.PRNGKey(3), (8, 2)),
    )
    y1, _ = flow.forward(params, x, temperature=1.0)
    y2, _ = flow.forward(params, x, temperature=2.0)
    assert float(jnp.max(jnp.abs(y1[1] - y2[1]))) > 1e-4
    # without the feature, temperature is a no-op on the coupling
    flow0 = _coupling(False)
    p0 = _noisy(flow0.init(jax.random.PRNGKey(0)), jax.random.PRNGKey(1))
    z1, _ = flow0.forward(p0, x, temperature=1.0)
    z2, _ = flow0.forward(p0, x, temperature=2.0)
    assert_close(z1[1], z2[1], 0.0)


def test_coupling_default_temperature_is_unit():
    """Omitting temperature equals T=1 (the log-T feature is exactly 0)."""
    flow = _coupling(True)
    params = _noisy(flow.init(jax.random.PRNGKey(0)), jax.random.PRNGKey(1))
    x = (
        jax.random.normal(jax.random.PRNGKey(2), (4, 3)),
        jax.random.normal(jax.random.PRNGKey(3), (4, 2)),
    )
    y_default, _ = flow.forward(params, x)
    y_unit, _ = flow.forward(params, x, temperature=1.0)
    assert_close(y_default[1], y_unit[1], 0.0)


def test_normal_prior_vector_temperature_energy():
    d = bg.NormalDistribution(4)
    x = jax.random.normal(jax.random.PRNGKey(0), (6, 4))
    t = jnp.linspace(0.5, 2.0, 6)
    e_vec = d.energy(x, temperature=t)
    assert e_vec.shape == (6,)
    for i in range(6):
        assert_close(e_vec[i], d.energy(x[i : i + 1], temperature=float(t[i]))[0], 1e-6)


@pytest.mark.slow
def test_ala2_generator_temperature_conditioning(key):
    from bgflow_tpu.energies.ala2 import ALA2_REFERENCE_XYZ
    from bgflow_tpu.models.ala2 import make_ala2_generator

    base = jnp.asarray(ALA2_REFERENCE_XYZ, jnp.float32).reshape(1, 66)
    data = np.asarray(base + 0.01 * jax.random.normal(key, (256, 66)))
    gen = make_ala2_generator(
        data, hidden=(16,), num_bins=4, temperature_conditioning=True
    )
    params = _noisy(gen.init(jax.random.PRNGKey(1)), jax.random.PRNGKey(2), 0.1)

    # the model density now genuinely depends on T ...
    x = jnp.asarray(data[:16])
    u1 = gen.energy(params, x, temperature=1.0)
    u2 = gen.energy(params, x, temperature=1.5)
    assert bool(jnp.all(jnp.isfinite(u1))) and bool(jnp.all(jnp.isfinite(u2)))
    # ... beyond the trivial additive log Z shift a T-independent flow
    # would give: the per-sample difference is not constant
    diff = u2 - u1
    assert float(jnp.std(diff)) > 1e-4

    # per-sample temperature vectors thread through sample/energy
    t_vec = jnp.linspace(1.0, 2.0, 16)
    u_vec = gen.energy(params, x, temperature=t_vec)
    assert u_vec.shape == (16,) and bool(jnp.all(jnp.isfinite(u_vec)))
    out = gen.sample(params, jax.random.PRNGKey(3), 32, temperature=1.5,
                     with_log_weights=True)
    assert bool(jnp.all(jnp.isfinite(out.xs[0])))

    # round-trip consistency at T != 1: energy(sample) is finite and the
    # flow inverse recovers the latent at the same temperature
    z, neg_dlogp = gen.flow.forward(params, out.xs, inverse=True, temperature=1.5)
    x2, dlogp = gen.flow.forward(params, z, temperature=1.5)
    assert_close(out.xs[0], x2[0], 2e-3)


@pytest.mark.slow
def test_trainer_per_sample_temperature_nll(key):
    from bgflow_tpu.energies.ala2 import ALA2_REFERENCE_XYZ
    from bgflow_tpu.models.ala2 import make_ala2_generator

    base = jnp.asarray(ALA2_REFERENCE_XYZ, jnp.float32).reshape(1, 66)
    data = np.asarray(base + 0.01 * jax.random.normal(key, (128, 66)))
    gen = make_ala2_generator(
        data, hidden=(8,), num_bins=4, temperature_conditioning=True
    )
    params = gen.init(jax.random.PRNGKey(1))
    temps = np.concatenate([np.ones(64), 1.5 * np.ones(64)]).astype(np.float32)
    trainer = bg.KLTrainer(
        gen, train_energy=False, likelihood_temperature_from_batch=True
    )
    step = trainer.make_train_step(batchsize_likelihood=32)
    opt_state = trainer.init(params)
    sampler = bg.DataSetSampler(jnp.asarray(data), jnp.asarray(temps))
    losses = []
    for i in range(4):
        k1, k2 = jax.random.split(jax.random.fold_in(key, i))
        batch = sampler.sample(k1, 32)
        params, opt_state, m = step(params, opt_state, k2, batch)
        losses.append(float(m["loss"]))
        assert not bool(m["skipped"])
    assert all(np.isfinite(l) for l in losses)
