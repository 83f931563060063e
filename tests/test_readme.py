"""Execute the README quickstart (the reference runs its README verbatim as
a test, ``tests/test_readme.py:1-40``); shortened iteration count."""
import jax
import jax.numpy as jnp
import optax

import bgflow_tpu as bg


def test_readme_quickstart():
    prior = bg.NormalDistribution(2)
    target = bg.DoubleWellEnergy(2)
    flow = bg.Chain([
        bg.Split(1, axis=-1),
        bg.Coupling(bg.AffineTransformer(bg.DenseNet([1, 64, 1]), bg.DenseNet([1, 64, 1]))),
        bg.Swap(),
        bg.Coupling(bg.AffineTransformer(bg.DenseNet([1, 64, 1]), bg.DenseNet([1, 64, 1]))),
        bg.Merge(1, axis=-1),
    ])
    gen = bg.BoltzmannGenerator(prior, flow, target)
    params = gen.init(jax.random.PRNGKey(0))

    trainer = bg.KLTrainer(gen, optimizer=optax.adam(2e-3), train_likelihood=False)
    step = trainer.make_train_step(batchsize_energy=512)
    opt_state = trainer.init(params)
    key = jax.random.PRNGKey(1)
    for _ in range(50):
        key, sub = jax.random.split(key)
        params, opt_state, metrics = step(params, opt_state, sub)
    assert jnp.isfinite(metrics["loss"])

    out = gen.sample(params, key, 10_000, with_log_weights=True)
    ess = bg.effective_sample_size(out.log_weights)
    assert 0 < float(ess) <= 10_000


def test_readme_builder_snippet():
    import numpy as np
    from bgflow_tpu.energies.ala2 import ALA2_FIXED_ATOMS, ALA2_Z_MATRIX

    rng = np.random.RandomState(0)
    base = np.arange(22)[:, None] * np.array([[0.15, 0.1, 0.12]])
    data = (base[None] + 0.05 * rng.randn(256, 22, 3)).reshape(256, 66)
    crd = bg.MixedCoordinateTransformation(data, ALA2_Z_MATRIX, ALA2_FIXED_ATOMS, keepdims=15)
    builder = bg.BoltzmannGeneratorBuilder(
        bg.ShapeDictionary.from_coordinate_transform(crd)
    )
    builder.add_condition(bg.TORSIONS, on=bg.FIXED, hidden=(32,))
    builder.add_condition(bg.BONDS, on=(bg.ANGLES, bg.TORSIONS), hidden=(32,))
    builder.add_map_to_ic_domains()
    builder.add_map_to_cartesian(crd)
    gen = builder.build_generator(check_target=False)
    params = gen.init(jax.random.PRNGKey(0))
    out = gen.sample(params, jax.random.PRNGKey(1), 8)
    assert out.xs[0].shape == (8, 66)
