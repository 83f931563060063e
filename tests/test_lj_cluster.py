"""Equivariant LJ-cluster CNF model: symmetry and trainability."""
import jax
import jax.numpy as jnp
import optax
import pytest

import bgflow_tpu as bg
from bgflow_tpu.models.lj_cluster import LJClusterModel, make_lj_cluster_generator
from tests.conftest import assert_close


@pytest.fixture(scope="module")
def model():
    return LJClusterModel.create(
        jax.random.PRNGKey(0), n_particles=6, n_dimensions=2, n_kernels=8, n_time_steps=8
    )


def test_lj_model_samples(model):
    out = model.generator.sample(model.params, jax.random.PRNGKey(1), 16,
                                 with_dlogp=True, with_log_weights=True)
    assert out.xs[0].shape == (16, 12)
    assert jnp.all(jnp.isfinite(out.xs[0]))
    assert jnp.all(jnp.isfinite(out.log_weights))


def test_lj_flow_is_equivariant(model):
    """Rotating the latent rotates the output: F(Rz) = R F(z)."""
    gen, params = model.generator, model.params
    z = gen.prior.sample(jax.random.PRNGKey(2), 4)
    theta = 0.8
    rot = jnp.asarray([[jnp.cos(theta), -jnp.sin(theta)], [jnp.sin(theta), jnp.cos(theta)]])

    def apply_rot(x):
        return (x.reshape(-1, 6, 2) @ rot.T).reshape(-1, 12)

    (x1,), ldj1 = gen.flow.forward(params, (z,))
    (x2,), ldj2 = gen.flow.forward(params, (apply_rot(z),))
    assert_close(x2, apply_rot(x1), 1e-4)
    assert_close(ldj1, ldj2, 1e-4)


def test_lj_flow_is_permutation_equivariant(model):
    gen, params = model.generator, model.params
    z = gen.prior.sample(jax.random.PRNGKey(3), 4)
    perm = jnp.asarray([3, 1, 0, 5, 4, 2])

    def apply_perm(x):
        return x.reshape(-1, 6, 2)[:, perm].reshape(-1, 12)

    (x1,), _ = gen.flow.forward(params, (z,))
    (x2,), _ = gen.flow.forward(params, (apply_perm(z),))
    assert_close(x2, apply_perm(x1), 1e-4)


def test_lj_model_trains(model):
    gen, params = model.generator, model.params
    trainer = bg.KLTrainer(gen, optimizer=optax.adam(1e-3), train_likelihood=False)
    step = trainer.make_train_step(batchsize_energy=64)
    opt = trainer.init(params)
    key = jax.random.PRNGKey(4)
    losses = []
    for _ in range(30):
        key, sub = jax.random.split(key)
        params, opt, m = step(params, opt, sub)
        losses.append(float(m["loss"]))
    assert all(jnp.isfinite(jnp.asarray(losses)))
    assert sum(losses[-5:]) / 5 < sum(losses[:5]) / 5
