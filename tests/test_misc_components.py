"""BNAF, 2D particle box, iterator sampler, jacobian utils."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bgflow_tpu as bg
from tests.conftest import assert_close


@pytest.mark.slow
def test_bnaf_density_estimation(key):
    flow = bg.BNAFlow(dim=3, block_sizes=(1, 6, 6, 1))
    params = flow.init(key)
    x = jax.random.normal(key, (8, 3), dtype=jnp.float64)
    (y,), ldj = flow.forward(params, (x,))
    assert y.shape == x.shape
    # exact dlogp vs brute-force jacobian determinant (triangular => product
    # of diagonal blocks, but slogdet of the full jacobian is the oracle)
    jac = bg.brute_force_jacobian(lambda xx: flow.forward(params, (xx,))[0][0], x)
    ref = jnp.linalg.slogdet(jac)[1]
    assert_close(ldj, ref, 1e-6)
    # monotone per dimension: jacobian diagonal positive
    assert jnp.all(jnp.diagonal(jac, axis1=-2, axis2=-1) > 0)


@pytest.mark.slow
def test_bnaf_trains_as_density_estimator(key):
    import optax

    flow = bg.BNAFlow(dim=2, block_sizes=(1, 8, 1))
    prior = bg.NormalDistribution(2)
    gen = bg.BoltzmannGenerator(prior, flow, target=None)
    params = gen.init(key)
    # bimodal data
    data = jnp.concatenate([
        jax.random.normal(key, (512, 2)) * 0.3 + jnp.asarray([1.5, 0.0]),
        jax.random.normal(jax.random.PRNGKey(1), (512, 2)) * 0.3 - jnp.asarray([1.5, 0.0]),
    ])

    def nll(p):
        # BNAF maps data -> latent in its forward; use it as the inverse map
        (z,), ldj = flow.forward(p, (data,))
        return jnp.mean(prior.energy(z) - ldj)

    opt = optax.adam(1e-2)
    state = opt.init(params)
    l0 = float(nll(params))
    for _ in range(100):
        g = jax.grad(nll)(params)
        updates, state = opt.update(g, state, params)
        import optax as _o
        params = _o.apply_updates(params, updates)
    assert float(nll(params)) < l0 - 0.3


def test_repulsive_particles(key):
    energy = bg.RepulsiveParticles()
    assert energy.dim == 76
    # grid configuration inside the box
    grid = np.stack(np.meshgrid(np.linspace(-2.5, 2.5, 7), np.linspace(-2.5, 2.5, 7)), -1)
    x0 = grid.reshape(-1, 2)[:38].reshape(-1)
    x = jnp.asarray(x0)[None].astype(jnp.float64)
    u = energy.energy(x)
    assert jnp.isfinite(u[0])
    s = energy.surrogate_energy(x)
    assert jnp.isfinite(s[0])
    # forces finite (autograd through the masked pair matrix)
    f = energy.force(x)
    assert jnp.all(jnp.isfinite(f))
    # box energy activates outside the wall
    x_out = x.at[0, 0].set(5.0)
    assert float(energy.box_energy(x_out)[0]) > 0
    assert float(energy.box_energy(x)[0]) == 0


def test_harmonic_particles(key):
    energy = bg.HarmonicParticles()
    x = jax.random.uniform(key, (3, 76), minval=-2.5, maxval=2.5)
    u = energy.energy(x)
    assert jnp.all(jnp.isfinite(u))
    # harmonic repulsion is bounded: energies stay moderate even at clashes
    x_clash = jnp.zeros((1, 76))
    assert jnp.isfinite(energy.energy(x_clash)[0])


def test_iterator_sampler(key):
    def factory():
        for i in range(4):
            yield np.full((8, 3), float(i))

    sampler = bg.IteratorSampler(factory)
    s = sampler.sample(key, 20)
    assert s.shape == (20, 3)
    assert_close(s[:8], jnp.zeros((8, 3)), 1e-7)
    # restarts after exhaustion
    s2 = sampler.sample(key, 40)
    assert s2.shape == (40, 3)


def test_jacobian_utils(key):
    w = jax.random.normal(key, (3, 3), dtype=jnp.float64)
    fn = lambda x: jnp.tanh(x @ w)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 3), dtype=jnp.float64)
    jac = bg.brute_force_jacobian(fn, x)
    assert jac.shape == (5, 3, 3)
    tr = bg.brute_force_jacobian_trace(fn, x)
    assert_close(tr, jnp.trace(jac, axis1=-2, axis2=-1), 1e-10)
