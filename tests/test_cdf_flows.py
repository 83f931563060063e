"""CDF-based flows, modulo flows, and conditioner-net coverage."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bgflow_tpu as bg
from tests.conftest import assert_close


def test_cdf_transform_roundtrip(key):
    dist = bg.TruncatedNormalDistribution(
        mu=jnp.array([0.4, 0.6]), sigma=0.2, lower_bound=0.0, upper_bound=1.0
    )
    flow = bg.CDFTransform(dist)
    x = jax.random.uniform(key, (16, 2), minval=0.05, maxval=0.95)
    (u,), ldj = flow.forward((), (x,))
    assert jnp.all((u >= 0) & (u <= 1))
    (x2,), ldj_inv = flow.forward((), (u,), inverse=True)
    assert_close(x, x2, 1e-4)
    assert_close(ldj, -ldj_inv, 1e-3)


def test_cdf_transform_pushes_to_uniform(key):
    """CDF of samples from the distribution is uniform."""
    dist = bg.DiagonalNormal(mu=jnp.zeros(1), sigma=2.0)
    flow = bg.CDFTransform(dist)
    x = dist.sample(key, 20_000)
    (u,), _ = flow.forward((), (x,))
    hist, _ = np.histogram(np.asarray(u), bins=10, range=(0, 1))
    assert hist.min() > 1500  # roughly flat


def test_distribution_transfer_flow(key):
    source = bg.DiagonalNormal(mu=jnp.zeros(2), sigma=1.0)
    target_d = bg.TruncatedNormalDistribution(
        mu=jnp.full(2, 0.5), sigma=0.2, lower_bound=0.0, upper_bound=1.0
    )
    flow = bg.DistributionTransferFlow(source, target_d)
    params = flow.init(None)
    x = source.sample(key, 5000)
    (y,), ldj = flow.forward(params, (x,))
    assert jnp.all((y >= 0) & (y <= 1))
    # transferred samples follow the target distribution
    assert abs(float(y.mean()) - 0.5) < 0.02
    (x2,), _ = flow.forward(params, (y,), inverse=True)
    assert_close(x, x2, 1e-3)


def test_constrain_gaussian_flow(key):
    flow = bg.ConstrainGaussianFlow(mu=jnp.zeros(3), sigma=1.0, lower_bound=-2.0, upper_bound=2.0)
    x = jax.random.normal(key, (64, 3)) * 3.0
    (y,), ldj = flow.forward((), (x,))
    assert jnp.all((y >= -2.0) & (y <= 2.0))
    assert jnp.all(jnp.isfinite(ldj))


def test_increase_multiplicity_flow(key):
    flow = bg.IncreaseMultiplicityFlow(multiplicities=3)
    x = jax.random.uniform(key, (32, 4))
    (y,), ldj = flow.forward((), (x,), key=jax.random.PRNGKey(1))
    assert jnp.all((y >= 0) & (y <= 1))
    assert jnp.all(ldj == 0)
    # inverse projects back onto the base sheaf
    (x2,), _ = flow.forward((), (y,), inverse=True)
    assert_close(x, x2, 1e-5)


def test_circular_shift_flow(key):
    flow = bg.CircularShiftFlow(shift=0.3)
    x = jax.random.uniform(key, (8, 3))
    (y,), _ = flow.forward((), (x,))
    assert_close(jnp.mod(y - 0.3, 1.0), jnp.mod(x, 1.0), 1e-6)
    (x2,), _ = flow.forward((), (y,), inverse=True)
    assert_close(x, x2, 1e-6)


def test_wrap_distances_net(key):
    inner = bg.DenseNet([2 + 3, 8, 4])  # 2 other + C(3,2)=3 distances
    net = bg.WrapDistances(inner, indices=np.arange(2, 11))
    params = net.init(key)
    x = jax.random.normal(key, (5, 11))
    y = net.apply(params, x)
    assert y.shape == (5, 4)
    # translation invariance of the distance features
    shift = jnp.zeros(11).at[2:].add(jnp.tile(jnp.asarray([1.0, -2.0, 0.5]), 3))
    y2 = net.apply(params, x + shift)
    assert_close(y, y2, 1e-5)


def test_mean_free_dense_net(key):
    net = bg.MeanFreeDenseNet([3, 8, 5])
    params = net.init(key)
    y = net.apply(params, jax.random.normal(key, (4, 3)))
    assert_close(y.mean(axis=-1), jnp.zeros(4), 1e-6)


def test_product_sampler_temperature(key):
    p = bg.ProductDistribution([
        bg.NormalDistribution(2),
        bg.TruncatedNormalDistribution(mu=jnp.full(2, 0.5), sigma=0.1,
                                       lower_bound=0.0, upper_bound=1.0),
    ])
    s = p.sample(key, 50_000, temperature=4.0)
    assert abs(float(s[0].std()) - 2.0) < 0.05  # sqrt(T) scaling
    assert jnp.all((s[1] >= 0) & (s[1] <= 1))


def test_linlogcut_energy_in_bg(key):
    base = bg.LennardJonesPotential(dim=6, n_particles=2, oscillator=True, two_event_dims=False)
    capped = bg.LinLogCutEnergy(base, high_energy=100.0)
    # overlapping particles: raw LJ explodes, capped stays moderate
    x = jnp.array([[0.0, 0.0, 0.0, 1e-3, 0.0, 0.0]])
    assert float(base.energy(x)[0]) > 1e6
    assert float(capped.energy(x)[0]) < 150.0
    g = jax.grad(lambda xx: capped.energy(xx).sum())(x)
    assert jnp.all(jnp.isfinite(g))


@pytest.mark.slow
def test_learnable_truncated_cdf_flow_trains(key):
    """The learnable marginal layer adapts its mu/sigma by NLL training."""
    import optax

    flow = bg.LearnableTruncatedCDFFlow(mu_init=jnp.full(2, 0.5), sigma_init=0.5)
    prior = bg.UniformDistribution(low=jnp.zeros(2), high=jnp.ones(2))
    gen = bg.BoltzmannGenerator(prior, flow, target=None)
    params = gen.init(key)
    # data concentrated at 0.7 with narrow spread
    data = jnp.clip(0.7 + 0.05 * jax.random.normal(key, (4096, 2)), 0.01, 0.99)

    def nll(p):
        return jnp.mean(gen.energy(p, data))

    opt = optax.adam(5e-2)
    state = opt.init(params)
    l0 = float(nll(params))
    for _ in range(200):
        g = jax.grad(nll)(params)
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
    assert float(nll(params)) < l0 - 0.5
    assert abs(float(params["mu"][0]) - 0.7) < 0.05
    assert float(jnp.exp(params["log_sigma"][0])) < 0.15
    # still a valid bijection after training
    u = jax.random.uniform(jax.random.PRNGKey(1), (16, 2), minval=0.02, maxval=0.98)
    (x,), ldj = flow.forward(params, (u,))
    (u2,), ldj_inv = flow.forward(params, (x,), inverse=True)
    assert_close(u, u2, 1e-4)
    assert_close(ldj, -ldj_inv, 1e-3)
