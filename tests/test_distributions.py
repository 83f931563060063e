"""Distribution tests: normalization constants, sampling moments, bounds."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bgflow_tpu as bg
from tests.conftest import assert_close


def test_normal_energy_is_normalized(key):
    d = bg.NormalDistribution(3)
    x = jax.random.normal(key, (10, 3), dtype=jnp.float64)
    # -log p for standard normal
    expected = 0.5 * jnp.sum(x**2, axis=-1) + 1.5 * jnp.log(2 * jnp.pi)
    assert_close(d.energy(x), expected, 1e-10)


def test_normal_with_cov(key):
    mean = jnp.array([1.0, -2.0])
    cov = jnp.array([[2.0, 0.5], [0.5, 1.0]])
    d = bg.NormalDistribution(2, mean=mean, cov=cov)
    x = jax.random.normal(key, (5, 2), dtype=jnp.float64)
    # compare with multivariate normal logpdf
    from scipy.stats import multivariate_normal

    expected = -multivariate_normal(np.asarray(mean), np.asarray(cov)).logpdf(np.asarray(x))
    assert_close(d.energy(x), expected, 1e-4)
    # sampling moments
    s = d.sample(key, 200_000)
    assert_close(jnp.mean(s, axis=0), mean, 2e-2)
    emp_cov = jnp.cov(s.T)
    assert_close(emp_cov, cov, 5e-2)


def test_normal_temperature_scaling(key):
    d = bg.NormalDistribution(2)
    s = d.sample(key, 100_000, temperature=4.0)
    assert_close(jnp.std(s, axis=0), 2.0 * jnp.ones(2), 2e-2)


def test_truncated_normal_bounds_and_energy(key):
    d = bg.TruncatedNormalDistribution(
        mu=jnp.array([1.0, 2.0]), sigma=jnp.array([1.0, 0.5]),
        lower_bound=0.0, upper_bound=3.0,
    )
    s = d.sample(key, 10_000)
    assert s.shape == (10_000, 2)
    assert jnp.all((s >= 0.0) & (s <= 3.0))
    # out-of-bounds energy is +inf
    e = d.energy(jnp.array([[5.0, 1.0]]))
    assert jnp.isinf(e[0])
    # cdf/icdf inverse pair
    x = jnp.array([0.5, 1.5])
    assert_close(d.icdf(d.cdf(x)), x, 1e-5)


def test_truncated_normal_high_temperature_in_bounds(key):
    d = bg.TruncatedNormalDistribution(mu=jnp.array([1.0]), sigma=jnp.array([0.3]),
                                       lower_bound=0.0, upper_bound=2.0)
    s = d.sample(key, 10_000, temperature=9.0)
    assert jnp.all((s >= 0.0) & (s <= 2.0))


def test_truncated_normal_rejection_sampling(key):
    """Rejection mode (reference normal.py:168-183): in-bounds, and the
    empirical distribution matches the icdf route."""
    kwargs = dict(mu=jnp.array([1.0, 2.0]), sigma=jnp.array([1.0, 0.5]),
                  lower_bound=0.0, upper_bound=3.0)
    d_rej = bg.TruncatedNormalDistribution(sampling_method="rejection", **kwargs)
    d_icdf = bg.TruncatedNormalDistribution(**kwargs)
    s = d_rej.sample(key, 50_000)
    assert s.shape == (50_000, 2)
    assert jnp.all((s >= 0.0) & (s <= 3.0))
    s2 = d_icdf.sample(jax.random.PRNGKey(1), 50_000)
    assert_close(jnp.mean(s, axis=0), jnp.mean(s2, axis=0), 2e-2)
    assert_close(jnp.std(s, axis=0), jnp.std(s2, axis=0), 2e-2)
    # temperature scaling stays in bounds too
    st = d_rej.sample(jax.random.PRNGKey(2), 10_000, temperature=9.0)
    assert jnp.all((st >= 0.0) & (st <= 3.0))


def test_truncated_normal_rejection_far_tail(key):
    """A band 9 sigma into the tail: the icdf route saturates (ndtri of a
    clipped cdf lands OUT of the band), while the Robert-style tail proposal
    samples the exact conditional density."""
    kwargs = dict(mu=jnp.array([0.0]), sigma=jnp.array([1.0]),
                  lower_bound=9.0, upper_bound=10.0)
    d = bg.TruncatedNormalDistribution(sampling_method="rejection", **kwargs)
    s = d.sample(key, 20_000)
    assert jnp.all((s >= 9.0) & (s <= 10.0))
    # E[x | 9 <= x <= 10] = 9.1089... for a standard normal
    assert abs(float(jnp.mean(s)) - 9.109) < 0.01
    # mirrored band in the lower tail
    d2 = bg.TruncatedNormalDistribution(
        mu=jnp.array([0.0]), sigma=jnp.array([1.0]),
        lower_bound=-10.0, upper_bound=-9.0, sampling_method="rejection")
    s2 = d2.sample(key, 20_000)
    assert jnp.all((s2 >= -10.0) & (s2 <= -9.0))
    assert abs(float(jnp.mean(s2)) + 9.109) < 0.01


def test_mean_free_normal(key):
    d = bg.MeanFreeNormalDistribution(dim=9, n_particles=3)
    s = d.sample(key, 100)
    assert s.shape == (100, 3, 3)
    assert_close(jnp.mean(s, axis=1), jnp.zeros((100, 3)), 1e-6)
    e = d.energy(s)
    assert e.shape == (100,)


def test_uniform(key):
    d = bg.UniformDistribution(low=jnp.zeros(3), high=jnp.ones(3))
    s = d.sample(key, 1000)
    assert jnp.all((s >= 0) & (s <= 1))
    e = d.energy(jnp.array([[0.5, 0.5, 0.5], [0.5, 1.5, 0.5]]))
    assert e[0] == 0.0
    assert jnp.isinf(e[1])


def test_mixture(key):
    c1 = bg.NormalDistribution(2, mean=jnp.array([-3.0, 0.0]))
    c2 = bg.NormalDistribution(2, mean=jnp.array([3.0, 0.0]))
    m = bg.MixtureDistribution([c1, c2])
    s = m.sample(key, 20_000)
    assert s.shape == (20_000, 2)
    # bimodal: roughly half of samples on each side
    frac = jnp.mean(s[:, 0] > 0)
    assert 0.4 < frac < 0.6
    # -log(0.5 p1 + 0.5 p2) is at most u1 + log 2 (and close to it far from c2)
    x = jnp.array([[-3.0, 0.0]])
    assert m.energy(x)[0] <= c1.energy(x)[0] + jnp.log(2.0) + 1e-6


def test_product_distribution(key):
    p = bg.ProductDistribution([
        bg.NormalDistribution(2),
        bg.UniformDistribution(low=jnp.zeros(3), high=jnp.ones(3)),
    ])
    s = p.sample(key, 10)
    assert isinstance(s, tuple) and len(s) == 2
    assert s[0].shape == (10, 2) and s[1].shape == (10, 3)
    e = p.energy(*s)
    assert e.shape == (10,)


def test_product_cat_dim(key):
    p = bg.ProductDistribution([
        bg.NormalDistribution(2),
        bg.NormalDistribution(3),
    ], cat_dim=-1)
    s = p.sample(key, 10)
    assert s.shape == (10, 5)
    e = p.energy(s)
    ref = bg.NormalDistribution(5).energy(s)
    assert_close(e, ref, 1e-6)


def test_energy_force(key):
    d = bg.DoubleWellEnergy(2)
    x = jax.random.normal(key, (5, 2), dtype=jnp.float64)
    f = d.force(x)
    # analytic force: -du/dx
    x0 = x[:, 0]
    expected_f0 = -(d.a + 2 * d.b * x0 + 4 * d.c * x0**3)
    assert_close(f[:, 0], expected_f0, 1e-10)
    assert_close(f[:, 1], -x[:, 1], 1e-10)


def test_lennard_jones_dimer():
    lj = bg.LennardJonesPotential(dim=6, n_particles=2, eps=1.0, rm=1.0, oscillator=False)
    # dimer at the minimum distance -> energy = -eps
    x = jnp.array([[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]]])
    assert_close(lj.energy(x), jnp.array([-1.0]), 1e-5)


def test_multi_double_well():
    mdw = bg.MultiDoubleWellPotential(dim=4, n_particles=2, a=1.0, b=-2.0, c=0.5, offset=2.0)
    x = jnp.array([[[0.0, 0.0], [2.0, 0.0]]])  # distance = 2 = offset
    assert_close(mdw.energy(x), jnp.array([0.5]), 1e-6)


def test_linlogcut():
    x = jnp.array([-5.0, 100.0, 1e6, jnp.inf])
    y = bg.linlogcut(x, high_val=1e3, max_val=1e9)
    assert y[0] == -5.0
    assert y[1] == 100.0
    assert y[2] < 1e3 + 20
    assert jnp.isfinite(y[3])


def test_gradient_clipped_energy(key):
    base = bg.DoubleWellEnergy(2)
    clipped = bg.GradientClippedEnergy(base, gradient_cutoff=0.1)
    x = 10.0 * jax.random.normal(key, (4, 2), dtype=jnp.float64)
    g = jax.grad(lambda xx: clipped.energy(xx).sum())(x)
    norms = jnp.linalg.norm(g.reshape(4, -1), axis=-1)
    assert jnp.all(norms <= 0.1 + 1e-6)


def test_circular_normal_distribution(key):
    d = bg.CircularNormalDistribution(mu=jnp.array([0.3]), sigma=0.05)
    s = d.sample(key, 50_000)
    assert s.shape == (50_000, 1)
    assert jnp.all((s >= 0) & (s <= 1))
    # concentrated around mu with circular std ~ sigma
    assert abs(float(s.mean()) - 0.3) < 0.01
    assert abs(float(s.std()) - 0.05) < 0.01
    # energy is a normalized negative log density: check ratio against the
    # analytic von Mises density at two points
    x1 = jnp.array([[0.3]])
    x2 = jnp.array([[0.4]])
    de = float(d.energy(x2)[0] - d.energy(x1)[0])
    kappa = float((2 * jnp.pi * 0.05) ** (-2))
    expected = kappa * (1.0 - jnp.cos(2 * jnp.pi * 0.1))
    assert abs(de - float(expected)) < 1e-3


def test_von_mises_low_concentration_is_uniformish(key):
    from bgflow_tpu.distributions.normal import sample_von_mises
    theta = sample_von_mises(key, 0.0, 0.01, (100_000,))
    # nearly uniform on [-pi, pi]
    import numpy as np
    hist, _ = np.histogram(np.asarray(theta), bins=8, range=(-np.pi, np.pi))
    assert hist.min() > 10_000
