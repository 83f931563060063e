"""Boltzmann generator statistical identities.

Mirrors the reference's ``tests/test_bg.py:16-194``: identity flow at
zero-init, exact-flow ESS = n, analytic Gaussian-to-Gaussian consistency.
"""
import jax
import jax.numpy as jnp
import numpy as np

import bgflow_tpu as bg
from tests.conftest import assert_close


def _make_bg(key, dim=2, hidden=16, weight_scale=1.0):
    prior = bg.NormalDistribution(dim)
    target = bg.DoubleWellEnergy(dim)
    d1 = dim // 2
    d2 = dim - d1
    shift = bg.DenseNet([d1, hidden, d2], weight_scale=weight_scale)
    scale = bg.DenseNet([d1, hidden, d2], weight_scale=weight_scale)
    flow = bg.Chain([
        bg.Split(d1, axis=-1),
        bg.Coupling(bg.AffineTransformer(shift, scale)),
        bg.Merge(d1, axis=-1),
    ])
    gen = bg.BoltzmannGenerator(prior, flow, target)
    params = gen.init(key)
    return gen, params


def test_sample_shapes(key):
    gen, params = _make_bg(key)
    out = gen.sample(params, key, 32, with_latent=True, with_dlogp=True,
                     with_energy=True, with_log_weights=True, with_weights=True)
    assert out.x.shape == (32, 2)
    assert out.zs[0].shape == (32, 2)
    assert out.dlogp.shape == (32,)
    assert out.energy.shape == (32,)
    assert out.log_weights.shape == (32,)
    assert_close(out.weights.sum(), 1.0, 1e-5)


def test_identity_flow_at_zero_init(key):
    """Zero-initialized nets -> flow is the identity, dlogp = 0."""
    gen, params = _make_bg(key, weight_scale=0.0)
    out = gen.sample(params, key, 64, with_latent=True, with_dlogp=True)
    assert_close(out.x, out.zs[0], 1e-6)
    assert_close(out.dlogp, jnp.zeros(64), 1e-6)
    # NLL of the identity BG == prior energy
    x = jax.random.normal(key, (16, 2))
    assert_close(gen.energy(params, x), gen.prior.energy(x), 1e-5)


def test_exact_flow_ess_is_n():
    """Gaussian prior -> affine flow -> scaled Gaussian target: weights are
    uniform, so Kish ESS == n."""
    key = jax.random.PRNGKey(0)
    dim = 4
    prior = bg.NormalDistribution(dim)
    sigma = 2.0
    target = bg.NormalDistribution(dim, cov=sigma**2 * jnp.eye(dim))

    # flow: x = sigma * z (exact transport between the two Gaussians)
    flow = bg.Lambda(
        fn=lambda z: (sigma * z, jnp.full(z.shape[:1], dim * jnp.log(sigma))),
        ifn=lambda x: (x / sigma, jnp.full(x.shape[:1], -dim * jnp.log(sigma))),
    )
    gen = bg.BoltzmannGenerator(prior, flow, target)
    n = 1000
    out = gen.sample((), key, n, with_log_weights=True)
    ess = bg.effective_sample_size(out.log_weights)
    assert_close(ess, float(n), 1e-3)
    assert_close(bg.sampling_efficiency(out.log_weights), 1.0, 1e-5)
    # log weights of the exact flow are constant (= -free energy difference)
    assert_close(jnp.std(out.log_weights), 0.0, 1e-5)


def test_log_weights_match_sample_path(key):
    gen, params = _make_bg(key)
    out = gen.sample(params, key, 64, with_log_weights=True)
    # recompute through the inverse path
    logw2 = gen.log_weights(params, out.x, normalize=False)
    logw1 = out.log_weights
    # normalize both for comparison
    logw1 = logw1 - jax.scipy.special.logsumexp(logw1)
    logw2 = logw2 - jax.scipy.special.logsumexp(logw2)
    assert_close(logw1, logw2, 1e-4)


def test_kldiv_finite_and_differentiable(key):
    gen, params = _make_bg(key)
    def loss(p):
        return jnp.mean(gen.kldiv(p, key, 256))
    val, grads = jax.value_and_grad(loss)(params)
    assert jnp.isfinite(val)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert jnp.all(jnp.isfinite(leaf))


def test_bg_energy_gradient_zero_at_optimum(key):
    """Gaussian target == prior and identity-initialized flow: NLL gradient
    w.r.t. params vanishes in expectation (reference test_bg.py:130-174)."""
    dim = 2
    prior = bg.NormalDistribution(dim)
    target = bg.NormalDistribution(dim)
    shift = bg.DenseNet([1, 8, 1], weight_scale=0.0)
    scale = bg.DenseNet([1, 8, 1], weight_scale=0.0)
    flow = bg.Chain([
        bg.Split(1, axis=-1),
        bg.Coupling(bg.AffineTransformer(shift, scale)),
        bg.Merge(1, axis=-1),
    ])
    gen = bg.BoltzmannGenerator(prior, flow, target)
    params = gen.init(key)
    x = prior.sample(key, 100_000)

    grads = jax.grad(lambda p: jnp.mean(gen.energy(p, x)))(params)
    for leaf in jax.tree_util.tree_leaves(grads):
        # gradient of the last-layer weights vanishes stochastically ~ 1/sqrt(n)
        assert jnp.max(jnp.abs(leaf)) < 2e-2


def test_bg_temperature_scaling_consistency():
    """Sampling the BG at temperature T: for an exact linear flow between
    Gaussians the output std scales by sqrt(T) and log-weights stay
    constant (the exact-transport property is temperature-covariant)."""
    key = jax.random.PRNGKey(0)
    dim = 3
    sigma = 1.7
    prior = bg.NormalDistribution(dim)
    target = bg.NormalDistribution(dim, cov=sigma**2 * jnp.eye(dim))
    flow = bg.Lambda(
        fn=lambda z: (sigma * z, jnp.full(z.shape[:1], dim * jnp.log(sigma))),
        ifn=lambda x: (x / sigma, jnp.full(x.shape[:1], -dim * jnp.log(sigma))),
    )
    gen = bg.BoltzmannGenerator(prior, flow, target)
    for T in (0.5, 1.0, 4.0):
        out = gen.sample((), key, 50_000, temperature=T, with_log_weights=True)
        expected_std = sigma * (T ** 0.5)
        assert abs(float(out.x.std()) - expected_std) < 0.02 * expected_std
        assert float(jnp.std(out.log_weights)) < 1e-4


def test_bg_nll_temperature():
    """NLL at temperature T equals the T-scaled prior energy for the
    identity flow."""
    key = jax.random.PRNGKey(1)
    prior = bg.NormalDistribution(2)
    gen = bg.BoltzmannGenerator(prior, bg.Identity(), bg.NormalDistribution(2))
    x = prior.sample(key, 64)
    for T in (0.5, 2.0):
        assert_close(gen.energy((), x, temperature=T), prior.energy(x, temperature=T), 1e-6)
