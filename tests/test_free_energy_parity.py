"""Free-energy parity (the BASELINE.md correctness anchor):

A trained BG's reweighted estimate of the free-energy difference between the
two wells of an asymmetric double well must agree with exact quadrature
within Monte-Carlo error.
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

import bgflow_tpu as bg
from tests.conftest import assert_close


def _exact_delta_f(a, b, c):
    """-log(Z_right / Z_left) by quadrature over the 1D double-well marginal."""
    x = np.linspace(-6, 6, 200001)
    u = a * x + b * x**2 + c * x**4
    p = np.exp(-(u - u.min()))
    z_left = p[x < 0].sum()
    z_right = p[x >= 0].sum()
    return -np.log(z_right / z_left)


def test_bg_free_energy_matches_quadrature(key):
    a, b, c = 0.5, -4.0, 1.0  # asymmetric double well
    target = bg.DoubleWellEnergy(2, a=a, b=b, c=c)
    prior = bg.NormalDistribution(2)
    d1, d2 = 1, 1
    blocks = [bg.Split(d1, axis=-1)]
    for i in range(4):
        shift = bg.DenseNet([1, 64, 64, 1], activation=jax.nn.silu)
        scale = bg.DenseNet([1, 64, 64, 1], activation=jax.nn.silu)
        blocks += [bg.Coupling(bg.AffineTransformer(shift, scale)), bg.Swap()]
    blocks.append(bg.Merge(d1, axis=-1))
    gen = bg.BoltzmannGenerator(prior, bg.Chain(blocks), target)
    params = gen.init(key)

    trainer = bg.KLTrainer(gen, optimizer=optax.adam(3e-3), train_likelihood=False)
    step = trainer.make_train_step(batchsize_energy=512)
    opt = trainer.init(params)
    for i in range(600):
        key, sub = jax.random.split(key)
        params, opt, _ = step(params, opt, sub)

    out = gen.sample(params, jax.random.PRNGKey(99), 50_000, with_log_weights=True)
    logw = out.log_weights - jax.scipy.special.logsumexp(out.log_weights)
    right = out.x[:, 0] >= 0
    logz_right = jax.scipy.special.logsumexp(jnp.where(right, logw, -jnp.inf))
    logz_left = jax.scipy.special.logsumexp(jnp.where(~right, logw, -jnp.inf))
    delta_f_bg = float(-(logz_right - logz_left))

    delta_f_exact = _exact_delta_f(a, b, c)
    ess = float(bg.effective_sample_size(out.log_weights))
    # require decent reweighting quality, then MC-error-level agreement
    assert ess > 1000
    assert abs(delta_f_bg - delta_f_exact) < 0.1, (delta_f_bg, delta_f_exact)


def test_bar_on_bg_samples(key):
    """BAR between two temperatures of a Gaussian using BG machinery: the
    dimensionless free-energy difference is known analytically."""
    dim = 2
    u0 = bg.NormalDistribution(dim)                       # sigma = 1
    u1 = bg.NormalDistribution(dim, cov=4.0 * jnp.eye(dim))  # sigma = 2
    k0, k1 = jax.random.split(key)
    x0 = u0.sample(k0, 20_000)
    x1 = u1.sample(k1, 20_000)
    fw = u1.energy(x0) - u0.energy(x0)
    rw = u0.energy(x1) - u1.energy(x1)
    df, ddf = bg.bennett_acceptance_ratio(fw, rw)
    # both energies are normalized -> exact Delta F = 0
    assert abs(float(df)) < 3 * float(ddf) + 0.02
