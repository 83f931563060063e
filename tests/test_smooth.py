"""Smooth bijector library: ramps, sigmoids, mixtures, implicit inversion."""
import jax
import jax.numpy as jnp
import pytest

import bgflow_tpu as bg
from bgflow_tpu.flows.smooth import (
    affine_sigmoid,
    bisection_inverse,
    elementwise_ldj,
    inverse_with_ldj,
    monomial_ramp,
    ramp_to_sigmoid,
    smooth_ramp,
    wrap_around,
)
from bgflow_tpu.transformers.smooth import SmoothSigmoidTransformer
from tests.conftest import assert_close


def test_smooth_ramp_properties():
    la = jnp.asarray(0.0)
    x = jnp.linspace(-0.5, 1.0, 50)
    y = smooth_ramp(x, la)
    assert jnp.all(y[x <= 0] == 0.0)
    assert_close(smooth_ramp(jnp.asarray(1.0), la), 1.0, 1e-6)
    # monotone
    assert jnp.all(jnp.diff(y) >= -1e-7)
    # gradient is NaN-free everywhere including x < 0
    g = jax.grad(lambda xx: smooth_ramp(xx, la))(jnp.asarray(-0.3))
    assert jnp.isfinite(g)


def test_sigmoid_from_ramp():
    sig = ramp_to_sigmoid(lambda x, la: smooth_ramp(x, la))
    la = jnp.asarray(0.5)
    x = jnp.linspace(0.01, 0.99, 21)
    y = sig(x, la)
    assert_close(sig(jnp.asarray(0.5), la), 0.5, 1e-6)
    assert jnp.all(jnp.diff(y) > 0)
    assert_close(y, 1.0 - sig(1.0 - x, la)[...], 1e-6)  # point symmetry


def test_bisection_inverse():
    f = lambda x: x**3
    y = jnp.asarray([0.001, 0.125, 0.729])
    x = bisection_inverse(f, y, 0.0, 1.0, eps=1e-10)
    assert_close(x, jnp.asarray([0.1, 0.5, 0.9]), 1e-6)


def test_inverse_with_ldj_and_implicit_gradients():
    bij = affine_sigmoid(ramp_to_sigmoid(lambda x, la: smooth_ramp(x, la)))
    params = (jnp.asarray(0.4), jnp.asarray(0.5), jnp.asarray(1.0), jnp.asarray(0.2))
    fwd = elementwise_ldj(bij)
    inv = inverse_with_ldj(bij)
    x = jnp.linspace(0.05, 0.95, 9)
    y, ldj_f = fwd(x, *params)
    x2, ldj_i = inv(y, *params)
    assert_close(x, x2, 1e-6)
    assert_close(ldj_f, -ldj_i, 1e-5)
    # implicit gradient of the inverse vs numerical derivative
    g = jax.grad(lambda yy: inv(yy, *params)[0].sum())(y)
    eps = 1e-5
    num = (inv(y + eps, *params)[0] - inv(y - eps, *params)[0]) / (2 * eps)
    assert_close(g, num, 1e-3)
    # gradient w.r.t. bijector parameters flows
    gp = jax.grad(lambda s: inv(y, s, *params[1:])[0].sum())(params[0])
    assert jnp.isfinite(gp)


def test_smooth_transformer_roundtrip(key):
    D_cond, D, K = 2, 3, 4
    net = bg.DenseNet([D_cond, 32, 5 * K * D], activation=jax.nn.silu)
    tr = SmoothSigmoidTransformer(net, n_components=K)
    params = tr.init(key)
    cond = jax.random.normal(key, (6, D_cond))
    y = jax.random.uniform(jax.random.PRNGKey(1), (6, D), minval=0.02, maxval=0.98)
    z, ldj = tr.forward(params, cond, y)
    assert jnp.all((z >= 0) & (z <= 1))
    y2, ldj_inv = tr.forward(params, cond, z, inverse=True)
    assert_close(y, y2, 1e-4)
    assert_close(ldj, -ldj_inv, 1e-3)


def test_smooth_transformer_circular(key):
    D_cond, D, K = 2, 3, 4
    net = bg.DenseNet([D_cond, 32, 5 * K * D], activation=jax.nn.silu)
    tr = SmoothSigmoidTransformer(net, n_components=K, is_circular=True)
    params = tr.init(key)
    cond = jax.random.normal(key, (4, D_cond))
    y = jax.random.uniform(jax.random.PRNGKey(1), (4, D))
    z, ldj = tr.forward(params, cond, y)
    assert jnp.all((z >= 0) & (z <= 1))
    y2, _ = tr.forward(params, cond, z, inverse=True)
    assert_close(y, y2, 1e-4)
    # boundary continuity of the density
    eps = 1e-4
    _, l0 = tr.forward(params, cond, jnp.full((4, D), eps))
    _, l1 = tr.forward(params, cond, jnp.full((4, D), 1 - eps))
    assert_close(l0, l1, 5e-2)


def test_smooth_transformer_in_coupling_trains(key):
    """Smooth transformer trains a small BG end to end."""
    import optax

    prior = bg.UniformDistribution(low=jnp.zeros(2), high=jnp.ones(2))
    target = bg.MixtureDistribution([
        bg.TruncatedNormalDistribution(mu=jnp.asarray([0.25, 0.5]), sigma=0.1,
                                       lower_bound=0.0, upper_bound=1.0),
        bg.TruncatedNormalDistribution(mu=jnp.asarray([0.75, 0.5]), sigma=0.1,
                                       lower_bound=0.0, upper_bound=1.0),
    ])
    K = 4
    net = bg.DenseNet([1, 32, 5 * K], activation=jax.nn.silu)
    flow = bg.Chain([
        bg.Split(1, axis=-1),
        bg.Coupling(SmoothSigmoidTransformer(net, n_components=K)),
        bg.Merge(1, axis=-1),
    ])
    gen = bg.BoltzmannGenerator(prior, flow, target)
    params = gen.init(key)
    trainer = bg.KLTrainer(gen, optimizer=optax.adam(5e-3), train_likelihood=False)
    step = trainer.make_train_step(batchsize_energy=256)
    opt = trainer.init(params)
    losses = []
    for i in range(60):
        key, sub = jax.random.split(key)
        params, opt, m = step(params, opt, sub)
        losses.append(float(m["loss"]))
    assert sum(losses[-10:]) / 10 < sum(losses[:10]) / 10
