"""EquivariantCouplingFlow: symmetries, inversion, log-det, BG integration.

Mirrors the reference's equivariant-RNVP notebook capability
(``notebooks/example_equivariant_RNVP.ipynb``) — deterministic equivariant
couplings on mean-free particle systems, complementing the equivariant
CNF tests (tests/test_lj_cluster.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bgflow_tpu as bg

N, D = 4, 2


def _mean_free(key, b=8):
    x = jax.random.normal(key, (b, N, D))
    return (x - x.mean(axis=1, keepdims=True)).reshape(b, -1)


@pytest.fixture
def flow_and_params(key):
    flow = bg.EquivariantCouplingFlow(N, D, n_blocks=3, n_rbf=8, hidden=(16,))
    params = flow.init(key)
    # random (non-identity) parameters so symmetry tests are nontrivial
    params = jax.tree_util.tree_map(
        lambda p: p + 0.3 * jax.random.normal(jax.random.PRNGKey(p.size), p.shape),
        params,
    )
    return flow, params


def test_identity_at_init(key):
    flow = bg.EquivariantCouplingFlow(N, D, n_blocks=3)
    params = flow.init(key)
    x, v = _mean_free(jax.random.fold_in(key, 1)), _mean_free(jax.random.fold_in(key, 2))
    (y, w), ldj = flow.forward(params, (x, v))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(w), np.asarray(v), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ldj), 0.0, atol=1e-6)


def test_round_trip(flow_and_params, key):
    flow, params = flow_and_params
    x, v = _mean_free(jax.random.fold_in(key, 1)), _mean_free(jax.random.fold_in(key, 2))
    (y, w), ldj = flow.forward(params, (x, v))
    (x2, v2), ldj_inv = flow.forward(params, (y, w), inverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ldj + ldj_inv), 0.0, atol=1e-5)
    # outputs stay mean-free (the flow preserves the subspace)
    np.testing.assert_allclose(
        np.asarray(y.reshape(-1, N, D).mean(axis=1)), 0.0, atol=1e-5
    )


def test_rotation_equivariance(flow_and_params, key):
    flow, params = flow_and_params
    x, v = _mean_free(jax.random.fold_in(key, 1)), _mean_free(jax.random.fold_in(key, 2))
    th = 0.7
    R = jnp.asarray([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])

    def rot(a):
        return (a.reshape(-1, N, D) @ R.T).reshape(a.shape)

    (y, w), ldj = flow.forward(params, (x, v))
    (yr, wr), ldj_r = flow.forward(params, (rot(x), rot(v)))
    np.testing.assert_allclose(np.asarray(yr), np.asarray(rot(y)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(wr), np.asarray(rot(w)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ldj_r), np.asarray(ldj), atol=1e-5)


def test_permutation_equivariance(flow_and_params, key):
    flow, params = flow_and_params
    x, v = _mean_free(jax.random.fold_in(key, 1)), _mean_free(jax.random.fold_in(key, 2))
    perm = jnp.asarray([2, 0, 3, 1])

    def pp(a):
        return a.reshape(-1, N, D)[:, perm].reshape(a.shape)

    (y, w), ldj = flow.forward(params, (x, v))
    (yp, wp), ldj_p = flow.forward(params, (pp(x), pp(v)))
    np.testing.assert_allclose(np.asarray(yp), np.asarray(pp(y)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(wp), np.asarray(pp(w)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ldj_p), np.asarray(ldj), atol=1e-5)


def test_ldj_matches_subspace_jacobian(flow_and_params, key):
    """The reported log-det equals slogdet of the Jacobian restricted to
    the mean-free subspace of both channels."""
    flow, params = flow_and_params
    # orthonormal basis of the per-dimension mean-free subspace
    q, _ = np.linalg.qr(np.eye(N) - np.ones((N, N)) / N)
    q = jnp.asarray(q[:, : N - 1])  # (N, N-1)

    def lift(z):  # ((N-1)*D,) -> (N*D,)
        return (q @ z.reshape(N - 1, D)).reshape(-1)

    def proj(a):  # (N*D,) -> ((N-1)*D,)
        return (q.T @ a.reshape(N, D)).reshape(-1)

    def f(z):
        zx, zv = jnp.split(z, 2)
        (y, w), _ = flow.forward(params, (lift(zx)[None], lift(zv)[None]))
        return jnp.concatenate([proj(y[0]), proj(w[0])])

    z = 0.5 * jax.random.normal(key, (2 * (N - 1) * D,))
    jac = jax.jacfwd(f)(z)
    _, logdet = jnp.linalg.slogdet(jac)
    zx, zv = jnp.split(z, 2)
    _, ldj = flow.forward(params, (lift(zx)[None], lift(zv)[None]))
    np.testing.assert_allclose(float(ldj[0]), float(logdet), rtol=1e-4, atol=1e-5)


def test_augmented_bg_trains(key):
    """BG on the augmented pair (x, v): MultiDoubleWell target + Gaussian
    kinetic channel, mean-free priors; a few reverse-KL steps reduce loss."""
    import optax

    dim = N * D
    target_x = bg.MultiDoubleWellPotential(
        dim, N, a=0.9, b=-4.0, c=0.0, offset=4.0, two_event_dims=False
    )
    kinetic = bg.MeanFreeNormalDistribution(dim, N, two_event_dims=False)
    target = bg.ProductEnergy([target_x, kinetic])
    prior = bg.ProductDistribution([
        bg.MeanFreeNormalDistribution(dim, N, two_event_dims=False),
        bg.MeanFreeNormalDistribution(dim, N, two_event_dims=False),
    ])
    flow = bg.EquivariantCouplingFlow(N, D, n_blocks=2, n_rbf=8, hidden=(16,))
    gen = bg.BoltzmannGenerator(prior, flow, target)
    params = gen.init(key)
    trainer = bg.KLTrainer(gen, train_likelihood=False, optimizer=optax.adam(5e-3))
    step = trainer.make_train_step(batchsize_energy=128)
    opt = trainer.init(params)
    k = jax.random.fold_in(key, 1)
    losses = []
    for _ in range(60):
        k, sub = jax.random.split(k)
        params, opt, m = step(params, opt, sub)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10])
