"""Flow-perturbation importance sampling (flows/perturbation.py).

Properties under test:
* consistency — self-normalized estimates match target expectations for an
  IMPERFECT flow (the weights correct any flow quality, like exact IS);
* agreement — for a near-perfect flow the perturbed weights give high ESS;
* the Jacobian-free CNF path — integrate_no_logdet matches the transport
  of the full forward, and perturbed reweighting through a CNF agrees
  with exact-dlogp importance sampling on a solvable target.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bgflow_tpu as bg


def _self_normalized_mean(xs, log_w, f):
    w = jax.nn.softmax(log_w)
    return jnp.sum(w[:, None] * f(xs), axis=0)


def test_flow_perturbation_corrects_imperfect_flow(key):
    """Gaussian target through a deliberately wrong affine flow: the
    weighted mean/std match the target, the unweighted ones do not."""
    d = 2
    mu = jnp.asarray([2.0, -1.0])
    sigma_t = jnp.asarray([0.7, 1.4])
    target = bg.NormalDistribution(d, mean=mu, cov=jnp.diag(sigma_t**2))
    prior = bg.NormalDistribution(d)
    flow = bg.AffineFlow(d)
    params = {"log_sigma": jnp.zeros(d), "mu": 0.25 * mu}  # wrong scale+shift

    out = bg.flow_perturbation_sample(
        params, prior, flow, target, key, n_samples=20000, sigma=0.05
    )
    x = out.xs[0]
    est_mean = _self_normalized_mean(x, out.log_weights, lambda a: a)
    np.testing.assert_allclose(np.asarray(est_mean), np.asarray(mu), atol=0.12)
    # unweighted samples are NOT target-distributed (the flow is wrong)
    assert float(jnp.abs(jnp.mean(x, axis=0) - mu).max()) > 0.5


def test_flow_perturbation_isometric_flow_full_ess(key):
    """For an ISOMETRIC exact flow (pure shift, J = I) the perturbation
    weights carry no anisotropy penalty: ESS ~ n.  (A non-isometric exact
    flow caps the ESS — that irreducible single-step variance is what the
    multi-step scheme removes; see the CNF test below.)"""
    d = 3
    mu = jnp.asarray([1.0, 0.0, -1.0])
    target = bg.NormalDistribution(d, mean=mu)
    prior = bg.NormalDistribution(d)
    flow = bg.AffineFlow(d)
    params = {"log_sigma": jnp.zeros(d), "mu": mu}  # exact shift-only

    n = 8192
    out = bg.flow_perturbation_sample(
        params, prior, flow, target, key, n_samples=n, sigma=0.05
    )
    ess = float(bg.effective_sample_size(out.log_weights))
    assert ess > 0.9 * n, ess


def test_multi_step_removes_anisotropy_floor(key):
    """A linear CNF with strongly anisotropic end-to-end Jacobian: the
    single-step ESS is capped well below n; K-segment perturbation
    recovers most of it (each segment's Jacobian is near identity)."""

    class LinearDynamics:
        """dx/dt = A x with diagonal A -> J = diag(exp(A t))."""

        rates = jnp.asarray([1.2, -1.0, 0.5, -0.5])

        def init(self, key):
            return {}

        def velocity(self, params, t, x):
            return x * self.rates

        def __call__(self, params, t, x, key=None):
            dx = self.velocity(params, t, x)
            div = jnp.full(x.shape[0], float(jnp.sum(self.rates)))
            return dx, div

    d = 4
    dyn = LinearDynamics()
    flow = bg.DiffEqFlow(dyn, integrator="rk4", n_time_steps=32)
    params = {}
    # the exact pushforward of N(0, I): N(0, diag(exp(2 rates)))
    target = bg.NormalDistribution(d, cov=jnp.diag(jnp.exp(2.0 * dyn.rates)))
    prior = bg.NormalDistribution(d)

    n = 4096
    ess = {}
    for K in (1, 8):
        out = bg.flow_perturbation_sample(
            params, prior, flow, target, jax.random.fold_in(key, K),
            n_samples=n, sigma=0.02, n_steps=K,
        )
        ess[K] = float(bg.effective_sample_size(out.log_weights))
    # measured on CPU f32: ESS 210 (K=1) -> 1857 (K=8) -> 2578 (K=16)
    assert ess[1] < 0.2 * n, ess
    assert ess[8] > 4.0 * ess[1], ess
    assert ess[8] > 0.35 * n, ess


def test_integrate_no_logdet_matches_forward(key):
    """The divergence-free transport equals the coordinate part of the
    full (x, logp) integration for the same solver settings."""
    dyn = bg.KernelDynamics(4, 2, mus=jnp.linspace(0, 2, 8), gammas=0.3 * jnp.ones(8))
    flow = bg.DiffEqFlow(dyn, integrator="rk4", n_time_steps=16)
    params = flow.init(key)
    z = 0.5 * jax.random.normal(jax.random.fold_in(key, 1), (6, 8))
    (x_full,), _ = flow.forward(params, (z,))
    x_fast = flow.integrate_no_logdet(params, z)
    np.testing.assert_allclose(np.asarray(x_fast), np.asarray(x_full), atol=1e-5)
    # round trip through the fast path
    z_back = flow.integrate_no_logdet(params, x_fast, inverse=True)
    np.testing.assert_allclose(np.asarray(z_back), np.asarray(z), atol=1e-4)


def test_flow_perturbation_cnf_agrees_with_exact_is(key):
    """CNF onto a multi-well particle target: flow-perturbed estimates of
    a permutation-invariant observable agree with exact-Jacobian IS."""
    n_particles, dim = 4, 2
    D = n_particles * dim
    target = bg.MultiDoubleWellPotential(
        D, n_particles, a=0.9, b=-4.0, c=0.0, offset=4.0, two_event_dims=False
    )
    prior = bg.MeanFreeNormalDistribution(D, n_particles, two_event_dims=False)
    dyn = bg.KernelDynamics(
        n_particles, dim, mus=jnp.linspace(0, 4, 12), gammas=0.5 * jnp.ones(12)
    )
    flow = bg.DiffEqFlow(dyn, integrator="rk4", n_time_steps=12)
    params = flow.init(key)

    n = 4096
    obs = lambda x: jnp.mean(x.reshape(-1, D) ** 2, axis=-1, keepdims=True)

    # exact-Jacobian IS (closed-form divergence -> exact dlogp); same
    # identity as bg.log_weights_given_latent: log w = u_prior + dlogp - u_t
    z = prior.sample(jax.random.fold_in(key, 1), n)
    (x_ex,), dlogp = flow.forward(params, (z,))
    logw_ex = prior.energy(z) + dlogp - target.energy(x_ex)

    out = bg.flow_perturbation_sample(
        params, prior, flow, target, jax.random.fold_in(key, 2),
        n_samples=n, sigma=0.02,
    )

    m_ex = float(_self_normalized_mean(x_ex, logw_ex, obs)[0])
    m_fp = float(_self_normalized_mean(out.xs[0], out.log_weights, obs)[0])
    assert abs(m_ex - m_fp) < 0.15 * abs(m_ex), (m_ex, m_fp)
