"""Linear flows, CNFs, funnel/checkerboard, truncated-Gaussian transformer."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bgflow_tpu as bg
from bgflow_tpu.flows.linear import (
    AffineFlow,
    InvertiblePPPP,
    KroneckerProductFlow,
    PPPPScheduler,
    PseudoOrthogonalFlow,
    TriuFlow,
    pppp_merge,
)
from bgflow_tpu.flows.misc import CheckerboardFlow, FunnelFlow
from bgflow_tpu.flows.cnf import (
    BlackBoxDynamics,
    BruteForceEstimator,
    DiffEqFlow,
    HutchinsonEstimator,
    KernelDynamics,
    TimeIndependentDynamics,
    brute_force_divergence,
    hutchinson_divergence,
)
from bgflow_tpu.transformers.gaussian import TruncatedGaussianTransformer
from tests.conftest import assert_close


def _roundtrip(flow, params, xs, tol, **kw):
    ys, l_f = flow.forward(params, xs, **kw)
    xs2, l_i = flow.forward(params, ys, inverse=True, **kw)
    for a, b in zip(xs, xs2):
        assert_close(a, b, tol)
    assert_close(l_f, -l_i, tol)
    return ys, l_f


def test_affine_flow(key, dtype, tol):
    flow = AffineFlow(4)
    params = flow.init(key)
    params["log_sigma"] = 0.3 * jnp.ones(4)
    params["mu"] = jnp.arange(4.0)
    x = jax.random.normal(key, (6, 4), dtype=dtype)
    ys, ldj = _roundtrip(flow, params, (x,), tol)
    assert_close(ldj, jnp.full(6, 1.2), 1e-5)


def test_triu_flow(key, dtype, tol):
    flow = TriuFlow(5)
    params = flow.init(key)
    params["elements"] = 0.1 * jax.random.normal(key, params["elements"].shape)
    x = jax.random.normal(key, (7, 5), dtype=dtype)
    ys, ldj = _roundtrip(flow, params, (x,), 1e-4 if dtype == jnp.float32 else 1e-9)
    # ldj vs exact slogdet
    r = flow._matrix(params)
    assert_close(ldj[0], jnp.linalg.slogdet(r)[1], 1e-5)


def test_pseudo_orthogonal_flow(key, dtype, tol):
    flow = PseudoOrthogonalFlow(4)
    params = flow.init(key)
    x = jax.random.normal(key, (5, 4), dtype=dtype)
    _roundtrip(flow, params, (x,), tol)
    assert float(flow.penalty(params)) == 0.0
    params["W"] = params["W"] + 0.1
    assert float(flow.penalty(params)) > 0.0


def test_kronecker_flow(key, dtype):
    flow = KroneckerProductFlow(8)
    params = flow.init(key)
    x = jax.random.normal(key, (6, 8), dtype=dtype)
    tol = 1e-3 if dtype == jnp.float32 else 1e-8
    ys, ldj = _roundtrip(flow, params, (x,), tol)
    # orthogonal init: unit determinant
    assert_close(jnp.abs(ldj), jnp.zeros(6), 1e-4)


def test_pppp_flow_and_merge(key, dtype):
    flow = InvertiblePPPP(4)
    params = flow.init(key)
    params["u"] = 0.1 * jnp.ones(4)
    x = jax.random.normal(key, (5, 4), dtype=dtype)
    tol = 1e-4 if dtype == jnp.float32 else 1e-9
    ys, ldj = _roundtrip(flow, params, (x,), tol)
    # merge folds the rank-one update into A and resets u
    merged_params, merged = pppp_merge(flow, params, jax.random.PRNGKey(1))
    assert merged
    assert jnp.all(merged_params["u"] == 0)
    ys2, ldj2 = flow.forward(merged_params, (x,))
    assert_close(ys[0], ys2[0], 1e-4 if dtype == jnp.float32 else 1e-8)
    assert_close(ldj, ldj2, 1e-4 if dtype == jnp.float32 else 1e-8)
    # Ainv consistency after merge
    assert_close(
        merged_params["A"] @ merged_params["Ainv"], jnp.eye(4), 1e-4 if dtype == jnp.float32 else 1e-8
    )


def test_pppp_scheduler(key):
    flow = InvertiblePPPP(3)
    params = {"pppp": flow.init(key)}
    params["pppp"]["u"] = 0.05 * jnp.ones(3)
    sched = PPPPScheduler(
        [(flow, lambda p: p["pppp"], lambda p, s: {**p, "pppp": s})],
        n_force_merge=2, n_correct=2,
    )
    params, merged = sched.step(params, jax.random.PRNGKey(1))
    assert merged
    assert float(sched.penalty(params)) >= 0.0


def test_funnel_flow(key, dtype):
    flow = FunnelFlow(min_val=-1.0, max_val=1.0)
    x = jax.random.normal(key, (8, 3), dtype=dtype)
    tol = 1e-3 if dtype == jnp.float32 else 1e-8
    ys, _ = _roundtrip(flow, (), (x,), tol)
    assert jnp.all((ys[0] > -1) & (ys[0] < 1))


def test_bent_identity(key, dtype):
    flow = bg.BentIdentity()
    x = jax.random.normal(key, (8, 3), dtype=dtype)
    _roundtrip(flow, (), (x,), 1e-4 if dtype == jnp.float32 else 1e-9)


def test_checkerboard_flow(key, dtype):
    flow = CheckerboardFlow(4)
    x = jax.random.normal(key, (2, 4, 4, 3), dtype=dtype)
    ys, ldj = flow.forward((), (x,))
    assert len(ys) == 4 and ys[0].shape == (2, 2, 2, 3)
    (x2,), _ = flow.forward((), ys, inverse=True)
    assert_close(x, x2, 1e-7)


def test_divergence_estimators(key):
    w = jax.random.normal(key, (4, 4), dtype=jnp.float64)

    def f(x):
        return jnp.tanh(x @ w)

    x = jax.random.normal(jax.random.PRNGKey(1), (8, 4), dtype=jnp.float64)
    div = brute_force_divergence(f, x)
    jac = jax.vmap(jax.jacfwd(lambda xx: f(xx[None])[0]))(x)
    assert_close(div, jnp.trace(jac, axis1=-2, axis2=-1), 1e-10)
    # Hutchinson is unbiased: average over many noise draws approaches exact
    keys = jax.random.split(jax.random.PRNGKey(2), 4000)
    ests = jax.vmap(
        lambda k: hutchinson_divergence(f, x, jax.random.rademacher(k, x.shape, dtype=x.dtype))
    )(keys)
    err = jnp.abs(ests.mean(0) - div)
    sem = ests.std(0) / jnp.sqrt(4000.0)
    assert jnp.all(err < 5.0 * sem + 1e-3)


def test_diffeq_flow_roundtrip(key, dtype):
    net = bg.DenseNet([3, 16, 3], activation=jax.nn.tanh)
    dyn = BlackBoxDynamics(TimeIndependentDynamics(net), BruteForceEstimator())
    flow = DiffEqFlow(dyn, n_time_steps=16)
    params = flow.init(key)
    x = jax.random.normal(key, (6, 3), dtype=dtype)
    tol = 1e-3 if dtype == jnp.float32 else 1e-6
    _roundtrip(flow, params, (x,), tol)


def test_diffeq_flow_dlogp_vs_autodiff(key):
    """CNF dlogp vs brute-force slogdet of the flow map Jacobian (f64)."""
    dtype = jnp.float64
    net = bg.DenseNet([2, 8, 2], activation=jax.nn.tanh)
    dyn = BlackBoxDynamics(TimeIndependentDynamics(net), BruteForceEstimator())
    flow = DiffEqFlow(dyn, n_time_steps=32)
    params = flow.init(key)
    x = jax.random.normal(key, (4, 2), dtype=dtype)

    def fmap(xx):
        (y,), _ = flow.forward(params, (xx[None],))
        return y[0]

    _, dlogp = flow.forward(params, (x,))
    for i in range(4):
        jac = jax.jacfwd(fmap)(x[i])
        assert_close(dlogp[i], jnp.linalg.slogdet(jac)[1], 1e-4)


def test_diffeq_checkpointing_matches(key):
    net = bg.DenseNet([2, 8, 2], activation=jax.nn.tanh)
    dyn = BlackBoxDynamics(TimeIndependentDynamics(net), BruteForceEstimator())
    f1 = DiffEqFlow(dyn, n_time_steps=8, use_checkpoints=False)
    f2 = DiffEqFlow(dyn, n_time_steps=8, use_checkpoints=True)
    params = f1.init(key)
    x = jax.random.normal(key, (4, 2))
    (y1,), l1 = f1.forward(params, (x,))
    (y2,), l2 = f2.forward(params, (x,))
    assert_close(y1, y2, 1e-6)
    # gradients agree as well
    g1 = jax.grad(lambda p: jnp.sum(f1.forward(p, (x,))[1]))(params)
    g2 = jax.grad(lambda p: jnp.sum(f2.forward(p, (x,))[1]))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        assert_close(a, b, 1e-6)


def test_kernel_dynamics_divergence(key):
    """Closed-form divergence of the equivariant kernel dynamics vs autodiff."""
    dtype = jnp.float64
    n_particles, n_dims = 4, 2
    mus = jnp.linspace(0.0, 3.0, 6, dtype=dtype)
    gammas = 0.5 * jnp.ones(6, dtype=dtype)
    dyn = KernelDynamics(n_particles, n_dims, mus, gammas)
    params = dyn.init(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, n_particles * n_dims), dtype=dtype)
    forces, div = dyn(params, 0.5, x)
    div_bf = brute_force_divergence(lambda xx: dyn(params, 0.5, xx, compute_divergence=False)[0], x)
    # small discrepancy from the eps regularizers in distances/rbf norms
    assert_close(div, div_bf, 1e-4)


def test_hutchinson_cnf_runs(key):
    net = bg.DenseNet([3, 16, 3], activation=jax.nn.tanh)
    dyn = BlackBoxDynamics(TimeIndependentDynamics(net), HutchinsonEstimator())
    flow = DiffEqFlow(dyn, n_time_steps=8)
    params = flow.init(key)
    x = jax.random.normal(key, (6, 3))
    (y,), dlogp = flow.forward(params, (x,), key=jax.random.PRNGKey(3))
    assert y.shape == x.shape
    assert jnp.all(jnp.isfinite(dlogp))


def test_kernel_cnf_equivariant_and_invertible(key):
    """DiffEqFlow over KernelDynamics: E(n) equivariance of the integrated
    map (f(x R^T) == f(x) R^T) and round-trip inversion."""
    n_particles, n_dims = 5, 3
    dim = n_particles * n_dims
    mus = jnp.linspace(0.0, 3.0, 8)
    gammas = 0.5 * jnp.ones(8)
    dyn = KernelDynamics(n_particles, n_dims, mus, gammas)
    flow = DiffEqFlow(dyn, integrator="rk4", n_time_steps=8)
    params = flow.init(key)
    params = jax.tree.map(lambda a: 0.3 * a, params)  # keep the map tame
    x = jax.random.normal(jax.random.PRNGKey(1), (4, dim))

    q, r = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(2), (n_dims, n_dims)))
    R = q * jnp.sign(jnp.diag(r))[None, :]
    xr = (x.reshape(-1, n_particles, n_dims) @ R.T).reshape(-1, dim)
    (y,), ldj = flow.forward(params, (x,))
    (yr,), ldj_r = flow.forward(params, (xr,))
    assert_close(
        yr.reshape(-1, n_particles, n_dims),
        y.reshape(-1, n_particles, n_dims) @ R.T,
        1e-5,
    )
    assert_close(ldj, ldj_r, 1e-5)  # log-det is rotation invariant

    (x_back,), ldj_inv = flow.forward(params, (y,), inverse=True)
    assert_close(x_back, x, 1e-3)  # fixed-grid fwd/bwd are eps-inverses
    assert_close(ldj + ldj_inv, jnp.zeros_like(ldj), 1e-3)


def test_truncated_gaussian_transformer(key, dtype):
    D_cond, D = 3, 4
    mu_net = bg.DenseNet([D_cond, 16, D], activation=jax.nn.silu)
    sigma_net = bg.DenseNet([D_cond, 16, D], activation=jax.nn.silu)
    tr = TruncatedGaussianTransformer(mu_net, sigma_net)
    params = tr.init(key)
    cond = jax.random.normal(key, (6, D_cond), dtype=dtype)
    y = jax.random.uniform(jax.random.PRNGKey(1), (6, D), dtype=dtype, minval=0.05, maxval=0.95)
    z, ldj = tr.forward(params, cond, y)
    assert jnp.all((z >= 0) & (z <= 1))
    y2, ldj_inv = tr.forward(params, cond, z, inverse=True)
    assert_close(y, y2, 1e-4 if dtype == jnp.float32 else 1e-7)
    assert_close(ldj, -ldj_inv, 1e-3 if dtype == jnp.float32 else 1e-6)


def test_scaling_layers(key, dtype, tol):
    from bgflow_tpu.transformers.gaussian import EntropyScalingLayer, ScalingLayer

    flow = ScalingLayer(init_factor=2.0, dim=2)
    params = flow.init(key)
    x = jax.random.normal(key, (4, 5), dtype=dtype)
    (y,), ldj = flow.forward(params, (x,))
    assert_close(y[:, :2], 2.0 * x[:, :2], tol)
    assert_close(y[:, 2:], x[:, 2:], tol)
    assert_close(ldj, jnp.full(4, 2 * jnp.log(2.0)), 1e-5)
    _roundtrip(flow, params, (x,), tol)

    eflow = EntropyScalingLayer(init_factor=3.0, dim=2)
    eparams = eflow.init(key)
    a = jax.random.normal(key, (4, 2), dtype=dtype)
    b = jax.random.normal(jax.random.PRNGKey(1), (4, 3), dtype=dtype)
    _roundtrip(eflow, eparams, (a, b), tol)


class _LinearDynamics:
    """dx/dt = a x with exact divergence a*D (analytic logdet a*D*t)."""

    def __init__(self, a=0.5):
        self.a = a

    def init(self, key):
        return ()

    def __call__(self, params, t, x, key=None):
        return self.a * x, jnp.full(x.shape[0], self.a * x.shape[-1], dtype=x.dtype)


def test_dopri5_matches_analytic_logdet(key):
    """Adaptive dopri5 (rtol/atol control, adjoint gradients) reproduces the
    exact flow map and logdet of a linear field to solver tolerance."""
    a, tmax = 0.7, 1.0
    flow = DiffEqFlow(_LinearDynamics(a), integrator="dopri5", t_max=tmax, rtol=1e-8, atol=1e-8)
    x = jax.random.normal(key, (5, 3), dtype=jnp.float64)
    (y,), dlogp = flow.forward((), (x,))
    assert_close(y, x * jnp.exp(a * tmax), 1e-7)
    assert_close(dlogp, jnp.full(5, a * 3 * tmax), 1e-7)
    # inverse integrates the reversed field back
    (x2,), dlogp_inv = flow.forward((), (y,), inverse=True)
    assert_close(x2, x, 1e-6)
    assert_close(dlogp_inv, -dlogp, 1e-6)


def test_dopri5_matches_fine_fixed_grid(key):
    """On a neural field, dopri5 at tight tolerance agrees with a very fine
    RK4 grid — and quantifies the coarse fixed-grid logdet bias."""
    dtype = jnp.float64
    # weight_scale stiffens the field so coarse grids show a measurable bias
    net = bg.DenseNet([2, 16, 2], activation=jax.nn.tanh, weight_scale=4.0)
    dyn = BlackBoxDynamics(TimeIndependentDynamics(net), BruteForceEstimator())
    params = dyn.init(key)
    x = jax.random.normal(key, (6, 2), dtype=dtype)

    adaptive = DiffEqFlow(dyn, integrator="dopri5", rtol=1e-10, atol=1e-10)
    (y_ref,), l_ref = adaptive.forward(params, (x,))

    errs = []
    for n_steps in (4, 8, 16):
        f = DiffEqFlow(dyn, n_time_steps=n_steps)
        (_,), l = f.forward(params, (x,))
        errs.append(float(jnp.max(jnp.abs(l - l_ref))))
    # RK4 logdet bias decays ~4th order: halving dt cuts the error >= 8x
    assert errs[0] > errs[1] > errs[2]
    assert errs[0] / max(errs[2], 1e-14) > 50.0
    # fine grid has effectively converged to the adaptive answer
    f64 = DiffEqFlow(dyn, n_time_steps=64)
    (_,), l64 = f64.forward(params, (x,))
    assert_close(l64, l_ref, 1e-7)


@pytest.mark.slow
def test_dopri5_adjoint_gradients(key):
    """Gradients through the adaptive solver (continuous adjoint) agree
    with backprop through a fine fixed grid."""
    net = bg.DenseNet([2, 8, 2], activation=jax.nn.tanh)
    dyn = BlackBoxDynamics(TimeIndependentDynamics(net), BruteForceEstimator())
    params = dyn.init(key)
    x = jax.random.normal(key, (4, 2), dtype=jnp.float64)

    def loss(flow, p):
        (y,), dlogp = flow.forward(p, (x,))
        return jnp.sum(y**2) + jnp.sum(dlogp)

    g_adj = jax.grad(lambda p: loss(DiffEqFlow(dyn, integrator="dopri5", rtol=1e-9, atol=1e-9), p))(params)
    g_fix = jax.grad(lambda p: loss(DiffEqFlow(dyn, n_time_steps=64), p))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_adj), jax.tree_util.tree_leaves(g_fix)):
        assert_close(a, b, 1e-5)
