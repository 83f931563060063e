"""Learnable elementwise marginal spline flow (flows/marginal.py)."""
import jax
import jax.numpy as jnp
import numpy as np

import bgflow_tpu as bg
from bgflow_tpu.flows.marginal import MarginalSplineFlow
from tests.conftest import assert_close


def _rand_params(flow, key):
    params = flow.init(key)
    keys = jax.random.split(key, len(params))
    return {
        k: 0.5 * jax.random.normal(kk, v.shape, v.dtype)
        for (k, v), kk in zip(params.items(), keys)
    }


def test_identity_at_init(key, dtype, tol):
    flow = MarginalSplineFlow(5, num_bins=6, is_circular=[True, True, False, False, True])
    params = flow.init(key)
    x = jax.random.uniform(key, (7, 5), dtype=dtype)
    (y,), ldj = flow.forward(params, (x,))
    assert_close(y, x, 1e-6)
    assert_close(ldj, jnp.zeros(7), 1e-6)


def test_roundtrip_and_ldj(key, dtype, tol):
    flow = MarginalSplineFlow(4, num_bins=8, is_circular=[True, False, True, False])
    params = _rand_params(flow, key)
    x = jax.random.uniform(jax.random.fold_in(key, 1), (16, 4), dtype=dtype)
    x = jnp.clip(x, 1e-3, 1.0 - 1e-3)
    (y,), l_f = flow.forward(params, (x,))
    assert jnp.all((y >= 0.0) & (y <= 1.0))
    (x2,), l_i = flow.forward(params, (y,), inverse=True)
    assert_close(x, x2, 5e-5 if dtype == jnp.float32 else 1e-9)
    assert_close(l_f, -l_i, 5e-4 if dtype == jnp.float32 else 1e-8)


def test_ldj_vs_jacobian(key):
    flow = MarginalSplineFlow(3, num_bins=5, is_circular=False)
    params = _rand_params(flow, key)
    x = jnp.clip(jax.random.uniform(key, (6, 3), dtype=jnp.float64), 5e-3, 1 - 5e-3)

    def f(xi):
        (yi,), _ = flow.forward(params, (xi[None],))
        return yi[0]

    _, ldj = flow.forward(params, (x,))
    for i in range(x.shape[0]):
        J = jax.jacfwd(f)(x[i])
        assert_close(ldj[i], jnp.linalg.slogdet(J)[1], 1e-6)


def test_circular_periodic_density(key):
    """For circular dims the derivative (density) matches across the seam."""
    flow = MarginalSplineFlow(2, num_bins=6, is_circular=True)
    params = _rand_params(flow, key)
    params["shift"] = jnp.zeros(2)  # isolate the spline's own periodicity
    eps = 1e-6
    x_lo = jnp.full((1, 2), eps)
    x_hi = jnp.full((1, 2), 1.0 - eps)

    def deriv(xv):
        (y,), _ = flow.forward(params, (xv,))
        return y

    d_lo = jax.jacfwd(lambda v: deriv(v.reshape(1, 2))[0, 0])(x_lo.reshape(-1))[0]
    d_hi = jax.jacfwd(lambda v: deriv(v.reshape(1, 2))[0, 0])(x_hi.reshape(-1))[0]
    assert_close(d_lo, d_hi, 1e-3)


def test_circular_shift_wraps(key):
    flow = MarginalSplineFlow(2, num_bins=4, is_circular=[True, False])
    params = flow.init(key)
    params["shift"] = jnp.asarray([0.25, 0.0])
    x = jnp.asarray([[0.9, 0.9]])
    (y,), ldj = flow.forward(params, (x,))
    # circular dim: shifted mod 1 through an identity spline; ldj stays 0
    assert_close(y[0, 0], jnp.asarray(0.15), 1e-6)
    assert_close(y[0, 1], jnp.asarray(0.9), 1e-6)
    assert_close(ldj, jnp.zeros(1), 1e-6)
    (x2,), _ = flow.forward(params, (y,), inverse=True)
    assert_close(x, x2, 1e-6)


def test_in_builder_on_torsions(key):
    """MarginalSplineFlow wired through the builder DSL keeps the BG exact."""
    prior_dims = bg.ShapeDictionary()
    prior_dims[bg.TORSIONS] = (6,)
    builder = bg.BoltzmannGeneratorBuilder(prior_dims)
    a = bg.TensorInfo("T_A", is_circular=True)
    b = bg.TensorInfo("T_B", is_circular=True)
    builder.add_split(bg.TORSIONS, (a, b), (3, 3))
    builder.add_condition(a, on=b, hidden=(16,), num_bins=4)
    builder.add_layer(MarginalSplineFlow(3, num_bins=4, is_circular=True), what=(a,))
    builder.add_merge((a, b), to=bg.TORSIONS)
    gen = builder.build_generator(check_target=False)
    params = gen.init(key)
    # non-trivial marginal layer: perturb its params (layer index 1 in chain)
    flat = jax.tree_util.tree_leaves(params)
    assert any(leaf.size for leaf in flat)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.3 * jax.random.normal(key, p.shape, p.dtype), params
    )
    out = gen.sample(params, key, 32, with_energy=True)
    x = out.xs[0]
    assert jnp.all((x >= 0.0) & (x <= 1.0))
    # exact-inverse identity: NLL(x) == prior energy(z) + dlogp (= out.energy)
    nll = gen.energy(params, x)
    assert_close(nll, out.energy, 5e-3)
