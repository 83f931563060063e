"""Transformer tests: round trips, identity-at-zero-init, ldj vs autodiff.

The ldj-vs-brute-force genre mirrors the reference
(``tests/nn/flow/crd_transform/test_ic.py:28-34`` pattern): compare analytic
log|det J| against ``jax.jacfwd`` determinants.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bgflow_tpu as bg
from bgflow_tpu.ops.rqs import rq_spline, rq_spline_tabulated
from tests.conftest import assert_close


def brute_force_ldj(fn, x):
    """log|det d fn(x)/dx| per batch element; fn maps (D,)->(D,)."""
    jac = jax.vmap(jax.jacfwd(fn))(x)
    return jnp.linalg.slogdet(jac)[1]


# ---------------------------------------------------------------- affine ----


def test_affine_roundtrip_and_ldj(key, dtype, tol):
    D_cond, D = 3, 4
    shift = bg.DenseNet([D_cond, 16, D], activation=jax.nn.silu)
    scale = bg.DenseNet([D_cond, 16, D], activation=jax.nn.silu)
    tr = bg.AffineTransformer(shift, scale)
    params = tr.init(key)
    cond = jax.random.normal(key, (8, D_cond), dtype=dtype)
    y = jax.random.normal(jax.random.PRNGKey(1), (8, D), dtype=dtype)

    z, ldj = tr.forward(params, cond, y)
    y2, ldj_inv = tr.forward(params, cond, z, inverse=True)
    assert_close(y, y2, tol)
    assert_close(ldj, -ldj_inv, tol)

    def per_elem(c, yy):
        return tr.forward(params, c[None], yy[None])[0][0]

    jac = jax.vmap(jax.jacfwd(per_elem, argnums=1))(cond, y)
    ldj_bf = jnp.linalg.slogdet(jac)[1]
    assert_close(ldj, ldj_bf, 1e-3 if dtype == jnp.float32 else 1e-8)


def test_affine_identity_at_zero_weights(key, dtype, tol):
    shift = bg.DenseNet([2, 4, 3], weight_scale=0.0)
    scale = bg.DenseNet([2, 4, 3], weight_scale=0.0)
    tr = bg.AffineTransformer(shift, scale)
    params = tr.init(key)
    cond = jax.random.normal(key, (5, 2), dtype=dtype)
    y = jax.random.normal(jax.random.PRNGKey(1), (5, 3), dtype=dtype)
    z, ldj = tr.forward(params, cond, y)
    assert_close(z, y, tol)
    assert_close(ldj, jnp.zeros(5), tol)


def test_affine_volume_preserving(key, dtype, tol):
    scale = bg.DenseNet([2, 8, 3])
    tr = bg.AffineTransformer(None, scale, preserve_volume=True)
    params = tr.init(key)
    cond = jax.random.normal(key, (5, 2), dtype=dtype)
    y = jax.random.normal(jax.random.PRNGKey(1), (5, 3), dtype=dtype)
    _, ldj = tr.forward(params, cond, y)
    assert_close(ldj, jnp.zeros(5), tol)


def test_affine_circular(key, dtype, tol):
    shift = bg.DenseNet([2, 8, 3])
    tr = bg.AffineTransformer(shift, is_circular=True)
    params = tr.init(key)
    cond = jax.random.normal(key, (5, 2), dtype=dtype)
    y = jax.random.uniform(jax.random.PRNGKey(1), (5, 3), dtype=dtype)
    z, ldj = tr.forward(params, cond, y)
    assert jnp.all((z >= 0) & (z < 1))
    assert_close(ldj, jnp.zeros(5), tol)
    y2, _ = tr.forward(params, cond, z, inverse=True)
    assert_close(y2, y, 1e-4 if dtype == jnp.float32 else tol)


# ----------------------------------------------------------------- spline ---


def _rand_spline_params(key, shape_wh, shape_s, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    w = jax.random.normal(k1, shape_wh, dtype=dtype)
    h = jax.random.normal(k2, shape_wh, dtype=dtype)
    s = jax.random.normal(k3, shape_s, dtype=dtype)
    return w, h, s


@pytest.mark.slow
def test_rq_spline_roundtrip(key, dtype, tol):
    B, D, K = 16, 5, 8
    w, h, s = _rand_spline_params(key, (B, D, K), (B, D, K + 1), dtype)
    x = jax.random.uniform(jax.random.PRNGKey(9), (B, D), dtype=dtype, minval=0.01, maxval=0.99)
    y, ldj = rq_spline(x, w, h, s)
    assert jnp.all((y >= 0) & (y <= 1))
    x2, ldj_inv = rq_spline(y, w, h, s, inverse=True)
    assert_close(x, x2, 1e-4 if dtype == jnp.float32 else 1e-9)
    assert_close(ldj, -ldj_inv, 1e-3 if dtype == jnp.float32 else 1e-8)


def test_rq_spline_identity_at_zero(key, dtype, tol):
    B, D, K = 4, 3, 8
    z = jnp.zeros((B, D, K), dtype=dtype)
    zs = jnp.zeros((B, D, K + 1), dtype=dtype)
    x = jax.random.uniform(key, (B, D), dtype=dtype)
    y, ldj = rq_spline(x, z, z, zs)
    assert_close(y, x, 1e-5 if dtype == jnp.float32 else 1e-10)
    assert_close(ldj, jnp.zeros_like(x), 1e-4 if dtype == jnp.float32 else 1e-9)


@pytest.mark.slow
def test_rq_spline_ldj_vs_autodiff(key, dtype):
    if dtype == jnp.float32:
        pytest.skip("autodiff check in f64 only")
    B, D, K = 8, 4, 6
    w, h, s = _rand_spline_params(key, (B, D, K), (B, D, K + 1), dtype)
    x = jax.random.uniform(jax.random.PRNGKey(3), (B, D), dtype=dtype, minval=0.02, maxval=0.98)

    def f_elem(xx, wi, hi, si):
        y, _ = rq_spline(xx[None, :], wi[None], hi[None], si[None])
        return y[0]

    for b in range(B):
        jac = jax.jacfwd(lambda xx: f_elem(xx, w[b], h[b], s[b]))(x[b])
        ldj_bf = jnp.log(jnp.abs(jnp.diag(jac))).sum()
        _, ldj = rq_spline(x[b : b + 1], w[b : b + 1], h[b : b + 1], s[b : b + 1])
        assert_close(ldj.sum(), ldj_bf, 1e-8)


def test_conditional_spline_transformer(key, dtype, tol):
    D_cond, D, K = 3, 4, 8
    net = bg.DenseNet([D_cond, 32, D * 3 * K + D], activation=jax.nn.silu)
    tr = bg.ConditionalSplineTransformer(net, is_circular=False)
    params = tr.init(key)
    cond = jax.random.normal(key, (6, D_cond), dtype=dtype)
    y = jax.random.uniform(jax.random.PRNGKey(2), (6, D), dtype=dtype)
    z, ldj = tr.forward(params, cond, y)
    y2, ldj_inv = tr.forward(params, cond, z, inverse=True)
    assert_close(y, y2, 1e-4 if dtype == jnp.float32 else 1e-8)
    assert_close(ldj, -ldj_inv, 1e-3 if dtype == jnp.float32 else 1e-8)


def test_conditional_spline_circular_continuity(key, dtype):
    """Circular spline: slope at 0 equals slope at 1 (pdf continuity)."""
    D_cond, D, K = 2, 3, 6
    net = bg.DenseNet([D_cond, 16, D * 3 * K], activation=jax.nn.silu)
    tr = bg.ConditionalSplineTransformer(net, is_circular=True)
    params = tr.init(key)
    cond = jax.random.normal(key, (4, D_cond), dtype=dtype)
    eps = 1e-4
    y0 = jnp.full((4, D), eps, dtype=dtype)
    y1 = jnp.full((4, D), 1.0 - eps, dtype=dtype)
    _, ldj0 = tr.forward(params, cond, y0)
    _, ldj1 = tr.forward(params, cond, y1)
    assert_close(ldj0, ldj1, 1e-2)


def test_conditional_spline_mixed_circularity(key, dtype):
    D_cond, D, K = 2, 4, 5
    is_circular = np.array([True, False, True, False])
    n_noncirc = 2
    net = bg.DenseNet([D_cond, 16, D * 3 * K + n_noncirc], activation=jax.nn.silu)
    tr = bg.ConditionalSplineTransformer(net, is_circular=is_circular)
    params = tr.init(key)
    cond = jax.random.normal(key, (4, D_cond), dtype=dtype)
    y = jax.random.uniform(jax.random.PRNGKey(5), (4, D), dtype=dtype)
    z, ldj = tr.forward(params, cond, y)
    y2, _ = tr.forward(params, cond, z, inverse=True)
    assert_close(y, y2, 1e-4 if dtype == jnp.float32 else 1e-8)


def test_tabulated_spline(dtype, tol):
    D, K = 3, 10
    sx = jnp.tile(jnp.linspace(0, 1, K + 1, dtype=dtype), (D, 1))
    sy = sx**2 * 0.5 + 0.5 * sx  # monotone
    slopes = jnp.gradient(sy[0], sx[0])[None, :].repeat(D, axis=0)
    x = jnp.array([[0.1, 0.5, 0.9], [0.3, 0.2, 0.7]], dtype=dtype)
    y, ldj = rq_spline_tabulated(x, sx, sy, slopes)
    x2, ldj_inv = rq_spline_tabulated(y, sx, sy, slopes, inverse=True)
    assert_close(x, x2, 1e-4 if dtype == jnp.float32 else 1e-9)
    assert_close(ldj, -ldj_inv, 1e-3 if dtype == jnp.float32 else 1e-8)
