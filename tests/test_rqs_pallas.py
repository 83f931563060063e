"""Pallas RQS kernel vs the XLA reference implementation (interpreter mode
on CPU; the same kernel compiles via Mosaic on TPU)."""
import jax
import jax.numpy as jnp
import pytest

from bgflow_tpu.ops.rqs import rq_spline
from bgflow_tpu.ops.rqs_pallas import rq_spline_pallas
from tests.conftest import assert_close


@pytest.mark.parametrize("inverse", [False, True], ids=["fwd", "inv"])
def test_pallas_matches_xla(key, inverse):
    B, D, K = 64, 5, 8
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = jax.random.uniform(k1, (B, D), dtype=jnp.float32, minval=0.01, maxval=0.99)
    w = jax.random.normal(k2, (B, D, K), dtype=jnp.float32)
    h = jax.random.normal(k3, (B, D, K), dtype=jnp.float32)
    s = jax.random.normal(k4, (B, D, K + 1), dtype=jnp.float32)

    y_ref, ldj_ref = rq_spline(x, w, h, s, inverse=inverse)
    y_pal, ldj_pal = rq_spline_pallas(
        x, w, h, s, inverse=inverse, block_rows=128, interpret=True
    )
    assert_close(y_pal, y_ref, 1e-5)
    assert_close(ldj_pal, ldj_ref, 1e-4)


def test_pallas_roundtrip(key):
    B, D, K = 32, 3, 8
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = jax.random.uniform(k1, (B, D), dtype=jnp.float32, minval=0.02, maxval=0.98)
    w = jax.random.normal(k2, (B, D, K), dtype=jnp.float32)
    h = jax.random.normal(k3, (B, D, K), dtype=jnp.float32)
    s = jax.random.normal(k4, (B, D, K + 1), dtype=jnp.float32)
    y, ldj = rq_spline_pallas(x, w, h, s, block_rows=32, interpret=True)
    x2, ldj_inv = rq_spline_pallas(y, w, h, s, inverse=True, block_rows=32, interpret=True)
    assert_close(x, x2, 1e-4)
    assert_close(ldj, -ldj_inv, 1e-3)


def test_pallas_padding_path(key):
    """Row counts that don't divide block_rows exercise the padding."""
    B, D, K = 7, 3, 6  # 21 rows, block 16 -> pad 11
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = jax.random.uniform(k1, (B, D), dtype=jnp.float32)
    w = jax.random.normal(k2, (B, D, K), dtype=jnp.float32)
    h = jax.random.normal(k3, (B, D, K), dtype=jnp.float32)
    s = jax.random.normal(k4, (B, D, K + 1), dtype=jnp.float32)
    y_ref, ldj_ref = rq_spline(x, w, h, s)
    y_pal, ldj_pal = rq_spline_pallas(x, w, h, s, block_rows=16, interpret=True)
    assert_close(y_pal, y_ref, 1e-5)
    assert_close(ldj_pal, ldj_ref, 1e-4)


def test_pallas_ad_gradients_match_xla(key):
    """The differentiable wrapper (Pallas fwd, XLA-vjp bwd) gives the same
    gradients as the pure XLA path."""
    from bgflow_tpu.ops.rqs_pallas import rq_spline_pallas_ad

    B, D, K = 16, 3, 8
    kk = jax.random.split(key, 4)
    x = jax.random.uniform(kk[0], (B, D), dtype=jnp.float32, minval=0.05, maxval=0.95)
    w = jax.random.normal(kk[1], (B, D, K), dtype=jnp.float32)
    h = jax.random.normal(kk[2], (B, D, K), dtype=jnp.float32)
    s = jax.random.normal(kk[3], (B, D, K + 1), dtype=jnp.float32)

    def loss(fn, w, h, s, x):
        y, ldj = fn(x, w, h, s)
        return jnp.sum(y**2) + jnp.sum(ldj)

    g1 = jax.grad(lambda *a: loss(rq_spline_pallas_ad, *a), argnums=(0, 1, 2, 3))(w, h, s, x)
    g2 = jax.grad(lambda *a: loss(rq_spline, *a), argnums=(0, 1, 2, 3))(w, h, s, x)
    for a, b in zip(g1, g2):
        assert_close(a, b, 1e-4)
