"""Fused Pallas IC reconstruction vs the XLA path (interpreter mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bgflow_tpu as bg
from tests.test_ic import ALA2_FIXED, ALA2_Z_MATRIX, _random_ala2_xyz
from tests.conftest import assert_close


def test_pallas_reconstruction_matches_xla(key):
    flow_ref = bg.RelativeInternalCoordinateTransformation(ALA2_Z_MATRIX, ALA2_FIXED)
    flow_pal = bg.RelativeInternalCoordinateTransformation(
        ALA2_Z_MATRIX, ALA2_FIXED, use_pallas=True
    )
    x = _random_ala2_xyz(key, 8, jnp.float32)
    ics, dlogp_fwd = flow_ref.forward((), (x,))
    (x_ref,), ld_ref = flow_ref.forward((), ics, inverse=True)
    (x_pal,), ld_pal = flow_pal.forward((), ics, inverse=True)
    assert_close(x_pal, x_ref, 1e-5)
    assert_close(ld_pal, ld_ref, 1e-5)
    # and it round-trips against the forward
    assert_close(x_pal, x, 1e-3)


def test_pallas_mixed_transform(key):
    data = np.asarray(_random_ala2_xyz(jax.random.PRNGKey(42), 200, jnp.float64))
    mixed_ref = bg.MixedCoordinateTransformation(data, ALA2_Z_MATRIX, ALA2_FIXED, keepdims=15)
    mixed_pal = bg.MixedCoordinateTransformation(
        data, ALA2_Z_MATRIX, ALA2_FIXED, keepdims=15, use_pallas=True
    )
    x = _random_ala2_xyz(key, 4, jnp.float32)
    ics, _ = mixed_ref.forward((), (x,))
    (x_ref,), ld_ref = mixed_ref.forward((), ics, inverse=True)
    (x_pal,), ld_pal = mixed_pal.forward((), ics, inverse=True)
    assert_close(x_pal, x_ref, 1e-4)
    assert_close(ld_pal, ld_ref, 1e-4)


def test_pallas_reconstruction_gradient_matches_xla(key):
    """Reverse-mode through the Pallas inverse == through the XLA inverse
    (the kernel has no VJP rule; flows/ic.py routes backward through the
    numerically identical dense reconstruction). This is the path NeuTra
    HMC differentiates when sampling through a TPU flow."""
    flow_ref = bg.RelativeInternalCoordinateTransformation(ALA2_Z_MATRIX, ALA2_FIXED)
    flow_pal = bg.RelativeInternalCoordinateTransformation(
        ALA2_Z_MATRIX, ALA2_FIXED, use_pallas=True
    )
    x = _random_ala2_xyz(key, 8, jnp.float32)
    ics, _ = flow_ref.forward((), (x,))

    def loss(flow, ics):
        (xr,), ld = flow.forward((), ics, inverse=True)
        return jnp.sum(jnp.sin(xr)) + jnp.sum(ld)

    g_ref = jax.grad(lambda ics: loss(flow_ref, ics))(ics)
    g_pal = jax.grad(lambda ics: loss(flow_pal, ics))(ics)
    for a, b in zip(g_pal, g_ref):
        assert_close(a, b, 1e-4)


def test_pallas_wide_and_legacy_layouts_agree(key):
    """Batch % 8 == 0 takes the wide (8-sublane) layout, other batches the
    legacy (rows, B) layout; both must match the XLA path."""
    flow_ref = bg.RelativeInternalCoordinateTransformation(ALA2_Z_MATRIX, ALA2_FIXED)
    flow_pal = bg.RelativeInternalCoordinateTransformation(
        ALA2_Z_MATRIX, ALA2_FIXED, use_pallas=True
    )
    for n in (16, 13):  # wide, legacy
        x = _random_ala2_xyz(jax.random.fold_in(key, n), n, jnp.float32)
        ics, _ = flow_ref.forward((), (x,))
        (x_ref,), ld_ref = flow_ref.forward((), ics, inverse=True)
        (x_pal,), ld_pal = flow_pal.forward((), ics, inverse=True)
        assert_close(x_pal, x_ref, 1e-5)
        assert_close(ld_pal, ld_ref, 1e-5)
