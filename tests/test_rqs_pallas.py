"""Pallas RQS kernel vs the XLA reference implementation (interpreter mode
on CPU; the same kernel compiles via Mosaic on TPU)."""
import jax
import numpy as np
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


@pytest.mark.slow
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


def test_apply_transposed_matches_apply(key):
    import bgflow_tpu as bg

    net = bg.DenseNet([7, 32, 19])
    params = net.init(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (13, 7))
    assert_close(net.apply_transposed(params, x), net.apply(params, x).T, 1e-6)
    wrapped = bg.WrapPeriodic(bg.DenseNet([10, 16, 5]), indices=[0, 2, 4])
    wp = wrapped.init(jax.random.PRNGKey(2))
    xw = jax.random.normal(jax.random.PRNGKey(3), (9, 7))
    assert_close(wrapped.apply_transposed(wp, xw), wrapped.apply(wp, xw).T, 1e-6)


@pytest.mark.parametrize("inverse", [False, True], ids=["fwd", "inv"])
def test_slab_path_matches_packed(key, inverse):
    """The slab-direct path (feature-major conditioner output + static row
    gathers) computes the identical function of the same raw features."""
    from bgflow_tpu.ops.rqs_pallas import rq_spline_pallas_slab, _slab_reference

    B, D, K = 37, 5, 8
    noncirc = (1, 3)
    n_raw = 3 * K * D + len(noncirc)
    k1, k2 = jax.random.split(key)
    x = jax.random.uniform(k1, (B, D), dtype=jnp.float32, minval=0.01, maxval=0.99)
    raw_t = jax.random.normal(k2, (n_raw, B), dtype=jnp.float32)

    y_slab, ldj_slab = rq_spline_pallas_slab(
        x, raw_t, num_bins=K, noncircular_indices=noncirc,
        inverse=inverse, block_rows=8, interpret=True,
    )
    # packed reference: unpack raw the transformer's way and use the XLA rqs
    config = (
        ("y_dim", D), ("num_bins", K), ("noncirc_idx", noncirc),
        ("inverse", inverse), ("left", 0.0), ("right", 1.0),
        ("bottom", 0.0), ("top", 1.0),
        ("min_bin_width", 1e-3), ("min_bin_height", 1e-3),
        ("min_derivative", 1e-3), ("identity_init", True),
        ("block_rows", 8), ("interpret", True),
    )
    y_ref, ldj_ref = _slab_reference(config, x, raw_t)
    assert_close(y_slab, y_ref, 1e-5)
    assert_close(ldj_slab, ldj_ref, 1e-4)


def test_slab_path_gradients_match(key):
    from bgflow_tpu.ops.rqs_pallas import rq_spline_pallas_slab

    B, D, K = 16, 3, 6
    noncirc = (0,)
    n_raw = 3 * K * D + len(noncirc)
    k1, k2 = jax.random.split(key)
    x = jax.random.uniform(k1, (B, D), dtype=jnp.float32, minval=0.05, maxval=0.95)
    raw_t = 0.5 * jax.random.normal(k2, (n_raw, B), dtype=jnp.float32)

    def loss_slab(x, r):
        y, ldj = rq_spline_pallas_slab(
            x, r, num_bins=K, noncircular_indices=noncirc, block_rows=8, interpret=True
        )
        return jnp.sum(y**2) + jnp.sum(ldj)

    g_x, g_r = jax.grad(loss_slab, argnums=(0, 1))(x, raw_t)
    # finite-difference spot check
    eps = 1e-3
    for (arr, grad, idx) in [(x, g_x, (3, 1)), (raw_t, g_r, (5, 2))]:
        ap = arr.at[idx].add(eps)
        am = arr.at[idx].add(-eps)
        if arr is x:
            fd = (loss_slab(ap, raw_t) - loss_slab(am, raw_t)) / (2 * eps)
        else:
            fd = (loss_slab(x, ap) - loss_slab(x, am)) / (2 * eps)
        assert abs(float(grad[idx]) - float(fd)) < 2e-2 * max(1.0, abs(float(fd)))


def test_spline_transformer_slab_path_matches_xla(key):
    """End-to-end through ConditionalSplineTransformer: use_pallas with a
    DenseNet conditioner takes the slab path and must agree with the plain
    XLA transformer."""
    import bgflow_tpu as bg

    D_out, D_in, K = 5, 4, 8
    is_circ = jnp.asarray([True, False, True, True, False])
    n_out = D_out * 3 * K + 2
    net = bg.DenseNet([D_in, 32, n_out])
    t_xla = bg.ConditionalSplineTransformer(net, is_circular=is_circ)
    t_slab = bg.ConditionalSplineTransformer(net, is_circular=is_circ, use_pallas=True)
    params = t_xla.init(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (23, D_in))
    y = jax.random.uniform(jax.random.PRNGKey(2), (23, D_out), minval=0.01, maxval=0.99)
    z1, l1 = t_xla._forward(params, x, y)
    z2, l2 = t_slab._forward(params, x, y)
    assert_close(z1, z2, 1e-5)
    assert_close(l1, l2, 1e-4)
    z1i, l1i = t_xla._inverse(params, x, y)
    z2i, l2i = t_slab._inverse(params, x, y)
    assert_close(z1i, z2i, 1e-5)
    assert_close(l1i, l2i, 1e-4)


@pytest.mark.parametrize("inverse", [False, True], ids=["fwd", "inv"])
def test_slab2_matches_slab1(key, inverse):
    """The gather-free v2 path (conditioner emits slab-ordered rows via
    slab_row_order) computes the identical function of the same packed raw
    features as the v1 gather path."""
    from bgflow_tpu.ops.rqs_pallas import (
        rq_spline_pallas_slab, rq_spline_pallas_slab2, slab_row_order,
    )

    B, D, K = 29, 5, 8
    noncirc = (1, 3)
    n_raw = 3 * K * D + len(noncirc)
    k1, k2 = jax.random.split(key)
    x = jax.random.uniform(k1, (B, D), dtype=jnp.float32, minval=0.01, maxval=0.99)
    raw_t = jax.random.normal(k2, (n_raw, B), dtype=jnp.float32)

    y1, l1 = rq_spline_pallas_slab(
        x, raw_t, num_bins=K, noncircular_indices=noncirc,
        inverse=inverse, block_rows=8, interpret=True,
    )
    order = slab_row_order(D, K, noncirc)
    y2, l2 = rq_spline_pallas_slab2(
        x, raw_t[order], num_bins=K, inverse=inverse, block_rows=8, interpret=True,
    )
    assert_close(y1, y2, 1e-6)
    assert_close(l1, l2, 1e-6)


def test_slab2_gradients_match(key):
    """v2 custom-vjp gradients agree with the v1 path's gradients w.r.t. the
    PACKED raw features (chain rule through the static row duplication)."""
    from bgflow_tpu.ops.rqs_pallas import (
        rq_spline_pallas_slab, rq_spline_pallas_slab2, slab_row_order,
    )

    B, D, K = 12, 3, 6
    noncirc = (0,)
    n_raw = 3 * K * D + len(noncirc)
    k1, k2 = jax.random.split(key)
    x = jax.random.uniform(k1, (B, D), dtype=jnp.float32, minval=0.05, maxval=0.95)
    raw_t = 0.5 * jax.random.normal(k2, (n_raw, B), dtype=jnp.float32)
    order = slab_row_order(D, K, noncirc)

    def loss1(x, r):
        y, ldj = rq_spline_pallas_slab(
            x, r, num_bins=K, noncircular_indices=noncirc, block_rows=8, interpret=True
        )
        return jnp.sum(y**2) + jnp.sum(ldj)

    def loss2(x, r):
        y, ldj = rq_spline_pallas_slab2(
            x, r[order], num_bins=K, block_rows=8, interpret=True
        )
        return jnp.sum(y**2) + jnp.sum(ldj)

    g1x, g1r = jax.grad(loss1, argnums=(0, 1))(x, raw_t)
    g2x, g2r = jax.grad(loss2, argnums=(0, 1))(x, raw_t)
    assert_close(g1x, g2x, 1e-4)
    assert_close(g1r, g2r, 1e-4)


def test_dense_apply_transposed_row_order(key):
    import bgflow_tpu as bg

    net = bg.DenseNet([7, 16, 11])
    params = net.init(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 7))
    order = np.asarray([3, 3, 0, 10, 7, 1])  # duplicates allowed
    out = net.apply_transposed(params, x, row_order=order)
    ref = net.apply(params, x).T[order]
    assert_close(out, ref, 1e-6)


@pytest.mark.parametrize("inverse", [False, True], ids=["fwd", "inv"])
def test_fused_coupling_matches_reference(key, inverse):
    """The fused (final matmul + spline) kernel computes the same function
    as the packed XLA reference of the same weights."""
    from bgflow_tpu.ops.rqs_fused import (
        _fused_reference, fused_row_order, rqs_fused_coupling,
    )

    B, D, K, H = 37, 5, 8, 16
    noncirc = (1, 3)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = jax.random.uniform(k1, (B, D), dtype=jnp.float32, minval=0.01, maxval=0.99)
    h = jax.random.normal(k2, (B, H), dtype=jnp.float32)
    n_raw = 3 * K * D + len(noncirc)
    W_packed = 0.3 * jax.random.normal(k3, (H, n_raw), dtype=jnp.float32)
    b_packed = 0.1 * jax.random.normal(k4, (n_raw,), dtype=jnp.float32)
    order = fused_row_order(D, K, noncirc)
    W, b = W_packed[:, order], b_packed[order]

    y, ldj = rqs_fused_coupling(
        x, h, W, b, num_bins=K, inverse=inverse, lanes=128, interpret=True
    )
    config = (
        ("y_dim", D), ("num_bins", K), ("activations", ()),
        ("inverse", inverse), ("left", 0.0), ("right", 1.0),
        ("bottom", 0.0), ("top", 1.0),
        ("min_bin_width", 1e-3), ("min_bin_height", 1e-3),
        ("min_derivative", 1e-3), ("identity_init", True),
        ("matmul_dtype", None), ("lanes", 128), ("interpret", True),
    )
    y_ref, ldj_ref = _fused_reference(config, x, h, ((W, b),))
    assert_close(y, y_ref, 1e-5)
    assert_close(ldj, ldj_ref, 1e-4)

    # and against the v1 slab path fed the packed layout directly
    from bgflow_tpu.ops.rqs_pallas import rq_spline_pallas_slab

    raw_t = (jnp.dot(h, W_packed) + b_packed).T
    y2, ldj2 = rq_spline_pallas_slab(
        x, raw_t, num_bins=K, noncircular_indices=noncirc,
        inverse=inverse, block_rows=8, interpret=True,
    )
    assert_close(y, y2, 1e-5)
    assert_close(ldj, ldj2, 1e-4)


def test_fused_coupling_gradients(key):
    """Fused custom-vjp gradients (x, h, W, b) match finite differences."""
    from bgflow_tpu.ops.rqs_fused import fused_row_order, rqs_fused_coupling

    B, D, K, H = 9, 3, 4, 8
    noncirc = (0,)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = jax.random.uniform(k1, (B, D), dtype=jnp.float32, minval=0.05, maxval=0.95)
    h = 0.5 * jax.random.normal(k2, (B, H), dtype=jnp.float32)
    order = fused_row_order(D, K, noncirc)
    W = 0.3 * jax.random.normal(k3, (H, len(order)), dtype=jnp.float32)
    b = 0.1 * jax.random.normal(k4, (len(order),), dtype=jnp.float32)

    def loss(x, h, W, b):
        y, ldj = rqs_fused_coupling(
            x, h, W, b, num_bins=K, lanes=128, interpret=True
        )
        return jnp.sum(y**2) + jnp.sum(ldj)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(x, h, W, b)
    eps = 1e-3
    for argi, (arr, idx) in enumerate(
        [(x, (4, 1)), (h, (2, 3)), (W, (5, 7)), (b, (11,))]
    ):
        args = [x, h, W, b]
        ap = arr.at[idx].add(eps); args[argi] = ap; lp = loss(*args)
        am = arr.at[idx].add(-eps); args[argi] = am; lm = loss(*args)
        fd = (lp - lm) / (2 * eps)
        g = float(grads[argi][idx])
        assert abs(g - float(fd)) < 3e-2 * max(1.0, abs(float(fd))), (argi, g, fd)


@pytest.mark.parametrize("inverse", [False, True], ids=["fwd", "inv"])
def test_fused_mlp_matches_transformer_xla(key, inverse):
    """The fully-fused MLP+spline kernel (via fused_mlp_spec) agrees with
    the plain XLA transformer of the same parameters, including bf16
    matmul mode within loose tolerance."""
    import bgflow_tpu as bg
    from bgflow_tpu.ops.rqs_fused import fused_row_order, rqs_fused_mlp

    D_out, D_in, K = 5, 4, 8
    is_circ = jnp.asarray([True, False, True, True, False])
    n_out = D_out * 3 * K + 2
    net = bg.WrapPeriodic(bg.DenseNet([2 * 2 + 2, 32, 16, n_out]), indices=[0, 2])
    t_xla = bg.ConditionalSplineTransformer(net, is_circular=is_circ)
    params = t_xla.init(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (23, D_in))
    y = jax.random.uniform(jax.random.PRNGKey(2), (23, D_out), minval=0.01, maxval=0.99)

    x_in, layers, acts = net.fused_mlp_spec(params, x)
    order = fused_row_order(D_out, K, t_xla._noncircular_indices(D_out))
    Wf, bf = layers[-1]
    layers = layers[:-1] + ((Wf[:, order], bf[order]),)
    z2, l2 = rqs_fused_mlp(
        y, x_in, layers, num_bins=K, activations=acts,
        inverse=inverse, lanes=128, interpret=True,
    )
    fwd = t_xla._forward if inverse else t_xla._inverse
    z1, l1 = fwd(params, x, y)
    assert_close(z1, z2, 1e-5)
    assert_close(l1, l2, 1e-4)


def test_fused_mlp_gradients(key):
    """Gradients of the fused MLP+spline path match finite differences
    through every layer's weights."""
    import bgflow_tpu as bg
    from bgflow_tpu.ops.rqs_fused import fused_row_order, rqs_fused_mlp

    D, K, F = 3, 4, 6
    n_out = D * 3 * K + D
    net = bg.DenseNet([F, 16, n_out])
    params = net.init(key)
    x = jax.random.uniform(jax.random.PRNGKey(1), (9, D), minval=0.05, maxval=0.95)
    xc = 0.5 * jax.random.normal(jax.random.PRNGKey(2), (9, F))
    order = fused_row_order(D, K, tuple(range(D)))

    def loss(params):
        x_in, layers, acts = net.fused_mlp_spec(params, xc)
        Wf, bf = layers[-1]
        layers = layers[:-1] + ((Wf[:, order], bf[order]),)
        y, ldj = rqs_fused_mlp(
            x, x_in, layers, num_bins=K, activations=acts, lanes=128, interpret=True
        )
        return jnp.sum(y**2) + jnp.sum(ldj)

    grads = jax.grad(loss)(params)
    eps = 1e-3
    for li, idx in [(0, (2, 5)), (1, (7, 11))]:
        p = jax.tree_util.tree_map(lambda a: a, params)
        p[li]["w"] = params[li]["w"].at[idx].add(eps)
        lp = loss(p)
        p[li]["w"] = params[li]["w"].at[idx].add(-eps)
        lm = loss(p)
        fd = (lp - lm) / (2 * eps)
        g = float(grads[li]["w"][idx])
        assert abs(g - float(fd)) < 3e-2 * max(1.0, abs(float(fd))), (li, g, fd)
