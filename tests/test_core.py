"""Core flow algebra: round trips, ldj antisymmetry, structural ops.

Mirrors the reference's test genres (``tests/nn/flow/test_coupling.py``,
``test_sequential.py``).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bgflow_tpu as bg
from tests.conftest import assert_close


def _roundtrip(flow, params, xs, tol, **kwargs):
    ys, ldj_f = flow.forward(params, xs, **kwargs)
    xs2, ldj_i = flow.forward(params, ys, inverse=True, **kwargs)
    for a, b in zip(xs, xs2):
        assert_close(a, b, tol, "roundtrip mismatch")
    assert_close(ldj_f, -ldj_i, tol, "ldj antisymmetry")
    return ys, ldj_f


def test_split_merge_sizes(key, dtype, tol):
    x = jax.random.normal(key, (7, 10), dtype=dtype)
    split = bg.Split(3, 4, axis=-1)
    ys, ldj = split.forward((), (x,))
    assert [y.shape[-1] for y in ys] == [3, 4, 3]
    assert jnp.all(ldj == 0)
    _roundtrip(split, (), (x,), tol)


def test_split_merge_indices(key, dtype, tol):
    x = jax.random.normal(key, (5, 6), dtype=dtype)
    split = bg.Split([0, 2, 4], [1, 3, 5], axis=-1)
    ys, _ = split.forward((), (x,))
    assert_close(ys[0], x[:, [0, 2, 4]], tol)
    _roundtrip(split, (), (x,), tol)


def test_split_overlapping_raises():
    with pytest.raises(ValueError):
        bg.Split([0, 1], [1, 2])


def test_swap(key, dtype, tol):
    a = jax.random.normal(key, (4, 3), dtype=dtype)
    b = jax.random.normal(key, (4, 2), dtype=dtype)
    ys, ldj = bg.Swap().forward((), (a, b))
    assert_close(ys[0], b, tol)
    assert_close(ys[1], a, tol)
    assert jnp.all(ldj == 0)


def test_chain_accumulates_ldj(key, dtype, tol):
    shift = bg.DenseNet([3, 8, 2], activation=jax.nn.tanh)
    scale = bg.DenseNet([3, 8, 2], activation=jax.nn.tanh)
    coupling = bg.Coupling(bg.AffineTransformer(shift, scale), transformed=(1,), on=(0,))
    chain = bg.Chain([bg.Split(3, axis=-1), coupling, bg.Swap(), bg.Merge(2, axis=-1)])
    params = chain.init(key)
    x = jax.random.normal(key, (6, 5), dtype=dtype)
    ys, ldj = _roundtrip(chain, params, (x,), tol)
    assert ys[0].shape == (6, 5)
    assert ldj.shape == (6,)


def test_wrap(key, dtype, tol):
    shift = bg.DenseNet([2, 4, 3], activation=jax.nn.silu)
    inner = bg.Coupling(bg.AffineTransformer(shift), transformed=(1,), on=(0,))
    wrap = bg.Wrap(inner, indices=(0, 2))
    params = wrap.init(key)
    xs = tuple(jax.random.normal(jax.random.PRNGKey(i), (4, d), dtype=dtype) for i, d in enumerate([2, 5, 3]))
    ys, _ = _roundtrip(wrap, params, xs, tol)
    # untouched middle tensor passes through at position 1
    assert_close(ys[1], xs[1], tol)


def test_set_constant(key, dtype, tol):
    x = jax.random.normal(key, (4, 3), dtype=dtype)
    const = jnp.ones(2, dtype=dtype)
    sc = bg.SetConstant(indices=[1], values=[const])
    ys, ldj = sc.forward((), (x,))
    assert len(ys) == 2 and ys[1].shape == (4, 2)
    xs2, _ = sc.forward((), ys, inverse=True)
    assert len(xs2) == 1
    assert_close(xs2[0], x, tol)


def test_inverse_flow(key, dtype, tol):
    shift = bg.DenseNet([2, 4, 3])
    flow = bg.Coupling(bg.AffineTransformer(shift), transformed=(1,), on=(0,))
    inv = bg.Inverse(flow)
    params = inv.init(key)
    xs = (jax.random.normal(key, (4, 2), dtype=dtype), jax.random.normal(key, (4, 3), dtype=dtype))
    y1, l1 = flow.forward(params, xs, inverse=True)
    y2, l2 = inv.forward(params, xs)
    for a, b in zip(y1, y2):
        assert_close(a, b, tol)
    assert_close(l1, l2, tol)


def test_jit_compatibility(key):
    """Flows are static closures: jit(forward) works with no static_argnums."""
    shift = bg.DenseNet([2, 8, 2])
    flow = bg.Chain([bg.Split(2, axis=-1), bg.Coupling(bg.AffineTransformer(shift)), bg.Merge(2, axis=-1)])
    params = flow.init(key)
    x = jax.random.normal(key, (4, 4))

    @jax.jit
    def run(p, x):
        ys, ldj = flow.forward(p, (x,))
        return ys[0], ldj

    y, ldj = run(params, x)
    assert y.shape == x.shape
