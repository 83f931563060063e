"""Pallas TPU kernel for the rational-quadratic spline.

One fused VMEM pass per tile: softmax bin normalization, cumulative knot
positions, branchless bin search, and the RQ forward/inverse evaluation all
happen in registers — no HBM round trips between stages and no gather ops
(bin selection is a one-hot masked reduction over the small bin axis).

Layout: elements (= batch x dims, flattened) ride the sublane axis in tiles
of ``block_rows``; the bin axis (K <= 128) rides the lanes.  For typical
K = 8..32 this underfills the 128-lane VPU but keeps every op a dense
(rows, K) elementwise/reduce — the kernel is bandwidth-bound and reads each
parameter exactly once.

Semantics match ``ops/rqs.rq_spline`` exactly (same clamping, identity
init); ``tests/test_rqs_pallas.py`` checks bit-level agreement in
interpreter mode and on device.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rqs import DEFAULT_MIN_BIN_HEIGHT, DEFAULT_MIN_BIN_WIDTH, DEFAULT_MIN_DERIVATIVE

__all__ = ["rq_spline_pallas"]


def _rqs_kernel(
    x_ref,
    w_ref,
    h_ref,
    s_ref,
    y_ref,
    ldj_ref,
    *,
    inverse: bool,
    left: float,
    right: float,
    bottom: float,
    top: float,
    min_bin_width: float,
    min_bin_height: float,
    min_derivative: float,
    shift: float,
    num_bins: int,
):
    x = x_ref[:, 0]
    w_raw = w_ref[:, :]
    h_raw = h_ref[:, :]
    s_raw = s_ref[:, :]

    # softmax-normalized bin sizes with minimum width
    def norm_bins(raw, min_size, total):
        m = jnp.max(raw, axis=-1, keepdims=True)
        e = jnp.exp(raw - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        return (min_size + (1.0 - min_size * num_bins) * p) * total

    widths = norm_bins(w_raw, min_bin_width, right - left)
    heights = norm_bins(h_raw, min_bin_height, top - bottom)
    # cumulative sums as a triangular matmul (Mosaic has no cumsum primitive;
    # for K <= 32 this is one tiny MXU pass)
    # M[j, i] = 1 for j <= i, so (w @ M)[i] = sum_{j<=i} w[j]
    tri = jnp.triu(jnp.ones((num_bins, num_bins), dtype=widths.dtype))
    cumx_in = left + jax.lax.dot_general(
        widths, tri, (((1,), (0,)), ((), ())), preferred_element_type=widths.dtype
    )
    cumy_in = bottom + jax.lax.dot_general(
        heights, tri, (((1,), (0,)), ((), ())), preferred_element_type=heights.dtype
    )
    derivs = min_derivative + jax.nn.softplus(s_raw + shift)  # (rows, K+1)

    x = jnp.clip(x, bottom if inverse else left, top if inverse else right)

    # branchless bin search: count interior edges <= x (exclude the last edge)
    edges = cumy_in if inverse else cumx_in
    lane = jax.lax.broadcasted_iota(jnp.int32, edges.shape, 1)
    interior = lane < num_bins - 1
    idx = jnp.sum(
        jnp.where(interior & (x[:, None] >= edges), 1, 0), axis=-1
    )  # (rows,) in [0, K-1]

    onehot = lane == idx[:, None]  # (rows, K) one-hot over bins

    def pick(vals):
        return jnp.sum(jnp.where(onehot, vals, 0.0), axis=-1)

    # knot quantities of the selected bin (left edges = cum - size)
    xk = pick(cumx_in - widths)
    yk = pick(cumy_in - heights)
    wk = pick(widths)
    hk = pick(heights)
    dk = hk / wk
    sk = pick(derivs[:, :num_bins])
    lane1 = jax.lax.broadcasted_iota(jnp.int32, derivs.shape, 1)
    onehot1 = lane1 == (idx + 1)[:, None]
    sk1 = jnp.sum(jnp.where(onehot1, derivs, 0.0), axis=-1)
    s_sum = sk + sk1 - 2.0 * dk

    if inverse:
        dy = x - yk
        a = dy * s_sum + hk * (dk - sk)
        b = hk * sk - dy * s_sum
        c = -dk * dy
        disc = jnp.maximum(b * b - 4.0 * a * c, 0.0)
        theta = jnp.clip((2.0 * c) / (-b - jnp.sqrt(disc)), 0.0, 1.0)
        y = theta * wk + xk
    else:
        theta = jnp.clip((x - xk) / wk, 0.0, 1.0)
        numer = hk * (dk * theta * theta + sk * theta * (1.0 - theta))
        denom_f = dk + s_sum * theta * (1.0 - theta)
        y = yk + numer / denom_f

    t1m = theta * (1.0 - theta)
    denom = dk + s_sum * t1m
    dnum = dk * dk * (sk1 * theta * theta + 2.0 * dk * t1m + sk * (1.0 - theta) ** 2)
    ldj = jnp.log(dnum) - 2.0 * jnp.log(denom)
    if inverse:
        ldj = -ldj

    y_ref[:, 0] = y
    ldj_ref[:, 0] = ldj


@functools.partial(
    jax.jit,
    static_argnames=(
        "inverse", "left", "right", "bottom", "top",
        "min_bin_width", "min_bin_height", "min_derivative",
        "identity_init", "block_rows", "interpret",
    ),
)
def rq_spline_pallas(
    x,
    unnormalized_widths,
    unnormalized_heights,
    unnormalized_derivatives,
    inverse: bool = False,
    left: float = 0.0,
    right: float = 1.0,
    bottom: float = 0.0,
    top: float = 1.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
    identity_init: bool = True,
    block_rows: int = 1024,
    interpret: bool = False,
):
    """Drop-in fused replacement for ``ops.rqs.rq_spline``.

    ``x``: (..., D); params (..., D, K)/(..., D, K)/(..., D, K+1).
    Returns (y, elementwise ldj), both shaped like ``x``.
    """
    batch_shape = x.shape
    num_bins = unnormalized_widths.shape[-1]
    n = int(np.prod(batch_shape))
    xf = x.reshape(n, 1)
    wf = unnormalized_widths.reshape(n, num_bins)
    hf = unnormalized_heights.reshape(n, num_bins)
    sf = unnormalized_derivatives.reshape(n, num_bins + 1)

    # pad rows to a multiple of the block
    n_pad = (-n) % block_rows
    if n_pad:
        xf = jnp.pad(xf, ((0, n_pad), (0, 0)), constant_values=0.5 * (left + right))
        wf = jnp.pad(wf, ((0, n_pad), (0, 0)))
        hf = jnp.pad(hf, ((0, n_pad), (0, 0)))
        sf = jnp.pad(sf, ((0, n_pad), (0, 0)))
    n_rows = n + n_pad

    shift = float(np.log(np.expm1(1.0 - min_derivative))) if identity_init else 0.0
    kernel = functools.partial(
        _rqs_kernel,
        inverse=inverse,
        left=left,
        right=right,
        bottom=bottom,
        top=top,
        min_bin_width=min_bin_width,
        min_bin_height=min_bin_height,
        min_derivative=min_derivative,
        shift=shift,
        num_bins=num_bins,
    )
    grid = (n_rows // block_rows,)
    row_spec = lambda width: pl.BlockSpec(
        (block_rows, width), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    y, ldj = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec(1), row_spec(num_bins), row_spec(num_bins), row_spec(num_bins + 1)],
        out_specs=(row_spec(1), row_spec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((n_rows, 1), x.dtype),
            jax.ShapeDtypeStruct((n_rows, 1), x.dtype),
        ),
        interpret=interpret,
    )(xf, wf, hf, sf)
    return y[:n, 0].reshape(batch_shape), ldj[:n, 0].reshape(batch_shape)
