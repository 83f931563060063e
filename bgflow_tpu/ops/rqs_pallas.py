"""Pallas TPU kernel for the rational-quadratic spline.

One fused VMEM pass: softmax bin normalization, cumulative knot positions,
branchless bin search, and the RQ forward/inverse evaluation happen in
registers — no HBM round trips between stages and no gather ops.

Layout (the part that matters on TPU): elements ride the (sublane, lane)
grid as (rows, 128) tiles and the small bin axis K becomes the *leading*
axis — arrays are reorganized to (K, N/128, 128).  This gives zero HBM
padding (a flattened (N, K) layout pads K -> 128 lanes, a 16x memory and
bandwidth tax that OOMs at molecular batch sizes) and every in-kernel op is
a dense full-width VPU op over (block_rows, 128) tiles with the K loop
unrolled at trace time.

Semantics match ``ops/rqs.rq_spline``; validated in interpreter mode and on
device by ``tests/test_rqs_pallas.py``.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rqs import DEFAULT_MIN_BIN_HEIGHT, DEFAULT_MIN_BIN_WIDTH, DEFAULT_MIN_DERIVATIVE, rq_spline

__all__ = [
    "rq_spline_pallas",
    "rq_spline_pallas_ad",
    "rq_spline_pallas_slab",
    "rq_spline_pallas_slab2",
    "slab_row_order",
]

_LANES = 128


def _rqs_math(
    x,          # (rows, lanes) elements, clipped to domain by caller or here
    w,          # list of K (rows, lanes) raw width logits
    h,          # list of K raw height logits
    s,          # list of K+1 raw slope logits
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
    """Register-resident RQ spline on same-shaped 2D tiles (shared by the
    slab kernel and the fused coupling kernel)."""
    K = num_bins

    def softmax_scale(raw, min_size, total):
        m = raw[0]
        for r in raw[1:]:
            m = jnp.maximum(m, r)
        exps = [jnp.exp(r - m) for r in raw]
        z = exps[0]
        for e in exps[1:]:
            z = z + e
        inv = 1.0 / z
        return [(min_size + (1.0 - min_size * K) * e * inv) * total for e in exps]

    widths = softmax_scale(w, min_bin_width, right - left)
    heights = softmax_scale(h, min_bin_height, top - bottom)

    x = jnp.clip(x, bottom if inverse else left, top if inverse else right)

    # Branchless bin localization via 0/1 masks, fused with the prefix sums:
    # m[k] = 1{x >= edge_k} for the interior edges of the SEARCH axis (cumy
    # when inverting, cumx otherwise).  Then every per-bin quantity is a
    # mask-weighted accumulation — the same additions in the same order as
    # the old prefix-list + (K-1)-deep select chain (bit-identical results,
    # since mask-weighted terms are exact zeros), at ~2/3 of the VPU ops.
    search = heights if inverse else widths
    base = bottom if inverse else left
    m = []
    edge = None
    for k in range(1, K):
        edge = search[k - 1] if edge is None else edge + search[k - 1]
        mk = jnp.where(x >= base + edge, 1.0, 0.0)
        m.append(mk)

    # cum positions at the containing bin's left edge
    xk = jnp.full_like(x, left)
    yk = jnp.full_like(x, bottom)
    for k in range(K - 1):
        xk = xk + m[k] * widths[k]
        yk = yk + m[k] * heights[k]

    # e[k] = 1{idx == k}
    e = [1.0 - m[0]] + [m[k - 1] - m[k] for k in range(1, K - 1)] + [m[K - 2]]

    def pick(slabs):
        acc = e[0] * slabs[0]
        for k in range(1, K):
            acc = acc + e[k] * slabs[k]
        return acc

    wk = pick(widths)
    hk = pick(heights)
    dk = hk / wk
    # lazy slope activation: pick the two RAW slopes first, then softplus
    # only those — 2 transcendental pairs per element instead of K+1
    sk_raw = pick(s[:K])
    sk1_raw = pick(s[1 : K + 1])
    sk = min_derivative + jax.nn.softplus(sk_raw + shift)
    sk1 = min_derivative + jax.nn.softplus(sk1_raw + shift)
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
    # one log instead of two: log(dnum) - 2 log(denom) == log(dnum/denom^2)
    ldj = jnp.log(dnum / (denom * denom))
    if inverse:
        ldj = -ldj
    return y, ldj


def _rqs_kernel(
    x_ref,      # (block, 128)
    w_ref,      # (K, block, 128)
    h_ref,      # (K, block, 128)
    s_ref,      # (K+1, block, 128)
    y_ref,      # (block, 128)
    ldj_ref,    # (block, 128)
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
    K = num_bins
    y, ldj = _rqs_math(
        x_ref[:, :],
        [w_ref[k] for k in range(K)],
        [h_ref[k] for k in range(K)],
        [s_ref[k] for k in range(K + 1)],
        inverse=inverse, left=left, right=right, bottom=bottom, top=top,
        min_bin_width=min_bin_width, min_bin_height=min_bin_height,
        min_derivative=min_derivative, shift=shift, num_bins=num_bins,
    )
    y_ref[:, :] = y
    ldj_ref[:, :] = ldj


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
    block_rows: int = 64,
    interpret=None,
):
    """Drop-in fused replacement for ``ops.rqs.rq_spline``.

    ``x``: (..., D); params (..., D, K)/(..., D, K)/(..., D, K+1).
    Returns (y, elementwise ldj), both shaped like ``x``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch_shape = x.shape
    num_bins = unnormalized_widths.shape[-1]
    n = int(np.prod(batch_shape))

    chunk = block_rows * _LANES
    n_pad = (-n) % chunk
    n_rows = (n + n_pad) // _LANES

    def to_slabs(arr, k_dim):
        # (..., D, k) -> (k, n_rows, 128), zero-padded along elements
        flat = arr.reshape(n, k_dim)
        if n_pad:
            flat = jnp.pad(flat, ((0, n_pad), (0, 0)))
        return jnp.transpose(flat, (1, 0)).reshape(k_dim, n_rows, _LANES)

    xf = x.reshape(n)
    if n_pad:
        xf = jnp.pad(xf, (0, n_pad), constant_values=0.5 * (left + right))
    xf = xf.reshape(n_rows, _LANES)
    wf = to_slabs(unnormalized_widths, num_bins)
    hf = to_slabs(unnormalized_heights, num_bins)
    sf = to_slabs(unnormalized_derivatives, num_bins + 1)

    y, ldj = _invoke_rqs_kernel(
        xf, wf, hf, sf,
        num_bins=num_bins, inverse=inverse, left=left, right=right,
        bottom=bottom, top=top, min_bin_width=min_bin_width,
        min_bin_height=min_bin_height, min_derivative=min_derivative,
        identity_init=identity_init, block_rows=block_rows, interpret=interpret,
    )
    y = y.reshape(-1)[:n].reshape(batch_shape)
    ldj = ldj.reshape(-1)[:n].reshape(batch_shape)
    return y, ldj


def _invoke_rqs_kernel(
    xf, wf, hf, sf, *, num_bins, inverse, left, right, bottom, top,
    min_bin_width, min_bin_height, min_derivative, identity_init,
    block_rows, interpret,
):
    """Launch the fused kernel on pre-slabbed inputs: xf (n_rows, 128),
    slabs (k, n_rows, 128)."""
    n_rows = xf.shape[0]
    shift = float(np.log(np.expm1(1.0 - min_derivative))) if identity_init else 0.0
    kernel = functools.partial(
        _rqs_kernel,
        inverse=inverse, left=left, right=right, bottom=bottom, top=top,
        min_bin_width=min_bin_width, min_bin_height=min_bin_height,
        min_derivative=min_derivative, shift=shift, num_bins=num_bins,
    )
    grid = (n_rows // block_rows,)
    elem_spec = pl.BlockSpec((block_rows, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    slab_spec = lambda k: pl.BlockSpec(
        (k, block_rows, _LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[elem_spec, slab_spec(num_bins), slab_spec(num_bins), slab_spec(num_bins + 1)],
        out_specs=(elem_spec, elem_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n_rows, _LANES), xf.dtype),
            jax.ShapeDtypeStruct((n_rows, _LANES), xf.dtype),
        ),
        interpret=interpret,
    )(xf, wf, hf, sf)


# ------------------------------------------------- differentiable wrapper --


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _rqs_pallas_core(config, x, w, h, s):
    kwargs = dict(config)
    return rq_spline_pallas(x, w, h, s, **kwargs)


def _rqs_pallas_fwd(config, x, w, h, s):
    return _rqs_pallas_core(config, x, w, h, s), (x, w, h, s)


def _rqs_pallas_bwd(config, residuals, cotangents):
    # the XLA implementation computes identical values (tests pin agreement
    # to ~1e-6), so its VJP is the exact gradient of the Pallas forward;
    # training batches are small, so the recompute is cheap
    x, w, h, s = residuals
    kwargs = {k: v for k, v in dict(config).items() if k not in ("block_rows", "interpret")}
    _, vjp = jax.vjp(lambda *a: rq_spline(*a, **kwargs), x, w, h, s)
    return vjp(cotangents)


_rqs_pallas_core.defvjp(_rqs_pallas_fwd, _rqs_pallas_bwd)


def rq_spline_pallas_ad(
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
):
    """Differentiable fused spline: Pallas forward, XLA-vjp backward."""
    config = (
        ("inverse", inverse), ("left", left), ("right", right),
        ("bottom", bottom), ("top", top),
        ("min_bin_width", min_bin_width), ("min_bin_height", min_bin_height),
        ("min_derivative", min_derivative), ("identity_init", identity_init),
    )
    return _rqs_pallas_core(
        config, x, unnormalized_widths, unnormalized_heights, unnormalized_derivatives
    )


# ------------------------------------------------------- slab-direct path --
#
# The relayout-free fast path for conditional splines: the conditioner
# emits its output feature-major (raw_t: (3*K*D + nc, B), via
# DenseNet.apply_transposed — the MXU writes that layout directly), and the
# kernel's (k, rows, 128) parameter slabs are then built from raw_t with
# STATIC leading-axis row gathers + reshapes only.  This removes the
# (B*D, K) -> (K, B*D) HBM transposes that dominated the packed path
# end-to-end (~(3K+1)x the element count of x in pure relayout traffic).
# Feature ordering inside raw_t matches ConditionalSplineTransformer's
# packed convention (widths | heights | slopes, each d-major k-minor, then
# the noncircular final slopes), so the same trained parameters evaluate
# identically through either path.


def _slab_perm(off, y_dim, num_bins):
    # rows of raw_t for slab layout: slab k gathers rows [off + d*K + k]
    return np.asarray(
        [[off + d * num_bins + k for d in range(y_dim)] for k in range(num_bins)]
    ).reshape(-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _rqs_slab_core(config, x, raw_t):
    cfg = dict(config)
    y_dim = cfg.pop("y_dim")
    num_bins = cfg.pop("num_bins")
    noncirc = cfg.pop("noncirc_idx")
    block_rows = cfg.pop("block_rows")
    interpret = cfg.pop("interpret")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = x.shape[0]
    K, D = num_bins, y_dim
    woff, hoff, soff, ncoff = 0, K * D, 2 * K * D, 3 * K * D

    n = D * B
    chunk = block_rows * _LANES
    n_pad = (-n) % chunk
    n_rows = (n + n_pad) // _LANES

    def slab(rows, k_dim):
        arr = raw_t[rows].reshape(k_dim, n)  # leading-axis static gather
        if n_pad:
            arr = jnp.pad(arr, ((0, 0), (0, n_pad)))
        return arr.reshape(k_dim, n_rows, _LANES)

    wf = slab(_slab_perm(woff, D, K), K)
    hf = slab(_slab_perm(hoff, D, K), K)
    # slopes: K slabs from the raw slope channel plus the periodic-wrap
    # final slab (first slope again, overridden for noncircular dims by the
    # dedicated trailing features)
    s_rows = _slab_perm(soff, D, K)
    nc_rank = {int(d): r for r, d in enumerate(noncirc)}
    last_rows = np.asarray(
        [ncoff + nc_rank[d] if d in nc_rank else soff + d * K for d in range(D)]
    )
    sf = slab(np.concatenate([s_rows, last_rows]), K + 1)

    xf = x.T.reshape(n)  # (B, D) -> (D*B,): the only data-array transpose
    if n_pad:
        xf = jnp.pad(xf, (0, n_pad), constant_values=0.5 * (cfg["left"] + cfg["right"]))
    xf = xf.reshape(n_rows, _LANES)

    y_rows, ldj_rows = _invoke_rqs_kernel(
        xf, wf, hf, sf, num_bins=K, block_rows=block_rows, interpret=interpret, **cfg
    )
    y = y_rows.reshape(-1)[:n].reshape(D, B)
    ldj = ldj_rows.reshape(-1)[:n].reshape(D, B)
    return y.T, jnp.sum(ldj, axis=0)


def _slab_reference(config, x, raw_t):
    """Same function through the packed XLA spline (used for the backward
    pass; identical values, exact VJP)."""
    cfg = dict(config)
    y_dim = cfg.pop("y_dim")
    num_bins = cfg.pop("num_bins")
    noncirc = cfg.pop("noncirc_idx")
    cfg.pop("block_rows")
    cfg.pop("interpret")
    K, D = num_bins, y_dim
    raw = raw_t.T  # (B, 3KD + nc)
    b_shape = raw.shape[:-1]
    w = raw[..., : K * D].reshape(*b_shape, D, K)
    h = raw[..., K * D : 2 * K * D].reshape(*b_shape, D, K)
    s = raw[..., 2 * K * D : 3 * K * D].reshape(*b_shape, D, K)
    slopes = jnp.concatenate([s, s[..., :1]], axis=-1)
    if len(noncirc):
        slopes = slopes.at[..., np.asarray(noncirc), -1].set(raw[..., 3 * K * D :])
    y, ldj = rq_spline(x, w, h, slopes, **cfg)
    return y, jnp.sum(ldj, axis=-1)


def _rqs_slab_fwd(config, x, raw_t):
    return _rqs_slab_core(config, x, raw_t), (x, raw_t)


def _rqs_slab_bwd(config, residuals, cotangents):
    x, raw_t = residuals
    _, vjp = jax.vjp(lambda xx, rr: _slab_reference(config, xx, rr), x, raw_t)
    return vjp(cotangents)


_rqs_slab_core.defvjp(_rqs_slab_fwd, _rqs_slab_bwd)


# --------------------------------------------- slab-direct v2 (no gather) --
#
# v1 builds its (k, rows, 128) parameter slabs with an HBM row gather of
# raw_t (measured ~20 ms/coupling at batch 1M on v5e — XLA's row gather
# runs ~8x over the stream bound).  v2 removes the gather entirely: the
# conditioner's final weight COLUMNS are permuted at trace time
# (DenseNet.apply_transposed(row_order=slab_row_order(...)), a (H, out)
# shuffle of ~200 KB) so raw_t arrives with rows already slab-contiguous
# [w: k-major d-minor | h | slopes incl. the duplicated periodic-wrap final
# row], and slab construction is pure reshape views.


def slab_row_order(y_dim: int, num_bins: int, noncircular_indices=()):
    """Conditioner output-row order that makes spline slabs contiguous.

    Maps v2 row position -> packed-layout row index (the packed layout is
    ConditionalSplineTransformer's convention: widths | heights | slopes,
    each d-major k-minor, then the noncircular final slopes).  The final
    (K+1)-th slope slab DUPLICATES the first-slope row for circular dims
    (periodic wrap) and takes the dedicated trailing feature for
    noncircular dims, so v2 output has (3*K + 1) * D rows.
    """
    D, K = int(y_dim), int(num_bins)
    woff, hoff, soff, ncoff = 0, K * D, 2 * K * D, 3 * K * D
    nc_rank = {int(d): r for r, d in enumerate(noncircular_indices)}
    order = []
    for off in (woff, hoff, soff):
        for k in range(K):
            order.extend(off + d * K + k for d in range(D))
    order.extend(
        ncoff + nc_rank[d] if d in nc_rank else soff + d * K for d in range(D)
    )
    return np.asarray(order, dtype=np.int64)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _rqs_slab2_core(config, x, raw_t):
    cfg = dict(config)
    y_dim = cfg.pop("y_dim")
    num_bins = cfg.pop("num_bins")
    block_rows = cfg.pop("block_rows")
    interpret = cfg.pop("interpret")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = x.shape[0]
    K, D = num_bins, y_dim

    n = D * B
    chunk = block_rows * _LANES
    n_pad = (-n) % chunk
    n_rows = (n + n_pad) // _LANES

    def slab(lo, k_dim):
        # contiguous leading-axis slice + reshape: views, no data movement
        arr = raw_t[lo : lo + k_dim * D].reshape(k_dim, n)
        if n_pad:
            arr = jnp.pad(arr, ((0, 0), (0, n_pad)))
        return arr.reshape(k_dim, n_rows, _LANES)

    wf = slab(0, K)
    hf = slab(K * D, K)
    sf = slab(2 * K * D, K + 1)

    xf = x.T.reshape(n)
    if n_pad:
        xf = jnp.pad(xf, (0, n_pad), constant_values=0.5 * (cfg["left"] + cfg["right"]))
    xf = xf.reshape(n_rows, _LANES)

    y_rows, ldj_rows = _invoke_rqs_kernel(
        xf, wf, hf, sf, num_bins=K, block_rows=block_rows, interpret=interpret, **cfg
    )
    y = y_rows.reshape(-1)[:n].reshape(D, B)
    ldj = ldj_rows.reshape(-1)[:n].reshape(D, B)
    return y.T, jnp.sum(ldj, axis=0)


def _slab2_reference(config, x, raw_t):
    """Identical function through plain XLA (exact VJP source).

    Uses the kernel's own ``_rqs_math`` on feature-major (D, B) tiles —
    same op sequence as the Pallas forward and a dense lane layout (the
    packed (B, D, K) route lane-pads K -> 128, a 16x tax)."""
    cfg = dict(config)
    y_dim = cfg.pop("y_dim")
    num_bins = cfg.pop("num_bins")
    cfg.pop("block_rows")
    cfg.pop("interpret")
    identity_init = cfg.pop("identity_init")
    K, D = num_bins, y_dim
    shift = (
        float(np.log(np.expm1(1.0 - cfg["min_derivative"])))
        if identity_init
        else 0.0
    )
    y, ldj = _rqs_math(
        x.T,
        [raw_t[k * D : (k + 1) * D] for k in range(K)],
        [raw_t[(K + k) * D : (K + k + 1) * D] for k in range(K)],
        [raw_t[(2 * K + k) * D : (2 * K + k + 1) * D] for k in range(K + 1)],
        shift=shift, num_bins=K, **cfg,
    )
    return y.T, jnp.sum(ldj, axis=0)


def _rqs_slab2_fwd(config, x, raw_t):
    return _rqs_slab2_core(config, x, raw_t), (x, raw_t)


def _rqs_slab2_bwd(config, residuals, cotangents):
    x, raw_t = residuals
    _, vjp = jax.vjp(lambda xx, rr: _slab2_reference(config, xx, rr), x, raw_t)
    return vjp(cotangents)


_rqs_slab2_core.defvjp(_rqs_slab2_fwd, _rqs_slab2_bwd)


def rq_spline_pallas_slab2(
    x,
    raw_t,
    num_bins: int,
    inverse: bool = False,
    left: float = 0.0,
    right: float = 1.0,
    bottom: float = 0.0,
    top: float = 1.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
    identity_init: bool = True,
    block_rows: int = 64,
    interpret=None,
):
    """Conditional RQ spline from slab-ordered conditioner output.

    ``x``: (B, D); ``raw_t``: ((3*num_bins + 1) * D, B) with rows in
    ``slab_row_order`` layout (emit via
    ``net.apply_transposed(params, cond, row_order=slab_row_order(...))``).
    Returns (y (B, D), summed ldj (B,)).  Differentiable (Pallas forward,
    exact XLA-vjp backward).
    """
    config = (
        ("y_dim", int(x.shape[-1])),
        ("num_bins", int(num_bins)),
        ("inverse", inverse), ("left", left), ("right", right),
        ("bottom", bottom), ("top", top),
        ("min_bin_width", min_bin_width), ("min_bin_height", min_bin_height),
        ("min_derivative", min_derivative), ("identity_init", identity_init),
        ("block_rows", block_rows), ("interpret", interpret),
    )
    return _rqs_slab2_core(config, x, raw_t)


def rq_spline_pallas_slab(
    x,
    raw_t,
    num_bins: int,
    noncircular_indices=(),
    inverse: bool = False,
    left: float = 0.0,
    right: float = 1.0,
    bottom: float = 0.0,
    top: float = 1.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
    identity_init: bool = True,
    block_rows: int = 64,
    interpret=None,
):
    """Conditional RQ spline from feature-major raw conditioner output.

    ``x``: (B, D); ``raw_t``: (3*num_bins*D + len(noncircular_indices), B).
    Returns (y (B, D), summed ldj (B,)).  Differentiable (Pallas forward,
    exact XLA-vjp backward).
    """
    config = (
        ("y_dim", int(x.shape[-1])),
        ("num_bins", int(num_bins)),
        ("noncirc_idx", tuple(int(i) for i in noncircular_indices)),
        ("inverse", inverse), ("left", left), ("right", right),
        ("bottom", bottom), ("top", top),
        ("min_bin_width", min_bin_width), ("min_bin_height", min_bin_height),
        ("min_derivative", min_derivative), ("identity_init", identity_init),
        ("block_rows", block_rows), ("interpret", interpret),
    )
    return _rqs_slab_core(config, x, raw_t)
