"""Fully-fused conditional-spline coupling kernel for TPU.

One Pallas call computes the conditioner's FINAL matmul and the whole
rational-quadratic spline, with the spline parameters living only in VMEM:

    HBM reads : trunk activations h (B, H), x (D_pad, B), weights (H, R)
    HBM writes: y (D_pad, B), summed ldj (1, B)

This removes the (3*K*D, B) raw-parameter tensor from HBM entirely — in the
unfused path that tensor is written by the conditioner, re-read, re-laid out
into kernel slabs and read again (~5 GB of traffic per coupling at batch 1M
for ala2-sized channels, measured ~40-50 ms/coupling on v5e against a ~2 ms
stream bound).

Layout: dims ride the SUBLANE axis (padded to a multiple of 8) and batch
rides the LANE axis, so the per-bin parameter planes are contiguous
sublane-aligned slices of the in-VMEM matmul result (R, C) — no relayout
anywhere.  The final weight columns are pre-permuted at trace time into
``fused_row_order`` (k-major, dim-minor, with the periodic-wrap final slope
row duplicated and pad dims pointing at row 0).

Semantics match ``ops/rqs.rq_spline`` through the packed reference
(`_fused_reference`), which also supplies the exact backward pass.

Reference for the conditional-spline conventions:
``bgflow/nn/flow/transformer/spline.py:14-204`` (the reference delegates the
spline math to nflows and has no fused path — this kernel is TPU-original).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rqs import (
    DEFAULT_MIN_BIN_HEIGHT,
    DEFAULT_MIN_BIN_WIDTH,
    DEFAULT_MIN_DERIVATIVE,
)
from .rqs_pallas import _rqs_math

__all__ = ["rqs_fused_coupling", "rqs_fused_mlp", "fused_row_order"]


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def fused_row_order(y_dim: int, num_bins: int, noncircular_indices=(), d_pad=None):
    """Final-layer output-row order for the fused kernel.

    Maps fused row position -> packed-layout row index (packed =
    ConditionalSplineTransformer convention: widths | heights | slopes, each
    d-major k-minor, then noncircular final slopes).  Fused layout is
    [w: K slabs of d_pad rows | h: K slabs | s: K+1 slabs], k-major
    dim-minor; the final slope slab duplicates the first-slope row for
    circular dims; pad dims (d >= y_dim) point at row 0 (their outputs are
    masked in the kernel).
    """
    D, K = int(y_dim), int(num_bins)
    Dp = _round_up(D, 8) if d_pad is None else int(d_pad)
    woff, hoff, soff, ncoff = 0, K * D, 2 * K * D, 3 * K * D
    nc_rank = {int(d): r for r, d in enumerate(noncircular_indices)}

    def rows(base_for_d):
        return [base_for_d(d) if d < D else 0 for d in range(Dp)]

    order = []
    for k in range(K):
        order.extend(rows(lambda d, k=k: woff + d * K + k))
    for k in range(K):
        order.extend(rows(lambda d, k=k: hoff + d * K + k))
    for k in range(K):
        order.extend(rows(lambda d, k=k: soff + d * K + k))
    order.extend(
        rows(lambda d: ncoff + nc_rank[d] if d in nc_rank else soff + d * K)
    )
    return np.asarray(order, dtype=np.int64)


def _fused_kernel(
    *refs,
    n_layers: int,
    activations,
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
    y_dim: int,
    d_pad: int,
    matmul_dtype,
):
    """refs: h (C, F) activations-in, then (W, b) per layer (trunk biases
    (1, out), final bias (R, 1)), then x (Dp, C); outs y (Dp, C), ldj (1, C).

    The whole conditioner MLP runs on the MXU with weights VMEM-resident;
    only the first-layer input ever comes from HBM.
    """
    h_ref = refs[0]
    layer_refs = refs[1 : 1 + 2 * n_layers]
    x_ref = refs[1 + 2 * n_layers]
    y_ref, ldj_ref = refs[2 + 2 * n_layers], refs[3 + 2 * n_layers]
    K, Dp = num_bins, d_pad

    def cast(a):
        return a.astype(matmul_dtype) if matmul_dtype is not None else a

    hb = h_ref[...]
    # trunk layers: (C, f_in) @ (f_in, f_out) + b, activation
    for li in range(n_layers - 1):
        W = layer_refs[2 * li][...]
        b = layer_refs[2 * li + 1][...]
        hb = jax.lax.dot_general(
            cast(hb), cast(W), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b
        act = activations[li]
        if act is not None:
            hb = act(hb)
    # final layer emitted feature-major: (R, C)
    Wf = layer_refs[2 * (n_layers - 1)][...]
    bf = layer_refs[2 * (n_layers - 1) + 1][...]
    raw = jax.lax.dot_general(
        cast(Wf), cast(hb), (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    raw = raw + bf

    w = [raw[k * Dp : (k + 1) * Dp] for k in range(K)]
    h = [raw[(K + k) * Dp : (K + k + 1) * Dp] for k in range(K)]
    s = [raw[(2 * K + k) * Dp : (2 * K + k + 1) * Dp] for k in range(K + 1)]

    y, ldj = _rqs_math(
        x_ref[...], w, h, s,
        inverse=inverse, left=left, right=right, bottom=bottom, top=top,
        min_bin_width=min_bin_width, min_bin_height=min_bin_height,
        min_derivative=min_derivative, shift=shift, num_bins=K,
    )
    y_ref[...] = y
    mask = jax.lax.broadcasted_iota(jnp.int32, ldj.shape, 0) < y_dim
    ldj_ref[...] = jnp.sum(jnp.where(mask, ldj, 0.0), axis=0, keepdims=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_core(config, x, h, layers):
    cfg = dict(config)
    y_dim = cfg.pop("y_dim")
    num_bins = cfg.pop("num_bins")
    lanes = cfg.pop("lanes")
    interpret = cfg.pop("interpret")
    matmul_dtype = cfg.pop("matmul_dtype")
    identity_init = cfg.pop("identity_init")
    activations = cfg.pop("activations")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    B, D = x.shape
    n_layers = len(layers)
    Dp = _round_up(D, 8)
    K = num_bins
    R = (3 * K + 1) * Dp
    Wf, bf = layers[-1]
    assert Wf.shape[-1] == R and bf.shape == (R,), (Wf.shape, bf.shape, R)

    C = lanes
    B_pad = _round_up(B, C)
    mid = 0.5 * (cfg["left"] + cfg["right"])

    xT = jnp.pad(x.T, ((0, Dp - D), (0, B_pad - B)), constant_values=mid)
    hP = jnp.pad(h, ((0, B_pad - B), (0, 0)))
    shift = (
        float(np.log(np.expm1(1.0 - cfg["min_derivative"])))
        if identity_init
        else 0.0
    )

    kernel = functools.partial(
        _fused_kernel,
        n_layers=n_layers, activations=activations,
        shift=shift, num_bins=K, y_dim=D, d_pad=Dp,
        matmul_dtype=matmul_dtype, **cfg,
    )
    grid = (B_pad // C,)
    const = lambda shape: pl.BlockSpec(
        shape, lambda j: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    in_specs = [pl.BlockSpec((C, h.shape[-1]), lambda j: (j, 0), memory_space=pltpu.VMEM)]
    operands = [hP]
    for li, (W, b) in enumerate(layers):
        in_specs.append(const(W.shape))
        operands.append(W)
        if li < n_layers - 1:
            in_specs.append(const((1, b.shape[0])))
            operands.append(b[None, :])
        else:
            in_specs.append(const((R, 1)))
            operands.append(b[:, None])
    in_specs.append(pl.BlockSpec((Dp, C), lambda j: (0, j), memory_space=pltpu.VMEM))
    operands.append(xT)

    yT, ldj = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((Dp, C), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda j: (0, j), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Dp, B_pad), x.dtype),
            jax.ShapeDtypeStruct((1, B_pad), x.dtype),
        ),
        interpret=interpret,
    )(*operands)
    return yT[:D, :B].T, ldj[0, :B]


def _fused_reference(config, x, h, layers):
    """Identical function through plain XLA; exact VJP source.

    Runs the MLP with the same cast semantics, then the kernel's own
    ``_rqs_math`` on dense feature-major (Dp, B) tiles — the SAME op
    sequence as the Pallas forward, and a layout with batch on the lane
    axis.  (An earlier version went through the packed ``rq_spline`` whose
    (B, D, K) tensors lane-pad K=8 -> 128, a 16x bandwidth/VPU tax that
    made the training backward ~400x slower per sample than the fused
    forward.)
    """
    cfg = dict(config)
    y_dim = cfg.pop("y_dim")
    num_bins = cfg.pop("num_bins")
    cfg.pop("lanes")
    cfg.pop("interpret")
    matmul_dtype = cfg.pop("matmul_dtype")
    identity_init = cfg.pop("identity_init")
    activations = cfg.pop("activations")
    B, D = x.shape
    Dp = _round_up(D, 8)
    K = num_bins

    def cast(a):
        return a.astype(matmul_dtype) if matmul_dtype is not None else a

    for li, (W, b) in enumerate(layers[:-1]):
        h = jnp.dot(cast(h), cast(W), preferred_element_type=jnp.float32) + b
        act = activations[li]
        if act is not None:
            h = act(h)
    Wf, bf = layers[-1]
    raw = jax.lax.dot_general(
        cast(Wf), cast(h), (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    raw = raw + bf[:, None]  # (R, B)
    mid = 0.5 * (cfg["left"] + cfg["right"])
    xT = jnp.concatenate(
        [x.T, jnp.full((Dp - D, B), mid, x.dtype)], axis=0
    ) if Dp != D else x.T
    shift = (
        float(np.log(np.expm1(1.0 - cfg["min_derivative"])))
        if identity_init
        else 0.0
    )
    y, ldj = _rqs_math(
        xT,
        [raw[k * Dp : (k + 1) * Dp] for k in range(K)],
        [raw[(K + k) * Dp : (K + k + 1) * Dp] for k in range(K)],
        [raw[(2 * K + k) * Dp : (2 * K + k + 1) * Dp] for k in range(K + 1)],
        shift=shift, num_bins=K, **cfg,
    )
    return y[:D].T, jnp.sum(ldj[:D], axis=0)


def _fused_fwd(config, x, h, layers):
    return _fused_core(config, x, h, layers), (x, h, layers)


def _fused_bwd(config, residuals, cotangents):
    x, h, layers = residuals
    _, vjp = jax.vjp(
        lambda xx, hh, ll: _fused_reference(config, xx, hh, ll),
        x, h, layers,
    )
    return vjp(cotangents)


_fused_core.defvjp(_fused_fwd, _fused_bwd)


def rqs_fused_mlp(
    x,
    x_in,
    layers,
    num_bins: int,
    activations=(),
    inverse: bool = False,
    left: float = 0.0,
    right: float = 1.0,
    bottom: float = 0.0,
    top: float = 1.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
    identity_init: bool = True,
    matmul_dtype=None,
    lanes: int = 1024,
    interpret=None,
):
    """Fully-fused (conditioner MLP + RQ spline) conditional coupling.

    ``x``: (B, D) values to transform; ``x_in``: (B, F) conditioner input
    (post-embedding); ``layers``: tuple of (W, b) pairs — every weight
    matrix stays VMEM-resident and the whole MLP runs on the MXU inside
    the kernel.  The FINAL layer's weight columns must be in
    ``fused_row_order`` (R = (3*num_bins+1)*round_up(D,8) outputs);
    ``activations``: one callable (or None) per trunk layer.  Returns
    (y (B, D), summed ldj (B,)).  Differentiable (Pallas forward, exact
    XLA-vjp backward through the dense reference).
    """
    config = (
        ("y_dim", int(x.shape[-1])),
        ("num_bins", int(num_bins)),
        ("activations", tuple(activations)),
        ("inverse", inverse), ("left", left), ("right", right),
        ("bottom", bottom), ("top", top),
        ("min_bin_width", min_bin_width), ("min_bin_height", min_bin_height),
        ("min_derivative", min_derivative), ("identity_init", identity_init),
        ("matmul_dtype", None if matmul_dtype is None else jnp.dtype(matmul_dtype).name),
        ("lanes", int(lanes)), ("interpret", interpret),
    )
    layers = tuple((W, b) for (W, b) in layers)
    return _fused_core(config, x, x_in, layers)


def rqs_fused_coupling(x, h, W, b, num_bins: int, **kwargs):
    """Single-layer convenience wrapper over :func:`rqs_fused_mlp`:
    ``h`` are precomputed trunk activations and (W, b) the slab-ordered
    final layer."""
    return rqs_fused_mlp(x, h, ((W, b),), num_bins, activations=(), **kwargs)
