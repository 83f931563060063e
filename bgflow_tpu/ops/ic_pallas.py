"""Pallas TPU kernel: fused z-matrix Cartesian reconstruction.

The staged NeRF reconstruction (``flows/ic.py::RelativeInternalCoordinate-
Transformation._inverse``) is HBM-bound under XLA: every stage's cross
products / norms materialize (B, m, 3) intermediates, costing several full
HBM round trips per stage.  This kernel keeps the whole growing point set in
VMEM and runs ALL stages back to back per batch tile — each atom's placement
is ~40 register-resident VPU ops, and HBM is touched exactly once per input
and output element.

Layout: batch on the lane axis.  Inputs arrive transposed —
bonds/angles/torsions as (D, B), fixed atoms as (n_fixed * 3, B) — and the
output is (n_atoms * 3, B) in *reconstruction order* (the caller applies the
static atom reorder and final transpose).

The placement plan (stages, context indices, IC row indices) is baked into
the kernel at trace time as Python constants, so the generated code is a
fully unrolled straight-line program per tile.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ic_reconstruct_pallas", "ic_reconstruct_pallas_wide"]


def _reconstruct_kernel(
    bonds_ref,
    angles_ref,
    torsions_ref,
    fixed_ref,
    out_ref,
    *,
    plan: Tuple[Tuple[Tuple[int, int, int, int, int], ...], ...],
    n_fixed: int,
    eps: float,
    fixed_rows: Tuple[int, ...] = None,
):
    # copy fixed atoms straight through (they are the first rows).  Refs are
    # (rows, lanes) in the legacy layout or (rows, 8, lanes) in the wide
    # layout — row slices give (lanes,) / (8, lanes) values; the math below
    # is shape-agnostic.  The wide layout fills all 8 VPU sublanes (a
    # (1, lanes) row computes at 1/8 of VPU width).
    # ``fixed_rows``: optional per-fixed-atom output row (atom-order output
    # baked into the plan — saves the caller's gather pass); None keeps the
    # contiguous reconstruction-order layout.
    if fixed_rows is None:
        out_ref[: 3 * n_fixed] = fixed_ref[...]
    else:
        for j, a in enumerate(fixed_rows):
            out_ref[3 * a : 3 * a + 3] = fixed_ref[3 * j : 3 * j + 3]

    def get_point(i):
        return out_ref[3 * i], out_ref[3 * i + 1], out_ref[3 * i + 2]

    def sub(a, b):
        return (a[0] - b[0], a[1] - b[1], a[2] - b[2])

    def cross(a, b):
        return (
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        )

    def normalize(v):
        inv = jax.lax.rsqrt(jnp.maximum(v[0] * v[0] + v[1] * v[1] + v[2] * v[2], eps * eps))
        return (v[0] * inv, v[1] * inv, v[2] * inv)

    for stage in plan:
        for (out_idx, ic_row, c1, c2, c3) in stage:
            p1 = get_point(c1)
            p2 = get_point(c2)
            p3 = get_point(c3)
            d = bonds_ref[ic_row]
            a = angles_ref[ic_row]
            t = torsions_ref[ic_row]

            v1 = sub(p1, p2)
            v2 = sub(p1, p3)
            n = cross(v1, v2)
            nn = cross(v1, n)
            n_hat = normalize(n)
            nn_hat = normalize(nn)
            sin_t = jnp.sin(t)
            cos_t = jnp.cos(t)
            v3 = tuple(-sin_t * nh + cos_t * nnh for nh, nnh in zip(n_hat, nn_hat))
            v3_hat = normalize(v3)
            v1_hat = normalize(v1)
            d_sin_a = d * jnp.sin(a)
            d_cos_a = d * jnp.cos(a)
            for k in range(3):
                out_ref[3 * out_idx + k] = (
                    p1[k] + d_sin_a * v3_hat[k] - d_cos_a * v1_hat[k]
                )


def ic_reconstruct_pallas(
    bonds_t,
    angles_t,
    torsions_t,
    fixed_t,
    plan,
    n_total: int,
    eps: float = 1e-7,
    block_lanes: int = 1024,
    interpret=None,
):
    """Run the fused reconstruction.

    bonds_t/angles_t/torsions_t: (D, B); fixed_t: (n_fixed*3, B).
    ``plan``: tuple of stages; each stage a tuple of
    (recon_index, ic_row, ctx1, ctx2, ctx3) with recon-order indices.
    Returns points (n_total*3, B) in reconstruction order.
    """
    if interpret is None:
        # Mosaic compiles on TPU; everywhere else run the interpreter
        interpret = jax.default_backend() != "tpu"
    dtype = jnp.result_type(bonds_t.dtype, fixed_t.dtype)
    bonds_t, angles_t, torsions_t, fixed_t = (
        x.astype(dtype) for x in (bonds_t, angles_t, torsions_t, fixed_t)
    )
    d_rows, b = bonds_t.shape
    n_fixed3 = fixed_t.shape[0]
    n_pad = (-b) % block_lanes
    if n_pad:
        pad = lambda x: jnp.pad(x, ((0, 0), (0, n_pad)), constant_values=1.0)
        bonds_t, angles_t, torsions_t, fixed_t = map(pad, (bonds_t, angles_t, torsions_t, fixed_t))
    n_cols = b + n_pad

    kernel = functools.partial(
        _reconstruct_kernel, plan=plan, n_fixed=n_fixed3 // 3, eps=eps
    )
    grid = (n_cols // block_lanes,)
    spec = lambda rows: pl.BlockSpec((rows, block_lanes), lambda i: (0, i), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec(d_rows), spec(d_rows), spec(d_rows), spec(n_fixed3)],
        out_specs=spec(3 * n_total),
        out_shape=jax.ShapeDtypeStruct((3 * n_total, n_cols), bonds_t.dtype),
        interpret=interpret,
    )(bonds_t, angles_t, torsions_t, fixed_t)
    return out[:, :b]


def ic_reconstruct_pallas_wide(
    bonds,
    angles,
    torsions,
    fixed_flat,
    plan,
    n_total: int,
    eps: float = 1e-7,
    block_lanes: int = 512,
    interpret=None,
):
    """Wide-layout fused reconstruction: batch rides (8 sublanes x lanes).

    Inputs are BATCH-major — bonds/angles/torsions (B, D), fixed_flat
    (B, n_fixed*3) — with B divisible by 8; each scalar row becomes an
    (8, B/8) tile so every placement op runs at full VPU width (the legacy
    (rows, B) layout computes on (1, lanes) rows at 1/8 width).  Returns
    points (n_total*3, 8, B/8) in reconstruction order.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = bonds.shape[0]
    assert B % 8 == 0, "wide layout needs batch divisible by 8"
    S = B // 8
    dtype = jnp.result_type(bonds.dtype, fixed_flat.dtype)

    def to_wide(x):
        # (B, D) -> (D, 8, B/8): one XLA transpose, no intermediate (D, B)
        return jnp.transpose(x.astype(dtype).reshape(8, S, x.shape[-1]), (2, 0, 1))

    bonds_w, angles_w, torsions_w, fixed_w = map(
        to_wide, (bonds, angles, torsions, fixed_flat)
    )
    n_pad = (-S) % block_lanes
    if n_pad:
        pad = lambda x: jnp.pad(
            x, ((0, 0), (0, 0), (0, n_pad)), constant_values=1.0
        )
        bonds_w, angles_w, torsions_w, fixed_w = map(
            pad, (bonds_w, angles_w, torsions_w, fixed_w)
        )
    n_cols = S + n_pad

    kernel = functools.partial(
        _reconstruct_kernel, plan=plan, n_fixed=fixed_flat.shape[-1] // 3, eps=eps
    )
    grid = (n_cols // block_lanes,)
    spec = lambda rows: pl.BlockSpec(
        (rows, 8, block_lanes), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    d_rows = bonds.shape[-1]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec(d_rows), spec(d_rows), spec(d_rows), spec(fixed_flat.shape[-1])],
        out_specs=spec(3 * n_total),
        out_shape=jax.ShapeDtypeStruct((3 * n_total, 8, n_cols), dtype),
        interpret=interpret,
    )(bonds_w, angles_w, torsions_w, fixed_w)
    return out[:, :, :S]


def build_plan(blocks, atom2index, index2order, n_fixed: int):
    """Bake the reconstruction plan from the z-matrix decomposition."""
    plan = []
    offset = n_fixed
    for block in blocks:
        stage = []
        ref = atom2index[block]
        idx = index2order[ref[:, 0] - n_fixed]
        for j in range(len(block)):
            stage.append((int(offset + j), int(idx[j]), int(ref[j, 1]), int(ref[j, 2]), int(ref[j, 3])))
        offset += len(block)
        plan.append(tuple(stage))
    return tuple(plan)
