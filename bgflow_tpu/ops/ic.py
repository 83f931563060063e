"""Internal-coordinate geometry primitives.

Measurement (xyz -> bond/angle/torsion), NeRF-style placement
(ICs -> xyz), Euler-angle frames, and the per-atom 3x3 Jacobian log-dets.

Reference behavior: ``bgflow/nn/flow/crd_transform/ic_helper.py``.  The torch
code hand-derives every Jacobian; here the *values* are closed-form and the
3x3 (or 9x9) Jacobians come from three (nine) ``jax.jvp`` passes with basis
tangents — exact, vectorized over (batch, atoms) in one shot, and fully fused
by XLA.  At trace time this is as cheap as the hand-written chain rule and
immune to derivation bugs.

All functions treat the last axis as xyz and broadcast over leading axes.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def _norm(v, eps):
    """Clamped Euclidean norm over the last axis, keepdims."""
    return jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def _normalize(v, eps):
    return v / _norm(v, eps)


# ----------------------------------------------------------------- values --


def dist(x1, x2, eps: float = 1e-7):
    """|x2 - x1|, shape (...,)."""
    return _norm(x2 - x1, eps)[..., 0]


def angle(x1, x2, x3, eps: float = 1e-7):
    """Angle at x2 spanned by (x1 - x2) and (x3 - x2), in [0, pi]."""
    r12 = _normalize(x1 - x2, eps)
    r32 = _normalize(x3 - x2, eps)
    cos_a = jnp.sum(r12 * r32, axis=-1)
    cos_a = jnp.clip(cos_a, -1.0 + eps, 1.0 - eps)
    return jnp.arccos(cos_a)


def torsion(x1, x2, x3, x4, eps: float = 1e-7):
    """Dihedral angle of the chain x1-x2-x3-x4, in [-pi, pi].

    atan2 formulation (numerically stable at 0 and pi).
    """
    b0 = x1 - x2
    b1 = _normalize(x3 - x2, eps)
    b2 = x4 - x3
    # components perpendicular to the central bond
    v = b0 - jnp.sum(b0 * b1, axis=-1, keepdims=True) * b1
    w = b2 - jnp.sum(b2 * b1, axis=-1, keepdims=True) * b1
    x = jnp.sum(v * w, axis=-1)
    y = jnp.sum(jnp.cross(b1, v) * w, axis=-1)
    return jnp.arctan2(y, x)


def ic_to_xyz(p1, p2, p3, d14, a124, t1234, eps: float = 1e-7):
    """Place a new point from (bond to p1, angle at p1 vs p2, torsion vs p2-p3).

    Standard NeRF construction (reference ``ic_helper.py:372-452``):
    the point sits at distance ``d14`` from ``p1``, forming angle ``a124``
    with the p1->p2 direction, rotated by torsion ``t1234`` out of the
    p1-p2-p3 plane.  ``d14/a124/t1234`` have shape (...,), points (..., 3).
    """
    v1 = p1 - p2
    v2 = p1 - p3
    n = jnp.cross(v1, v2)
    nn = jnp.cross(v1, n)
    n_hat = _normalize(n, eps)
    nn_hat = _normalize(nn, eps)
    t = t1234[..., None]
    d = d14[..., None]
    a = a124[..., None]
    v3 = -jnp.sin(t) * n_hat + jnp.cos(t) * nn_hat
    v3_hat = _normalize(v3, eps)
    v1_hat = _normalize(v1, eps)
    return p1 + d * jnp.sin(a) * v3_hat - d * jnp.cos(a) * v1_hat


def ic_to_xy0(p1, p2, d14, a124, eps: float = 1e-7):
    """Place a point in the z=0 plane (used for the third seed atom).

    Reference ``ic_helper.py:455-477``: equivalent to ``ic_to_xyz`` with a
    virtual third point at (0,-1,0) and torsion pi/2.
    """
    p3 = jnp.zeros_like(p1).at[..., 1].set(-1.0)
    t = jnp.full(d14.shape, 0.5 * jnp.pi, dtype=d14.dtype)
    return ic_to_xyz(p1, p2, p3, d14, a124, t, eps=eps)


# ------------------------------------------------------- frames and euler --


def tripod(p1, p2, p3, eps: float = 1e-7):
    """Unique orthonormal basis attached to three points.

    Returns (ex, ey, ez) with ez along p2-p1.  Reference ``ic_helper.py:114-138``.
    """
    e1 = _normalize(p2 - p1, eps)
    u = p3 - p1
    e2 = _normalize(jnp.cross(u, e1), eps)
    e3 = jnp.cross(e2, e1)
    return -e3, -e2, e1


def to_euler_angles(ex, ey, ez):
    """Basis -> proper z-x-z Euler parametrization (alpha, cos(beta), gamma).

    alpha, gamma in [-pi, pi]; beta is returned as its cosine in [-1, 1]
    (the reference's convention, ``ic_helper.py:330-341``, which makes the
    orientation marginal uniform-friendly).
    """
    alpha = jnp.arctan2(ez[..., 0], -ez[..., 1])
    cos_beta = ez[..., 2]
    gamma = jnp.arctan2(ex[..., 2], ey[..., 2])
    return alpha, cos_beta, gamma


def _rot_z(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, zero], axis=-1),
            jnp.stack([s, c, zero], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )


def _rot_x(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([one, zero, zero], axis=-1),
            jnp.stack([zero, c, -s], axis=-1),
            jnp.stack([zero, s, c], axis=-1),
        ],
        axis=-2,
    )


def from_euler_angles(alpha, cos_beta, gamma, eps: float = 1e-7):
    """(alpha, cos(beta), gamma) -> rotation matrix (z-x-z convention)."""
    beta = jnp.arccos(jnp.clip(cos_beta, -1.0 + eps, 1.0 - eps))
    return _rot_z(alpha) @ _rot_x(beta) @ _rot_z(gamma)


# --------------------------------------------------- jacobian log-dets -----


def placement_logdet(d, a, eps: float = 1e-7):
    """log |det dx/d(bond, angle, torsion)| of the NeRF placement = log(d^2 sin a).

    The placement map x = p1 + d * u(a, t) with u a unit vector at polar
    angle a and azimuth t has the spherical volume element d^2 sin(a):
    |dx/dd| = 1, |dx/da| = d, |dx/dt| = d sin(a), mutually orthogonal.
    The xyz -> (b, a, t) measurement is its inverse, so its log-det is the
    negative.  (Closed form replaces the jvp-based 3x3 determinant — same
    value, one pass; validated against autodiff in tests/test_ic.py.)
    """
    sin_a = jnp.clip(jnp.sin(a), eps, None)
    return 2.0 * jnp.log(jnp.maximum(d, eps)) + jnp.log(sin_a)


def jac_logdet_3(f: Callable, x: jax.Array) -> Tuple:
    """log|det df/dx| for an elementwise-3D map via 3 jvp passes.

    ``f``: (..., 3) -> either a single (..., 3) array or a tuple of three
    (...,)-shaped outputs (e.g. (bond, angle, torsion)).
    Returns (f(x), logdet (...,)).
    """

    def _flatten(dout):
        leaves = jax.tree_util.tree_leaves(dout)
        if len(leaves) == 1 and leaves[0].shape[-1] == 3:
            return leaves[0]
        return jnp.stack(leaves, axis=-1)

    cols = []
    out = None
    for i in range(3):
        tangent = jnp.zeros_like(x).at[..., i].set(1.0)
        out, dout = jax.jvp(f, (x,), (tangent,))
        cols.append(_flatten(dout))  # (..., 3) rows of J^T
    jac = jnp.stack(cols, axis=-2)  # (..., col, row) — det is transpose-invariant
    return out, jnp.log(jnp.abs(det3x3(jac)))


def det3x3(a):
    """Determinant of a (..., 3, 3) stack (cross-product form, no LU)."""
    return jnp.sum(jnp.cross(a[..., 0, :], a[..., 1, :]) * a[..., 2, :], axis=-1)


def jac_logdet_general(f: Callable, x: jax.Array) -> Tuple:
    """log|det df/dx| for a map (B, n) -> (B, n) via n jvp passes + slogdet.

    Used for the 9x9 reference-frame Jacobian (the reference enumerates its
    24 non-vanishing permutations, ``ic_helper.py:8-78``; ``slogdet`` on the
    small dense matrix is simpler and as fast on TPU).
    """
    n = x.shape[-1]
    cols = []
    out = None
    for i in range(n):
        tangent = jnp.zeros_like(x).at[..., i].set(1.0)
        out, dout = jax.jvp(f, (x,), (tangent,))
        cols.append(dout)
    jac = jnp.stack(cols, axis=-1)  # (..., out_dim, in_dim)
    return out, jnp.linalg.slogdet(jac)[1]
