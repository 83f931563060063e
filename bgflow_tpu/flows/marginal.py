"""Learnable elementwise marginal flows.

``MarginalSplineFlow`` is an *unconditional* per-dimension monotone
rational-quadratic spline with trainable knots — a learnable marginal
reshaper.  The reference reaches learnable marginals through trainable
``TruncatedNormalDistribution`` priors (``bgflow/distribution/normal.py:138-143``)
and tabulated splines (``bgflow/nn/flow/spline.py:6-191``); this layer is the
strictly more expressive TPU-native version: K-bin RQ splines per dim, exact
identity at zero-init, circular dims get periodic slope wrap plus a free
(log-det-zero) learnable phase shift.

Motivation: coupling flows condition dims on *other* dims; with ~100+
torsion dofs the residual error is dominated by small per-dim marginal
mismatches that accumulate multiplicatively in the importance weights.  A
single elementwise layer fixes every marginal at negligible cost (the params
are (D, K) — no conditioner network).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.flow import Flow
from ..ops.rqs import rq_spline_core, rq_spline_params

__all__ = ["MarginalSplineFlow"]


class MarginalSplineFlow(Flow):
    """Trainable elementwise RQ-spline warp of ``[left, right]^D``.

    Parameters
    ----------
    dim : number of features D.
    num_bins : spline bins per feature.
    is_circular : bool or (D,) bool mask.  Circular dims keep a periodic
        density (last slope == first slope) and gain a learnable mod-1 phase
        shift; non-circular dims get an independent final slope.
    left, right : domain (the same interval is the codomain — marginal
        reshaping, not rescaling).
    """

    def __init__(self, dim: int, num_bins: int = 8, is_circular=False,
                 left: float = 0.0, right: float = 1.0):
        self.dim = int(dim)
        self.num_bins = int(num_bins)
        circ = np.asarray(is_circular, dtype=bool)
        if circ.ndim == 0:
            circ = np.full((self.dim,), bool(circ))
        if circ.shape != (self.dim,):
            raise ValueError(f"is_circular must be scalar or shape ({self.dim},)")
        self.is_circular = circ
        self.left = float(left)
        self.right = float(right)
        self._width = self.right - self.left

    def init(self, key=None):
        D, K = self.dim, self.num_bins
        f = jnp.result_type(float)
        params = {
            "w": jnp.zeros((D, K), f),
            "h": jnp.zeros((D, K), f),
            "s": jnp.zeros((D, K), f),
        }
        n_noncirc = int(np.sum(~self.is_circular))
        if n_noncirc:
            params["s_edge"] = jnp.zeros((n_noncirc,), f)
        if bool(np.any(self.is_circular)):
            params["shift"] = jnp.zeros((D,), f)
        return params

    def _knots(self, params):
        s = params["s"]
        slopes = jnp.concatenate([s, s[:, :1]], axis=-1)
        idx = np.nonzero(~self.is_circular)[0]
        if len(idx) > 0:
            slopes = slopes.at[idx, -1].set(params["s_edge"])
        return rq_spline_params(
            params["w"], params["h"], slopes,
            left=self.left, right=self.right, bottom=self.left, top=self.right,
        )

    def _shift(self, params, x, sign):
        if "shift" not in params:
            return x
        circ = jnp.asarray(self.is_circular)
        shifted = self.left + jnp.mod(
            x - self.left + sign * params["shift"], self._width
        )
        return jnp.where(circ, shifted, x)

    def _apply(self, params, xs, inverse):
        (x,) = xs
        cumx, cumy, derivs = self._knots(params)
        # (D, K+1) knots broadcast against (..., D) inputs through a leading
        # singleton axis (take_along_axis broadcasts all non-axis dims)
        bshape = (1,) * (x.ndim - 1)
        cumx = cumx.reshape(bshape + cumx.shape)
        cumy = cumy.reshape(bshape + cumy.shape)
        derivs = derivs.reshape(bshape + derivs.shape)
        if inverse:
            y, ldj = rq_spline_core(
                jnp.clip(x, self.left, self.right), cumx, cumy, derivs, inverse=True
            )
            y = self._shift(params, y, -1.0)
        else:
            x = self._shift(params, x, +1.0)
            y, ldj = rq_spline_core(
                jnp.clip(x, self.left, self.right), cumx, cumy, derivs, inverse=False
            )
        return (y,), jnp.sum(ldj.reshape(ldj.shape[0], -1), axis=-1)

    def _forward(self, params, xs, **kwargs):
        return self._apply(params, xs, inverse=False)

    def _inverse(self, params, xs, **kwargs):
        return self._apply(params, xs, inverse=True)
