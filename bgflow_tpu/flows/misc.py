"""Misc flows: funnel (sigmoid-to-interval) and 2D checkerboard split.

References: ``bgflow/nn/flow/funnel.py``, ``checkerboard.py``.
"""
from __future__ import annotations

import math
from itertools import product

import numpy as np
import jax
import jax.numpy as jnp

from ..core.flow import Flow

__all__ = ["FunnelFlow", "CheckerboardFlow"]


class FunnelFlow(Flow):
    """Sigmoid squashing of R onto (min_val, max_val) with exact log-det."""

    def __init__(self, eps: float = 1e-6, min_val: float = -1.0, max_val: float = 1.0):
        self.eps = eps
        self.min_val = min_val
        self.max_val = max_val

    def _forward(self, params, xs, **kwargs):
        (x,) = xs
        width = self.max_val - self.min_val
        ldj = jnp.sum(
            (jax.nn.log_sigmoid(x) - jax.nn.softplus(x) + math.log(width)).reshape(x.shape[0], -1),
            axis=-1,
        )
        y = jax.nn.sigmoid(x) * width + self.min_val
        y = jnp.clip(y, self.min_val + self.eps, self.max_val - self.eps)
        return (y,), ldj

    def _inverse(self, params, xs, **kwargs):
        (y,) = xs
        width = self.max_val - self.min_val
        y = jnp.clip(y, self.min_val + self.eps, self.max_val - self.eps)
        u = (y - self.min_val) / width
        ldj = jnp.sum(
            (-jnp.log(u - u * u) - math.log(width)).reshape(y.shape[0], -1), axis=-1
        )
        x = jnp.log(u) - jnp.log1p(-u)
        return (x,), ldj


def _checkerboard_masks(size: int):
    even = np.arange(size, dtype=np.int64) % 2
    odd = 1 - even
    grid = np.arange(size * size, dtype=np.int64)
    idxs = []
    for i, j in product([odd, even], repeat=2):
        mask = np.outer(i, j).astype(bool).reshape(-1)
        idxs.append(grid[mask])
    mask = np.concatenate(idxs)
    return np.argsort(mask), idxs


class CheckerboardFlow(Flow):
    """Split an (B, size, size, C) grid into its four 2x2-checkerboard
    sub-grids (volume preserving); inverse reassembles."""

    def __init__(self, size: int):
        assert size % 2 == 0
        self.size = size
        self._inv_mask, self._sub_masks = _checkerboard_masks(size)

    def _forward(self, params, xs, **kwargs):
        (x,) = xs
        n_batch = x.shape[0]
        assert x.shape[1] == self.size and x.shape[2] == self.size
        sz = self.size // 2
        flat = x.reshape(n_batch, self.size * self.size, -1)
        ys = tuple(
            flat[:, mask, :].reshape(n_batch, sz, sz, -1) for mask in self._sub_masks
        )
        return ys, jnp.zeros(n_batch, dtype=x.dtype)

    def _inverse(self, params, xs, **kwargs):
        assert len(xs) == 4
        n_batch = xs[0].shape[0]
        sz = self.size // 2
        flat = jnp.concatenate([x.reshape(n_batch, sz * sz, -1) for x in xs], axis=1)
        y = flat[:, self._inv_mask, :].reshape(n_batch, self.size, self.size, -1)
        return (y,), jnp.zeros(n_batch, dtype=y.dtype)
