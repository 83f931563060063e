"""Core flow algebra.

A *flow* is an invertible (or stochastically invertible) map between tuples of
arrays together with the log-determinant of its Jacobian.  Unlike the torch
reference (``bgflow/nn/flow/base.py:7-33``), flows here are **stateless static
objects**: parameters live in an explicit pytree created by ``init(key)`` and
threaded through ``forward``.  This makes every flow trivially compatible with
``jax.jit`` / ``jax.vmap`` / ``jax.grad`` / ``pjit`` — the flow object itself is
a hashable static closure, the params are traced.

Conventions
-----------
* ``forward(params, xs, inverse=False, temperature=1.0, key=None)`` maps a
  tuple of arrays ``xs`` to ``(ys, ldj)`` where ``ldj`` has shape
  ``batch_shape`` (no trailing singleton — energies and dlogp are ``(B,)``).
* ``ldj`` is the log |det J| of the *applied* direction, so for an exact
  bijection ``ldj_fwd(x) = -ldj_inv(F(x))``.
* Stochastic flows consume ``key`` and return the path-work contribution in
  place of an exact log-det (SNF convention, reference
  ``bgflow/nn/flow/stochastic/``).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Any
ArrayTuple = Tuple[jax.Array, ...]


def as_tuple(x) -> tuple:
    """Pack a single array into a 1-tuple; pass tuples/lists through."""
    if isinstance(x, (tuple, list)):
        return tuple(x)
    return (x,)


def zero_ldj(xs: ArrayTuple) -> jax.Array:
    """A zero log-det matching the batch shape of the first tensor."""
    x = xs[0]
    return jnp.zeros(x.shape[:1], dtype=x.dtype)


class Flow:
    """Base class.  Subclasses implement ``_forward`` and ``_inverse``.

    Parameter-free subclasses only implement the two direction methods; the
    default ``init`` returns an empty pytree.
    """

    def init(self, key: Optional[jax.Array] = None) -> Params:
        return ()

    # -- direction dispatch ------------------------------------------------
    def forward(self, params: Params, xs, inverse: bool = False, **kwargs):
        xs = as_tuple(xs)
        if inverse:
            ys, ldj = self._inverse(params, xs, **kwargs)
        else:
            ys, ldj = self._forward(params, xs, **kwargs)
        return as_tuple(ys), ldj

    def __call__(self, params: Params, xs, inverse: bool = False, **kwargs):
        return self.forward(params, xs, inverse=inverse, **kwargs)

    # -- to be implemented -------------------------------------------------
    def _forward(self, params, xs: ArrayTuple, **kwargs):
        raise NotImplementedError

    def _inverse(self, params, xs: ArrayTuple, **kwargs):
        raise NotImplementedError

    # -- sugar -------------------------------------------------------------
    def inverse(self) -> "Inverse":
        return Inverse(self)


class Inverse(Flow):
    """Swap forward and inverse of a delegate flow.

    Reference: ``bgflow/nn/flow/inverted.py:6-23``.
    """

    def __init__(self, delegate: Flow):
        self.delegate = delegate

    def init(self, key=None):
        return self.delegate.init(key)

    def _forward(self, params, xs, **kwargs):
        return self.delegate.forward(params, xs, inverse=True, **kwargs)

    def _inverse(self, params, xs, **kwargs):
        return self.delegate.forward(params, xs, inverse=False, **kwargs)


class Chain(Flow):
    """Sequential composition with log-det accumulation.

    Reference: ``bgflow/nn/flow/sequential.py:10-92``.  The block list is
    static, so the Python loop unrolls at trace time into one fused XLA
    computation — there is no interpreter overhead at run time.

    Params are a tuple with one entry per block.
    """

    def __init__(self, blocks: Sequence[Flow]):
        self.blocks = tuple(blocks)

    def __len__(self):
        return len(self.blocks)

    def __getitem__(self, idx):
        if isinstance(idx, slice):
            return Chain(self.blocks[idx])
        return self.blocks[idx]

    def init(self, key=None):
        if key is None:
            keys = [None] * len(self.blocks)
        else:
            keys = jax.random.split(key, max(len(self.blocks), 1))
        return tuple(b.init(k) for b, k in zip(self.blocks, keys))

    def forward(self, params, xs, inverse: bool = False, key=None, **kwargs):
        xs = as_tuple(xs)
        if len(params) != len(self.blocks):
            raise ValueError(
                f"Chain of {len(self.blocks)} blocks got params of length "
                f"{len(params)}; use chain.init(key) — passing () would "
                f"silently apply no blocks."
            )
        blocks = list(zip(params, self.blocks))
        if inverse:
            blocks = blocks[::-1]
        if key is not None:
            keys = list(jax.random.split(key, max(len(blocks), 1)))
        else:
            keys = [None] * len(blocks)
        ldj = zero_ldj(xs)
        for (p, block), k in zip(blocks, keys):
            xs, dldj = block.forward(p, xs, inverse=inverse, key=k, **kwargs)
            ldj = ldj + dldj
        return xs, ldj


class Identity(Flow):
    def _forward(self, params, xs, **kwargs):
        return xs, zero_ldj(xs)

    def _inverse(self, params, xs, **kwargs):
        return xs, zero_ldj(xs)


class Lambda(Flow):
    """Wrap a pair of parameter-free callables ``(fn, ifn)``.

    Each callable maps ``xs -> (ys, ldj)``.
    """

    def __init__(self, fn, ifn):
        self._fn = fn
        self._ifn = ifn

    def _forward(self, params, xs, **kwargs):
        ys, ldj = self._fn(*xs)
        return as_tuple(ys), ldj

    def _inverse(self, params, xs, **kwargs):
        ys, ldj = self._ifn(*xs)
        return as_tuple(ys), ldj
