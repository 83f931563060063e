"""Structural flows: split / merge / swap / wrap / set-constant / coupling.

These are pure tuple/pytree manipulations with zero log-det (except coupling,
which delegates to its transformer).  Reference semantics:
``bgflow/nn/flow/coupling.py:13-272``.

All index bookkeeping happens at trace time with static Python ints, so XLA
sees only static slices and concatenations — no gathers on the hot path when
the index sets are contiguous (the builder emits contiguous splits when it
can).
"""
from __future__ import annotations

import warnings
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .flow import Flow, Inverse, as_tuple, zero_ldj


class Split(Flow):
    """Split one tensor into several along ``axis``.

    ``sizes_or_indices`` are either ints (sizes; the last may be inferred) or
    sequences of ints (index lists).  Reference: ``coupling.py:13-104``.
    """

    def __init__(self, *sizes_or_indices, axis: int = -1):
        first = sizes_or_indices[0]
        if isinstance(first, (Sequence, np.ndarray)) and not isinstance(first, (int, np.integer)):
            self.sizes = None
            self.indices = tuple(np.asarray(i, dtype=np.int64) for i in sizes_or_indices)
            all_idx = np.concatenate(self.indices)
            if len(np.unique(all_idx)) != len(all_idx):
                raise ValueError("Cannot split tensor. Indices are overlapping.")
            self._n_total = len(all_idx)
            # inverse permutation for concat-based merge
            order = np.argsort(all_idx)
            if not np.array_equal(np.sort(all_idx), np.arange(self._n_total)):
                raise ValueError(f"Split with indices misses some indices: {sorted(all_idx)}")
            self._inv_perm = tuple(order.tolist())
        else:
            self.sizes = tuple(int(s) for s in sizes_or_indices)
            self.indices = None
        self.axis = axis

    def _resolved_sizes(self, n):
        total = sum(self.sizes)
        if total == n:
            return self.sizes
        if total < n:
            return (*self.sizes, n - total)
        raise ValueError(f"can't split dim of size {n} into sizes {self.sizes}")

    def _forward(self, params, xs, **kwargs):
        (x,) = xs
        if self.indices is None:
            sizes = self._resolved_sizes(x.shape[self.axis])
            offsets = np.cumsum((0,) + sizes)
            ys = tuple(
                jax.lax.slice_in_dim(x, int(offsets[i]), int(offsets[i + 1]), axis=self.axis)
                for i in range(len(sizes))
            )
        else:
            ys = tuple(jnp.take(x, jnp.asarray(idx), axis=self.axis) for idx in self.indices)
        return ys, zero_ldj(xs)

    def _inverse(self, params, xs, **kwargs):
        if self.indices is None:
            y = jnp.concatenate(xs, axis=self.axis)
        else:
            cat = jnp.concatenate(xs, axis=self.axis)
            y = jnp.take(cat, jnp.asarray(self._inv_perm), axis=self.axis)
        return (y,), zero_ldj(xs)


class Merge(Inverse):
    """Shortcut for ``Inverse(Split(...))``.  Reference: ``coupling.py:107-110``."""

    def __init__(self, *sizes_or_indices, axis: int = -1):
        super().__init__(Split(*sizes_or_indices, axis=axis))


class Swap(Flow):
    """Swap the first two tensors in the tuple.  Reference: ``coupling.py:113-130``."""

    def _swap(self, xs):
        if len(xs) == 1:
            warnings.warn("applying swapping on a single tensor has no effect")
            return xs
        return (xs[1], xs[0], *xs[2:])

    def _forward(self, params, xs, **kwargs):
        return self._swap(xs), zero_ldj(xs)

    def _inverse(self, params, xs, **kwargs):
        return self._swap(xs), zero_ldj(xs)


class Coupling(Flow):
    """Conditioned transformer application (the coupling layer).

    ``transformer.forward(params, cond, y, inverse=..., **kwargs)`` transforms
    the concatenation of the ``transformed`` tensors conditioned on the
    concatenation of the ``on`` tensors.  Reference: ``coupling.py:133-182``.

    ``temperature_feature=True`` appends ``log(T)`` as one extra conditioner
    input column (scalar T broadcast over the batch, or a per-sample ``(B,)``
    vector) — the "latent temperature input" that makes the learned
    conditional densities temperature-dependent.  At ``T=1`` the feature is
    exactly zero, so a temperature-conditioned model evaluated at unit
    temperature uses only the data-driven inputs.  The conditioner net must
    be built with one extra input dim (``factory.make_conditioners(...,
    temperature_feature=True)`` handles the bookkeeping).
    """

    def __init__(self, transformer, transformed=(1,), on=(0,), cat_axis: int = -1,
                 temperature_feature: bool = False):
        self.transformer = transformer
        self.transformed = tuple(transformed)
        self.on = tuple(on)
        overlap = set(self.transformed) & set(self.on)
        if overlap:
            raise ValueError(f"Indices {overlap} cannot be both transformed and conditioned on.")
        self.cat_axis = cat_axis
        if temperature_feature and cat_axis != -1:
            raise ValueError("temperature_feature requires cat_axis=-1")
        self.temperature_feature = bool(temperature_feature)

    def init(self, key=None):
        return self.transformer.init(key)

    def _apply(self, params, xs, inverse, **kwargs):
        lengths = [xs[i].shape[self.cat_axis] for i in self.transformed]
        y = jnp.concatenate([xs[i] for i in self.transformed], axis=self.cat_axis)
        cond = jnp.concatenate([xs[i] for i in self.on], axis=self.cat_axis)
        if self.temperature_feature:
            t = jnp.asarray(kwargs.get("temperature", 1.0), dtype=cond.dtype)
            feat = jnp.log(jnp.broadcast_to(
                t.reshape(t.shape + (1,) * (cond.ndim - t.ndim)),
                cond.shape[:-1] + (1,),
            ))
            cond = jnp.concatenate([cond, feat], axis=-1)
        y_out, ldj = self.transformer.forward(params, cond, y, inverse=inverse, **kwargs)
        out = list(xs)
        offset = 0
        for i, n in zip(self.transformed, lengths):
            out[i] = jax.lax.slice_in_dim(y_out, offset, offset + n, axis=self.cat_axis)
            offset += n
        return tuple(out), ldj

    def _forward(self, params, xs, **kwargs):
        return self._apply(params, xs, inverse=False, **kwargs)

    def _inverse(self, params, xs, **kwargs):
        return self._apply(params, xs, inverse=True, **kwargs)


class Wrap(Flow):
    """Apply a sub-flow to a subset of the tensors in the tuple.

    Reference: ``coupling.py:185-222``.
    """

    def __init__(self, flow: Flow, indices: Sequence[int], out_indices: Optional[Sequence[int]] = None):
        self.flow = flow
        self.indices = tuple(indices)
        self.out_indices = self.indices if out_indices is None else tuple(out_indices)
        self._argsort_in = tuple(int(i) for i in np.argsort(self.indices))
        self._argsort_out = tuple(int(i) for i in np.argsort(self.out_indices))

    def init(self, key=None):
        return self.flow.init(key)

    def _apply(self, params, xs, in_idx, out_idx, argsort_out, inverse, **kwargs):
        inp = tuple(xs[i] for i in in_idx)
        rest = [xs[i] for i in range(len(xs)) if i not in in_idx]
        ys, ldj = self.flow.forward(params, inp, inverse=inverse, **kwargs)
        out = list(rest)
        for i in argsort_out:
            out.insert(out_idx[i], ys[i])
        return tuple(out), ldj

    def _forward(self, params, xs, **kwargs):
        return self._apply(params, xs, self.indices, self.out_indices, self._argsort_out, False, **kwargs)

    def _inverse(self, params, xs, **kwargs):
        return self._apply(params, xs, self.out_indices, self.indices, self._argsort_in, True, **kwargs)


class SetConstant(Flow):
    """Insert constant tensors in forward, strip them in inverse.

    Reference: ``coupling.py:227-272``.
    """

    def __init__(self, indices: Sequence[int], values: Sequence[jax.Array]):
        argsort = np.argsort(indices)
        self.indices = tuple(int(indices[i]) for i in argsort)
        self.values = tuple(jnp.asarray(values[i]) for i in argsort)

    def _forward(self, params, xs, **kwargs):
        batch = xs[0].shape[0]
        out = list(xs)
        for i, v in zip(self.indices, self.values):
            out.insert(i, jnp.broadcast_to(v, (batch, *v.shape)))
        return tuple(out), zero_ldj(xs)

    def _inverse(self, params, xs, **kwargs):
        out = tuple(x for i, x in enumerate(xs) if i not in self.indices)
        return out, zero_ldj(out)
