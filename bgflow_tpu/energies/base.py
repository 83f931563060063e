"""Energy protocol.

An *energy* is a dimensionless (kT-unit) potential ``u(x)`` over one or more
event tensors.  Reference: ``bgflow/distribution/energy/base.py:44-214``.

Subclasses implement ``_energy(*xs) -> (B,)`` (the T=1 energy); ``energy``
applies temperature scaling ``u(x)/T``.  Forces come from ``jax.grad`` —
everything downstream (reverse-KL training, MCMC, Langevin layers) simply
differentiates through ``energy``, which XLA fuses with the surrounding
computation instead of the reference's custom autograd Functions.
"""
from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp

Shape = Tuple[int, ...]


def _parse_event_shapes(dim) -> Tuple[Shape, ...]:
    """Accept an int, a shape, or a list of shapes (reference ``base.py:14-41``)."""
    if isinstance(dim, int):
        return ((dim,),)
    if isinstance(dim, Sequence) and all(isinstance(d, int) for d in dim):
        return (tuple(dim),)
    return tuple(tuple(d) for d in dim)


class Energy:
    def __init__(self, dim):
        self._event_shapes = _parse_event_shapes(dim)

    @property
    def event_shapes(self) -> Tuple[Shape, ...]:
        return self._event_shapes

    @property
    def event_shape(self) -> Shape:
        if len(self._event_shapes) > 1:
            raise ValueError("This energy has multiple event shapes.")
        return self._event_shapes[0]

    @property
    def dim(self) -> int:
        if len(self._event_shapes) > 1:
            raise ValueError("This energy has multiple event shapes; use event_shapes.")
        shape = self._event_shapes[0]
        n = 1
        for s in shape:
            n *= s
        return n

    def _energy(self, *xs) -> jax.Array:
        raise NotImplementedError

    def energy(self, *xs, temperature: Union[float, jax.Array] = 1.0) -> jax.Array:
        """Temperature-scaled energy, shape (B,)."""
        return self._energy(*xs) / temperature

    def force(self, *xs, temperature=1.0):
        """-grad of the energy w.r.t. each event tensor.

        Returns a single array if there is one event tensor, else a tuple.
        """
        argnums = tuple(range(len(xs)))

        def total(*inner):
            return jnp.sum(self.energy(*inner, temperature=temperature))

        grads = jax.grad(total, argnums=argnums)(*xs)
        forces = tuple(-g for g in grads)
        return forces[0] if len(forces) == 1 else forces
