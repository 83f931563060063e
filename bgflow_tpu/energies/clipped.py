"""Energy regularizers: linlogcut tail damping and gradient clipping.

Reference: ``bgflow/distribution/energy/clipped.py:8-38`` and
``bgflow/utils/train.py:60-118``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Energy


def linlogcut(x, high_val: float = 1e3, max_val: float = 1e9):
    """Identity below ``high_val``, logarithmic growth above, capped at
    ``max_val``.  Keeps reverse-KL gradients finite in high-energy regions."""
    x = jnp.minimum(x, max_val)
    x = jnp.where(jnp.isfinite(x), x, max_val)
    damped = high_val + jnp.log1p(jnp.maximum(x - high_val, 0.0))
    return jnp.where(x < high_val, x, damped)


class LinLogCutEnergy(Energy):
    """u -> linlogcut(u): linear below ``high_energy``, log above."""

    def __init__(self, energy: Energy, high_energy: float = 1e3, max_energy: float = 1e9):
        super().__init__([list(s) for s in energy.event_shapes])
        self.delegate = energy
        self.high_energy = high_energy
        self.max_energy = max_energy

    def _energy(self, *xs):
        return linlogcut(self.delegate.energy(*xs), self.high_energy, self.max_energy)


def _clipped_identity(x, max_norm: float, norm_dim: bool):
    """Identity in the forward pass; clips the gradient in the backward."""

    @jax.custom_vjp
    def f(y):
        return y

    def fwd(y):
        return y, None

    def bwd(_, g):
        if norm_dim:
            # clip by per-sample norm
            flat = g.reshape(g.shape[0], -1)
            norm = jnp.linalg.norm(flat, axis=-1, keepdims=True)
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
            return (g * scale.reshape(-1, *([1] * (g.ndim - 1))),)
        return (jnp.clip(g, -max_norm, max_norm),)

    f.defvjp(fwd, bwd)
    return f(x)


class GradientClippedEnergy(Energy):
    """Clips dU/dx flowing back into the flow during reverse-KL training.

    ``norm_dim=True`` clips by per-sample gradient norm, else elementwise.
    Reference: ``clipped.py:20-38`` + ``utils/train.py:84-118``.
    """

    def __init__(self, energy: Energy, gradient_cutoff: float, norm_dim: bool = True):
        super().__init__([list(s) for s in energy.event_shapes])
        self.delegate = energy
        self.gradient_cutoff = float(gradient_cutoff)
        self.norm_dim = bool(norm_dim)

    def _energy(self, *xs):
        xs = tuple(_clipped_identity(x, self.gradient_cutoff, self.norm_dim) for x in xs)
        return self.delegate.energy(*xs)
