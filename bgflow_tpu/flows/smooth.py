"""Smooth elementary bijectors with numerical inversion.

The capability of the reference's JAX seed (``bgflow/nn/flow/transformer/
jax.py`` and ``jax_bridge.py``): C-infinity ramps -> generalized sigmoids ->
affine-sigmoid mixtures -> circularly wrapped mixtures, with automatic
elementwise log-dets and a bisection inverse that differentiates implicitly.
Being JAX-native end to end, the torch/dlpack bridging machinery of the
reference disappears entirely.

Inversion gradients use the one-step-Newton trick: the bisection root is
``stop_gradient``-ed and corrected by ``x - (f(x) - y)/f'(x)``, which is an
identity at the root but carries the exact first-order (implicit-function
theorem) dependence on ``y`` and the parameters — the same gradients as the
reference's hand-written custom VJP (``jax_bridge.py:71-124``) with none of
the plumbing.
"""
from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "smooth_ramp",
    "monomial_ramp",
    "ramp_to_sigmoid",
    "affine_sigmoid",
    "mixture_bijector",
    "wrap_around",
    "remap_to_unit",
    "elementwise_ldj",
    "bisection_inverse",
    "inverse_with_ldj",
]


# ---------------------------------------------------- scalar bijector zoo --


def smooth_ramp(x, logalpha, power: int = 1, eps: float = 1e-9):
    """C-infinity ramp exp(-alpha x^-power), 0 below 0, 1 at 1."""
    alpha = jnp.exp(logalpha)
    # double-where to keep the backward pass NaN-free at x <= 0
    z = jnp.where(x > eps, x, eps)
    normalizer = jnp.exp(-alpha)
    return jnp.where(x > eps, jnp.exp(-alpha * z ** (-power)) / normalizer, 0.0)


def monomial_ramp(x, order: int = 2):
    return x**order


def ramp_to_sigmoid(ramp: Callable) -> Callable:
    """rho(x) / (rho(x) + rho(1-x)) — a generalized sigmoid on [0, 1]."""

    def _sigmoid(x, *params):
        numer = ramp(x, *params)
        return numer / (numer + ramp(1.0 - x, *params))

    return _sigmoid


def affine_sigmoid(sigmoid: Callable, eps: float = 1e-8) -> Callable:
    """Shift/slope/leaky-mix wrapper making a family of unit-interval maps."""

    def _affine_sigmoid(x, shift, log_slope, mix, *params):
        slope = jnp.exp(log_slope)
        m = jax.nn.sigmoid(mix) * (1.0 - eps) + eps
        return m * sigmoid(slope * (x - shift), *params) + (1.0 - m) * x

    return _affine_sigmoid


def mixture_bijector(bijector: Callable) -> Callable:
    """Convex combination of K parameterized bijectors (params (..., K))."""

    def _mixture(x, weights, *params):
        components = bijector(x[..., None], *params)
        return jnp.sum(jax.nn.softmax(weights, axis=-1) * components, axis=-1)

    return _mixture


def remap_to_unit(fun: Callable) -> Callable:
    """Normalize a monotone map so that f(0)=0 and f(1)=1."""

    @functools.wraps(fun)
    def _remapped(x, *params):
        y1 = fun(jnp.ones_like(x), *params)
        y0 = fun(jnp.zeros_like(x), *params)
        return (fun(x, *params) - y0) / (y1 - y0)

    return _remapped


def wrap_around(bijector: Callable, sheaves=(-1, 0, 1)) -> Callable:
    """Circularly wrap a unit-interval bijector (sum over periodic images),
    renormalized to [0, 1]; gives continuous circular transforms."""
    sheaves_arr = jnp.asarray(sheaves, dtype=jnp.result_type(float))
    mix = mixture_bijector(bijector)

    def _wrapped(x, *params):
        # x: (...); evaluate at each sheaf shift and average uniformly
        shifted = x[..., None] - sheaves_arr
        params_rep = [jnp.broadcast_to(p[..., None], (*p.shape, len(sheaves))) for p in params]
        weights = jnp.zeros(shifted.shape)
        comps = bijector(shifted, *params_rep)
        return jnp.sum(jax.nn.softmax(weights, axis=-1) * comps, axis=-1)

    return remap_to_unit(_wrapped)


# -------------------------------------------------------- ldj + inversion --


def elementwise_ldj(bijector: Callable) -> Callable:
    """Wrap an elementwise map with its elementwise log |df/dx| (via jvp)."""

    def _with_ldj(x, *params):
        y, dy = jax.jvp(lambda xx: bijector(xx, *params), (x,), (jnp.ones_like(x),))
        return y, jnp.log(jnp.abs(dy))

    return _with_ldj


def bisection_inverse(fn: Callable, target, lower, upper, eps: float = 1e-8):
    """Elementwise bisection root of fn(x) = target on [lower, upper]."""
    n_iters = int(jnp.ceil(-jnp.log2(eps)))
    lo = jnp.broadcast_to(jnp.asarray(lower, dtype=target.dtype), target.shape)
    hi = jnp.broadcast_to(jnp.asarray(upper, dtype=target.dtype), target.shape)

    def body(_, bounds):
        lo, hi = bounds
        mid = 0.5 * (lo + hi)
        pred = fn(mid)
        lo = jnp.where(pred < target, mid, lo)
        hi = jnp.where(pred >= target, mid, hi)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, n_iters, body, (lo, hi))
    return 0.5 * (lo + hi)


def inverse_with_ldj(bijector: Callable, domain=(0.0, 1.0), eps: float = 1e-8) -> Callable:
    """Numerically invert an elementwise monotone bijector.

    Returns ``inv(y, *params) -> (x, ldj)`` with exact implicit gradients
    (one-step Newton through the stop-gradient bisection root) and
    ``ldj = -log|df/dx|(x)``.
    """

    def _inverse(y, *params):
        f = lambda x: bijector(x, *params)
        root = jax.lax.stop_gradient(
            bisection_inverse(f, jax.lax.stop_gradient(y), domain[0], domain[1], eps)
        )
        fx, dfx = jax.jvp(f, (root,), (jnp.ones_like(root),))
        # identity at the root; carries d root/dy = 1/f' and -f_p/f'
        x = root - (fx - y) / dfx
        _, dfx_at_x = jax.jvp(f, (x,), (jnp.ones_like(x),))
        return x, -jnp.log(jnp.abs(dfx_at_x))

    return _inverse
