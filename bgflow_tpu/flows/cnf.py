"""Continuous normalizing flows (neural ODEs).

Reference: ``bgflow/nn/flow/diffeq.py:11-96`` (torchdiffeq/ANODE there).
TPU-native design: fixed-grid explicit integrators (RK4 / midpoint / Euler)
unrolled via ``lax.scan``; gradients flow by backprop-through-solver, with
optional ``jax.checkpoint`` per step (the discretize-then-optimize regime
the reference reaches for with ANODE — on TPU rematerialization beats
adjoint integration for the step counts BGs use).

A *dynamics* is an object with ``init(key) -> params`` and
``__call__(params, t, x, key=None) -> (dx, divergence_or_None)`` where
``divergence = tr(d dx / dx)``; the instantaneous change of variables gives
``dlogp/dt = -divergence``.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..core.flow import Flow
from ..ops.geometry import distance_vectors, distances_from_vectors
from ..ops.rbf import rbf_kernels

__all__ = [
    "DiffEqFlow",
    "BlackBoxDynamics",
    "TimeIndependentDynamics",
    "KernelDynamics",
    "brute_force_divergence",
    "hutchinson_divergence",
    "BruteForceEstimator",
    "HutchinsonEstimator",
]


# ------------------------------------------------------- div estimators --


def brute_force_divergence(f: Callable, x: jax.Array) -> jax.Array:
    """Exact divergence of f: (B, D) -> (B, D) via D jvp passes (O(D) cost,
    the forward-mode analogue of the reference's O(D) backward passes)."""
    dim = x.shape[-1]
    div = jnp.zeros(x.shape[0], dtype=x.dtype)
    for i in range(dim):
        tangent = jnp.zeros_like(x).at[:, i].set(1.0)
        _, jv = jax.jvp(f, (x,), (tangent,))
        div = div + jv[:, i]
    return div


def hutchinson_divergence(f: Callable, x: jax.Array, noise: jax.Array) -> jax.Array:
    """Stochastic trace estimate with one vjp: E[eps^T (df/dx) eps]."""
    _, vjp = jax.vjp(f, x)
    (jt_noise,) = vjp(noise)
    return jnp.sum(jt_noise * noise, axis=-1)


class BruteForceEstimator:
    """Exact divergence (reference ``estimator/brute_force_estimator.py``)."""

    def __call__(self, f, t, x, key=None):
        dx = f(t, x)
        div = brute_force_divergence(lambda xx: f(t, xx), x)
        return dx, div


class HutchinsonEstimator:
    """Rademacher/Gaussian stochastic trace (reference
    ``estimator/hutchinson_estimator.py``).  The same key yields the same
    noise — reuse the key across forward/inverse for noise reuse."""

    def __init__(self, rademacher: bool = True):
        self.rademacher = rademacher

    def __call__(self, f, t, x, key=None):
        if key is None:
            raise ValueError("HutchinsonEstimator requires a PRNG key")
        if self.rademacher:
            noise = jax.random.rademacher(key, x.shape, dtype=x.dtype)
        else:
            noise = jax.random.normal(key, x.shape, dtype=x.dtype)
        dx = f(t, x)
        div = hutchinson_divergence(lambda xx: f(t, xx), x, noise)
        return dx, div


# ------------------------------------------------------------- dynamics --


class TimeIndependentDynamics:
    """Wrap a net ``apply(params, x) -> dx`` as time-independent dynamics."""

    def __init__(self, net):
        self.net = net

    def init(self, key):
        return self.net.init(key)

    def velocity(self, params, t, x):
        return self.net.apply(params, x)


class BlackBoxDynamics:
    """Any velocity field + divergence estimator (reference
    ``dynamics/blackbox.py``)."""

    def __init__(self, dynamics, estimator=None):
        self.dynamics = dynamics
        self.estimator = estimator if estimator is not None else BruteForceEstimator()

    def init(self, key):
        return self.dynamics.init(key)

    def __call__(self, params, t, x, key=None):
        f = lambda tt, xx: self.dynamics.velocity(params, tt, xx)
        return self.estimator(f, t, x, key=key)

    def velocity(self, params, t, x):
        return self.dynamics.velocity(params, t, x)


class KernelDynamics:
    """E(n)-equivariant RBF-kernel dynamics with closed-form divergence.

    Reference: ``dynamics/kernel_dynamic.py:6-116``.  The velocity of each
    particle is a sum of radial forces along pair difference vectors with
    RBF-interpolated magnitudes; the divergence is analytic, so no
    estimator is needed.
    """

    def __init__(self, n_particles, n_dimensions, mus, gammas, mus_time=None, gammas_time=None):
        self.n_particles = n_particles
        self.n_dimensions = n_dimensions
        self.mus = jnp.asarray(mus)
        self.neg_log_gammas = -jnp.log(jnp.asarray(gammas))
        self.n_kernels = self.mus.shape[0]
        self.mus_time = None if mus_time is None else jnp.asarray(mus_time)
        self.neg_log_gammas_time = (
            None if gammas_time is None else -jnp.log(jnp.asarray(gammas_time))
        )
        self.n_out = 1 if self.mus_time is None else self.mus_time.shape[0]

    def init(self, key):
        k1, _ = jax.random.split(key)
        return {
            "weights": jax.random.normal(k1, (self.n_kernels, self.n_out))
            * jnp.sqrt(1.0 / self.n_kernels),
            "bias": jnp.zeros((1, self.n_out)),
            "importance": jnp.zeros(self.n_kernels),
        }

    def _force_mag(self, params, t, d, derivative):
        rbfs, d_rbfs = rbf_kernels(d, self.mus, self.neg_log_gammas, derivative=derivative)
        force_mag = (rbfs + params["importance"] ** 2) @ params["weights"] + params["bias"]
        d_force_mag = None if not derivative else d_rbfs @ params["weights"]
        if self.mus_time is not None:
            t_arr = jnp.asarray(t).reshape(1)
            trbfs, _ = rbf_kernels(t_arr, self.mus_time, self.neg_log_gammas_time)
            force_mag = jnp.sum(force_mag * trbfs, axis=-1, keepdims=True)
            if derivative:
                d_force_mag = jnp.sum(d_force_mag * trbfs, axis=-1, keepdims=True)
        return force_mag, d_force_mag

    def __call__(self, params, t, x, key=None, compute_divergence: bool = True):
        n_batch = x.shape[0]
        xp = x.reshape(n_batch, self.n_particles, self.n_dimensions)
        r = distance_vectors(xp)
        d = distances_from_vectors(r)[..., None]
        force_mag, d_force_mag = self._force_mag(params, t, d, compute_divergence)
        forces = jnp.sum(r * force_mag, axis=-2).reshape(n_batch, -1)
        if not compute_divergence:
            return forces, None
        divergence = jnp.sum(
            (d * d_force_mag + self.n_dimensions * force_mag).reshape(n_batch, -1), axis=-1
        )
        return forces, divergence

    def velocity(self, params, t, x):
        return self(params, t, x, compute_divergence=False)[0]


# ----------------------------------------------------------------- flow --


def _rk4_step(f, t, dt, state):
    k1 = f(t, state)
    k2 = f(t + 0.5 * dt, jax.tree_util.tree_map(lambda s, k: s + 0.5 * dt * k, state, k1))
    k3 = f(t + 0.5 * dt, jax.tree_util.tree_map(lambda s, k: s + 0.5 * dt * k, state, k2))
    k4 = f(t + dt, jax.tree_util.tree_map(lambda s, k: s + dt * k, state, k3))
    return jax.tree_util.tree_map(
        lambda s, a, b, c, d: s + (dt / 6.0) * (a + 2 * b + 2 * c + d), state, k1, k2, k3, k4
    )


def _midpoint_step(f, t, dt, state):
    k1 = f(t, state)
    k2 = f(t + 0.5 * dt, jax.tree_util.tree_map(lambda s, k: s + 0.5 * dt * k, state, k1))
    return jax.tree_util.tree_map(lambda s, k: s + dt * k, state, k2)


def _euler_step(f, t, dt, state):
    k1 = f(t, state)
    return jax.tree_util.tree_map(lambda s, k: s + dt * k, state, k1)


_STEPPERS = {"rk4": _rk4_step, "midpoint": _midpoint_step, "euler": _euler_step}


class DiffEqFlow(Flow):
    """Neural-ODE flow over state (x, logp).

    ``dynamics(params, t, x, key) -> (dx, divergence)``; forward integrates
    t: 0 -> t_max, inverse integrates the time-reversed field.

    Integrators:

    * ``"rk4"`` / ``"midpoint"`` / ``"euler"`` — fixed-grid ``lax.scan``
      with backprop-through-solver (``use_checkpoints=True`` rematerializes
      each step in the backward pass: the discretize-then-optimize regime
      the reference reaches for with ANODE).
    * ``"dopri5"`` — adaptive RK45 with ``rtol``/``atol`` error control via
      ``jax.experimental.ode.odeint``; gradients use the continuous adjoint
      (optimize-then-discretize), the exact analogue of the reference's
      torchdiffeq ``odeint_adjoint`` path (``diffeq.py:45-96``).  With a
      stochastic divergence estimator the Hutchinson noise key is held
      fixed along the whole trajectory (standard FFJORD practice —
      per-step resampling is incompatible with adaptive stepping).
    """

    def __init__(
        self,
        dynamics,
        integrator: str = "rk4",
        n_time_steps: int = 20,
        t_max: float = 1.0,
        use_checkpoints: bool = False,
        rtol: float = 1e-5,
        atol: float = 1e-6,
        mxstep: int = 10_000,
    ):
        self.dynamics = dynamics
        self.integrator = integrator
        self.stepper = None if integrator == "dopri5" else _STEPPERS[integrator]
        self.n_time_steps = n_time_steps
        self.t_max = t_max
        self.use_checkpoints = use_checkpoints
        self.rtol = float(rtol)
        self.atol = float(atol)
        self.mxstep = int(mxstep)

    def init(self, key):
        return self.dynamics.init(key)

    def _integrate(self, params, x, key, reverse: bool):
        def field(t, state, key=None):
            x, logp = state
            tt = self.t_max - t if reverse else t
            dx, div = self.dynamics(params, tt, x, key=key)
            sign = -1.0 if reverse else 1.0
            # ldj convention: log|det J| of the applied map = + integral of div
            # keep the scan carry dtype even if params are higher precision
            return ((sign * dx).astype(x.dtype), (sign * div).astype(logp.dtype))

        logp0 = jnp.zeros(x.shape[0], dtype=x.dtype)

        if self.integrator == "dopri5":
            from jax.experimental.ode import odeint

            ts = jnp.asarray([0.0, self.t_max], dtype=x.dtype)
            out = odeint(
                lambda state, t: field(t, state, key=key),
                (x, logp0),
                ts,
                rtol=self.rtol,
                atol=self.atol,
                mxstep=self.mxstep,
            )
            x, dlogp = jax.tree_util.tree_map(lambda a: a[-1], out)
            return x, dlogp

        dt = self.t_max / self.n_time_steps

        def one_step(state, inputs):
            i, step_key = inputs
            t = i * dt
            new = self.stepper(lambda tt, s: field(tt, s, key=step_key), t, dt, state)
            return new, None

        if self.use_checkpoints:
            one_step = jax.checkpoint(one_step)

        steps = jnp.arange(self.n_time_steps, dtype=x.dtype)
        keys = (
            jax.random.split(key, self.n_time_steps)
            if key is not None
            else jnp.zeros((self.n_time_steps, 2), dtype=jnp.uint32)
        )
        (x, dlogp), _ = jax.lax.scan(one_step, (x, logp0), (steps, keys))
        return x, dlogp

    def integrate_no_logdet(
        self, params, x, inverse: bool = False, key=None, t_span=None
    ):
        """Transport ``x`` WITHOUT accumulating the divergence integral.

        The fast path for flow-perturbation reweighting
        (``flows/perturbation.py``, arXiv:2407.10666): importance weights
        there need no Jacobians, so the per-step divergence work (an O(D)
        backward sweep for the brute-force estimator) is skipped entirely.

        ``t_span=(a, b)`` transports through the sub-flow of ``t in
        [a, b]`` only (``inverse=True`` maps time-b states back to time
        a) — the segments of the multi-step perturbation scheme
        (arXiv:2601.21177).  Fixed-grid integrators use a proportional
        share of ``n_time_steps`` (at least 1).
        """
        a, b = (0.0, self.t_max) if t_span is None else t_span
        span = b - a
        vel = getattr(self.dynamics, "velocity", None)
        if vel is None:
            import warnings

            # every in-repo dynamics exposes velocity(); a bare __call__
            # fallback still evaluates (and discards) the divergence, so
            # the Jacobian-scale cost this method exists to skip is paid
            warnings.warn(
                f"{type(self.dynamics).__name__} has no velocity() method; "
                "integrate_no_logdet falls back to the full dynamics call "
                "and discards the divergence — implement velocity() to "
                "actually skip the divergence work"
            )

        def field(s, x_):
            tt = (b - s) if inverse else (a + s)
            if vel is not None:
                dx = vel(params, tt, x_)
            else:
                dx, _ = self.dynamics(params, tt, x_, key=key)
            sign = -1.0 if inverse else 1.0
            return (sign * dx).astype(x_.dtype)

        if self.integrator == "dopri5":
            from jax.experimental.ode import odeint

            ts = jnp.asarray([0.0, span], dtype=x.dtype)
            out = odeint(
                lambda s, t: field(t, s), x, ts,
                rtol=self.rtol, atol=self.atol, mxstep=self.mxstep,
            )
            return out[-1]

        n_steps = max(1, round(self.n_time_steps * span / self.t_max))
        dt = span / n_steps

        def one_step(s, i):
            return self.stepper(field, i * dt, dt, s), None

        steps = jnp.arange(n_steps, dtype=x.dtype)
        y, _ = jax.lax.scan(one_step, x, steps)
        return y

    def _forward(self, params, xs, key=None, **kwargs):
        (x,) = xs
        y, dlogp = self._integrate(params, x, key, reverse=False)
        return (y,), dlogp

    def _inverse(self, params, xs, key=None, **kwargs):
        (x,) = xs
        y, dlogp = self._integrate(params, x, key, reverse=True)
        return (y,), dlogp
