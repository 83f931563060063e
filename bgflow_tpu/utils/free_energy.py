"""Free-energy estimators: BAR, MBAR, and exponential reweighting.

Reference: ``bgflow/utils/free_energy.py:13-197`` (torch BAR adapted from
pymbar) and the legacy umbrella-sampling analysis the reference keeps as
dead code (``distribution/sampling/_mcmc/umbrella_sampling.py``) — rebuilt
natively here.

These are host-driven analysis routines (few hundred scalar iterations);
the per-sample logsumexp reductions are jnp and jit-friendly.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["one_sided_reweighting", "bennett_acceptance_ratio", "mbar"]


def one_sided_reweighting(work):
    """Exponential (Zwanzig) estimator: -log <exp(-W)>."""
    n = work.shape[0]
    return -(jax.scipy.special.logsumexp(-work, axis=0) - jnp.log(n))


def _bar_zero(forward_work, reverse_work, delta_f):
    """The implicit equation BAR sets to zero (Fermi-function averages)."""
    n_f = forward_work.shape[0]
    n_r = reverse_work.shape[0]
    log_count = jnp.log(n_f / n_r)

    exp_arg_f = log_count + forward_work - delta_f
    max_arg_f = jnp.clip(exp_arg_f, 0.0, 1e10)
    log_ff = -max_arg_f - jnp.log(jnp.exp(-max_arg_f) + jnp.exp(exp_arg_f - max_arg_f))
    log_numerator = jax.scipy.special.logsumexp(log_ff, axis=0)

    exp_arg_r = -(log_count - reverse_work - delta_f)
    max_arg_r = jnp.clip(exp_arg_r, 0.0, 1e10)
    log_fr = -max_arg_r - jnp.log(jnp.exp(-max_arg_r) + jnp.exp(exp_arg_r - max_arg_r))
    log_denominator = jax.scipy.special.logsumexp(log_fr, axis=0)
    return log_numerator - log_denominator


def bennett_acceptance_ratio(
    forward_work,
    reverse_work,
    compute_uncertainty: bool = True,
    maximum_iterations: int = 500,
    relative_tolerance: float = 1e-12,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """BAR estimate of DF_{0->1} from forward work u1(x0)-u0(x0) and reverse
    work u0(x1)-u1(x1); returns (delta_f, uncertainty or None).

    Root finding: bracket by the two one-sided estimators, then false
    position (the reference's scheme, ``free_energy.py:131-165``).
    Returns NaN on poor overlap.
    """
    forward_work = jnp.ravel(jnp.asarray(forward_work))
    reverse_work = jnp.ravel(jnp.asarray(reverse_work))

    upper = float(one_sided_reweighting(forward_work))
    lower = float(-one_sided_reweighting(reverse_work))
    f_upper = float(_bar_zero(forward_work, reverse_work, upper))
    f_lower = float(_bar_zero(forward_work, reverse_work, lower))

    # widen the bracket until it straddles the root
    for _ in range(100):
        if f_upper * f_lower <= 0:
            break
        mid = 0.5 * (upper + lower)
        upper = upper + max(abs(upper - mid), 0.1)
        lower = lower - max(abs(lower - mid), 0.1)
        f_upper = float(_bar_zero(forward_work, reverse_work, upper))
        f_lower = float(_bar_zero(forward_work, reverse_work, lower))
    else:
        nan = jnp.asarray(jnp.nan)
        return nan, (nan if compute_uncertainty else None)

    delta_f = upper
    delta_f_old = np.inf
    for _ in range(maximum_iterations):
        delta_f = upper - f_upper * (upper - lower) / (f_upper - f_lower)
        f_new = float(_bar_zero(forward_work, reverse_work, delta_f))
        if f_upper * f_new < 0:
            lower, f_lower = delta_f, f_new
        elif f_lower * f_new <= 0:
            upper, f_upper = delta_f, f_new
        else:
            nan = jnp.asarray(jnp.nan)
            return nan, (nan if compute_uncertainty else None)
        if abs(delta_f - delta_f_old) / max(abs(delta_f), 1e-300) < relative_tolerance:
            break
        delta_f_old = delta_f

    delta_f = jnp.asarray(delta_f)
    if not compute_uncertainty:
        return delta_f, None

    # asymptotic variance (Bennett 1976 / pymbar; reference :170-197)
    n_f = forward_work.shape[0]
    n_r = reverse_work.shape[0]
    m = jnp.log(n_f / n_r)
    c = m - delta_f
    exp_arg_f = forward_work + c
    max_f = jnp.max(exp_arg_f)
    log_ff = -jnp.log(jnp.exp(-max_f) + jnp.exp(exp_arg_f - max_f))
    af_f = jnp.exp(jax.scipy.special.logsumexp(log_ff) - max_f) / n_f
    exp_arg_r = reverse_work - c
    max_r = jnp.max(exp_arg_r)
    log_fr = -jnp.log(jnp.exp(-max_r) + jnp.exp(exp_arg_r - max_r))
    af_r = jnp.exp(jax.scipy.special.logsumexp(log_fr) - max_r) / n_r
    af_f2 = jnp.exp(jax.scipy.special.logsumexp(2 * log_ff) - 2 * max_f) / n_f
    af_r2 = jnp.exp(jax.scipy.special.logsumexp(2 * log_fr) - 2 * max_r) / n_r
    nrat = (n_f + n_r) / (n_f * n_r)
    variance = (af_f2 / af_f**2) / n_f + (af_r2 / af_r**2) / n_r - nrat
    return delta_f, jnp.sqrt(variance)


def mbar(
    u_kn: jax.Array,
    n_k: jax.Array,
    n_iterations: int = 1000,
    tolerance: float = 1e-10,
) -> jax.Array:
    """Multistate Bennett acceptance ratio (self-consistent iteration).

    Parameters
    ----------
    u_kn : (K, N) dimensionless energies of all N pooled samples evaluated
        in each of the K states.
    n_k : (K,) number of samples drawn from each state.

    Returns
    -------
    f_k : (K,) dimensionless free energies with f_0 = 0.

    The fixed-point update runs as one jitted ``lax.while_loop`` — the
    entire estimator is a single device program.
    """
    u_kn = jnp.asarray(u_kn)
    n_k = jnp.asarray(n_k, dtype=u_kn.dtype)
    log_n_k = jnp.log(n_k)

    def update(f_k):
        # log denominator per sample: logsumexp_k [log N_k + f_k - u_kn]
        log_denom = jax.scipy.special.logsumexp(
            log_n_k[:, None] + f_k[:, None] - u_kn, axis=0
        )
        new_f = -jax.scipy.special.logsumexp(-u_kn - log_denom[None, :], axis=1)
        return new_f - new_f[0]

    def cond(state):
        f_k, prev, i = state
        return (i < n_iterations) & (jnp.max(jnp.abs(f_k - prev)) > tolerance)

    def body(state):
        f_k, _, i = state
        return update(f_k), f_k, i + 1

    f0 = jnp.zeros(u_kn.shape[0], dtype=u_kn.dtype)
    f_k, _, _ = jax.lax.while_loop(cond, body, (update(f0), f0, jnp.asarray(0)))
    return f_k
