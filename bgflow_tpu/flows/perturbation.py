"""Flow-perturbation importance sampling: unbiased weights with NO Jacobians.

Deterministic-flow importance sampling needs log|det J_F| — cheap for
coupling flows, but an O(D)-backward-pass divergence integral for CNFs
with exact trace (and the Hutchinson estimator, though unbiased for the
divergence itself, gives *biased* importance weights once exponentiated).
Flow perturbation (arXiv:2407.10666; multi-step variant arXiv:2601.21177)
sidesteps the Jacobian entirely:

    forward:   z ~ p(z),  x = F(z) + sigma * eps,        eps ~ N(0, I)
    backward:  B(z | x) = N(z; F^{-1}(x), sigma_back^2)

    log w = -u(x)/T + log B(z|x) - log p(z) - log N(x; F(z), sigma^2)

For ANY backward kernel B this is a valid extended-space importance weight
(the same identity behind SNF path weights, ``flows/stochastic.py``), so
self-normalized estimates converge to target expectations regardless of
flow quality; the flow and the noise scales only set the variance.  All
that is required of F is a forward and an inverse *point* map — no log-det
— which is why ``DiffEqFlow.integrate_no_logdet`` exists: both transports
skip the divergence work entirely.

Single-step weights carry an irreducible variance set by the flow's local
anisotropy (as sigma -> 0, Var[log w] -> Var[eps^T (I - J^{-T} J^{-1}) eps
/ 2]): even a PERFECT but non-isometric flow caps the ESS.  The multi-step
scheme (``n_steps > 1``, the Flow Perturbation++ refinement of
arXiv:2601.21177) splits a CNF's time axis into K segments and perturbs
after each: per-segment Jacobians are O(t_max/K) from the identity, so the
anisotropy penalty shrinks and the weights approach the exact-Jacobian
ones as K grows — still without ever computing a Jacobian.

Reference has no analogue (its CNFs pay the brute-force trace for exact
weights: ``bgflow/nn/flow/estimator/brute_force_estimator.py``).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.flow import as_tuple

__all__ = ["FlowPerturbationSample", "flow_perturbation_sample"]


class FlowPerturbationSample(NamedTuple):
    xs: tuple            # perturbed samples, one array per target tensor
    log_weights: jax.Array   # un-normalized extended-space log weights, (B,)


def _gauss_logpdf(d, sigma):
    """Sum of independent N(0, sigma^2) log-densities over non-batch axes."""
    d = d.reshape(d.shape[0], -1)
    dim = d.shape[-1]
    return -0.5 * jnp.sum((d / sigma) ** 2, axis=-1) - dim * jnp.log(
        sigma * jnp.sqrt(2.0 * jnp.pi)
    )


def flow_perturbation_sample(
    params,
    prior,
    flow,
    target,
    key,
    n_samples: int,
    sigma: float,
    sigma_back: Optional[float] = None,
    temperature: float = 1.0,
    n_steps: int = 1,
    forward_fn=None,
    inverse_fn=None,
) -> FlowPerturbationSample:
    """Draw perturbed flow samples with Jacobian-free importance weights.

    ``forward_fn(zs) -> xs`` / ``inverse_fn(xs) -> zs`` default to the
    flow's transports; for a :class:`~bgflow_tpu.flows.cnf.DiffEqFlow`
    they default to ``integrate_no_logdet`` (single-tensor events), which
    skips the divergence integral — the entire point of the method.

    ``n_steps > 1`` (DiffEqFlow only) runs the multi-step scheme:
    perturbation after each of K equal time segments, which removes the
    single-step anisotropy floor on the ESS (see module docstring).

    Smaller ``sigma`` means weights closer to the exact-Jacobian ones but
    a stiffer backward kernel; sigma ~ data scale / 100 is a reasonable
    start, with ``n_steps`` the lever for tightening further.
    """
    sigma = float(sigma)
    sigma_back = sigma if sigma_back is None else float(sigma_back)

    if n_steps > 1:
        if forward_fn is not None or inverse_fn is not None:
            raise ValueError(
                "n_steps > 1 integrates per-segment via "
                "flow.integrate_no_logdet; custom forward_fn/inverse_fn "
                "only apply to the single-step scheme"
            )
        if not hasattr(flow, "integrate_no_logdet"):
            raise ValueError(
                "multi-step flow perturbation needs a DiffEqFlow-like flow "
                "with integrate_no_logdet(t_span=...)"
            )
        return _multi_step(
            params, prior, flow, target, key, n_samples,
            sigma, sigma_back, temperature, n_steps,
        )

    if forward_fn is None or inverse_fn is None:
        if hasattr(flow, "integrate_no_logdet"):
            fwd = lambda zs: (flow.integrate_no_logdet(params, zs[0], inverse=False),)
            inv = lambda xs: (flow.integrate_no_logdet(params, xs[0], inverse=True),)
        else:
            fwd = lambda zs: flow.forward(params, zs)[0]
            inv = lambda xs: flow.forward(params, xs, inverse=True)[0]
        forward_fn = forward_fn or fwd
        inverse_fn = inverse_fn or inv

    key_prior, key_noise = jax.random.split(key)
    zs = as_tuple(prior.sample(key_prior, n_samples, temperature=temperature))
    fzs = as_tuple(forward_fn(zs))

    noise_keys = jax.random.split(key_noise, len(fzs))
    eps = tuple(
        jax.random.normal(k, f.shape, dtype=f.dtype) for k, f in zip(noise_keys, fzs)
    )
    xs = tuple(f + sigma * e for f, e in zip(fzs, eps))

    gzs = as_tuple(inverse_fn(xs))  # backward kernel mean: F^{-1}(x)

    log_fwd = sum(_gauss_logpdf(x - f, sigma) for x, f in zip(xs, fzs))
    log_back = sum(_gauss_logpdf(z - g, sigma_back) for z, g in zip(zs, gzs))
    # log w = log[mu(x) B(z|x)] - log[p(z) K(x|z)]
    #       = -u_target(x) + log_back + u_prior(z) - log_fwd
    # (prior.energy = +u_prior, so the prior term ADDS, exactly as in the
    # deterministic identity log w = u_prior(z) + dlogp - u_target(x))
    log_w = (
        -target.energy(*xs, temperature=temperature)
        + log_back
        + prior.energy(*zs, temperature=temperature)
        - log_fwd
    )
    return FlowPerturbationSample(xs=xs, log_weights=log_w)


def _multi_step(
    params, prior, flow, target, key, n_samples, sigma, sigma_back, temperature, n_steps
):
    """K-segment perturbation path through a DiffEqFlow (single-tensor).

    forward:  y_0 = z ~ p;  y_k = Phi_k(y_{k-1}) + sigma * eps_k
    backward: B_k(y_{k-1} | y_k) = N(y_{k-1}; Phi_k^{-1}(y_k), sigma_back^2)
    log w = -u(y_K) + sum_k log B_k + u_prior(y_0) - sum_k log K_k
    """
    key_prior, key_noise = jax.random.split(key)
    z = as_tuple(prior.sample(key_prior, n_samples, temperature=temperature))
    if len(z) != 1:
        raise ValueError("multi-step flow perturbation supports single-tensor events")
    (y,) = z
    t_max = flow.t_max
    edges = [t_max * k / n_steps for k in range(n_steps + 1)]
    log_fwd = jnp.zeros(y.shape[0], dtype=y.dtype)
    log_back = jnp.zeros(y.shape[0], dtype=y.dtype)
    keys = jax.random.split(key_noise, n_steps)
    for k in range(n_steps):
        span = (edges[k], edges[k + 1])
        f = flow.integrate_no_logdet(params, y, t_span=span)
        eps = jax.random.normal(keys[k], f.shape, dtype=f.dtype)
        y_next = f + sigma * eps
        log_fwd = log_fwd + _gauss_logpdf(y_next - f, sigma)
        g = flow.integrate_no_logdet(params, y_next, inverse=True, t_span=span)
        log_back = log_back + _gauss_logpdf(y - g, sigma_back)
        y = y_next
    log_w = (
        -target.energy(y, temperature=temperature)
        + log_back
        + prior.energy(*z, temperature=temperature)
        - log_fwd
    )
    return FlowPerturbationSample(xs=(y,), log_weights=log_w)
