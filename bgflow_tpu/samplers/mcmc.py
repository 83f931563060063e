"""Markov-chain Monte Carlo steps with pluggable proposals.

Reference: ``bgflow/distribution/sampling/mcmc.py:29-222``.  Everything is
branchless (``jnp.where`` merges), vectorized over chains, and per-chain
temperatures make one batch a whole parallel-tempering ladder.

A proposal maps ``(state, key) -> (proposed_state, delta_log_prob)`` where
``delta_log_prob = log g(x'|x) - log g(x|x')`` (0 for symmetric proposals).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .iterative import IterativeSampler, SamplerState, SamplerStep

__all__ = [
    "GaussianProposal",
    "LatentProposal",
    "MCMCStep",
    "HMCStep",
    "GaussianMCMCSampler",
    "metropolis_accept",
    "tune_hmc_step_size",
]


def metropolis_accept(key, current_energies, proposed_energies, proposal_delta_log_prob):
    """Vectorized Metropolis criterion; returns a boolean accept mask."""
    log_prob = -(proposed_energies - current_energies) - proposal_delta_log_prob
    log_acceptance = jnp.minimum(jnp.zeros_like(log_prob), log_prob)
    log_random = jnp.log(jax.random.uniform(key, log_acceptance.shape))
    return log_acceptance >= log_random


class GaussianProposal:
    """Symmetric Gaussian random-walk displacement."""

    def __init__(self, noise_std: float = 0.1):
        self.noise_std = noise_std

    def propose(self, state: SamplerState, key) -> Tuple[SamplerState, jax.Array]:
        keys = jax.random.split(key, len(state.samples))
        new = tuple(
            x + self.noise_std * jax.random.normal(k, x.shape, dtype=x.dtype)
            for x, k in zip(state.samples, keys)
        )
        return state.replace(samples=new, energies=None), 0.0


class LatentProposal:
    """Proposal through a flow's latent space.

    The acceptance accounts for the flow log-dets
    (``delta_log_prob -= logdet_fwd + logdet_inv``, reference
    ``mcmc.py:72-83``), so a perfect flow turns MCMC into independent
    resampling.
    """

    def __init__(self, flow, flow_params, base_proposal=None, flow_kwargs=dict()):
        self.flow = flow
        self.flow_params = flow_params
        self.base_proposal = base_proposal if base_proposal is not None else GaussianProposal(0.1)
        self.flow_kwargs = dict(flow_kwargs)

    def propose(self, state: SamplerState, key) -> Tuple[SamplerState, jax.Array]:
        z, logdet_inv = self.flow.forward(
            self.flow_params, state.samples, inverse=True, **self.flow_kwargs
        )
        latent_state, delta_log_prob = self.base_proposal.propose(
            state.replace(samples=z, energies=None), key
        )
        x_new, logdet_fwd = self.flow.forward(
            self.flow_params, latent_state.samples, **self.flow_kwargs
        )
        delta_log_prob = delta_log_prob - (logdet_fwd + logdet_inv)
        return latent_state.replace(samples=x_new, energies=None), delta_log_prob


class MCMCStep(SamplerStep):
    """Metropolis MC with pluggable proposal and per-chain temperatures."""

    def __init__(self, target_energy, proposal=None, target_temperatures=1.0, n_steps: int = 1):
        super().__init__(n_steps=n_steps)
        self.target_energy = target_energy
        self.proposal = proposal if proposal is not None else GaussianProposal()
        self.target_temperatures = target_temperatures

    def _step(self, state: SamplerState, key) -> SamplerState:
        key_prop, key_accept = jax.random.split(key)
        if state.energies is None:
            state = state.replace(energies=self.target_energy.energy(*state.samples))
        proposed, delta_log_prob = self.proposal.propose(state, key_prop)
        proposed_energies = self.target_energy.energy(*proposed.samples)
        accept = metropolis_accept(
            key_accept,
            state.energies / self.target_temperatures,
            proposed_energies / self.target_temperatures,
            delta_log_prob,
        )
        merged = tuple(
            jnp.where(accept.reshape(-1, *([1] * (new.ndim - 1))), new, old)
            for new, old in zip(proposed.samples, state.samples)
        )
        return state.replace(
            samples=merged,
            energies=jnp.where(accept, proposed_energies, state.energies),
        )


class HMCStep(SamplerStep):
    """Hamiltonian Monte Carlo: leapfrog proposals + exact Metropolis.

    Exact with respect to the target at ANY step size — unlike unadjusted
    Langevin/BAOAB MD, whose dt-discretization bias is what made round-1
    ala2 training data non-Boltzmann.  Momenta are resampled every step
    (p ~ N(0, m)), ``n_leapfrog`` leapfrog steps propose, and the full
    Hamiltonian difference decides acceptance, so the only cost of a large
    step size is a lower acceptance rate, never a biased ensemble.

    Per-chain ``target_temperatures`` (B,) make one batch a parallel-
    tempering ladder: chain i samples exp(-u(x)/T_i), and its step size is
    scaled by sqrt(T_i).  ``masses`` (scalar or (D,)): heavier coordinates
    move slower — physical atom masses help when stiff bonds (X-H) limit
    the step size.  (The reference has no HMC; its closest tool is the
    Gaussian random walk, ``mcmc.py:125-189``.)
    """

    def __init__(
        self,
        target_energy,
        step_size: float = 1e-3,
        n_leapfrog: int = 10,
        target_temperatures=1.0,
        masses=1.0,
        jitter: float = 0.2,
        n_steps: int = 1,
    ):
        super().__init__(n_steps=n_steps)
        self.target_energy = target_energy
        self.step_size = step_size
        self.n_leapfrog = int(n_leapfrog)
        self.target_temperatures = jnp.asarray(target_temperatures)
        # tuple/list = one mass spec per state tensor; anything else is a
        # scalar or per-feature array shared by all tensors
        self.masses = (
            tuple(jnp.asarray(m) for m in masses)
            if isinstance(masses, (tuple, list))
            else jnp.asarray(masses)
        )
        # per-chain step-size jitter dt * U(1-j, 1+j): breaks the leapfrog
        # resonance on harmonic modes (a trajectory length near a half
        # period maps x -> -x and freezes the mode's amplitude — with stiff
        # bonds this silently stalls mixing at full acceptance)
        self.jitter = float(jitter)

    def _grad_u(self, xs):
        return jax.grad(lambda xx: jnp.sum(self.target_energy.energy(*xx)))(xs)

    def _masses_for(self, xs):
        """Normalize ``masses`` to one (scalar or per-feature) array per
        state tensor: scalar/(D,) applies to every tensor (back-compat);
        a tuple/list gives one entry per tensor (multi-tensor systems,
        e.g. augmented (x, v) pairs or product spaces)."""
        if isinstance(self.masses, (tuple, list)):
            assert len(self.masses) == len(xs)
            return tuple(jnp.asarray(m) for m in self.masses)
        return tuple(self.masses for _ in xs)

    def _step(self, state: SamplerState, key) -> SamplerState:
        xs = state.samples
        if state.energies is None:
            state = state.replace(energies=self.target_energy.energy(*xs))
        u0 = state.energies
        key_p, key_a, key_j = jax.random.split(key, 3)

        dtype = xs[0].dtype
        T = jnp.broadcast_to(self.target_temperatures, u0.shape).astype(dtype)
        ms = tuple(m.astype(dtype) for m in self._masses_for(xs))
        # the step size may ride in state.aux (a traced scan carry): one
        # compiled program serves every trial size during step-size tuning
        dt0 = (
            state.aux["hmc_step_size"]
            if state.aux is not None and "hmc_step_size" in state.aux
            else self.step_size
        )
        dt_c = dt0 * jnp.sqrt(T)  # (B,)
        if self.jitter > 0.0:
            dt_c = dt_c * jax.random.uniform(
                key_j, dt_c.shape, dtype=dtype,
                minval=1.0 - self.jitter, maxval=1.0 + self.jitter,
            )

        def bcast(c, a):  # (B,) -> (B, 1, ..., 1) matching a's rank
            return c.reshape(c.shape[0], *([1] * (a.ndim - 1)))

        keys_p = jax.random.split(key_p, len(xs))
        ps = tuple(
            jnp.sqrt(m) * jax.random.normal(k, x.shape, dtype=dtype)
            for x, m, k in zip(xs, ms, keys_p)
        )

        def kinetic(ps):
            return sum(
                0.5 * jnp.sum((p * p / m).reshape(p.shape[0], -1), axis=-1)
                for p, m in zip(ps, ms)
            )

        h0 = u0 / T + kinetic(ps)

        inv_T = 1.0 / T
        # leapfrog on phi(x) = u(x)/T: half kick, L-1 full (drift+kick),
        # final drift + half kick
        def kick(xs, ps, scale):
            gs = self._grad_u(xs)
            return tuple(
                p - scale * bcast(dt_c * inv_T, p) * g for p, g in zip(ps, gs)
            )

        def drift(xs, ps):
            return tuple(
                x + bcast(dt_c, x) * p / m for x, p, m in zip(xs, ps, ms)
            )

        ps = kick(xs, ps, 0.5)

        def drift_kick(carry, _):
            xs, ps = carry
            xs = drift(xs, ps)
            ps = kick(xs, ps, 1.0)
            return (xs, ps), None

        if self.n_leapfrog > 1:
            (xs, ps), _ = jax.lax.scan(drift_kick, (xs, ps), None, length=self.n_leapfrog - 1)
        xs = drift(xs, ps)
        ps = kick(xs, ps, 0.5)

        u1 = self.target_energy.energy(*xs)
        h1 = u1 / T + kinetic(ps)
        log_u = jnp.log(jax.random.uniform(key_a, u0.shape))
        # guard: non-finite proposals always reject
        accept = (log_u < -(h1 - h0)) & jnp.isfinite(h1)

        merged = tuple(
            jnp.where(bcast(accept, new), new, old)
            for new, old in zip(xs, state.samples)
        )
        new_u = jnp.where(accept, u1, u0)
        return state.replace(samples=merged, energies=new_u)


def tune_hmc_step_size(
    target_energy,
    x0,
    key,
    target_accept: float = 0.7,
    step_size: float = 1e-3,
    n_leapfrog: int = 10,
    masses=1.0,
    n_rounds: int = 12,
    n_probe: int = 5,
    eta: float = 0.6,
):
    """Find an HMC step size hitting ``target_accept`` by stochastic search.

    HMC acceptance collapses with dimension at fixed step size (the step
    that accepts ~90% on alanine dipeptide accepts ~4% on a tripeptide);
    an untuned sampler silently freezes and the "exact" ensemble is just
    the initial structure.  This runs short probe chains and adapts
    ``log(step) += eta * (accept - target)`` per round (Robbins-Monro).
    Returns (step_size, final_acceptance_estimate).

    Probes use T=1 chains; pass the COLD-replica start ``x0`` — a (B, D)
    array, or a tuple of per-tensor arrays for multi-tensor states (e.g.
    the latent channels of a :class:`~bgflow_tpu.bg.PushforwardEnergy`).
    """
    xs = tuple(jnp.asarray(x) for x in (x0 if isinstance(x0, (tuple, list)) else (x0,)))
    dtype = xs[0].dtype
    step = float(step_size)
    hmc = HMCStep(
        target_energy, step_size=step, n_leapfrog=n_leapfrog,
        masses=masses, n_steps=1,
    )
    # the trial step size rides in state.aux, so ONE compiled probe program
    # serves all rounds (a fresh HMCStep per trial would retrace, and with
    # a large flow-pushforward energy each retrace costs minutes)

    @jax.jit
    def probe(state, key):
        new = hmc._step(state, key)
        changed = jnp.zeros(new.samples[0].shape[0], dtype=bool)
        # a chain moved if ANY of its tensors changed (HMC accepts or
        # rejects the whole multi-tensor state at once)
        for c, p in zip(new.samples, state.samples):
            flat = jnp.abs(c - p).reshape(c.shape[0], -1)
            changed = changed | jnp.any(flat > 1e-12, axis=-1)
        return new, jnp.mean(changed.astype(jnp.float32))

    state = SamplerState(
        samples=xs,
        energies=target_energy.energy(*xs),
        step_count=jnp.zeros((), jnp.int32),
        aux={"hmc_step_size": jnp.asarray(step, dtype)},
    )
    accept = 0.0
    for r in range(n_rounds):
        moved = 0.0
        for i in range(n_probe):
            key, sub = jax.random.split(key)
            state, frac = probe(state, sub)
            moved += float(frac)
        accept = moved / n_probe  # keep equilibrating as we tune
        if accept == 0.0:
            # far above the stability limit (e.g. a poorly conditioned
            # pushforward energy): geometric decay beats Robbins-Monro
            step = float(step * 0.4)
        else:
            step = float(step * np.exp(eta * (accept - target_accept)))
        state = state.replace(aux={"hmc_step_size": jnp.asarray(step, dtype)})
    return step, accept


class GaussianMCMCSampler(IterativeSampler):
    """Shortcut: Gaussian random-walk MCMC (reference ``mcmc.py:125-189``)."""

    def __init__(
        self,
        energy,
        init_state,
        temperature=1.0,
        noise_std: float = 0.1,
        stride: int = 1,
        n_burnin: int = 0,
        return_hook=None,
    ):
        if not isinstance(init_state, SamplerState):
            init_state = SamplerState(samples=(init_state,))
        if return_hook is None:
            # flatten iteration and batch axes, matching the reference
            def return_hook(*samples):
                return tuple(
                    x.reshape(-1, *shape) for x, shape in zip(samples, energy.event_shapes)
                )

        super().__init__(
            init_state,
            sampler_steps=[
                MCMCStep(
                    energy,
                    proposal=GaussianProposal(noise_std=noise_std),
                    target_temperatures=temperature,
                )
            ],
            stride=stride,
            n_burnin=n_burnin,
            return_hook=return_hook,
        )
