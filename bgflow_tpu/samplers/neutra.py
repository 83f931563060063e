"""Flow-preconditioned ("NeuTra") sampling of a Boltzmann generator's target.

``neutra_sample`` runs HMC chains on the latent-space image of the target
under the generator's trained flow (:meth:`BoltzmannGenerator.latent_energy`)
and pushes the chain states back to configuration space.  The chains are
exact with respect to the (tempered) target for ANY flow quality — the flow
only sets the geometry the chain moves in — so a even a mediocre trained
generator turns into an asymptotically-exact sampler whose mixing inherits
the flow's mode knowledge: latent chains cross torsion barriers that x-space
ladders need hot replicas for.

This is the data-quality bootstrap loop for the peptide family: train a BG
on replica-exchange data, regenerate better-mixed data with NeuTra chains
through that BG, retrain.  Capability beyond the reference (whose closest
tool is the latent random-walk proposal, ``bgflow/distribution/sampling/
mcmc.py:72-83``); the HMC-on-pushforward design follows arXiv:2112.01586.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .iterative import SamplerState
from .mcmc import HMCStep, tune_hmc_step_size


class NeutraResult(NamedTuple):
    """Pooled chain output in configuration space."""

    xs: Tuple[jax.Array, ...]        # per-target-tensor frames, (N, ...)
    step_size: float                 # tuned (or given) HMC step size
    acceptance: float                # acceptance estimate from tuning probes
    energies: jax.Array              # target energies of the frames, (N,)


def neutra_sample(
    generator,
    params,
    key,
    n_samples: int,
    n_chains: int = 256,
    temperature: float = 1.0,
    gaussianize: bool = True,
    x0=None,
    step_size: Optional[float] = None,
    n_leapfrog: int = 10,
    n_burnin: int = 200,
    stride: int = 2,
    target_accept: float = 0.7,
    tune_rounds: int = 12,
) -> NeutraResult:
    """Sample the generator's target with flow-preconditioned HMC.

    Parameters
    ----------
    generator : BoltzmannGenerator
        A (typically trained) generator; ``params`` are its flow parameters.
    n_samples : int
        Total frames to return (pooled over ``n_chains`` chains collecting
        every ``stride`` HMC steps after ``n_burnin`` equilibration steps).
    gaussianize : bool
        Unconstrain box-bounded latent channels first (required for
        builder-made molecular generators whose IC channels live in [0, 1];
        see :meth:`BoltzmannGenerator.latent_energy`).
    x0 : tuple of arrays, array, or None
        Chain starts in CONFIGURATION space, one leading-axis-``n_chains``
        array per target tensor (e.g. training-data frames).  ``None``
        starts from the generator's own samples — exactness does not depend
        on the start, only burn-in length does.
    step_size : float or None
        ``None`` tunes the step size to ``target_accept`` with short probe
        chains (Robbins-Monro, ``tune_hmc_step_size``) before sampling.

    Returns a :class:`NeutraResult`; frames are exact (tempered-)Boltzmann
    draws once chains are equilibrated — no reweighting needed.
    """
    pe = generator.latent_energy(params, temperature=temperature, gaussianize=gaussianize)

    key, k_init, k_tune = jax.random.split(key, 3)
    if x0 is None:
        xs0 = generator.sample(params, k_init, n_chains, temperature=temperature).xs
    else:
        xs0 = tuple(jnp.asarray(x) for x in (x0 if isinstance(x0, (tuple, list)) else (x0,)))
        if xs0[0].shape[0] != n_chains:
            raise ValueError(
                f"x0 leading axis {xs0[0].shape[0]} != n_chains {n_chains}"
            )
    zs0 = pe.pull(*xs0)
    zs0 = zs0 if isinstance(zs0, tuple) else (zs0,)

    accept = float("nan")
    if step_size is None:
        step_size, accept = tune_hmc_step_size(
            pe, zs0, k_tune, target_accept=target_accept,
            step_size=0.05, n_leapfrog=n_leapfrog, n_rounds=tune_rounds,
        )

    hmc = HMCStep(pe, step_size=step_size, n_leapfrog=n_leapfrog, n_steps=stride)
    state = SamplerState(
        samples=zs0,
        energies=pe.energy(*zs0),
        step_count=jnp.zeros((), jnp.int32),
    )

    # chunked lax.scan blocks: per-iteration host dispatches dominate
    # wall-clock through a tunneled accelerator (same pattern as
    # models/polyala.py::generate_polyala_data_exact) — one dispatch
    # advances `scan_chunk` stride-blocks and pushes the collected latent
    # states through the flow on device.
    scan_chunk = 32

    @jax.jit
    def burn_chunk(state, key):
        def body(s, sub):
            return hmc.step(s, sub), None

        return jax.lax.scan(body, state, jax.random.split(key, scan_chunk))[0]

    @jax.jit
    def collect_chunk(state, key):
        def body(s, sub):
            s = hmc.step(s, sub)
            return s, s.samples

        state, zs = jax.lax.scan(body, state, jax.random.split(key, scan_chunk))
        # zs leaves: (chunk, chains, D) -> flatten, push to x, energies
        zs_flat = tuple(z.reshape((-1,) + z.shape[2:]) for z in zs)
        x = pe.push(*zs_flat)
        xs = x if isinstance(x, tuple) else (x,)
        return state, xs, generator.target.energy(*xs, temperature=temperature)

    n_burn_blocks = -(-n_burnin // max(1, stride))
    for _ in range(-(-n_burn_blocks // scan_chunk)):
        key, sub = jax.random.split(key)
        state = burn_chunk(state, sub)

    n_iter = -(-n_samples // n_chains)
    frames = None
    energies = []
    for _ in range(-(-n_iter // scan_chunk)):
        key, sub = jax.random.split(key)
        state, xs, u = collect_chunk(state, sub)
        if frames is None:
            frames = [[] for _ in xs]
        for buf, x in zip(frames, xs):
            buf.append(np.asarray(x))
        energies.append(np.asarray(u))

    xs_out = tuple(jnp.asarray(np.concatenate(b, axis=0)[:n_samples]) for b in frames)
    u_out = jnp.asarray(np.concatenate(energies, axis=0)[:n_samples])
    return NeutraResult(xs=xs_out, step_size=float(step_size), acceptance=float(accept), energies=u_out)
