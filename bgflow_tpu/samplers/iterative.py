"""Iterative sampling framework.

Reference: ``bgflow/distribution/sampling/iterative.py:37-218`` and
``_iterative_helpers.py:9-97``.

TPU-first re-design: ``SamplerState`` is an immutable pytree; a
``SamplerStep`` is a pure function ``step(state, key) -> state``; the
``IterativeSampler`` compiles the whole (burn-in + stride x steps) loop into
a single ``lax.scan`` — one device program per ``sample`` call, regardless
of chain length.  Chains are batched along the leading axis, so sharding
the batch axis over a mesh shards the chains (see
``bgflow_tpu.parallel``).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .base import Sampler


class SamplerState(NamedTuple):
    """State of a batch of Markov chains (a pytree; all leaves batched)."""

    samples: Tuple[jax.Array, ...]
    energies: Optional[jax.Array] = None  # (B,)
    velocities: Optional[Tuple[jax.Array, ...]] = None
    box_vectors: Optional[jax.Array] = None
    # scalar step counter, materialized lazily by steps that need state that
    # must survive lax.scan tracing (e.g. replica-exchange parity)
    step_count: Optional[jax.Array] = None
    # open-ended per-step auxiliary carry (a dict pytree keyed by step), for
    # state that must evolve across scan iterations but is not per-chain —
    # e.g. the metadynamics bias grid.  Lazily materialized like step_count.
    aux: Optional[dict] = None

    def replace(self, **kwargs) -> "SamplerState":
        return self._replace(**kwargs)


def map_to_primary_cell(x: jax.Array, box_vectors: jax.Array) -> jax.Array:
    """Wrap particle positions into the primary periodic cell.

    ``x``: positions with trailing dimension ``3*n_particles`` (flat) or 3
    (already per-particle); ``box_vectors``: (3, 3) row-vector cell matrix
    (triclinic supported).  Positions are converted to fractional
    coordinates, reduced mod 1, and mapped back — the TPU-native (batched,
    two small matmuls) equivalent of the reference's per-update wrap in
    ``bgflow/distribution/sampling/_iterative_helpers.py:60-97``.
    """
    box_vectors = jnp.asarray(box_vectors, dtype=x.dtype)
    shape = x.shape
    pos = x.reshape(*shape[:-1], shape[-1] // 3, 3) if shape[-1] != 3 else x
    frac = pos @ jnp.linalg.inv(box_vectors)
    pos = (frac - jnp.floor(frac)) @ box_vectors
    return pos.reshape(shape)


def evaluate_energy(state: SamplerState, energy, temperatures=1.0) -> SamplerState:
    """Fill in ``state.energies`` (dimensionless, at T=1; temperature scaling
    happens in the acceptance criterion)."""
    if state.energies is not None:
        return state
    return state.replace(energies=energy.energy(*state.samples))


class SamplerStep:
    """One (block of) Markov-transition step(s): ``step(state, key)``."""

    def __init__(self, n_steps: int = 1):
        self.n_steps = n_steps

    def _step(self, state: SamplerState, key) -> SamplerState:
        raise NotImplementedError

    def step(self, state: SamplerState, key) -> SamplerState:
        if self.n_steps == 1:
            return self._step(state, key)

        def body(state, key):
            return self._step(state, key), None

        # unroll the first sub-step: _step may materialize lazily created
        # state fields (energies, velocities, step_count) and the scan carry
        # needs the final pytree structure
        keys = jax.random.split(key, self.n_steps)
        state = self._step(state, keys[0])
        state, _ = jax.lax.scan(body, state, keys[1:])
        return state


class IterativeSampler(Sampler):
    """Drive a list of SamplerSteps.

    ``sample(key, n)`` advances the internal state by ``n`` iterations (each
    iteration = ``stride`` passes over all steps) and returns the samples
    stacked along a leading iteration axis: shapes ``(n, B, ...)``.
    The first call runs ``n_burnin`` extra iterations.

    The whole loop is one jitted ``lax.scan``; the returned state is stored
    for subsequent calls (stateful convenience, pure core).
    """

    def __init__(
        self,
        init_state: SamplerState,
        sampler_steps: Sequence[SamplerStep],
        stride: int = 1,
        n_burnin: int = 0,
        return_hook: Optional[Callable] = None,
        wrap_into_primary_cell: bool = True,
    ):
        super().__init__(return_hook=return_hook)
        if not isinstance(init_state, SamplerState):
            init_state = SamplerState(samples=(init_state,))
        self.state = init_state
        self.sampler_steps = list(sampler_steps)
        self.stride = stride
        self.n_burnin = n_burnin
        # wrap samples into the periodic box after every iteration when the
        # state carries box_vectors (reference `_iterative_helpers.py:60-97`)
        self.wrap_into_primary_cell = wrap_into_primary_cell
        self._needs_burnin = n_burnin > 0
        # one jit wrapper reused across sample() calls (a fresh jax.jit per
        # call would re-dispatch through a new cache every time)
        self._jit_run = jax.jit(self._run, static_argnums=(2, 3))

    def _one_iteration(self, state: SamplerState, key) -> SamplerState:
        for _ in range(self.stride):
            for step in self.sampler_steps:
                key, sub = jax.random.split(key)
                state = step.step(state, sub)
        if self.wrap_into_primary_cell and state.box_vectors is not None:
            state = state.replace(samples=tuple(
                map_to_primary_cell(s, state.box_vectors) for s in state.samples
            ))
        return state

    def _run(self, state, key, n_iterations: int, collect: bool):
        # The first iteration runs unrolled: steps may materialize lazily
        # created fields (energies, velocities), changing the pytree
        # structure; the scan carry needs the post-step structure.
        keys = jax.random.split(key, n_iterations)
        state = self._one_iteration(state, keys[0])
        first = state.samples if collect else None
        if n_iterations == 1:
            collected = (
                jax.tree_util.tree_map(lambda x: x[None], first) if collect else None
            )
            return state, collected

        def body(state, key):
            state = self._one_iteration(state, key)
            return state, state.samples if collect else None

        state, rest = jax.lax.scan(body, state, keys[1:])
        collected = None
        if collect:
            collected = jax.tree_util.tree_map(
                lambda x0, xs: jnp.concatenate([x0[None], xs], axis=0), first, rest
            )
        return state, collected

    def _sample(self, key, n_samples: int):
        if self._needs_burnin:
            key, sub = jax.random.split(key)
            self.state, _ = self._jit_run(self.state, sub, self.n_burnin, False)
            self._needs_burnin = False
        self.state, collected = self._jit_run(self.state, key, n_samples, True)
        return tuple(collected)

    def _sample_with_temperature(self, key, n_samples, temperature):
        raise NotImplementedError(
            "Set per-chain temperatures on the sampler steps instead."
        )
