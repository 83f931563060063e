"""Parallel tempering (replica exchange) over batched and sharded ladders.

The reference only hints at tempering through per-chain temperature vectors
(``mcmc.py:97-122``, ``iterative.py:12-23``); here replica exchange is a
first-class SamplerStep:

* ``ReplicaExchangeStep`` — the temperature ladder lives in the batch:
  samples (B, K, ...) with K temperatures per independent chain group.
  Even/odd neighbor swaps alternate per step; fully branchless.
* ``sharded_replica_exchange`` — the ladder axis sharded over a device
  mesh: boundary swaps move one replica's state between neighboring devices
  with ``jax.lax.ppermute`` inside ``shard_map`` (ICI traffic only).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..samplers.iterative import SamplerState, SamplerStep

__all__ = ["ReplicaExchangeStep", "swap_acceptance_logprob", "sharded_replica_exchange"]


def swap_acceptance_logprob(energies_i, energies_j, temps_i, temps_j):
    """log acceptance of swapping configurations between temperature levels:
    (1/T_i - 1/T_j) (u_i - u_j) with dimensionless base energies u."""
    return (1.0 / temps_i - 1.0 / temps_j) * (energies_i - energies_j)


class ReplicaExchangeStep(SamplerStep):
    """Neighbor swaps on a (B, K)-laddered batch.

    ``state.samples`` tensors have shape (B*K, ...), ordered so that
    consecutive groups of K belong to one ladder; ``temperatures`` has
    shape (K,).  Even/odd neighbor pairings alternate per invocation; the
    parity lives in the carried ``state.step_count`` (NOT in Python object
    state) so the alternation survives ``lax.scan`` tracing — a Python
    attribute would be frozen at trace time and repeat one pairing forever.
    """

    def __init__(self, target_energy, temperatures, n_steps: int = 1):
        super().__init__(n_steps=n_steps)
        self.target_energy = target_energy
        self.temperatures = jnp.asarray(temperatures)

    def _step(self, state: SamplerState, key) -> SamplerState:
        k = self.temperatures.shape[0]
        temps = self.temperatures
        if state.energies is None:
            state = state.replace(energies=self.target_energy.energy(*state.samples))
        count = state.step_count
        if count is None:
            count = jnp.zeros((), dtype=jnp.int32)
        e = state.energies.reshape(-1, k)  # (B, K)
        b = e.shape[0]

        parity = count % 2

        # pair (i, i+1) for i in parity, parity+2, ...
        idx = jnp.arange(k)
        partner = jnp.where((idx - parity) % 2 == 0, idx + 1, idx - 1)
        partner = jnp.clip(partner, 0, k - 1)
        has_partner = partner != idx

        log_acc = swap_acceptance_logprob(e, e[:, partner], temps, temps[partner])
        u = jax.random.uniform(key, (b, k))
        # both members of a pair see the same decision (symmetric computation)
        pair_lo = jnp.minimum(idx, partner)
        accept = (jnp.log(u[:, pair_lo]) < log_acc) & has_partner

        # swap: gather from partner where accepted
        gather_idx = jnp.where(accept, partner[None, :], idx[None, :])  # (B, K)
        new_e = jnp.take_along_axis(e, gather_idx, axis=1)
        flat_gather = (jnp.arange(b)[:, None] * k + gather_idx).reshape(-1)
        new_samples = tuple(
            x.reshape(b * k, *x.shape[1:])[flat_gather] for x in state.samples
        )
        return state.replace(
            samples=new_samples, energies=new_e.reshape(-1), step_count=count + 1
        )


def sharded_replica_exchange(mesh: Mesh, target_energy, temperatures, axis_name: str = "dp"):
    """Build a jitted exchange step for a ladder sharded across devices.

    ``temperatures``: (K,) with K divisible by the mesh size; samples
    (K, D) live sharded along the ladder axis.  Each call alternates
    even/odd pairings; cross-shard pairs exchange partner state via
    ``ppermute`` (one neighbor hop on the ICI ring).

    Returns ``step(samples, energies, key, parity) -> (samples, energies)``.
    """
    temps = jnp.asarray(temperatures)
    k_total = temps.shape[0]
    n_shards = mesh.shape[axis_name]
    assert k_total % n_shards == 0
    k_local = k_total // n_shards

    def local_step(samples, energies, key, parity):
        # samples: (k_local, D), energies: (k_local,) on each shard
        shard = jax.lax.axis_index(axis_name)
        idx_global = shard * k_local + jnp.arange(k_local)
        my_temps = temps[idx_global]

        partner = jnp.where((idx_global - parity) % 2 == 0, idx_global + 1, idx_global - 1)
        partner = jnp.clip(partner, 0, k_total - 1)
        has_partner = partner != idx_global

        # neighbor state: shift by one in each direction across the full ladder
        right_s = jnp.roll(samples, -1, axis=0)
        left_s = jnp.roll(samples, 1, axis=0)
        right_e = jnp.roll(energies, -1)
        left_e = jnp.roll(energies, 1)
        # boundary elements come from the neighboring shard via ppermute
        perm_fwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]  # send first row left
        perm_bwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        first_s = jax.lax.ppermute(samples[0], axis_name, perm_fwd)
        first_e = jax.lax.ppermute(energies[0], axis_name, perm_fwd)
        last_s = jax.lax.ppermute(samples[-1], axis_name, perm_bwd)
        last_e = jax.lax.ppermute(energies[-1], axis_name, perm_bwd)
        right_s = right_s.at[-1].set(first_s)
        right_e = right_e.at[-1].set(first_e)
        left_s = left_s.at[0].set(last_s)
        left_e = left_e.at[0].set(last_e)

        go_right = partner > idx_global
        partner_s = jnp.where(go_right[:, None], right_s, left_s)
        partner_e = jnp.where(go_right, right_e, left_e)

        log_acc = swap_acceptance_logprob(energies, partner_e, my_temps, temps[partner])
        # identical uniforms for both pair members: seed by the lower index
        pair_lo = jnp.minimum(idx_global, partner)
        u = jax.vmap(lambda i: jax.random.uniform(jax.random.fold_in(key, i)))(pair_lo)
        accept = (jnp.log(u) < log_acc) & has_partner

        new_samples = jnp.where(accept[:, None], partner_s, samples)
        new_energies = jnp.where(accept, partner_e, energies)
        return new_samples, new_energies

    spec = P(axis_name)
    rep = P()

    @jax.jit
    def step(samples, energies, key, parity):
        return shard_map(
            local_step,
            mesh=mesh,
            in_specs=(spec, spec, rep, rep),
            out_specs=(spec, spec),
        )(samples, energies, key, parity)

    return step
