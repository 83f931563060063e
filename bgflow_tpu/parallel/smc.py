"""Sequential-Monte-Carlo utilities: weight normalization, ESS, and
systematic resampling — single-device and mesh-sharded.

The reference has no SMC machinery (its replay buffer is the closest
analogue); this module provides the population-resampling primitives for
annealed importance sampling / SMC samplers over sharded particle
populations.  Distributed weight reductions ride ``psum`` in log space;
resampling uses the systematic (low-variance) scheme.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

__all__ = [
    "normalize_log_weights",
    "systematic_resampling_indices",
    "resample",
    "sharded_smc_step",
    "sharded_smc_step_hierarchical",
]


def normalize_log_weights(log_weights):
    return log_weights - jax.scipy.special.logsumexp(log_weights, axis=0)


def systematic_resampling_indices(key, log_weights, n: int):
    """Systematic resampling: one uniform, n evenly spaced pointers."""
    w = jnp.exp(normalize_log_weights(log_weights))
    cdf = jnp.cumsum(w)
    u0 = jax.random.uniform(key, ())
    pointers = (u0 + jnp.arange(n)) / n
    return jnp.searchsorted(cdf, pointers, side="right").clip(0, log_weights.shape[0] - 1)


def resample(key, samples, log_weights, n: int = None):
    """Resample a pytree of (B, ...) arrays by systematic resampling."""
    b = log_weights.shape[0]
    n = b if n is None else n
    idx = systematic_resampling_indices(key, log_weights, n)
    return jax.tree_util.tree_map(lambda x: jnp.take(x, idx, axis=0), samples), idx


def sharded_smc_step(mesh: Mesh, axis_name: str = "dp"):
    """Build a jitted distributed resampling step.

    Particles (B, ...) are sharded along the batch axis.  Global weight
    normalization and the resampling CDF use ``psum``/``all_gather`` of the
    per-shard weight *sums* (O(n_shards) comm), and only the selected
    particles move (one ``all_gather`` of the population in the gather
    step — the simple, bandwidth-bound scheme appropriate for BG-scale
    populations).

    Returns ``smc(key, samples, log_weights) -> (samples, ess)``.
    """
    spec = P(axis_name)
    rep = P()

    def local(key, samples, log_weights):
        # global logsumexp via psum in log space
        shard = jax.lax.axis_index(axis_name)
        n_shards = jax.lax.axis_size(axis_name)
        b_local = log_weights.shape[0]
        m_local = jnp.max(log_weights)
        m = jax.lax.pmax(m_local, axis_name)
        sum_local = jnp.sum(jnp.exp(log_weights - m))
        z = jax.lax.psum(sum_local, axis_name)
        logz = m + jnp.log(z)
        w_norm = jnp.exp(log_weights - logz)  # sums to 1 globally

        # Kish ESS across all shards
        sum_sq = jax.lax.psum(jnp.sum(w_norm**2), axis_name)
        ess = 1.0 / sum_sq

        # global systematic resampling: every shard computes the full CDF
        all_w = jax.lax.all_gather(w_norm, axis_name)  # (n_shards, b_local)
        cdf = jnp.cumsum(all_w.reshape(-1))
        n_total = n_shards * b_local
        u0 = jax.random.uniform(key, ())
        pointers = (u0 + shard * b_local + jnp.arange(b_local)) / n_total
        idx = jnp.searchsorted(cdf, pointers, side="right").clip(0, n_total - 1)

        # gather selected particles from the global population
        all_samples = jax.tree_util.tree_map(
            lambda x: jax.lax.all_gather(x, axis_name).reshape(n_total, *x.shape[1:]),
            samples,
        )
        new_samples = jax.tree_util.tree_map(lambda x: jnp.take(x, idx, axis=0), all_samples)
        return new_samples, ess

    @jax.jit
    def smc(key, samples, log_weights):
        return shard_map(
            local,
            mesh=mesh,
            in_specs=(rep, spec, spec),
            out_specs=(spec, rep),
        )(key, samples, log_weights)

    return smc


def sharded_smc_step_hierarchical(mesh: Mesh, axis_name: str = "dp"):
    """ICI-friendly distributed resampling that never gathers the population.

    Two-level (mixture) systematic resampling:

    1. **Shard level** — per-shard weight sums (O(n_shards) ``all_gather``
       of scalars) form a shard CDF; one systematic sweep assigns each
       destination shard a single *source* shard.  Expected copies of shard
       ``s`` = ``n_shards * W_s / sum(W)``, so the scheme is unbiased.
    2. **Routing** — source blocks travel to destinations over a ring of
       neighbor ``ppermute`` steps (each hop moves one block per link, so
       traffic rides ICI neighbor links); peak memory stays O(b_local)
       instead of the O(n_total) of :func:`sharded_smc_step`'s full
       ``all_gather``.
    3. **Local level** — each destination systematically resamples its
       ``b_local`` particles from the received block with the block's local
       weights (marginal probability of particle (s, i) per output slot is
       exactly ``w_i / sum(W)``).

    Variance is slightly above global systematic resampling (the shard
    assignment quantizes), matching standard mixture-resampling particle
    filters; ESS reported is the exact global Kish ESS.

    Returns ``smc(key, samples, log_weights) -> (samples, ess)``.
    """
    spec = P(axis_name)
    rep = P()
    n_shards = mesh.shape[axis_name]

    def local(key, samples, log_weights):
        shard = jax.lax.axis_index(axis_name)
        b_local = log_weights.shape[0]

        # global log-normalization via psum in log space
        m = jax.lax.pmax(jnp.max(log_weights), axis_name)
        sum_local = jnp.sum(jnp.exp(log_weights - m))
        z = jax.lax.psum(sum_local, axis_name)
        w_norm = jnp.exp(log_weights - (m + jnp.log(z)))  # sums to 1 globally
        ess = 1.0 / jax.lax.psum(jnp.sum(w_norm**2), axis_name)

        # 1. shard-level systematic sweep (identical on every shard: `key`
        #    is replicated, so u0 agrees everywhere)
        w_shard = jax.lax.all_gather(jnp.sum(w_norm), axis_name)  # (n_shards,)
        cdf = jnp.cumsum(w_shard)
        key_shardlevel, key_local = jax.random.split(key)
        u0 = jax.random.uniform(key_shardlevel, ())
        pointers = (u0 + jnp.arange(n_shards)) / n_shards
        src = jnp.searchsorted(cdf, pointers, side="right").clip(0, n_shards - 1)
        my_src = src[shard]

        # 2. ring routing: after r neighbor hops, this shard holds the block
        #    that started on (shard - r) mod n; keep it when that is my_src
        perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        block = (samples, w_norm)
        acc = jax.tree_util.tree_map(jnp.zeros_like, block)

        for r in range(n_shards):
            origin = (shard - r) % n_shards
            take = (origin == my_src)
            acc = jax.tree_util.tree_map(
                lambda a, b: jnp.where(
                    take.reshape((1,) * b.ndim), b, a), acc, block)
            if r < n_shards - 1:
                block = jax.tree_util.tree_map(
                    lambda x: jax.lax.ppermute(x, axis_name, perm), block)
        recv_samples, recv_w = acc

        # 3. local systematic resampling within the received block, with a
        #    per-destination key so shards sharing a source draw differently
        key_d = jax.random.fold_in(key_local, shard)
        w_block = recv_w / jnp.maximum(jnp.sum(recv_w), 1e-38)
        cdf_local = jnp.cumsum(w_block)
        u1 = jax.random.uniform(key_d, ())
        ptr = (u1 + jnp.arange(b_local)) / b_local
        idx = jnp.searchsorted(cdf_local, ptr, side="right").clip(0, b_local - 1)
        new_samples = jax.tree_util.tree_map(
            lambda x: jnp.take(x, idx, axis=0), recv_samples)
        return new_samples, ess

    @jax.jit
    def smc(key, samples, log_weights):
        return shard_map(
            local,
            mesh=mesh,
            in_specs=(rep, spec, spec),
            out_specs=(spec, rep),
        )(key, samples, log_weights)

    return smc
