"""Tour of the sampler layer — the reference's ``notebooks/samplers.ipynb``
rebuilt on the functional TPU-native API.

Sections mirror the notebook (reference: samplers.ipynb):
1. sampling from distributions (temperature-aware priors, product spaces),
2. sampling from data (DataSetSampler with mapping hooks),
3. sampling from energies with the iterative framework — a custom MD+MCMC
   hybrid step (5 velocity-Verlet/HMC leapfrog steps, then a Metropolis
   random walk), all compiled into one `lax.scan`,
4. the metropolized replay buffer.

Run (CPU, a few seconds):
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python examples/samplers_tour.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bgflow_tpu.utils.backend import ensure_reachable_backend

ensure_reachable_backend()
import jax
import jax.numpy as jnp

import bgflow_tpu as bg


def section(title):
    print(f"\n=== {title} ===", flush=True)


key = jax.random.PRNGKey(0)

# 1. distributions ------------------------------------------------------
section("distributions")
prior = bg.NormalDistribution(2, mean=jnp.asarray([1.0, -1.0]))
x = prior.sample(key, 4)
print("normal:", np.asarray(x).round(2).tolist())
# temperature-aware sampling (variance scales with T)
hot = prior.sample(key, 2048, temperature=4.0)
print("std at T=4:", round(float(jnp.std(hot - jnp.asarray([1.0, -1.0]))), 3), "(expect ~2)")
# product spaces group independent channels into one sampler/energy
product = bg.ProductDistribution(
    [bg.NormalDistribution(2), bg.UniformDistribution(jnp.zeros(3), jnp.ones(3))]
)
xs = product.sample(key, 2)
xs = xs if isinstance(xs, tuple) else (xs,)
print("product:", [np.asarray(t).shape for t in xs])

# 2. data ---------------------------------------------------------------
section("data")
data = jax.random.normal(key, (1000, 2))
sampler = bg.DataSetSampler(data)
batch = sampler.sample(jax.random.fold_in(key, 1), 8)
print("data batch:", np.asarray(batch).shape)

# 3. energies: custom iterative sampling --------------------------------
section("iterative MD + MCMC hybrid")
target = bg.DoubleWellEnergy(2)
n_chains = 64
x0 = jnp.zeros((n_chains, 2))
state = bg.SamplerState(samples=(x0,), energies=target.energy(x0))
steps = [
    # 5 leapfrog steps with exact Metropolis correction (the TPU-native
    # replacement for the notebook's hand-rolled Verlet integrator —
    # same dynamics, but the ensemble stays exactly Boltzmann)
    bg.HMCStep(target, step_size=0.08, n_leapfrog=5),
    # then one Gaussian random-walk Metropolis pass
    bg.MCMCStep(target, proposal=bg.GaussianProposal(noise_std=0.2)),
]
it = bg.IterativeSampler(state, steps, stride=2, n_burnin=50)
samples = it.sample(jax.random.fold_in(key, 2), 200)  # (200, 64, 2) pooled
flat = np.asarray(samples).reshape(-1, 2)
left, right = float(np.mean(flat[:, 0] < 0)), float(np.mean(flat[:, 0] > 0))
print(f"chains: {flat.shape[0]} samples, well occupancy L/R = {left:.2f}/{right:.2f}")

# 4. replay buffer ------------------------------------------------------
section("metropolized replay buffer")
# proposals come from a broad Gaussian "generator"; the buffer accepts or
# rejects them against random entries so its content drifts toward the
# target Boltzmann ensemble
proposal_dist = bg.NormalDistribution(2, cov=4.0 * jnp.eye(2))
buf = bg.MetropolizedReplayBuffer(
    proposal_dist.sample(jax.random.fold_in(key, 3), 256),
    target_energy=target,
    proposal_energy=proposal_dist,
)
k = jax.random.fold_in(key, 4)
n_acc = 0
for i in range(20):
    k, k1, k2 = jax.random.split(k, 3)
    proposal = proposal_dist.sample(k1, 64)
    n_acc += buf.update(k2, proposal)
print("buffer mean target energy:", round(float(jnp.mean(buf.energies)), 3),
      f"({n_acc}/{20*64} proposals accepted)")
