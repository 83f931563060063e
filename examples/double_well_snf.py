"""Stochastic normalizing flow (SNF) on a 2D double well.

Mirror of the reference's augmented/SNF workflow
(``notebooks/alanine_dipeptide_augmented.ipynb``, ``snf_openmm.py``
capability): a deterministic flow composed with stochastic Metropolis
layers whose path work is accounted into ``dlogp``, keeping the
importance weights exact (annealed-importance / Jarzynski accounting).

Two facts this example demonstrates:

* a Metropolis layer targeting exactly the final density provably leaves
  the importance weights unchanged (the work term telescopes against the
  improved sample energies) — it buys decorrelation, not ESS;
* an *annealed* tail (layers targeting exp(-u/T) at decreasing T) is
  where SNF ESS gains come from: each stage bridges part of the gap
  between the transported prior and the target.

The stochastic layers run as on-device ``lax.scan`` chains over the
in-repo energy (the reference delegates them to OpenMM integrators).

    python examples/double_well_snf.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # run without installing

import jax
import jax.numpy as jnp

import bgflow_tpu as bg


def ess_of(flow, n_eval=20000, seed=2):
    target = bg.DoubleWellEnergy(2)
    gen = bg.BoltzmannGenerator(bg.NormalDistribution(2), flow, target)
    params = gen.init(jax.random.PRNGKey(0))
    out = gen.sample(params, jax.random.PRNGKey(seed), n_eval, with_log_weights=True)
    ess = float(bg.effective_sample_size(out.log_weights))
    right = float(jnp.mean(out.xs[0][:, 0] > 0))
    return ess, right


def main():
    target = bg.DoubleWellEnergy(2)
    # a deliberately crude transport (prior -> too-broad blob), standing in
    # for an undertrained deterministic flow
    base = bg.ConstantAffineFlow(loc=0.0, scale=1.6)

    ess0, right0 = ess_of(bg.Chain([base]))
    print(f"deterministic only      : ESS {ess0:6.0f}/20000  right-well {right0:.3f}")

    exact_tail = bg.Chain([base, bg.MetropolisMCFlow(target, n_steps=10, stepsize=0.4)])
    ess1, right1 = ess_of(exact_tail)
    print(f"+10 MC steps @ T=1      : ESS {ess1:6.0f}/20000  right-well {right1:.3f}"
          "   (unchanged ESS — exact-target layers are weight-neutral)")

    annealed = bg.Chain([base] + [
        bg.MetropolisMCFlow(target, n_steps=6, stepsize=0.4, temperature=t)
        for t in (3.0, 1.7, 1.0)
    ])
    ess2, right2 = ess_of(annealed)
    print(f"+6 MC steps @ T=3,1.7,1 : ESS {ess2:6.0f}/20000  right-well {right2:.3f}")

    assert abs(ess1 - ess0) < 1e-3 * max(ess0, 1.0), (ess0, ess1)
    assert ess2 > 1.2 * ess0, (ess0, ess2)
    print(f"annealed SNF improvement: {ess2 / ess0:.2f}x ESS")


if __name__ == "__main__":
    main()
