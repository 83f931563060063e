"""Alanine-dipeptide Boltzmann generator, end to end on device.

Parity with the reference's canonical notebook
(``notebooks/alanine_dipeptide_basics.py``): MD data, mixed coordinate
transform, spline couplings, NLL-then-mixed training, reweighted evaluation.
Unlike the reference (which needs OpenMM + CPU worker pools), everything —
MD, energies, flow — runs on the accelerator.

    python examples/alanine_dipeptide_basics.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # run without installing

import jax
import jax.numpy as jnp
import optax

import bgflow_tpu as bg
from bgflow_tpu.models.ala2 import Ala2Model


def main():
    key = jax.random.PRNGKey(0)
    print("generating MD data (BAOAB, Kabsch-aligned) + building the generator...")
    model = Ala2Model.create(key, n_data=16384)
    gen, params, data = model.generator, model.params, model.data
    data_sampler = bg.DataSetSampler(data)

    trainer = bg.KLTrainer(gen, optimizer=optax.adam(4e-4))

    # On a TPU chip this trains at ~100-250 steps/s; scale n_iter up
    # (20k NLL + annealed KL) for production-quality models.
    print("phase 1: NLL training")
    params, opt_state, _ = trainer.train(
        params, jax.random.PRNGKey(1), n_iter=2000, data=data_sampler,
        batchsize=512, w_likelihood=1.0, w_energy=0.0, progress_interval=500,
    )

    print("phase 2: mixed NLL/KL training (annealed energy weight)")
    for w_energy in (0.02, 0.05, 0.1):
        params, opt_state, _ = trainer.train(
            params, jax.random.PRNGKey(2), n_iter=700, data=data_sampler,
            opt_state=opt_state, batchsize=512, w_likelihood=1.0,
            w_energy=w_energy, progress_interval=700,
        )

    print("evaluation: 10k samples with importance weights")
    out = gen.sample(params, jax.random.PRNGKey(3), 10_000, with_log_weights=True)
    ess = float(bg.effective_sample_size(out.log_weights))
    nll = float(jnp.mean(gen.energy(params, data[:1024])))
    print(f"ESS = {ess:.0f} / 10000    NLL(data) = {nll:.2f}")

    # save a small trajectory of generated structures
    from bgflow_tpu.energies.ala2 import ALA2_ATOMS
    names = [n for n, _, _ in ALA2_ATOMS]
    bg.save_pdb_trajectory("ala2_samples.pdb", out.x[:10].reshape(10, 22, 3), names)
    print("wrote ala2_samples.pdb")


if __name__ == "__main__":
    main()
