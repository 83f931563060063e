"""Minimal Boltzmann generator on a 2D double well.

Parity with the reference README example (``README.md:54-96``): Normal
prior, RealNVP coupling flow, mixed NLL + reverse-KL training, reweighted
sampling.  Runs in ~1 minute on CPU, seconds on a TPU chip.

    python examples/double_well_basics.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # run without installing

import jax
import jax.numpy as jnp
import optax

import bgflow_tpu as bg


def make_generator(key, dim=2, hidden=64, n_blocks=4):
    prior = bg.NormalDistribution(dim)
    target = bg.DoubleWellEnergy(dim)
    d1, d2 = dim // 2, dim - dim // 2
    blocks = [bg.Split(d1, axis=-1)]
    for i in range(n_blocks):
        din, dout = (d1, d2) if i % 2 == 0 else (d2, d1)
        blocks += [
            bg.Coupling(bg.AffineTransformer(
                bg.DenseNet([din, hidden, hidden, dout]),
                bg.DenseNet([din, hidden, hidden, dout]),
            )),
            bg.Swap(),
        ]
    blocks.append(bg.Merge(d1, axis=-1))
    gen = bg.BoltzmannGenerator(prior, bg.Chain(blocks), target)
    return gen, gen.init(key)


def main():
    key = jax.random.PRNGKey(0)
    gen, params = make_generator(key)

    # "data": MCMC samples from the target (on-device chains)
    sampler = bg.GaussianMCMCSampler(gen.target, jnp.zeros((64, 2)), noise_std=0.4,
                                     stride=5, n_burnin=200)
    data = bg.DataSetSampler(sampler.sample(jax.random.PRNGKey(7), 200))

    trainer = bg.KLTrainer(gen, optimizer=optax.adam(2e-3))
    params, opt_state, reporter = trainer.train(
        params, key, n_iter=400, data=data, batchsize=256,
        w_likelihood=0.5, w_energy=0.5, progress_interval=100,
    )

    out = gen.sample(params, jax.random.PRNGKey(1), 10_000, with_log_weights=True)
    ess = bg.effective_sample_size(out.log_weights)
    frac_right = float(jnp.mean(out.x[:, 0] > 0))
    print(f"ESS = {float(ess):.0f} / 10000   well occupancy: "
          f"{1 - frac_right:.2f} / {frac_right:.2f}")


if __name__ == "__main__":
    main()
