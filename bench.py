"""Benchmark: TPU samples/s on the README-parity Boltzmann generator.

Workload (BASELINE.md anchor 1): 2-D double-well target, RealNVP coupling
flow (two blocks, 64x64 hidden), Normal prior; sampling with importance
log-weights.  The baseline constant below is bgflow-on-CPU measured in this
container (torch 8 threads, batch 65536, README config):

    SAMPLES_PER_SEC  = 101_860   (bgflow @ /root/reference, README.md:54-96)
    TRAIN_STEPS_PER_SEC = 17.9   (KLTrainer reverse-KL, batch 1024)

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import jax
import jax.numpy as jnp

import bgflow_tpu as bg

BASELINE_CPU_SAMPLES_PER_SEC = 101_860.0


def make_generator(key, dim=2, hidden=(64, 64)):
    prior = bg.NormalDistribution(dim)
    target = bg.DoubleWellEnergy(dim)
    d1, d2 = dim // 2, dim - dim // 2

    def dense(din, dout):
        return bg.DenseNet([din, *hidden, dout], activation=jax.nn.relu)

    flow = bg.Chain([
        bg.Split(d1, axis=-1),
        bg.Coupling(bg.AffineTransformer(dense(d1, d2), dense(d1, d2))),
        bg.Swap(),
        bg.Coupling(bg.AffineTransformer(dense(d2, d1), dense(d2, d1))),
        bg.Merge(d1, axis=-1),
    ])
    gen = bg.BoltzmannGenerator(prior, flow, target)
    return gen, gen.init(key)


def main():
    key = jax.random.PRNGKey(0)
    gen, params = make_generator(key)
    n = 65536

    @jax.jit
    def sample(params, key):
        out = gen.sample(params, key, n, with_log_weights=True)
        return out.x, out.log_weights

    # warmup / compile
    x, lw = sample(params, key)
    jax.block_until_ready((x, lw))

    iters = 50
    t0 = time.perf_counter()
    for i in range(iters):
        x, lw = sample(params, jax.random.fold_in(key, i))
    jax.block_until_ready((x, lw))
    t1 = time.perf_counter()

    sps = n * iters / (t1 - t0)
    print(json.dumps({
        "metric": "dw2d_realnvp_samples_per_sec",
        "value": round(sps, 1),
        "unit": "samples/s",
        "vs_baseline": round(sps / BASELINE_CPU_SAMPLES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
