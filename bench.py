"""Benchmark: TPU samples/s on the flagship alanine-dipeptide generator.

Workload (BASELINE.md anchor 2): the full molecular sampling path — uniform
prior -> 4 affine coupling blocks (128x128 conditioners, shift-only circular
torsions) -> inverse-CDF maps onto IC domains -> whitened-fixed-atom +
z-matrix NeRF reconstruction to Cartesian xyz.  Identical architecture
measured on the reference (bgflow @ /root/reference, torch CPU 8 threads,
batch 8192, same synthetic data seed):

    ALA2_SAMPLES_PER_SEC = 43_453      (reference CPU)
    DW2D RealNVP README config         = 101_860 (reference CPU, batch 64k)

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

import bgflow_tpu as bg

BASELINE_CPU_ALA2_SAMPLES_PER_SEC = 43_453.0


def make_ala2_generator(key, compute_dtype=jnp.bfloat16):
    from bgflow_tpu.energies.ala2 import ALA2_FIXED_ATOMS, ALA2_Z_MATRIX

    rng = np.random.RandomState(0)
    base = np.arange(22)[:, None] * np.array([[0.15, 0.1, 0.12]])
    data = (base[None] + 0.05 * rng.randn(512, 22, 3)).reshape(512, 66).astype(np.float32)

    crd = bg.MixedCoordinateTransformation(
        data, ALA2_Z_MATRIX, ALA2_FIXED_ATOMS, keepdims=15,
        use_pallas=True,  # fused reconstruction kernel (2.9x vs XLA path)
    )
    shape_info = bg.ShapeDictionary.from_coordinate_transform(crd)
    builder = bg.BoltzmannGeneratorBuilder(shape_info)
    builder.default_transformer_type = bg.AffineTransformer
    for what, on in [
        (bg.TORSIONS, bg.FIXED),
        (bg.FIXED, bg.TORSIONS),
        (bg.BONDS, (bg.ANGLES, bg.TORSIONS)),
        (bg.ANGLES, (bg.BONDS, bg.TORSIONS)),
    ]:
        # bf16 conditioner matmuls (f32 accumulate) — the MXU's fast path;
        # the spline/affine transform math itself stays f32
        builder.add_condition(what, on=on, hidden=(128, 128), compute_dtype=compute_dtype)
    builder.add_map_to_ic_domains()
    builder.add_map_to_cartesian(crd)
    gen = builder.build_generator(check_target=False)
    return gen, gen.init(key)


def main():
    key = jax.random.PRNGKey(0)
    gen, params = make_ala2_generator(key)
    # large batch amortizes dispatch latency; the whole path (couplings,
    # inverse CDFs, z-matrix reconstruction) is one fused XLA program
    n = 4 * 1024 * 1024

    @jax.jit
    def sample(params, key):
        return gen.sample(params, key, n).xs[0]

    x = sample(params, key)
    jax.block_until_ready(x)

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        x = sample(params, jax.random.fold_in(key, i))
    jax.block_until_ready(x)
    t1 = time.perf_counter()

    sps = n * iters / (t1 - t0)
    assert bool(jnp.all(jnp.isfinite(x[:1024]))), "bench produced non-finite samples"
    print(json.dumps({
        "metric": "ala2_bg_samples_per_sec",
        "value": round(sps, 1),
        "unit": "samples/s",
        "vs_baseline": round(sps / BASELINE_CPU_ALA2_SAMPLES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
