"""Measure the reference (noegroup/bgflow, torch CPU) baseline numbers.

Regenerates the BASELINE_CPU_* constants hard-coded in ``bench.py`` so the
headline "vs_baseline" multiples are reproducible (VERDICT r2, weak #5):
runs the *actual reference library* at /root/reference (imported, not
copied) on this container's CPU and reports:

- ``readme_2d_samples_per_sec``     — the README minimal config
  (/root/reference/README.md:54-96): 2-D double well, one RealNVP block.
- ``ala2_affine_samples_per_sec``   — the reference BoltzmannGeneratorBuilder
  ala2 generator with affine couplings (the faster of its two transformer
  families; its spline path needs the absent ``nflows``), batch 8192 —
  the exact workload ``bench.py::make_flagship(transformer='affine')``
  mirrors, built on the same synthetic data and z-matrix.
- ``ala2_nll_train_steps_per_sec``  — reference ``KLTrainer`` NLL-only
  steps/s at batch 1024 on that generator.  (Mixed NLL/KL against the real
  ala2 force field is impossible for the reference on this machine: its MM
  energies require OpenMM, which is not installed — the TPU build's
  in-repo force-field kernel has no reference counterpart to race.)

Environment details are recorded in the output JSON
(artifacts/baseline_reference.json).

Run:  python scripts/baseline_reference.py [--quick]
"""
import json
import os
import platform
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference")

import numpy as np

# numpy-2 compat shims for the (read-only) reference
np.infty = np.inf

import jax

jax.config.update("jax_platforms", "cpu")  # keep the TPU out of this entirely
import jax.dlpack

if not hasattr(jax.dlpack, "to_dlpack"):  # removed in new jax; bridge unused here
    jax.dlpack.to_dlpack = lambda arr, *a, **k: arr

import torch

N_THREADS = 8
torch.set_num_threads(N_THREADS)

import bgflow as ref  # the reference library

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts")


def _synthetic_data(n=512):
    """Same synthetic ala2-like geometry bench.py uses (bench.py:41-44)."""
    rng = np.random.RandomState(0)
    base = np.arange(22)[:, None] * np.array([[0.15, 0.1, 0.12]])
    return (base[None] + 0.05 * rng.randn(n, 22, 3)).reshape(n, 66).astype(np.float32)


def measure_readme_2d(batch=8192, iters=20):
    """README.md:54-96 config: DoubleWell + Normal prior + one RealNVP block."""
    dim = 2
    prior = ref.NormalDistribution(dim)
    target = ref.DoubleWellEnergy(dim)

    class RealNVP(ref.SequentialFlow):
        def __init__(self, hidden):
            super().__init__([
                ref.SplitFlow(dim // 2),
                ref.CouplingFlow(
                    ref.AffineTransformer(
                        shift_transformation=ref.DenseNet([dim // 2, *hidden, dim // 2]),
                        scale_transformation=ref.DenseNet([dim // 2, *hidden, dim // 2]),
                    )
                ),
                ref.InverseFlow(ref.SplitFlow(dim // 2)),
            ])

    gen = ref.BoltzmannGenerator(prior, RealNVP([64, 64]), target)
    with torch.no_grad():
        gen.sample(batch)  # warm
        t0 = time.perf_counter()
        for _ in range(iters):
            gen.sample(batch)
        dt = time.perf_counter() - t0
    return batch * iters / dt


def build_ala2_affine():
    """The reference builder ala2 generator, affine couplings, mirroring
    bench.py::make_flagship(transformer='affine') block for block."""
    from bgflow_tpu.energies.ala2 import ALA2_FIXED_ATOMS, ALA2_Z_MATRIX

    data = torch.tensor(_synthetic_data())
    crd = ref.MixedCoordinateTransformation(
        data, np.asarray(ALA2_Z_MATRIX), np.asarray(ALA2_FIXED_ATOMS), keepdims=15
    )
    shape_info = ref.ShapeDictionary.from_coordinate_transform(crd)
    # target only matters for KL terms; NLL/sampling never evaluates it
    target = ref.DoubleWellEnergy(66)
    builder = ref.BoltzmannGeneratorBuilder(
        shape_info, target=target, device=torch.device("cpu"), dtype=torch.float32
    )
    builder.default_transformer_type = ref.AffineTransformer
    for what, on in [
        (ref.TORSIONS, ref.FIXED),
        (ref.FIXED, ref.TORSIONS),
        (ref.BONDS, (ref.ANGLES, ref.TORSIONS)),
        (ref.ANGLES, (ref.BONDS, ref.TORSIONS)),
    ]:
        # circular channels: the reference affine transformer is shift-only
        circular = what is ref.TORSIONS
        builder.add_condition(what, on=on, hidden=(128, 128),
                              use_scaling=not circular)
    builder.add_map_to_ic_domains()
    builder.add_map_to_cartesian(crd)
    return builder.build_generator(), data


def measure_ala2_sampling(gen, batch=8192, iters=10):
    with torch.no_grad():
        gen.sample(batch)  # warm
        t0 = time.perf_counter()
        for _ in range(iters):
            gen.sample(batch)
        dt = time.perf_counter() - t0
    return batch * iters / dt


def measure_ala2_training(gen, data, batch=1024, iters=20):
    """Reference KLTrainer, NLL-only (w_energy=0), steps/s."""
    optim = torch.optim.Adam(gen.parameters(), lr=1e-4)
    trainer = ref.KLTrainer(gen, optim=optim, train_energy=False)
    sampler = ref.DataSetSampler(data)
    trainer.train(n_iter=2, data=sampler, batchsize=batch)  # warm
    t0 = time.perf_counter()
    trainer.train(n_iter=iters, data=sampler, batchsize=batch)
    dt = time.perf_counter() - t0
    return iters / dt


def main():
    quick = "--quick" in sys.argv
    out = {
        "library": "bgflow @ /root/reference",
        "torch": torch.__version__,
        "torch_num_threads": N_THREADS,
        "cpu": platform.processor() or platform.machine(),
        "python": platform.python_version(),
    }
    out["readme_2d_samples_per_sec"] = round(
        measure_readme_2d(iters=4 if quick else 20), 1
    )
    gen, data = build_ala2_affine()
    out["ala2_affine_samples_per_sec"] = round(
        measure_ala2_sampling(gen, iters=3 if quick else 10), 1
    )
    out["ala2_nll_train_steps_per_sec"] = round(
        measure_ala2_training(gen, data, iters=5 if quick else 20), 2
    )
    with open(os.path.join(ART, "baseline_reference.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
