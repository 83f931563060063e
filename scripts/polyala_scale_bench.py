"""System-size scaling benchmark: poly-alanine on one TPU chip.

Two sweeps, one JSON artifact (artifacts/polyala_scale.json):

  flows   — full BG sampling throughput (prior -> spline couplings ->
            IC-domain maps -> z-matrix reconstruction) for ACE-(ALA)_n-NME
            at n_res in {1, 2, 3, 5, 8}; the whole flagship architecture is
            generic over chain length (models/polyala.py).
  energy  — force-field energy throughput, dense O(N^2) nonbonded vs the
            O(N) cell-list cutoff path (energies/neighborlist.py), at
            n_res up to 24 (169 atoms) — the scale-up story for chains
            where the all-pairs sum stops fitting the arithmetic budget.

Run:  python scripts/polyala_scale_bench.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bgflow_tpu.utils.backend import ensure_reachable_backend

if "--cpu" in sys.argv:  # jax.config pin survives sitecustomize env re-pins
    import jax

    jax.config.update("jax_platforms", "cpu")
ON_TPU = ensure_reachable_backend()
import jax
import jax.numpy as jnp

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts")


def _timed(fn, *args, n_rep=5):
    """Median wall time of jitted fn over n_rep post-warmup calls."""
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _synthetic_frames(n_res, n=512, seed=0):
    """Perturbed copies of the relaxed extended chain (enough spread for
    whitening statistics; the bench measures compute, not model quality)."""
    from bgflow_tpu.energies.peptide import polyala_reference_xyz

    ref = polyala_reference_xyz(n_res)
    rng = np.random.RandomState(seed)
    x = ref[None] + 0.01 * rng.randn(n, *ref.shape)
    return x.reshape(n, -1).astype(np.float32)


def flow_sweep(sizes=(1, 2, 3, 5, 8), elements=2 ** 23):
    """Per-size batch keeps batch*n_atoms ~ constant (fits 16 GB HBM at
    every chain length instead of OOMing where 262k samples of ALA8 won't)."""
    from bgflow_tpu.models.polyala import make_polyala_generator

    rows = []
    for n_res in sizes:
        data = _synthetic_frames(n_res)
        n_atoms = data.shape[1] // 3
        batch = max(8192, (elements // n_atoms) // 1024 * 1024)
        gen = make_polyala_generator(n_res, data, use_pallas_spline=ON_TPU)
        params = gen.init(jax.random.PRNGKey(0))

        @jax.jit
        def sample(p, key):
            return gen.sample(p, key, batch).xs[0]

        dt = _timed(sample, params, jax.random.PRNGKey(1))
        rows.append({
            "n_res": n_res, "n_atoms": n_atoms, "batch": batch,
            "samples_per_sec": round(batch / dt, 1),
            "atoms_per_sec": round(batch * n_atoms / dt, 1),
        })
        print("flow ", rows[-1], flush=True)
    return rows


def energy_sweep(sizes=(3, 8, 16, 32, 48), batch=16384, cutoff=1.2):
    from bgflow_tpu.energies.peptide import build_polyala_forcefield

    rows = []
    for n_res in sizes:
        x = jnp.asarray(_synthetic_frames(n_res, n=batch, seed=1))
        row = {"n_res": n_res, "n_atoms": x.shape[1] // 3, "batch": batch}
        for label, kw in (("dense", {}), ("cell_list", {"cutoff": cutoff})):
            ff = build_polyala_forcefield(n_res, **kw)
            en = jax.jit(ff.energy)
            dt = _timed(en, x)
            row[f"{label}_evals_per_sec"] = round(batch / dt, 1)
        # cutoff truncation bias at this cutoff (kT RMS over the batch)
        dense = build_polyala_forcefield(n_res)
        cl = build_polyala_forcefield(n_res, cutoff=cutoff)
        d = jax.jit(dense.energy)(x[:1024]) - jax.jit(cl.energy)(x[:1024])
        d = d[jnp.isfinite(d)]  # clash-y synthetic frames can overflow f32
        row["cutoff_bias_rms_kt"] = round(float(jnp.sqrt(jnp.mean((d - d.mean()) ** 2))), 4)
        rows.append(row)
        print("energy", row, flush=True)
    return rows


if __name__ == "__main__":
    res = {
        "backend": "tpu" if ON_TPU else "cpu",
        "flows": flow_sweep() if ON_TPU else flow_sweep(sizes=(1, 3), elements=2 ** 19),
        "energy": energy_sweep() if ON_TPU else energy_sweep(sizes=(3, 8), batch=2048),
    }
    with open(os.path.join(ART, "polyala_scale.json"), "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res, indent=1))
