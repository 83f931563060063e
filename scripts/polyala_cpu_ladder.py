"""CPU-scale ranking of the three ALA3 quality fixes.

Trains reduced-scale variants of the ALA3 spline BG on the existing
exact-ensemble data (artifacts/polyala3_data.npz) and ranks them by
sampling efficiency, so the expensive TPU closeout only runs the winners.

Variants: baseline / learnable marginals / residue-AR torsions / both.
Reduced scale: fewer iterations + no Pallas (CPU) — relative ordering is
what we're after, not absolute efficiency.

Run:  python scripts/polyala_cpu_ladder.py [n_iter] [batch]
Writes artifacts/polyala3_cpu_ladder.json
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import optax

import bgflow_tpu as bg
from bgflow_tpu.models.polyala import make_polyala_generator

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts")

VARIANTS = {
    "baseline": dict(),
    # umbrella-augmented training set (the fix that rescued the ala2
    # flagship): per-dihedral umbrella frames with near-uniform coverage
    # mixed into the exact ensemble (scripts/polyala_demo.py logic).
    # MEASURED 2026-08-18: 0.069% eff vs baseline 0.202% — augmentation
    # HURTS at ALA3 scale (coverage mass dilutes the Boltzmann bulk).
    "augment": dict(_augment=True),
    "residue_ar": dict(torsion_scheme="residue_ar"),
    # per-dof density mismatch is the diagnosed wall: does capacity move it?
    "capacity": dict(hidden=(512, 512), num_bins=32, torsion_cross_couplings=8),
    "marginals": dict(learnable_marginals=True),
    "augment+marginals": dict(_augment=True, learnable_marginals=True),
}


def _load_demo_module():
    import importlib.util

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "polyala_demo.py")
    spec = importlib.util.spec_from_file_location("polyala_demo", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def run_variant(name, kw, data, log_w, n_iter, batch, n_eval=20000):
    gen_kw = dict(
        use_pallas_spline=False, marginals_from="data",
        torsion_cross_couplings=4, hidden=(256, 256), num_bins=16,
    )
    gen_kw.update(kw)
    gen = make_polyala_generator(3, data, **gen_kw)
    params = gen.init(jax.random.PRNGKey(0))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    trainer = bg.KLTrainer(
        gen, train_energy=False,
        optimizer=optax.adam(optax.cosine_decay_schedule(1e-3, n_iter, 1e-2)),
    )
    sampler = bg.DataSetSampler(jnp.asarray(data), log_weights=jnp.asarray(log_w))
    t0 = time.time()
    params, _, reporter = trainer.train(
        params, jax.random.PRNGKey(1), n_iter, data=sampler,
        batchsize=batch, scan_chunk=min(500, n_iter),
    )
    t_train = time.time() - t0
    out = gen.sample(params, jax.random.PRNGKey(7), n_eval, with_log_weights=True)
    lw = out.log_weights
    finite = jnp.isfinite(lw)
    ess = float(bg.effective_sample_size(jnp.where(finite, lw, -jnp.inf)))
    nll = float(reporter.losses()[0][-20:].mean())
    res = {
        "n_params": n_params,
        "final_nll": nll,
        "ess": ess,
        "sampling_efficiency_pct": 100.0 * ess / n_eval,
        "logw_std": float(jnp.std(jnp.where(finite, lw, jnp.nan), where=finite)),
        "frac_nonfinite": float(1.0 - jnp.mean(finite.astype(jnp.float32))),
        "mean_model_energy_kt": float(jnp.mean(gen.target.energy(out.xs[0][:2048]))),
        "train_seconds": t_train,
    }
    print(f"{name:>22}: eff {res['sampling_efficiency_pct']:.4f}%  "
          f"logw_std {res['logw_std']:.1f}  NLL {nll:.1f}  "
          f"E_model {res['mean_model_energy_kt']:.0f} kT  ({t_train:.0f}s)",
          flush=True)
    return res


def main():
    n_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    blob = np.load(os.path.join(ART, "polyala3_data.npz"))
    data, log_w = blob["data"], blob["log_weights"]
    out_path = os.path.join(ART, "polyala3_cpu_ladder.json")
    results = {"n_iter": n_iter, "batch": batch, "variants": {}}
    # resume: keep variants already measured at this scale (reruns after a
    # timeout only pay for what is missing)
    if os.path.exists(out_path):
        with open(out_path) as fh:
            prev = json.load(fh)
        if prev.get("n_iter") == n_iter and prev.get("batch") == batch:
            results["variants"].update(prev.get("variants", {}))
    aug_cache = None
    for name, kw in VARIANTS.items():
        if name in results["variants"]:
            print(f"{name:>22}: cached", flush=True)
            continue
        kw = dict(kw)
        if kw.pop("_augment", False):
            if aug_cache is None:
                aug_cache = _load_demo_module()._augmented_training_set(3)
            d, lw = aug_cache
        else:
            d, lw = data, log_w
        results["variants"][name] = run_variant(name, kw, d, lw, n_iter, batch)
        with open(out_path, "w") as fh:
            json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
