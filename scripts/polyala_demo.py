"""End-to-end poly-alanine BG demo on TPU: the generic scale-up family.

Phases (each writes/extends artifacts/polyala{N}.json + checkpoints):

  data   — HMC + replica-exchange exact-Boltzmann ensemble
  train  — weighted-NLL training of the spline BG (the recipe the ala2
           science closeout validated: NLL-only, aligned data)
  eval   — sampling efficiency / log-weight statistics

Run:  python scripts/polyala_demo.py <phase> [n_res]
"""
import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts")


def data_phase(n_res, n_samples=98304):
    from bgflow_tpu.models.polyala import generate_polyala_data_exact

    key = jax.random.PRNGKey(11)
    # all rungs + MBAR weights: the hot rungs cross barriers and MBAR
    # unbiases them to T=1 (coverage augmentation at zero extra cost)
    data, log_w = generate_polyala_data_exact(
        key, n_res, n_samples=n_samples, n_ladders=64, n_burnin=400,
        return_all_rungs=True,
    )
    np.savez(
        os.path.join(ART, f"polyala{n_res}_data.npz"),
        data=np.asarray(data), log_weights=np.asarray(log_w),
    )
    w = np.exp(np.asarray(log_w)); w /= w.sum()
    print(f"data: {data.shape}, weight-ESS {1.0/np.sum(w**2):.0f}", flush=True)


def train_phase(n_res, n_iter=24000, batch=1024):
    import bgflow_tpu as bg
    from bgflow_tpu.models.polyala import make_polyala_generator
    import optax

    blob = np.load(os.path.join(ART, f"polyala{n_res}_data.npz"))
    data = blob["data"]
    log_w = blob["log_weights"] if "log_weights" in blob.files else None
    gen = make_polyala_generator(
        n_res, data, use_pallas_spline=True, marginals_from="data",
        torsion_cross_couplings=4, hidden=(256, 256), num_bins=16,
    )
    params = gen.init(jax.random.PRNGKey(0))
    trainer = bg.KLTrainer(
        gen, train_energy=False,
        optimizer=optax.adam(optax.cosine_decay_schedule(1e-3, n_iter, 1e-2)),
    )
    sampler = bg.DataSetSampler(jnp.asarray(data), log_weights=(
        None if log_w is None else jnp.asarray(log_w)))
    params, opt_state, reporter = trainer.train(
        params, jax.random.PRNGKey(1), n_iter, data=sampler,
        batchsize=batch, scan_chunk=1000, progress_interval=1,
        checkpoint_dir=os.path.join(ART, f"polyala{n_res}_ckpt"),
    )
    print("final loss:", reporter.losses()[0][-20:].mean(), flush=True)


def eval_phase(n_res, n_eval=50000):
    import bgflow_tpu as bg
    from bgflow_tpu.models.polyala import make_polyala_generator
    from bgflow_tpu.utils.checkpoint import restore_checkpoint

    data = np.load(os.path.join(ART, f"polyala{n_res}_data.npz"))["data"]
    gen = make_polyala_generator(
        n_res, data, use_pallas_spline=True, marginals_from="data",
        torsion_cross_couplings=4, hidden=(256, 256), num_bins=16,
    )
    params = restore_checkpoint(os.path.join(ART, f"polyala{n_res}_ckpt"))["params"]
    out = gen.sample(params, jax.random.PRNGKey(7), n_eval, with_log_weights=True)
    lw = out.log_weights
    finite = jnp.isfinite(lw)
    ess = float(bg.effective_sample_size(jnp.where(finite, lw, -jnp.inf)))
    res = {
        "n_res": n_res,
        "n_eval": n_eval,
        "ess": ess,
        "sampling_efficiency_pct": 100.0 * ess / n_eval,
        "logw_std": float(jnp.std(jnp.where(finite, lw, jnp.nan), where=finite)),
        "frac_nonfinite_logw": float(1.0 - jnp.mean(finite.astype(jnp.float32))),
        "mean_energy_model_samples": float(
            jnp.mean(gen.target.energy(out.xs[0][:4096]))
        ),
        "mean_energy_data": float(
            jnp.mean(gen.target.energy(jnp.asarray(data[:4096])))
        ),
    }
    path = os.path.join(ART, f"polyala{n_res}.json")
    with open(path, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res, indent=1), flush=True)


if __name__ == "__main__":
    phase = sys.argv[1] if len(sys.argv) > 1 else "all"
    n_res = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    if phase in ("data", "all"):
        data_phase(n_res)
    if phase in ("train", "all"):
        train_phase(n_res)
    if phase in ("eval", "all"):
        eval_phase(n_res)
