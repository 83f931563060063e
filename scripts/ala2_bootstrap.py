"""The NeuTra data bootstrap, closed end-to-end on alanine dipeptide.

Loop: trained flagship -> neutra_sample regenerates an exact-Boltzmann
ensemble through it -> a fresh generator trains on those frames -> compare
sampling efficiency against an identical model trained on the ORIGINAL
(umbrella-augmented, MBAR-weighted) dataset.

What this answers: can the bootstrap replace the umbrella machinery for
data generation once one good model exists?  The NeuTra set needs no
umbrella windows, no MBAR, and no reweighting — frames are unweighted
Boltzmann draws wherever the chains mix (which the trained flow makes
easy: artifacts/ala2_neutra.json measured a 10x larger stable step).

Run (CPU ok, ~1.5 h at the default reduced scale):
    python scripts/ala2_bootstrap.py [n_iter] [batch]
Writes artifacts/ala2_bootstrap.json (+ ala2_neutra_data.npz).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bgflow_tpu.utils.backend import ensure_reachable_backend

ensure_reachable_backend()
import jax
import jax.numpy as jnp

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts")
NEUTRA_DATA = os.path.join(ART, "ala2_neutra_data.npz")


def _flagship(data):
    from bgflow_tpu.models.ala2 import make_ala2_generator

    return make_ala2_generator(
        data, hidden=(128, 128), num_bins=8, keepdims=9,
        use_pallas_spline=jax.default_backend() == "tpu",
    )


def generate(n_samples=131072, n_chains=256):
    import bgflow_tpu as bg
    from bgflow_tpu.energies.ala2 import ALA2_FIXED_ATOMS, ALA2_REFERENCE_XYZ
    from bgflow_tpu.ops.geometry import kabsch_align
    from bgflow_tpu.utils.checkpoint import restore_checkpoint

    data = np.load(os.path.join(ART, "ala2_train_data.npz"))["data"]
    gen = _flagship(data)
    params = restore_checkpoint(
        os.path.join(ART, "ala2_ckpt"), template=gen.init(jax.random.PRNGKey(0))
    )
    x0 = jnp.asarray(data[:: max(1, len(data) // n_chains)][:n_chains])
    t0 = time.time()
    res = bg.neutra_sample(
        gen, params, jax.random.PRNGKey(31), n_samples, n_chains=n_chains,
        x0=x0, n_burnin=200, stride=2, n_leapfrog=10,
    )
    frames = np.asarray(res.xs[0])
    ref = jnp.asarray(ALA2_REFERENCE_XYZ, jnp.float32)
    aligned = []
    for i in range(0, frames.shape[0], 16384):
        chunk = jnp.asarray(frames[i : i + 16384], jnp.float32).reshape(-1, 22, 3)
        aligned.append(np.asarray(kabsch_align(chunk, ref, atoms=ALA2_FIXED_ATOMS)))
    frames = np.concatenate(aligned, axis=0).reshape(-1, 66)
    np.savez_compressed(NEUTRA_DATA, data=frames, step_size=res.step_size)
    print(f"neutra data: {frames.shape} in {time.time()-t0:.0f}s, "
          f"step {res.step_size:.3g}, accept~{res.acceptance:.2f}", flush=True)
    return frames


def train_and_eval(tag, data, log_w, n_iter, batch, n_eval=50000):
    import bgflow_tpu as bg
    import optax

    gen = _flagship(data)
    params = gen.init(jax.random.PRNGKey(0))
    trainer = bg.KLTrainer(
        gen, train_energy=False,
        optimizer=optax.adam(optax.cosine_decay_schedule(1e-3, n_iter, 1e-2)),
    )
    sampler = bg.DataSetSampler(
        jnp.asarray(data),
        log_weights=None if log_w is None else jnp.asarray(log_w),
    )
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
    res = {
        "n_frames": int(len(data)),
        "weighted": log_w is not None,
        "final_nll": float(reporter.losses()[0][-20:].mean()),
        "ess": ess,
        "sampling_efficiency_pct": 100.0 * ess / n_eval,
        "logw_std": float(jnp.std(jnp.where(finite, lw, jnp.nan), where=finite)),
        "train_seconds": round(t_train, 1),
    }
    print(f"{tag:>10}: eff {res['sampling_efficiency_pct']:.2f}%  "
          f"logw_std {res['logw_std']:.1f}  NLL {res['final_nll']:.1f}  "
          f"({t_train:.0f}s)", flush=True)
    return res


def main():
    n_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    out_path = os.path.join(ART, "ala2_bootstrap.json")
    results = {"n_iter": n_iter, "batch": batch, "variants": {}}
    if os.path.exists(out_path):
        prev = json.load(open(out_path))
        if prev.get("n_iter") == n_iter and prev.get("batch") == batch:
            results["variants"].update(prev.get("variants", {}))

    if os.path.exists(NEUTRA_DATA):
        neutra = np.load(NEUTRA_DATA)["data"]
    else:
        neutra = generate()

    if "original" not in results["variants"]:
        blob = np.load(os.path.join(ART, "ala2_train_data.npz"))
        results["variants"]["original"] = train_and_eval(
            "original", blob["data"], blob["log_weights"], n_iter, batch
        )
        json.dump(results, open(out_path, "w"), indent=1)
    if "neutra" not in results["variants"]:
        results["variants"]["neutra"] = train_and_eval(
            "neutra", neutra, None, n_iter, batch
        )
        json.dump(results, open(out_path, "w"), indent=1)


if __name__ == "__main__":
    main()
