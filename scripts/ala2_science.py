"""Flagship science driver: exact data -> trained spline BG -> ESS / free energy.

Phased and resumable (each phase writes an artifact under artifacts/):

  phase data   — HMC + replica-exchange exact-Boltzmann ala2 ensemble
  phase train  — NLL pretrain + mixed NLL/KL annealing on the spline BG
  phase eval   — ESS, log-weight stats, phi-basin occupancy, basin dF via
                 BG reweighting vs umbrella+MBAR

Run on the TPU (ambient env):  python scripts/ala2_science.py <phase>
"""
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts")
os.makedirs(ART, exist_ok=True)

DATA_PATH = os.path.join(ART, "ala2_exact_data.npz")
PARAMS_PATH = os.path.join(ART, "ala2_params.npz")
RESULTS_PATH = os.path.join(ART, "ala2_science.json")
UMBRELLA_PATH = os.path.join(ART, "ala2_umbrella.npz")
TRAIN_DATA_PATH = os.path.join(ART, "ala2_train_data.npz")


def phi_psi(frames):
    from bgflow_tpu.ops.ic import torsion

    x = frames.reshape(-1, 22, 3)
    phi = torsion(x[:, 4], x[:, 6], x[:, 8], x[:, 14], 1e-7)
    psi = torsion(x[:, 6], x[:, 8], x[:, 14], x[:, 16], 1e-7)
    return phi, psi


N_PMF_BINS = 36


def pmf_phi(phi, log_w=None, n_bins=N_PMF_BINS):
    """Weighted PMF F(phi)/kT over [-pi, pi) bins (min-shifted; NaN = empty)."""
    phi = np.asarray(phi)
    edges = np.linspace(-np.pi, np.pi, n_bins + 1)
    if log_w is None:
        w = np.ones_like(phi)
    else:
        log_w = np.asarray(log_w)
        finite = np.isfinite(log_w)
        phi, log_w = phi[finite], log_w[finite]
        w = np.exp(log_w - log_w.max())
    hist, _ = np.histogram(phi, bins=edges, weights=w)
    counts, _ = np.histogram(phi, bins=edges)
    p = hist / hist.sum()
    f = np.where(p > 0, -np.log(np.maximum(p, 1e-300)), np.nan)
    return f - np.nanmin(f), counts


def gen_data(n_samples=131072, n_ladders=128, seed=0):
    from bgflow_tpu.models.ala2 import generate_ala2_data_exact

    print("gen_data: starting", flush=True)
    t0 = time.time()
    # ladder spacing ~1.2x: for ~60 effective dof the exchange acceptance
    # collapses beyond 1 + sqrt(2/D) ~ 1.18 spacing (a 1.6x ladder swapped
    # essentially never and the cold rungs stayed kinetically trapped)
    data = generate_ala2_data_exact(
        jax.random.PRNGKey(seed),
        n_samples=n_samples,
        n_ladders=n_ladders,
        temperatures=tuple(1.2**i for i in range(8)),
        step_size=2.5e-3,
        n_leapfrog=20,
        n_burnin=400,
        stride=10,
    )
    data = np.asarray(data)
    phi, psi = phi_psi(jnp.asarray(data))
    stats = {
        "phi_pos_frac": float(jnp.mean(phi > 0.2)),
        "phi_deg_pcts": [float(v) for v in np.percentile(np.degrees(np.asarray(phi)), [1, 25, 50, 75, 99])],
        "psi_deg_pcts": [float(v) for v in np.percentile(np.degrees(np.asarray(psi)), [1, 25, 50, 75, 99])],
        "psi_upper_frac": float(jnp.mean((psi > 0.7) & (psi < 2.97))),
    }
    print(f"data: {data.shape} in {time.time()-t0:.0f}s; {json.dumps(stats)}", flush=True)
    np.savez_compressed(DATA_PATH, data=data)
    return data


def train(n_pretrain=6000, n_anneal=30000, seed=1, batch=1024):
    import optax
    from bgflow_tpu.models.ala2 import make_ala2_generator
    from bgflow_tpu.training.trainers import KLTrainer
    from bgflow_tpu.samplers.dataset import DataSetSampler
    from bgflow_tpu.utils.checkpoint import (
        latest_step, restore_checkpoint, save_checkpoint,
    )

    raw = np.load(DATA_PATH)["data"]
    n_test = 8192
    data, test = raw[:-n_test], raw[-n_test:]
    gen = make_ala2_generator(
        data, hidden=(128, 128), num_bins=8, keepdims=9, use_pallas_spline=True
    )
    key = jax.random.PRNGKey(seed)
    params = gen.init(key)
    ds = DataSetSampler(jnp.asarray(data))
    pre_dir = os.path.join(ART, "ala2_pretrain_ckpt")
    ann_dir = os.path.join(ART, "ala2_anneal_ckpt")

    # ---- NLL pretraining with cosine LR (resumable at phase granularity)
    trainer = KLTrainer(
        gen,
        optimizer=optax.adam(optax.cosine_decay_schedule(1e-3, n_pretrain, 1e-2)),
        train_energy=False,
    )
    pre_step = latest_step(pre_dir)
    if pre_step is not None and pre_step >= n_pretrain:
        tmpl = {"params": params, "opt_state": trainer.init(params), "step": 0}
        params = restore_checkpoint(pre_dir, template=tmpl)["params"]
        print(f"pretrain: reusing finished checkpoint (step {pre_step})", flush=True)
    else:
        t0 = time.time()
        params, _, rep = trainer.train(
            params, key, n_pretrain, data=ds, batchsize=batch,
            test_data=test, test_interval=1000, progress_interval=1000,
            checkpoint_dir=pre_dir, checkpoint_interval=2000,
        )
        print(f"pretrain {n_pretrain} it in {time.time()-t0:.0f}s", flush=True)

    # ---- mixed annealing: ramp KL weight in, lower LR (step-resumable)
    trainer2 = KLTrainer(
        gen,
        optimizer=optax.adam(optax.cosine_decay_schedule(2e-4, n_anneal, 1e-2)),
    )
    w_energy = optax.linear_schedule(0.0, 1.0, transition_steps=n_anneal // 2)
    opt2, start = None, 0
    ann_step = latest_step(ann_dir)
    if ann_step:
        tmpl = {"params": params, "opt_state": trainer2.init(params), "step": 0}
        st = restore_checkpoint(ann_dir, template=tmpl)
        params, opt2, start = st["params"], st["opt_state"], int(st["step"])
        print(f"anneal: resuming from step {start}", flush=True)
    if start < n_anneal:
        t0 = time.time()
        params, _, rep2 = trainer2.train(
            params, jax.random.fold_in(key, 1 + start), n_anneal - start,
            data=ds, opt_state=opt2, batchsize=batch,
            n_kl_samples=batch, w_energy=w_energy,
            test_data=test, test_interval=2000, progress_interval=2000,
            checkpoint_dir=ann_dir, checkpoint_interval=2000, start_step=start,
        )
        print(f"anneal {n_anneal - start} it in {time.time()-t0:.0f}s", flush=True)

    save_checkpoint(os.path.join(ART, "ala2_ckpt"), n_pretrain + n_anneal, params)
    _save_stats(gen)
    print("saved params")
    return params


def train_augmented(n_pretrain=12000, n_anneal=0, seed=4, batch=1024,
                    c7ax_mass=0.03, umbrella_neg_mass=0.07):
    """Retrain with umbrella-window frames mixed in (weighted NLL).

    The C7ax basin (phi > 0.2) has ~1e-5 Boltzmann weight (umbrella+MBAR:
    dF = -11.6 kT), so a Boltzmann-faithful model would need ~1e5 samples
    per C7ax hit — useless for estimating the basin dF by reweighting.
    Instead we train the model on a *mixture*: (1 - a - b) exact-Boltzmann
    data + a x C7ax-conditional ensemble + b x MBAR-unbiased umbrella
    frames, with a = c7ax_mass a few percent.  The model then deliberately
    OVERSAMPLES the rare basin; importance reweighting (which uses the
    model's actual density) corrects the estimate exactly, at a ~a cost in
    overall sampling efficiency.  Minibatches are drawn ∝ weight via
    DataSetSampler log_weights (= weighted NLL in expectation).

    The umbrella frames MUST be Kabsch-aligned onto the same reference as
    the exact data before mixing: the PCA-whitened fixed-atom channel only
    models internal fluctuations, and unaligned poses blow it up (measured:
    logw_std 228 and 0.0015% efficiency unaligned vs aligned parity with
    the exact-data model).  Annealing defaults to OFF — checkpoint ESS
    diagnostics showed the reverse-KL term mode-narrows a data-rich model
    (16.2% -> 0.07% efficiency on the non-augmented flagship).
    """
    import optax
    from bgflow_tpu.models.ala2 import make_ala2_generator
    from bgflow_tpu.ops.geometry import kabsch_align
    from bgflow_tpu.energies.ala2 import ALA2_REFERENCE_XYZ, ALA2_FIXED_ATOMS
    from bgflow_tpu.training.trainers import KLTrainer
    from bgflow_tpu.samplers.dataset import DataSetSampler
    from bgflow_tpu.utils.checkpoint import latest_step, restore_checkpoint, save_checkpoint

    raw = np.load(DATA_PATH)["data"]
    n_test = 8192
    data, test = raw[:-n_test], raw[-n_test:]
    umb = np.load(UMBRELLA_PATH)
    frames, cv, logw = umb["frames"], umb["cv"].astype(np.float64), umb["log_weights"].astype(np.float64)
    frames = np.asarray(
        kabsch_align(
            jnp.asarray(frames, jnp.float32).reshape(-1, 22, 3),
            jnp.asarray(ALA2_REFERENCE_XYZ, jnp.float32),
            atoms=ALA2_FIXED_ATOMS,
        )
    ).reshape(-1, 66)

    def _lse(a):
        m = a.max()
        return m + np.log(np.exp(a - m).sum())

    pos = cv > 0.2
    lw_pos = logw[pos] - _lse(logw[pos]) + np.log(c7ax_mass)
    lw_neg = logw[~pos] - _lse(logw[~pos]) + np.log(umbrella_neg_mass)
    exact_mass = 1.0 - c7ax_mass - umbrella_neg_mass
    X = np.concatenate([data, frames[pos], frames[~pos]]).astype(np.float32)
    lw = np.concatenate([
        np.full(len(data), np.log(exact_mass / len(data))),
        lw_pos,
        lw_neg,
    ]).astype(np.float32)
    np.savez_compressed(TRAIN_DATA_PATH, data=X, log_weights=lw)
    gen = make_ala2_generator(
        X, hidden=(128, 128), num_bins=8, keepdims=9, use_pallas_spline=True
    )
    key = jax.random.PRNGKey(seed)
    params = gen.init(key)
    ds = DataSetSampler(jnp.asarray(X), log_weights=jnp.asarray(lw))
    pre_dir = os.path.join(ART, "ala2_aug_pretrain_ckpt")
    ann_dir = os.path.join(ART, "ala2_aug_anneal_ckpt")
    # checkpoints from a previous augment recipe (different data/steps) are
    # not resumable into this one — start clean
    import shutil

    for d in (pre_dir, ann_dir):
        step = latest_step(d)
        if step is not None and step != n_pretrain and os.path.isdir(d):
            shutil.rmtree(d)

    trainer = KLTrainer(
        gen,
        optimizer=optax.adam(optax.cosine_decay_schedule(1e-3, n_pretrain, 1e-2)),
        train_energy=False,
    )
    pre_step = latest_step(pre_dir)
    if pre_step is not None and pre_step >= n_pretrain:
        tmpl = {"params": params, "opt_state": trainer.init(params), "step": 0}
        params = restore_checkpoint(pre_dir, template=tmpl)["params"]
        print(f"aug pretrain: reusing finished checkpoint (step {pre_step})", flush=True)
    else:
        t0 = time.time()
        params, _, _ = trainer.train(
            params, key, n_pretrain, data=ds, batchsize=batch,
            test_data=test, test_interval=1000, progress_interval=1000,
            checkpoint_dir=pre_dir, checkpoint_interval=2000,
            scan_chunk=2000,  # on-device loop: ~1.2k steps/s vs ~40/s dispatched
        )
        print(f"aug pretrain {n_pretrain} it in {time.time()-t0:.0f}s", flush=True)

    if n_anneal:
        trainer2 = KLTrainer(
            gen,
            optimizer=optax.adam(optax.cosine_decay_schedule(2e-4, n_anneal, 1e-2)),
        )
        w_energy = optax.linear_schedule(0.0, 1.0, transition_steps=n_anneal // 2)
        opt2, start = None, 0
        ann_step = latest_step(ann_dir)
        if ann_step:
            tmpl = {"params": params, "opt_state": trainer2.init(params), "step": 0}
            st = restore_checkpoint(ann_dir, template=tmpl)
            params, opt2, start = st["params"], st["opt_state"], int(st["step"])
            print(f"aug anneal: resuming from step {start}", flush=True)
        if start < n_anneal:
            t0 = time.time()
            params, _, _ = trainer2.train(
                params, jax.random.fold_in(key, 1 + start), n_anneal - start,
                data=ds, opt_state=opt2, batchsize=batch,
                n_kl_samples=batch, w_energy=w_energy,
                test_data=test, test_interval=2000, progress_interval=2000,
                checkpoint_dir=ann_dir, checkpoint_interval=2000, start_step=start,
            )
            print(f"aug anneal {n_anneal - start} it in {time.time()-t0:.0f}s", flush=True)

    # monotone step id: generation 2 of the augmented recipe (aligned
    # umbrella frames, NLL-only) — must exceed every previously saved step
    # so evaluate()'s latest-step restore picks it up
    save_checkpoint(os.path.join(ART, "ala2_ckpt"), 2 * 10**6 + n_pretrain + n_anneal, params)
    _save_stats(gen)
    print("saved params (augmented)")
    return params


def _save_stats(gen):
    """Persist the data-derived model constants next to the checkpoint so
    evaluate() can rebuild the EXACT generator without the original npz
    (whitening PCA + IC marginals are data-derived; a regenerated dataset
    is statistically but not bit-identical)."""
    import shutil
    from bgflow_tpu.utils.checkpoint import save_checkpoint

    d = os.path.join(ART, "ala2_ckpt_stats")
    if os.path.isdir(d):
        shutil.rmtree(d)
    save_checkpoint(d, 0, gen.data_statistics)


def _load_stats():
    from bgflow_tpu.utils.checkpoint import restore_checkpoint

    d = os.path.join(ART, "ala2_ckpt_stats")
    return restore_checkpoint(d) if os.path.isdir(d) else None


def _load_params(gen):
    from bgflow_tpu.utils.checkpoint import restore_checkpoint

    template = gen.init(jax.random.PRNGKey(0))
    return restore_checkpoint(os.path.join(ART, "ala2_ckpt"), template=template)


def evaluate(n_eval=100_000, seed=2):
    import bgflow_tpu as bg
    from bgflow_tpu.models.ala2 import make_ala2_generator

    stats = _load_stats()
    if stats is not None:
        data = None  # constants restored; dataset not needed
    elif os.path.exists(TRAIN_DATA_PATH):
        # augmented run: generator must be rebuilt from the SAME dataset the
        # training used (PCA whitening + IC marginals are data-derived)
        data = np.load(TRAIN_DATA_PATH)["data"]
    else:
        data = np.load(DATA_PATH)["data"][:-8192]
    gen = make_ala2_generator(
        data, hidden=(128, 128), num_bins=8, keepdims=9, use_pallas_spline=True,
        statistics=stats,
    )
    params = _load_params(gen)
    key = jax.random.PRNGKey(seed)

    out = gen.sample(params, key, n_eval, with_log_weights=True)
    logw = out.log_weights
    finite = jnp.isfinite(logw)
    ess = float(bg.effective_sample_size(logw))
    eff = ess / n_eval
    x = out.xs[0]
    phi, psi = phi_psi(x)
    phi_d = None if data is None else phi_psi(jnp.asarray(data))[0]

    # basin split at phi = 0.2 rad (between C7eq/alphaR at phi<0 and C7ax)
    def basin_stats(phi_arr, logw_arr=None):
        pos = phi_arr > 0.2
        if logw_arr is None:
            return float(jnp.mean(pos))
        # importance-weighted occupancy
        w = jnp.exp(logw_arr - jnp.max(logw_arr))
        return float(jnp.sum(w * pos) / jnp.sum(w))

    results = {
        "n_eval": n_eval,
        "ess": ess,
        "sampling_efficiency_pct": 100.0 * eff,
        "logw_std": float(jnp.std(logw[finite])),
        "frac_nonfinite_logw": float(1.0 - jnp.mean(finite)),
        "phi_pos_frac_model": basin_stats(phi),
        "phi_pos_frac_model_reweighted": basin_stats(phi, logw),
        "phi_pos_frac_data": None if phi_d is None else basin_stats(phi_d),
        "mean_energy_model_samples": float(jnp.mean(gen.target.energy(x[:20000]))),
    }
    # basin free-energy difference from reweighted BG samples (host f64);
    # MC error from per-basin importance-weight ESS:
    #   var(log ratio) ~ 1/ESS_pos + 1/ESS_neg  (self-normalized IS)
    logw64 = np.asarray(logw, np.float64)
    phi64 = np.asarray(phi, np.float64)
    w64 = np.exp(logw64 - logw64.max())
    pos = phi64 > 0.2
    s_pos, s_neg = w64[pos].sum(), w64[~pos].sum()
    if s_pos > 0 and s_neg > 0:
        results["dF_basins_bg_kt"] = float(np.log(s_pos / s_neg))
        ess_pos = s_pos**2 / max((w64[pos] ** 2).sum(), 1e-300)
        ess_neg = s_neg**2 / max((w64[~pos] ** 2).sum(), 1e-300)
        results["ess_basin_pos"] = float(ess_pos)
        results["ess_basin_neg"] = float(ess_neg)
        results["dF_bg_err_kt"] = float(np.sqrt(1.0 / ess_pos + 1.0 / ess_neg))
        results["n_model_samples_pos"] = int(pos.sum())
    # full F(phi) profile from reweighted BG samples (compared against the
    # umbrella+MBAR profile by the umbrella phase)
    f_bg, counts = pmf_phi(phi, logw)
    results["pmf_phi_bg_kt"] = [None if np.isnan(v) else round(float(v), 4) for v in f_bg]
    results["pmf_phi_bg_counts"] = [int(c) for c in counts]
    print(json.dumps(results, indent=1))
    existing = json.load(open(RESULTS_PATH)) if os.path.exists(RESULTS_PATH) else {}
    existing.update(results)
    with open(RESULTS_PATH, "w") as fh:
        json.dump(existing, fh, indent=1)
    return results


def compare():
    """Recompute the umbrella-side dF / PMF from the saved umbrella ensemble
    (artifacts/ala2_umbrella.npz) and the BG-vs-umbrella agreement stats,
    without re-running the umbrella sampling.  Run after `eval`."""
    umb = np.load(UMBRELLA_PATH)
    cv = umb["cv"].astype(np.float64)
    logw = umb["log_weights"].astype(np.float64)

    def basin_df(c, lw):
        w = np.exp(lw - lw.max())
        p = (w * (c > 0.2)).sum() / w.sum()
        return float(np.log(p / (1 - p)))

    n_blocks = 5
    size = len(cv) // n_blocks
    dfs = [
        basin_df(cv[i * size : (i + 1) * size], logw[i * size : (i + 1) * size])
        for i in range(n_blocks)
    ]
    f_umb, counts_umb = pmf_phi(cv, logw)
    out = {
        "dF_basins_umbrella_kt": basin_df(cv, logw),
        "dF_umbrella_err_kt": float(np.std(dfs) / np.sqrt(n_blocks)),
        "dF_blocks": dfs,
        "pmf_phi_umbrella_kt": [None if np.isnan(v) else round(float(v), 4) for v in f_umb],
    }
    existing = json.load(open(RESULTS_PATH)) if os.path.exists(RESULTS_PATH) else {}
    if "pmf_phi_bg_kt" in existing:
        f_bg = np.array([np.nan if v is None else v for v in existing["pmf_phi_bg_kt"]])
        n_bg = np.array(existing["pmf_phi_bg_counts"])
        ok = np.isfinite(f_bg) & np.isfinite(f_umb) & (n_bg >= 50) & (counts_umb >= 50)
        if ok.any():
            diff = f_bg[ok] - f_umb[ok]
            diff -= diff.mean()
            out["pmf_phi_agreement_bins"] = int(ok.sum())
            out["pmf_phi_rmsd_kt"] = round(float(np.sqrt(np.mean(diff**2))), 4)
            out["pmf_phi_maxdev_kt"] = round(float(np.max(np.abs(diff))), 4)
        # headline consistency check: |dF_bg - dF_umb| vs mutual MC error
        if "dF_basins_bg_kt" in existing:
            dev = existing["dF_basins_bg_kt"] - out["dF_basins_umbrella_kt"]
            sig = np.sqrt(existing.get("dF_bg_err_kt", 0.0) ** 2 + out["dF_umbrella_err_kt"] ** 2)
            out["dF_deviation_kt"] = round(float(dev), 4)
            out["dF_mutual_err_kt"] = round(float(sig), 4)
            out["dF_within_mutual_error"] = bool(abs(dev) <= 2 * sig)
    print(json.dumps(out, indent=1))
    existing.update(out)
    with open(RESULTS_PATH, "w") as fh:
        json.dump(existing, fh, indent=1)
    return out


def umbrella(n_iterations=600, n_windows=24, k_umbrella=50.0, seed=3):
    """phi-basin dF via umbrella sampling + MBAR (the BG-independent
    reference estimate the reweighted BG must match)."""
    from bgflow_tpu.energies.ala2 import ALA2_REFERENCE_XYZ, build_ala2_forcefield
    from bgflow_tpu.models.ala2 import ALA2_MASSES
    from bgflow_tpu.ops.ic import torsion
    from bgflow_tpu.samplers.umbrella import UmbrellaSampling

    ff = build_ala2_forcefield()

    def cv(x):
        p = x.reshape(-1, 22, 3)
        return torsion(p[:, 4], p[:, 6], p[:, 8], p[:, 14], 1e-7)

    centers = jnp.linspace(-np.pi, np.pi, n_windows, endpoint=False)
    masses = jnp.asarray(np.repeat(ALA2_MASSES, 3) / ALA2_MASSES.min())
    us = UmbrellaSampling(
        ff, cv, centers, k_umbrella=k_umbrella, cv_period=2 * np.pi,
        mover="hmc", hmc_step_size=2e-3, hmc_leapfrog=10, masses=masses,
        stride=10, n_burnin=400,
    )
    if os.path.exists(DATA_PATH):
        # seed each window with the exact-ensemble frame nearest its center:
        # windows then start equilibrated in the orthogonal (psi etc.) dofs
        frames = jnp.asarray(np.load(DATA_PATH)["data"])
        phis = cv(frames)
        d = jnp.abs(jnp.mod(phis[None, :] - centers[:, None] + np.pi, 2 * np.pi) - np.pi)
        x0 = frames[jnp.argmin(d, axis=1)]
    else:
        x0 = jnp.repeat(
            jnp.asarray(ALA2_REFERENCE_XYZ, dtype=jnp.float32).reshape(1, -1),
            n_windows, axis=0,
        )
    t0 = time.time()
    samples = us.run(jax.random.PRNGKey(seed), x0, n_iterations)
    print(f"umbrella: {samples.shape} in {time.time()-t0:.0f}s")
    # persist frames + MBAR-unbiased log-weights: the augment phase trains
    # the BG on these (weighted NLL via DataSetSampler log_weights) so both
    # phi basins get support even when the unbiased ensemble never crossed
    cv_vals, log_w = us.unbiased_log_weights(samples)
    np.savez_compressed(
        UMBRELLA_PATH,
        frames=np.asarray(samples.reshape(-1, samples.shape[-1])),
        cv=np.asarray(cv_vals),
        log_weights=np.asarray(log_w),
    )

    def basin_df(block):
        cv_vals, log_w = us.unbiased_log_weights(block)
        w = jnp.exp(log_w - jnp.max(log_w))
        p = jnp.sum(w * (cv_vals > 0.2)) / jnp.sum(w)
        return float(jnp.log(p / (1 - p)))

    df_full = basin_df(samples)
    # block uncertainty over the iteration axis
    n_blocks = 5
    size = samples.shape[0] // n_blocks
    dfs = [basin_df(samples[i * size : (i + 1) * size]) for i in range(n_blocks)]
    err = float(np.std(dfs) / np.sqrt(n_blocks))
    cv_all, log_w_all = us.unbiased_log_weights(samples)
    f_umb, counts_umb = pmf_phi(cv_all, log_w_all)
    out = {
        "dF_basins_umbrella_kt": df_full,
        "dF_umbrella_err_kt": err,
        "dF_blocks": dfs,
        "window_cv_coverage": [float(c) for c in np.percentile(
            np.asarray(us.cv(samples.reshape(-1, 66))), [0, 5, 50, 95, 100])],
        "pmf_phi_umbrella_kt": [None if np.isnan(v) else round(float(v), 4) for v in f_umb],
    }
    # PMF agreement vs the BG-reweighted profile, if the eval phase ran
    existing_now = json.load(open(RESULTS_PATH)) if os.path.exists(RESULTS_PATH) else {}
    if "pmf_phi_bg_kt" in existing_now:
        f_bg = np.array([np.nan if v is None else v for v in existing_now["pmf_phi_bg_kt"]])
        n_bg = np.array(existing_now["pmf_phi_bg_counts"])
        ok = np.isfinite(f_bg) & np.isfinite(f_umb) & (n_bg >= 50) & (counts_umb >= 50)
        if ok.any():
            # profiles are min-shifted independently; compare after aligning
            # on the weighted-mean offset over the shared well bins
            diff = f_bg[ok] - f_umb[ok]
            diff -= diff.mean()
            out["pmf_phi_agreement_bins"] = int(ok.sum())
            out["pmf_phi_rmsd_kt"] = round(float(np.sqrt(np.mean(diff**2))), 4)
            out["pmf_phi_maxdev_kt"] = round(float(np.max(np.abs(diff))), 4)
    print(json.dumps(out, indent=1))
    existing = {}
    if os.path.exists(RESULTS_PATH):
        existing = json.load(open(RESULTS_PATH))
    existing.update(out)
    with open(RESULTS_PATH, "w") as fh:
        json.dump(existing, fh, indent=1)
    return out


if __name__ == "__main__":
    phase = sys.argv[1] if len(sys.argv) > 1 else "all"
    if phase in ("data", "all"):
        gen_data()
    if phase in ("train", "all"):
        train()
    if phase == "augment":
        train_augmented()
    if phase in ("eval", "all"):
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
        evaluate(n_eval=n)
    if phase in ("umbrella", "all"):
        umbrella()
    if phase == "compare":
        compare()
