"""End-to-end poly-alanine BG demo on TPU: the generic scale-up family.

Phases (each writes/extends artifacts/polyala{N}.json + checkpoints):

  data     — HMC + replica-exchange exact-Boltzmann ensemble
  umbrella — per-backbone-dihedral umbrella sweeps (phi_i and psi_i of every
             residue) run as ONE masked-CV batch with a joint MBAR
  train    — weighted-NLL training of the spline BG (the recipe the ala2
             science closeout validated: NLL-only, aligned data); optional
             umbrella augmentation + learnable marginal layers
  neutra   — regenerate the ensemble with flow-preconditioned HMC through a
             trained checkpoint (bgflow_tpu.neutra_sample); `train --neutra`
             then trains on it (the data-quality bootstrap loop)
  eval     — sampling efficiency / log-weight statistics

Run:  python scripts/polyala_demo.py <phase> [n_res] [--augment] [--marginals] [--residue_ar] [--neutra]
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
# GBSA OBC-II implicit solvent for the whole pipeline (data/umbrella/model
# target).  Toggled by --gbsa, which also redirects ART to artifacts/gbsa so
# vacuum and solvated ensembles/checkpoints never mix.
IMPLICIT_SOLVENT = False
# --big: capacity rung (wider conditioners, more bins, more torsion
# cross-coupling rounds).  A module global like IMPLICIT_SOLVENT because it
# changes the architecture every phase must agree on.
BIG = False


def _tag(augment, marginals, residue_ar=False, neutra=False, lv=False,
         cold=False, tcond=False):
    return ("_aug" if augment else "") + ("_m" if marginals else "") + (
        "_ar" if residue_ar else "") + ("_nt" if neutra else "") + (
        "_lv" if lv else "") + ("_cold" if cold else "") + (
        "_tc" if tcond else "") + ("_big" if BIG else "")


def data_phase(n_res, n_samples=98304):
    from bgflow_tpu.models.polyala import generate_polyala_data_exact

    key = jax.random.PRNGKey(11)
    # all rungs + MBAR weights: the hot rungs cross barriers and MBAR
    # unbiases them to T=1 (coverage augmentation at zero extra cost)
    data, log_w = generate_polyala_data_exact(
        key, n_res, n_samples=n_samples, n_ladders=64, n_burnin=400,
        return_all_rungs=True, implicit_solvent=IMPLICIT_SOLVENT,
    )
    np.savez(
        os.path.join(ART, f"polyala{n_res}_data.npz"),
        data=np.asarray(data), log_weights=np.asarray(log_w),
        n_rungs=8, rung_base=1.15,
    )
    w = np.exp(np.asarray(log_w)); w /= w.sum()
    print(f"data: {data.shape}, weight-ESS {1.0/np.sum(w**2):.0f}", flush=True)


def umbrella_phase(n_res, n_windows=16, n_iterations=500, k_umbrella=40.0, seed=5):
    """One umbrella sweep over EVERY backbone dihedral, in one batch.

    Window (s, w) biases dihedral s toward center_w via a one-hot cv_mask;
    all S*n_windows windows advance together (HMC) and a single joint MBAR
    unbiases the pooled frames.  This is the per-dihedral enhanced-sampling
    augmentation the ALA3 quality analysis called for (ROADMAP)."""
    from bgflow_tpu.energies.peptide import (
        PEPTIDE_MASSES, backbone_dihedrals, build_peptide_topology,
        build_polyala_forcefield, polyala_z_matrix, polyala_reference_xyz,
    )
    from bgflow_tpu.ops.geometry import kabsch_align
    from bgflow_tpu.ops.ic import torsion
    from bgflow_tpu.samplers.umbrella import UmbrellaSampling

    seq = ["ACE"] + ["ALA"] * n_res + ["NME"]
    dihs = backbone_dihedrals(seq)
    quads = [d["phi"] for d in dihs] + [d["psi"] for d in dihs]
    names = [f"phi{d['residue']}" for d in dihs] + [f"psi{d['residue']}" for d in dihs]
    S = len(quads)
    atoms, _ = build_peptide_topology(seq)
    n_atoms = len(atoms)
    masses_amu = PEPTIDE_MASSES(atoms)
    masses = jnp.asarray(np.repeat(masses_amu, 3) / masses_amu.min())
    ff = build_polyala_forcefield(n_res, implicit_solvent=IMPLICIT_SOLVENT)
    qa = np.asarray(quads)  # (S, 4)

    def cv(x):
        p = x.reshape(-1, n_atoms, 3)
        return jnp.stack(
            [torsion(p[:, a], p[:, b], p[:, c], p[:, d], 1e-7) for a, b, c, d in qa],
            axis=-1,
        )  # (B, S)

    g = jnp.linspace(-jnp.pi, jnp.pi, n_windows, endpoint=False)
    centers = jnp.zeros((S * n_windows, S)).at[
        jnp.arange(S * n_windows), jnp.repeat(jnp.arange(S), n_windows)
    ].set(jnp.tile(g, S))
    mask = jnp.zeros((S * n_windows, S)).at[
        jnp.arange(S * n_windows), jnp.repeat(jnp.arange(S), n_windows)
    ].set(1.0)

    us = UmbrellaSampling(
        ff, cv, centers, k_umbrella=k_umbrella, cv_period=2 * np.pi,
        cv_mask=mask, mover="hmc", hmc_step_size=2e-3, hmc_leapfrog=10,
        masses=masses, stride=10, n_burnin=300,
    )
    # seed each window with the exact-data frame whose swept dihedral is
    # nearest the window center (equilibrated in the orthogonal dofs)
    data = np.load(os.path.join(ART, f"polyala{n_res}_data.npz"))["data"]
    pool = jnp.asarray(data[:: max(1, len(data) // 16384)])
    dih_pool = cv(pool)  # (P, S)
    sweep_of_window = np.repeat(np.arange(S), n_windows)
    cent = jnp.tile(g, S)
    d = jnp.abs(
        jnp.mod(dih_pool[:, sweep_of_window] - cent[None, :] + np.pi, 2 * np.pi)
        - np.pi
    )  # (P, K)
    x0 = pool[jnp.argmin(d, axis=0)]
    t0 = time.time()
    samples = us.run(jax.random.PRNGKey(seed), x0, n_iterations)
    print(f"umbrella: {samples.shape} in {time.time()-t0:.0f}s", flush=True)
    cv_vals, log_w = us.unbiased_log_weights(samples)

    frames = np.asarray(samples).reshape(-1, 3 * n_atoms)
    ref = jnp.asarray(polyala_reference_xyz(n_res), jnp.float32)
    _, fixed = polyala_z_matrix(n_res)
    aligned = []
    for i in range(0, frames.shape[0], 16384):
        chunk = jnp.asarray(frames[i : i + 16384], jnp.float32).reshape(-1, n_atoms, 3)
        aligned.append(np.asarray(kabsch_align(chunk, ref, atoms=fixed)))
    frames = np.concatenate(aligned, axis=0).reshape(-1, 3 * n_atoms)

    # frame (it, k) -> window k -> sweep k // n_windows; pooled order is
    # iteration-major (reshape of (n_iter, K, D))
    K = S * n_windows
    sweep_id = np.tile(np.repeat(np.arange(S), n_windows), samples.shape[0])
    np.savez_compressed(
        os.path.join(ART, f"polyala{n_res}_umbrella.npz"),
        frames=frames,
        cv=np.asarray(cv_vals),          # (N, S) all dihedrals of every frame
        log_weights=np.asarray(log_w),   # joint-MBAR unbiased (normalized)
        sweep_id=sweep_id,
        sweep_names=np.asarray(names),
    )
    w = np.exp(np.asarray(log_w) - np.max(np.asarray(log_w))); w /= w.sum()
    print(f"umbrella: {S} sweeps x {n_windows} windows, {frames.shape[0]} frames, "
          f"weight-ESS {1.0/np.sum(w**2):.0f}", flush=True)


def _augmented_training_set(n_res, umbrella_mass=0.25, n_bins=16,
                            include_exact=True):
    """Exact ensemble + umbrella frames with near-uniform per-dihedral
    coverage: each sweep gets umbrella_mass/S total mass, split equally over
    occupied cv bins, within-bin proportional to the joint-MBAR weights
    (locally Boltzmann, marginally flat — the coverage the learnable
    marginal layer needs to see).

    ``include_exact=False`` returns only the umbrella block (total mass
    ``umbrella_mass``) — for callers that mix the umbrella frames with a
    DIFFERENT base ensemble (e.g. the NeuTra bootstrap).  Slicing the
    combined return instead would be wrong: non-finite-weight rows are
    filtered, so block boundaries shift."""
    ub = np.load(os.path.join(ART, f"polyala{n_res}_umbrella.npz"))
    frames, cvs, logw, sweep_id = (
        ub["frames"], ub["cv"].astype(np.float64),
        ub["log_weights"].astype(np.float64), ub["sweep_id"],
    )
    S = int(sweep_id.max()) + 1
    edges = np.linspace(-np.pi, np.pi, n_bins + 1)
    parts_x, parts_lw = [], []
    if include_exact:
        blob = np.load(os.path.join(ART, f"polyala{n_res}_data.npz"))
        data, lw_data = blob["data"], blob["log_weights"].astype(np.float64)
        lw_data = lw_data - np.logaddexp.reduce(lw_data) + np.log(1.0 - umbrella_mass)
        parts_x.append(data)
        parts_lw.append(lw_data)
    for s in range(S):
        sel = sweep_id == s
        f_s, c_s, w_s = frames[sel], cvs[sel, s], logw[sel]
        which = np.clip(np.searchsorted(edges, c_s) - 1, 0, n_bins - 1)
        occupied = np.unique(which)
        mass_bin = umbrella_mass / (S * len(occupied))
        lw_s = np.full(len(f_s), -np.inf)
        for b in occupied:
            m = which == b
            lw_s[m] = w_s[m] - np.logaddexp.reduce(w_s[m]) + np.log(mass_bin)
        parts_x.append(f_s)
        parts_lw.append(lw_s)
    X = np.concatenate(parts_x).astype(np.float32)
    LW = np.concatenate(parts_lw).astype(np.float32)
    keep = np.isfinite(LW)
    return X[keep], LW[keep]


def _make_gen(n_res, data, marginals, residue_ar=False, use_pallas=None,
              statistics=None, tcond=False):
    from bgflow_tpu.models.polyala import make_polyala_generator

    if use_pallas is None:
        # fused Pallas kernels on TPU; on CPU the interpret-mode emulation
        # is far slower than the plain XLA path (numerics identical)
        use_pallas = jax.default_backend() == "tpu"
    return make_polyala_generator(
        n_res, data,
        use_pallas_spline=use_pallas,
        marginals_from="data",
        torsion_cross_couplings=6 if BIG else 4,
        hidden=(384, 384) if BIG else (256, 256),
        num_bins=24 if BIG else 16,
        learnable_marginals=marginals,
        torsion_scheme="residue_ar" if residue_ar else "even_odd",
        statistics=statistics,
        implicit_solvent=IMPLICIT_SOLVENT,
        temperature_conditioning=tcond,
    )


def _load_stats(ckpt_dir):
    """Data-derived model constants saved next to a checkpoint (if any).
    Older checkpoints predate this; None falls back to refitting from the
    dataset (correct as long as the npz files were not regenerated).

    A meta sidecar records which solvent model the checkpoint was trained
    against; restoring it under a mismatched IMPLICIT_SOLVENT global fails
    loudly instead of silently evaluating a GBSA checkpoint on the vacuum
    target (or vice versa)."""
    meta_path = ckpt_dir + "_stats_meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
        if bool(meta.get("implicit_solvent")) != bool(IMPLICIT_SOLVENT):
            raise RuntimeError(
                f"checkpoint {ckpt_dir} was trained with implicit_solvent="
                f"{meta.get('implicit_solvent')} but the pipeline is running "
                f"with IMPLICIT_SOLVENT={IMPLICIT_SOLVENT}"
            )
    d = ckpt_dir + "_stats"
    if os.path.isdir(d):
        from bgflow_tpu.utils.checkpoint import restore_checkpoint

        return restore_checkpoint(d)
    return None


def _save_stats(ckpt_dir, statistics):
    import shutil

    from bgflow_tpu.utils.checkpoint import save_checkpoint

    if os.path.isdir(ckpt_dir + "_stats"):
        shutil.rmtree(ckpt_dir + "_stats")
    save_checkpoint(ckpt_dir + "_stats", 0, statistics)
    with open(ckpt_dir + "_stats_meta.json", "w") as fh:
        json.dump({"implicit_solvent": bool(IMPLICIT_SOLVENT)}, fh)


def _neutra_data_path(n_res, augment, marginals, residue_ar):
    """NeuTra ensembles are tagged by the SOURCE checkpoint variant — each
    variant's bootstrap regenerates through a different flow, so the files
    must not overwrite each other."""
    return os.path.join(
        ART, f"polyala{n_res}_neutra{_tag(augment, marginals, residue_ar)}.npz")


def _filter_frozen_chains(data, energies):
    """Drop frames from chains that froze at a clash configuration.

    NeuTra chains started from a pathological frame can have ~0 acceptance
    (the polyala3 run left 4/512 chains stuck at u=1007 kT — 0.78% of the
    ensemble); NLL training on them teaches the flow a clash tail that
    destroys reweighting ESS.  Filter by a robust energy cutoff
    (median + 10 * robust sigma from the IQR)."""
    med = np.median(energies)
    iqr = np.quantile(energies, 0.75) - np.quantile(energies, 0.25)
    cutoff = med + 10.0 * (iqr / 1.349)
    keep = energies <= cutoff
    n_drop = int((~keep).sum())
    if n_drop:
        print(f"neutra filter: dropped {n_drop}/{len(keep)} frames above "
              f"{cutoff:.1f} kT (median {med:.1f})", flush=True)
    return data[keep]


def _training_set(n_res, augment, neutra, marginals=False, residue_ar=False,
                  cold=False):
    """The (data, log_weights) pair for a variant — deterministic, so eval
    can rebuild the exact generator (whitening/marginal statistics are
    data-derived) without re-saving large arrays.

    ``cold``: keep only the T=1 rung, unweighted — the recipe the ala2
    flagship's 10.7% efficiency came from (``ala2_science.py::gen_data``
    returns the cold rung only).  MBAR-weighted all-rung NLL concentrates
    the effective dataset (weight-ESS ~20% of frames) and the model
    over-sharpens around the high-weight frames: NLL keeps improving while
    reweighting ESS collapses (observed twice on ALA3: 24k-iter weighted
    runs at 0.004-0.006% vs 4k-iter at 0.2%)."""
    if cold:
        blob = np.load(os.path.join(ART, f"polyala{n_res}_data.npz"))
        data = blob["data"]
        k = int(blob["n_rungs"]) if "n_rungs" in blob.files else 8
        return data[np.arange(len(data)) % k == 0], None
    if neutra:
        # NeuTra-regenerated exact ensemble (uniform weights); optionally
        # still mixed with the umbrella augmentation frames
        path = _neutra_data_path(n_res, augment, marginals, residue_ar)
        blob = np.load(path)
        data = _filter_frozen_chains(blob["data"], blob["energies"])
        log_w = None
        if augment:
            # umbrella block only (the neutra frames supersede the old
            # exact ensemble): 75% neutra mass, 25% umbrella mass
            aug_x, aug_lw = _augmented_training_set(n_res, include_exact=False)
            lw0 = np.full(len(data), np.log(0.75 / len(data)), np.float32)
            aug_lw = aug_lw - np.logaddexp.reduce(aug_lw) + np.log(0.25)
            data = np.concatenate([data, aug_x]).astype(np.float32)
            log_w = np.concatenate([lw0, aug_lw]).astype(np.float32)
        return data, log_w
    if augment:
        return _augmented_training_set(n_res)
    blob = np.load(os.path.join(ART, f"polyala{n_res}_data.npz"))
    return blob["data"], (
        blob["log_weights"] if "log_weights" in blob.files else None)


def train_phase(n_res, n_iter=24000, batch=1024, augment=False, marginals=False,
                residue_ar=False, neutra=False, cold=False, tcond=False):
    """``tcond``: temperature-conditioned training — the model sees log(T)
    as a conditioner input and trains unweighted NLL on ALL ladder rungs at
    each frame's own rung temperature (every rung is an exact ensemble at
    its T, so no MBAR reweighting and no weight-concentration
    over-sharpening).  Evaluate at T=1 (or any T in the ladder range)."""
    import bgflow_tpu as bg
    import optax

    # a retrain REPLACES the variant's checkpoint: stale later-step dirs from
    # a previous run would otherwise shadow this run at restore-latest time
    # (and are inconsistent with freshly regenerated data anyway, because the
    # whitening/marginal constants are data-derived)
    import shutil

    ckpt_dir = os.path.join(
        ART, f"polyala{n_res}_ckpt{_tag(augment, marginals, residue_ar, neutra, cold=cold, tcond=tcond)}")
    if os.path.isdir(ckpt_dir):
        shutil.rmtree(ckpt_dir)

    temps = None
    if tcond:
        blob = np.load(os.path.join(ART, f"polyala{n_res}_data.npz"))
        data, log_w = blob["data"], None
        k = int(blob["n_rungs"]) if "n_rungs" in blob.files else 8
        base = float(blob["rung_base"]) if "rung_base" in blob.files else 1.15
        temps = (base ** (np.arange(len(data)) % k)).astype(np.float32)
        if neutra:
            # combined rung: NeuTra-regenerated T=1 frames (through the
            # baseline checkpoint) join the ladder as extra T=1 data
            nb = np.load(_neutra_data_path(n_res, False, False, False))
            nd = _filter_frozen_chains(nb["data"], nb["energies"])
            data = np.concatenate([data, nd.astype(data.dtype)])
            temps = np.concatenate([temps, np.ones(len(nd), np.float32)])
        if augment:
            # stack the coverage augmentation ON TOP of tcond (VERDICT r5
            # item 2): ladder frames keep per-rung temperatures and a
            # 70% uniform block mass; umbrella frames (per-dihedral sweeps
            # + optionally the tail-targeted windows of
            # ``r5_ala3_campaign.py``) enter as T=1 data with their
            # bin-flattened MBAR weights.  Weighted sampling is confined to
            # the umbrella blocks (locally Boltzmann, marginally flat), so
            # the MBAR weight-concentration failure mode of all-rung
            # weighted NLL does not reappear.
            lw_parts = [np.full(len(data), np.log(0.70 / len(data)), np.float64)]
            x_parts, t_parts = [data], [temps]
            aug_x, aug_lw = _augmented_training_set(n_res, include_exact=False)
            aug_lw = aug_lw.astype(np.float64)
            aug_lw = aug_lw - np.logaddexp.reduce(aug_lw)
            tgt_path = os.path.join(ART, f"polyala{n_res}_umbrella_tgt.npz")
            if os.path.exists(tgt_path):
                tgt = np.load(tgt_path)
                tgt_x = tgt["frames"].astype(np.float32)
                tgt_lw = tgt["log_weights"].astype(np.float64)
                keep = np.isfinite(tgt_lw)
                tgt_x, tgt_lw = tgt_x[keep], tgt_lw[keep]
                tgt_lw = tgt_lw - np.logaddexp.reduce(tgt_lw) + np.log(0.12)
                x_parts += [aug_x, tgt_x]
                lw_parts += [aug_lw + np.log(0.18), tgt_lw]
                t_parts += [np.ones(len(aug_x), np.float32),
                            np.ones(len(tgt_x), np.float32)]
            else:
                x_parts.append(aug_x)
                lw_parts.append(aug_lw + np.log(0.30))
                t_parts.append(np.ones(len(aug_x), np.float32))
            data = np.concatenate(x_parts).astype(np.float32)
            temps = np.concatenate(t_parts)
            log_w = np.concatenate(lw_parts).astype(np.float32)
    else:
        data, log_w = _training_set(n_res, augment, neutra, marginals, residue_ar, cold=cold)
    if augment and not neutra:
        np.savez_compressed(
            os.path.join(ART, f"polyala{n_res}_train_data.npz"),
            data=data, log_weights=log_w,
        )
    gen = _make_gen(n_res, data, marginals, residue_ar, tcond=tcond)
    params = gen.init(jax.random.PRNGKey(0))
    trainer = bg.KLTrainer(
        gen, train_energy=False,
        likelihood_temperature_from_batch=tcond,
        optimizer=optax.adam(optax.cosine_decay_schedule(1e-3, n_iter, 1e-2)),
    )
    if tcond:
        sampler = bg.DataSetSampler(
            jnp.asarray(data), jnp.asarray(temps),
            log_weights=None if log_w is None else jnp.asarray(log_w))
    else:
        sampler = bg.DataSetSampler(jnp.asarray(data), log_weights=(
            None if log_w is None else jnp.asarray(log_w)))
    params, opt_state, reporter = trainer.train(
        params, jax.random.PRNGKey(1), n_iter, data=sampler,
        batchsize=batch, scan_chunk=1000, progress_interval=1,
        checkpoint_dir=ckpt_dir,
    )
    _save_stats(ckpt_dir, gen.data_statistics)
    print("final loss:", reporter.losses()[0][-20:].mean(), flush=True)


def finetune_phase(n_res, n_iter=4000, batch=1024, lv_batch=1024, w_lv=0.02,
                   augment=False, marginals=False, residue_ar=False,
                   neutra=False, tcond=False):
    """Log-variance fine-tune of a trained variant (ALA3 quality wall fix).

    The log-weight forensics (polyala_logw_diag) showed the NLL-trained flow
    is overdispersed: the ESS-killing right tail of log-weights is a smooth
    +25-nat continuum of LOW-energy samples the flow underweights, plus a
    clash left tail.  Minimizing Var[log w] over reparametrized model samples
    attacks both tails directly while the NLL anchor keeps mode coverage
    (reverse-KL annealing destroyed the ala2 flagship: 16.2% -> 0.07%).

    Reads polyala{n}_ckpt{tag}, writes polyala{n}_ckpt{tag}_lv; evaluate
    with ``eval ... --lv``.
    """
    import bgflow_tpu as bg
    import optax
    from bgflow_tpu.utils.checkpoint import restore_checkpoint

    if tcond:
        # NLL anchor on the COLD rung at scalar T=1 (the logvar term also
        # samples the model at T=1): the temperature axis stays frozen at
        # the evaluation temperature during the tail finetune
        blob = np.load(os.path.join(ART, f"polyala{n_res}_data.npz"))
        k = int(blob["n_rungs"]) if "n_rungs" in blob.files else 8
        data = blob["data"][np.arange(len(blob["data"])) % k == 0]
        log_w = None
    else:
        data, log_w = _training_set(n_res, augment, neutra, marginals, residue_ar)
    base = os.path.join(
        ART, f"polyala{n_res}_ckpt{_tag(augment, marginals, residue_ar, neutra, tcond=tcond)}")
    gen = _make_gen(n_res, data, marginals, residue_ar,
                    statistics=_load_stats(base), tcond=tcond)
    params = restore_checkpoint(base)["params"]

    import shutil

    # _tag-consistent name (eval/science look up "..._lv_tc", not "_tc_lv")
    ckpt_dir = os.path.join(
        ART,
        f"polyala{n_res}_ckpt{_tag(augment, marginals, residue_ar, neutra, lv=True, tcond=tcond)}",
    )
    for d in (ckpt_dir, ckpt_dir + "_stats"):
        if os.path.isdir(d):
            shutil.rmtree(d)
    trainer = bg.KLTrainer(
        gen, train_energy=False, train_logvar=True,
        optimizer=optax.chain(
            optax.clip_by_global_norm(50.0),
            optax.adam(optax.cosine_decay_schedule(1e-4, n_iter, 1e-2)),
        ),
    )
    # ramp the variance term in so the first steps stay near the NLL optimum
    w_logvar = optax.linear_schedule(0.0, w_lv, max(1, n_iter // 4))
    sampler = bg.DataSetSampler(jnp.asarray(data), log_weights=(
        None if log_w is None else jnp.asarray(log_w)))
    params, opt_state, reporter = trainer.train(
        params, jax.random.PRNGKey(2), n_iter, data=sampler,
        batchsize=batch, n_logvar_samples=lv_batch, w_logvar=w_logvar,
        scan_chunk=500, progress_interval=1, checkpoint_dir=ckpt_dir,
    )
    _save_stats(ckpt_dir, gen.data_statistics)
    print("final loss:", reporter.losses()[0][-20:].mean(), flush=True)


def neutra_phase(n_res, n_samples=98304, n_chains=512, augment=False,
                 marginals=False, residue_ar=False, n_burnin=400,
                 tune_rounds=12):
    """Regenerate the training ensemble with flow-preconditioned HMC.

    Loads the trained checkpoint of the given variant, runs NeuTra chains
    (bgflow_tpu.neutra_sample) on the latent image of the force field, and
    writes polyala{n}_neutra.npz — an exact-Boltzmann, better-mixed dataset
    for the next training round (latent chains cross torsion barriers the
    x-space ladder needs hot replicas for).  Train with --neutra to use it.
    """
    import bgflow_tpu as bg
    from bgflow_tpu.energies.peptide import polyala_reference_xyz, polyala_z_matrix
    from bgflow_tpu.ops.geometry import kabsch_align
    from bgflow_tpu.utils.checkpoint import restore_checkpoint

    data, _ = _training_set(n_res, augment, neutra=False,
                            marginals=marginals, residue_ar=residue_ar)
    # NeuTra HMC differentiates through the full flow; the Pallas IC
    # reconstruction kernel carries a custom_vjp that replays the XLA path
    # (flows/ic.py, test_pallas_reconstruction_gradient_matches_xla), so the
    # default backend-appropriate kernel choice is fine here
    ckpt = os.path.join(ART, f"polyala{n_res}_ckpt{_tag(augment, marginals, residue_ar)}")
    gen = _make_gen(n_res, data, marginals, residue_ar,
                    statistics=_load_stats(ckpt))
    params = restore_checkpoint(ckpt)["params"]

    # chain starts: spread across the LOW-ENERGY half of the ensemble — a
    # hot-rung clash frame as x0 can freeze its chain for the whole run
    # (zero acceptance through the latent preconditioner)
    from bgflow_tpu.energies.peptide import build_polyala_forcefield

    ff0 = build_polyala_forcefield(n_res, implicit_solvent=IMPLICIT_SOLVENT)
    cand = data[:: max(1, len(data) // (4 * n_chains))][: 4 * n_chains]
    u0 = np.asarray(ff0.energy(jnp.asarray(cand)))
    pool = cand[u0 <= np.median(u0)]
    x0 = jnp.asarray(pool[:n_chains])
    t0 = time.time()
    res = bg.neutra_sample(
        gen, params, jax.random.PRNGKey(23), n_samples, n_chains=n_chains,
        x0=x0, n_burnin=n_burnin, stride=2, n_leapfrog=10,
        tune_rounds=tune_rounds,
    )
    frames = np.asarray(res.xs[0])
    print(f"neutra: {frames.shape} in {time.time()-t0:.0f}s, "
          f"step {res.step_size:.3g}, accept~{res.acceptance:.2f}, "
          f"<u> {float(res.energies.mean()):.1f} kT", flush=True)

    ref = jnp.asarray(polyala_reference_xyz(n_res), jnp.float32)
    n_atoms = ref.shape[0]
    _, fixed = polyala_z_matrix(n_res)
    aligned = []
    for i in range(0, frames.shape[0], 16384):
        chunk = jnp.asarray(frames[i : i + 16384], jnp.float32).reshape(-1, n_atoms, 3)
        aligned.append(np.asarray(kabsch_align(chunk, ref, atoms=fixed)))
    frames = np.concatenate(aligned, axis=0).reshape(-1, 3 * n_atoms)
    np.savez_compressed(
        _neutra_data_path(n_res, augment, marginals, residue_ar),
        data=frames,
        energies=np.asarray(res.energies),
        step_size=res.step_size,
    )


def eval_phase(n_res, n_eval=50000, augment=False, marginals=False,
               residue_ar=False, neutra=False, lv=False, cold=False,
               tcond=False):
    import bgflow_tpu as bg
    from bgflow_tpu.utils.checkpoint import restore_checkpoint

    if tcond:
        data = np.load(os.path.join(ART, f"polyala{n_res}_data.npz"))["data"]
    else:
        data, _ = _training_set(n_res, augment, neutra, marginals, residue_ar, cold=cold)
    ckpt = os.path.join(
        ART, f"polyala{n_res}_ckpt{_tag(augment, marginals, residue_ar, neutra, lv, cold, tcond)}")
    gen = _make_gen(n_res, data, marginals, residue_ar,
                    statistics=_load_stats(ckpt), tcond=tcond)
    params = restore_checkpoint(ckpt)["params"]
    out = gen.sample(params, jax.random.PRNGKey(7), n_eval, with_log_weights=True)
    lw = out.log_weights
    finite = jnp.isfinite(lw)
    ess = float(bg.effective_sample_size(jnp.where(finite, lw, -jnp.inf)))
    res = {
        "n_res": n_res,
        "n_eval": n_eval,
        "config": {"augment": augment, "learnable_marginals": marginals,
                   "residue_ar": residue_ar, "neutra": neutra, "lv": lv,
                   "cold": cold, "tcond": tcond},
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
    # per-dihedral diagnostics: histogram overlap between (unweighted) model
    # samples and the data marginal — locates WHICH backbone dof the flow
    # still mismatches (the ALA3 quality wall is accumulated per-dof error)
    from bgflow_tpu.energies.peptide import backbone_dihedrals, build_peptide_topology
    from bgflow_tpu.ops.ic import torsion

    seq = ["ACE"] + ["ALA"] * n_res + ["NME"]
    dihs = backbone_dihedrals(seq)
    quads = [d["phi"] for d in dihs] + [d["psi"] for d in dihs]
    names = [f"phi{d['residue']}" for d in dihs] + [f"psi{d['residue']}" for d in dihs]
    n_atoms = len(build_peptide_topology(seq)[0])

    def dih(x):
        p = np.asarray(x).reshape(-1, n_atoms, 3)
        return np.stack(
            [np.asarray(torsion(p[:, a], p[:, b], p[:, c], p[:, d], 1e-7))
             for a, b, c, d in quads], axis=-1)

    edges = np.linspace(-np.pi, np.pi, 25)
    dm, dd = dih(out.xs[0][:20000]), dih(data[:20000])
    overlap = {}
    for s, name in enumerate(names):
        hm, _ = np.histogram(dm[:, s], bins=edges, density=True)
        hd, _ = np.histogram(dd[:, s], bins=edges, density=True)
        # histogram intersection in [0, 1]
        overlap[name] = round(float(np.minimum(hm, hd).sum() * np.diff(edges)[0]), 4)
    res["dihedral_overlap_model_vs_data"] = overlap
    path = os.path.join(
        ART, f"polyala{n_res}{_tag(augment, marginals, residue_ar, neutra, lv, cold, tcond)}.json")
    with open(path, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res, indent=1), flush=True)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    phase = args[0] if args else "all"
    n_res = int(args[1]) if len(args) > 1 else 3
    augment = "--augment" in flags
    marginals = "--marginals" in flags
    residue_ar = "--residue_ar" in flags
    neutra = "--neutra" in flags
    lv = "--lv" in flags
    cold = "--cold" in flags
    tcond = "--tcond" in flags
    if "--big" in flags:
        BIG = True
    if "--gbsa" in flags:
        IMPLICIT_SOLVENT = True
        ART = os.path.join(ART, "gbsa")
        os.makedirs(ART, exist_ok=True)
    # scale overrides (--iters=N, --batch=N): the CPU ladder showed the
    # 24k-iter full schedule can over-sharpen on weighted data — shorter
    # schedules are a legitimate rung, not just a budget cut
    kv = dict(f.lstrip("-").split("=", 1) for f in flags if "=" in f)
    unknown = set(kv) - {"iters", "batch", "w_lv"}
    if unknown:
        raise SystemExit(
            f"unknown flag(s): {sorted(unknown)} (expected --iters=N / --batch=N / --w_lv=F)")
    train_kw = {}
    if "iters" in kv:
        train_kw["n_iter"] = int(kv["iters"])
    if "batch" in kv:
        train_kw["batch"] = int(kv["batch"])
    if phase in ("data", "all"):
        data_phase(n_res)
    if phase in ("umbrella",) or (phase == "all" and augment):
        umbrella_phase(n_res)
    if phase == "neutra":
        # regenerate the ensemble through the trained (augment, marginals,
        # residue_ar) checkpoint; later `train --neutra` consumes it
        neutra_phase(n_res, augment=augment, marginals=marginals,
                     residue_ar=residue_ar)
    if phase in ("train", "all"):
        train_phase(n_res, augment=augment, marginals=marginals,
                    residue_ar=residue_ar, neutra=neutra, cold=cold,
                    tcond=tcond, **train_kw)
    if phase == "finetune":
        ft_kw = dict(train_kw)
        if "w_lv" in kv:
            ft_kw["w_lv"] = float(kv["w_lv"])
        finetune_phase(n_res, augment=augment, marginals=marginals,
                       residue_ar=residue_ar, neutra=neutra, tcond=tcond,
                       **ft_kw)
    if phase in ("eval", "all"):
        eval_phase(n_res, augment=augment, marginals=marginals,
                   residue_ar=residue_ar, neutra=neutra, lv=lv, cold=cold,
                   tcond=tcond)
