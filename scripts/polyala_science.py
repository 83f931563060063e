"""ALA_n science closeout: BG-reweighted free energies vs umbrella+MBAR.

The n>=3 analogue of ``scripts/ala2_science.py``'s eval/umbrella/compare
loop (reference workflow:
``/root/reference/notebooks/alanine_dipeptide_basics.py:303-358``), run
per backbone dihedral:

  * sampling efficiency / log-weight statistics of the trained variant
  * per-dihedral PMFs F(phi_i), F(psi_i) from reweighted BG samples vs the
    BG-independent umbrella+MBAR estimate (joint masked-CV batch,
    ``polyala_demo.py umbrella``), with RMSD over well-populated bins
  * per-residue phi-basin dF (phi_i > 0.2 split) BG vs umbrella, with MC
    errors from per-basin importance ESS (BG) and iteration blocks
    (umbrella)

Writes artifacts/polyala{n}_science.json.

Run:  python scripts/polyala_science.py [n_res] [--neutra] [--augment]
      [--marginals] [--lv] [--n=200000]
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bgflow_tpu.utils.backend import ensure_reachable_backend

ensure_reachable_backend()
import jax
import jax.numpy as jnp

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts")

N_PMF_BINS = 36


def pmf(vals, log_w=None, n_bins=N_PMF_BINS):
    """Weighted PMF F/kT over [-pi, pi) bins (min-shifted; NaN = empty)."""
    vals = np.asarray(vals, np.float64)
    edges = np.linspace(-np.pi, np.pi, n_bins + 1)
    if log_w is None:
        w = np.ones_like(vals)
    else:
        log_w = np.asarray(log_w, np.float64)
        finite = np.isfinite(log_w)
        vals, log_w = vals[finite], log_w[finite]
        w = np.exp(log_w - log_w.max())
    hist, _ = np.histogram(vals, bins=edges, weights=w)
    counts, _ = np.histogram(vals, bins=edges)
    p = hist / hist.sum()
    f = np.where(p > 0, -np.log(np.maximum(p, 1e-300)), np.nan)
    return f - np.nanmin(f), counts


def basin_df(vals, log_w, split=0.2):
    """log(P[cv > split] / P[cv <= split]) with self-normalized-IS error."""
    vals = np.asarray(vals, np.float64)
    lw = np.asarray(log_w, np.float64)
    finite = np.isfinite(lw)
    vals, lw = vals[finite], lw[finite]
    w = np.exp(lw - lw.max())
    pos = vals > split
    s_pos, s_neg = w[pos].sum(), w[~pos].sum()
    if s_pos <= 0 or s_neg <= 0:
        return None, None, (0.0, 0.0)
    ess_pos = s_pos**2 / max((w[pos] ** 2).sum(), 1e-300)
    ess_neg = s_neg**2 / max((w[~pos] ** 2).sum(), 1e-300)
    return (
        float(np.log(s_pos / s_neg)),
        float(np.sqrt(1.0 / ess_pos + 1.0 / ess_neg)),
        (float(ess_pos), float(ess_neg)),
    )


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from polyala_demo import _load_stats, _make_gen, _tag, _training_set

    import bgflow_tpu as bg
    from bgflow_tpu.energies.peptide import backbone_dihedrals, build_peptide_topology
    from bgflow_tpu.ops.ic import torsion
    from bgflow_tpu.utils.checkpoint import restore_checkpoint

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    kv = dict(f.lstrip("-").split("=", 1) for f in flags if "=" in f)
    n_res = int(args[0]) if args else 3
    augment = "--augment" in flags
    marginals = "--marginals" in flags
    neutra = "--neutra" in flags
    lv = "--lv" in flags
    cold = "--cold" in flags
    tcond = "--tcond" in flags
    residue_ar = "--ar" in flags
    if "--big" in flags:
        import polyala_demo as pd

        pd.BIG = True
    n_eval = int(kv.get("n", 200000))
    if "--gbsa" in flags:
        # solvated pipeline: same switch + artifact redirection as
        # polyala_demo --gbsa (vacuum and GBSA ensembles never mix)
        import polyala_demo as pd

        pd.IMPLICIT_SOLVENT = True
        if not pd.ART.endswith("gbsa"):
            pd.ART = os.path.join(pd.ART, "gbsa")
        if not globals()["ART"].endswith("gbsa"):
            globals()["ART"] = os.path.join(globals()["ART"], "gbsa")

    if tcond:
        data = np.load(os.path.join(ART, f"polyala{n_res}_data.npz"))["data"]
    else:
        data, _ = _training_set(n_res, augment, neutra, marginals, cold=cold)
    tag = _tag(augment, marginals, residue_ar, neutra, lv, cold, tcond)
    ckpt = os.path.join(ART, f"polyala{n_res}_ckpt{tag}")
    gen = _make_gen(n_res, data, marginals, residue_ar,
                    statistics=_load_stats(ckpt), tcond=tcond)
    params = restore_checkpoint(ckpt)["params"]

    seq = ["ACE"] + ["ALA"] * n_res + ["NME"]
    dihs = backbone_dihedrals(seq)
    quads = [d["phi"] for d in dihs] + [d["psi"] for d in dihs]
    names = [f"phi{d['residue']}" for d in dihs] + [f"psi{d['residue']}" for d in dihs]
    n_atoms = len(build_peptide_topology(seq)[0])

    def dih(x_flat):
        p = np.asarray(x_flat).reshape(-1, n_atoms, 3)
        return np.stack(
            [np.asarray(torsion(jnp.asarray(p[:, a]), jnp.asarray(p[:, b]),
                                jnp.asarray(p[:, c]), jnp.asarray(p[:, d]), 1e-7))
             for a, b, c, d in quads], axis=-1)

    # ---- BG side: sample in chunks (200k x flow on one chip is fine, but
    # chunking keeps peak memory flat and matches the ala2 driver)
    chunk = 50000
    lws, cvs, u_sum, n_u = [], [], 0.0, 0
    key = jax.random.PRNGKey(101)
    for i in range(-(-n_eval // chunk)):
        key, sub = jax.random.split(key)
        out = gen.sample(params, sub, chunk, with_log_weights=True)
        lws.append(np.asarray(out.log_weights, np.float64))
        cvs.append(dih(out.xs[0]))
        u_sum += float(jnp.sum(gen.target.energy(out.xs[0][:8192])))
        n_u += min(chunk, 8192)
    lw = np.concatenate(lws)[:n_eval]
    cv_m = np.concatenate(cvs, axis=0)[:n_eval]
    finite = np.isfinite(lw)
    ess = float(bg.effective_sample_size(jnp.asarray(np.where(finite, lw, -np.inf))))

    # block-resolved efficiency: the Kish ESS of a heavy-right-tailed weight
    # distribution is dominated by the single largest weight, so one number
    # at one n is close to meaningless (observed 30x spread between draws);
    # the per-block median/IQR over 20k-blocks is the honest summary
    n_blocks = max(2, n_eval // 20000)
    size = n_eval // n_blocks
    effs = []
    for b in range(n_blocks):
        blw = lw[b * size:(b + 1) * size]
        bfin = np.isfinite(blw)
        be = float(bg.effective_sample_size(
            jnp.asarray(np.where(bfin, blw, -np.inf))))
        effs.append(100.0 * be / size)
    effs = np.asarray(effs)

    res = {
        "n_res": n_res,
        "config": {"augment": augment, "learnable_marginals": marginals,
                   "neutra": neutra, "lv": lv, "cold": cold, "tcond": tcond,
                   "residue_ar": residue_ar},
        "n_eval": n_eval,
        "ess": ess,
        "sampling_efficiency_pct": 100.0 * ess / n_eval,
        "efficiency_pct_blocks": {
            "n_blocks": int(n_blocks),
            "block_size": int(size),
            "median": round(float(np.median(effs)), 4),
            "iqr": [round(float(np.quantile(effs, 0.25)), 4),
                    round(float(np.quantile(effs, 0.75)), 4)],
            "min": round(float(effs.min()), 4),
            "max": round(float(effs.max()), 4),
        },
        "logw_std": float(np.std(lw[finite])),
        "frac_nonfinite_logw": float(1.0 - finite.mean()),
        "mean_energy_model_samples": u_sum / max(n_u, 1),
        "mean_energy_data": float(jnp.mean(gen.target.energy(
            jnp.asarray(np.asarray(data)[:8192])))),
    }

    # ---- umbrella side: per-sweep PMFs from the joint-MBAR weights
    ub = np.load(os.path.join(ART, f"polyala{n_res}_umbrella.npz"))
    cv_u = ub["cv"].astype(np.float64)            # (N, S) all dihedrals
    lw_u = ub["log_weights"].astype(np.float64)   # joint-MBAR, normalized
    sweep_names = [str(s) for s in ub["sweep_names"]]
    assert sweep_names == names, (sweep_names, names)

    per_dih = {}
    rmsds, devs = [], []
    for s, name in enumerate(names):
        f_bg, c_bg = pmf(cv_m[:, s][finite], lw[finite])
        f_um, c_um = pmf(cv_u[:, s], lw_u)
        ok = np.isfinite(f_bg) & np.isfinite(f_um) & (c_bg >= 50) & (c_um >= 50)
        entry = {
            "pmf_bg_kt": [None if np.isnan(v) else round(float(v), 3) for v in f_bg],
            "pmf_umbrella_kt": [None if np.isnan(v) else round(float(v), 3) for v in f_um],
            "agreement_bins": int(ok.sum()),
        }
        if ok.any():
            diff = f_bg[ok] - f_um[ok]
            diff -= diff.mean()
            entry["pmf_rmsd_kt"] = round(float(np.sqrt(np.mean(diff**2))), 4)
            entry["pmf_maxdev_kt"] = round(float(np.max(np.abs(diff))), 4)
            rmsds.append(entry["pmf_rmsd_kt"])
        # phi basins: the alphaL/C7ax-like phi>0.2 region per residue
        if name.startswith("phi"):
            df_bg, err_bg, (e_pos, e_neg) = basin_df(cv_m[:, s][finite], lw[finite])
            df_um, err_um, _ = basin_df(cv_u[:, s], lw_u)
            # umbrella block error over iteration blocks
            n_blocks = 5
            size = len(cv_u) // n_blocks
            dfs = []
            for b in range(n_blocks):
                v, _, _ = basin_df(cv_u[b * size:(b + 1) * size, s],
                                   lw_u[b * size:(b + 1) * size])
                if v is not None:
                    dfs.append(v)
            err_um_blocks = float(np.std(dfs) / np.sqrt(len(dfs))) if len(dfs) > 1 else None
            entry.update({
                "dF_basins_bg_kt": None if df_bg is None else round(df_bg, 4),
                "dF_bg_err_kt": None if err_bg is None else round(err_bg, 4),
                "ess_basin_pos": round(e_pos, 1),
                "dF_basins_umbrella_kt": None if df_um is None else round(df_um, 4),
                "dF_umbrella_err_kt": (
                    None if err_um_blocks is None else round(err_um_blocks, 4)),
            })
            if df_bg is not None and df_um is not None:
                dev = df_bg - df_um
                sig = np.sqrt((err_bg or 0.0) ** 2 + (err_um_blocks or 0.0) ** 2)
                entry["dF_deviation_kt"] = round(float(dev), 4)
                entry["dF_mutual_err_kt"] = round(float(sig), 4)
                entry["dF_within_mutual_error"] = bool(abs(dev) <= 2 * sig)
                devs.append((name, entry["dF_deviation_kt"],
                             entry["dF_within_mutual_error"]))
        per_dih[name] = entry

    res["per_dihedral"] = per_dih
    if rmsds:
        res["pmf_rmsd_kt_mean"] = round(float(np.mean(rmsds)), 4)
        res["pmf_rmsd_kt_max"] = round(float(np.max(rmsds)), 4)
    res["dF_summary"] = [
        {"dihedral": n, "deviation_kt": d, "within_mutual_error": w}
        for n, d, w in devs
    ]
    res["dF_all_within_mutual_error"] = bool(all(w for _, _, w in devs)) if devs else None

    path = os.path.join(ART, f"polyala{n_res}_science{tag}.json")
    with open(path, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps({k: v for k, v in res.items() if k != "per_dihedral"},
                     indent=1), flush=True)
    print("per-dihedral PMF RMSD (kT):",
          {k: v.get("pmf_rmsd_kt") for k, v in per_dih.items()}, flush=True)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
