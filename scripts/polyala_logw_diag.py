"""Log-weight forensics for a trained poly-alanine BG.

The ALA3 evals report ESS ~= 1.00 of 50k — which can mean EITHER a genuinely
broad weight distribution OR a single numerically rogue sample whose weight
dwarfs everything (a spline-edge / log-det pathology that no amount of
training removes).  This script tells them apart:

  * sorted top-k log-weights (gap between rank 1 and rank k)
  * ESS after dropping the top 1..16 weights
  * decomposition logw = -u - logq for the top-weight and bulk samples
  * per-term force-field energies of the top-weight samples
  * bulk-only logw std (5..95 percentile window)

Run:  python scripts/polyala_logw_diag.py [n_res] [--neutra] [--augment]
      [--marginals] [--residue_ar] [--n=50000]
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


def ess(lw):
    lw = lw - lw.max()
    w = np.exp(lw)
    return float(w.sum() ** 2 / (w**2).sum())


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from polyala_demo import _load_stats, _make_gen, _tag, _training_set

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    kv = dict(f.lstrip("-").split("=", 1) for f in flags if "=" in f)
    n_res = int(args[0]) if args else 3
    augment = "--augment" in flags
    marginals = "--marginals" in flags
    residue_ar = "--residue_ar" in flags
    neutra = "--neutra" in flags
    n = int(kv.get("n", 50000))

    from bgflow_tpu.energies.peptide import build_polyala_forcefield
    from bgflow_tpu.utils.checkpoint import restore_checkpoint

    data, _ = _training_set(n_res, augment, neutra, marginals, residue_ar)
    tag = _tag(augment, marginals, residue_ar, neutra)
    ckpt = os.path.join(ART, f"polyala{n_res}_ckpt{tag}")
    gen = _make_gen(n_res, data, marginals, residue_ar,
                    statistics=_load_stats(ckpt))
    params = restore_checkpoint(ckpt)["params"]
    ff = build_polyala_forcefield(n_res)

    out = gen.sample(params, jax.random.PRNGKey(7), n, with_log_weights=True)
    lw = np.asarray(out.log_weights, np.float64)
    x = out.xs[0]
    finite = np.isfinite(lw)
    lwf = lw[finite]

    order = np.argsort(lwf)[::-1]
    topk = order[:16]
    rep = {
        "n_res": n_res,
        "config": {"augment": augment, "marginals": marginals,
                   "residue_ar": residue_ar, "neutra": neutra},
        "n": n,
        "frac_nonfinite": float(1 - finite.mean()),
        "top16_logw_minus_median": [
            round(float(lwf[i] - np.median(lwf)), 2) for i in topk
        ],
        "ess_drop_top_k": {
            k: round(ess(np.delete(lwf, order[:k])), 2) for k in (0, 1, 2, 4, 8, 16)
        },
        "logw_quantiles_rel_median": {
            q: round(float(np.quantile(lwf, q) - np.median(lwf)), 2)
            for q in (0.001, 0.05, 0.25, 0.75, 0.95, 0.999)
        },
        "logw_bulk_std_5_95": round(float(np.std(
            lwf[(lwf > np.quantile(lwf, 0.05)) & (lwf < np.quantile(lwf, 0.95))])), 3),
    }

    # decompose the top samples: u vs per-term energies.  The per-term
    # ClassicalForceField methods take (B, n_atoms, 3) and return kJ/mol, so
    # wrap them to match ff.energy's flat-(B, 3N)-in / kT-out convention.
    def _terms(name_fns, xs_flat):
        p = xs_flat.reshape(xs_flat.shape[0], -1, 3)
        return {name: np.asarray(fn(p)) / ff.kt for name, fn in name_fns}

    TERMS = (
        ("bond", ff.bond_energy), ("angle", ff.angle_energy),
        ("torsion", ff.torsion_energy), ("nonbonded", ff.nonbonded_energy),
    )
    idx_f = np.nonzero(finite)[0]
    sel = idx_f[topk[:8]]
    xs = x[jnp.asarray(sel)]
    u_top = np.asarray(gen.target.energy(xs))
    rep["top8_u_kt"] = [round(float(v), 1) for v in u_top]
    rep["top8_logq"] = [round(float(v), 1) for v in np.asarray(-lw[sel] - u_top)]
    rep["top8_terms"] = {
        name: [round(float(v), 1) for v in vals]
        for name, vals in _terms(TERMS, xs).items()
    }
    # a median-weight control group
    mid = idx_f[order[len(order) // 2: len(order) // 2 + 8]]
    xm = x[jnp.asarray(mid)]
    u_mid = np.asarray(gen.target.energy(xm))
    rep["mid8_u_kt"] = [round(float(v), 1) for v in u_mid]
    rep["mid8_logq"] = [round(float(v), 1) for v in np.asarray(-lw[mid] - u_mid)]

    # model-sample per-term means vs data
    xs_all = x[:8192]
    xd = jnp.asarray(np.asarray(data)[:8192])
    rep["model_terms_mean"] = {
        name: round(float(vals.mean()), 2)
        for name, vals in _terms(TERMS, xs_all).items()
    }
    rep["model_terms_mean"]["total"] = round(float(jnp.mean(ff.energy(xs_all))), 2)
    rep["data_terms_mean"] = {
        name: round(float(vals.mean()), 2)
        for name, vals in _terms(TERMS, xd).items()
    }
    rep["data_terms_mean"]["total"] = round(float(jnp.mean(ff.energy(xd))), 2)
    print(json.dumps(rep, indent=1), flush=True)
    with open(os.path.join(ART, f"polyala{n_res}_logw_diag{tag}.json"), "w") as fh:
        json.dump(rep, fh, indent=1)


if __name__ == "__main__":
    main()
