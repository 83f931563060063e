"""Round-5 ALA3 logw-tail attribution per lever (VERDICT r4 item 2's
falsification branch).

For each trained variant (tc, tc+aug(tgt), tc+aug(tgt)+ar) this samples
the model, isolates the log-weight right tail (the samples that carry the
reweighting variance), and asks WHERE they live:

  * marginal support score — sum over backbone dihedrals of the log
    training-data marginal density at the sample's (phi, psi) bins.  If
    tail samples sit in well-supported marginal bins, per-dihedral
    umbrella coverage cannot fix them (the mismatch is joint / off-CV).
  * energy decomposition — target energy of tail vs bulk samples, and
    model-vs-data mean energies (an over-relaxed model under-spreads the
    Boltzmann ensemble: low sample energies, huge positive logw tail).

Writes artifacts/gbsa/r5_ala3_attribution.json.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bgflow_tpu.utils.backend import ensure_reachable_backend

ensure_reachable_backend()
import numpy as np
import jax
import jax.numpy as jnp

import polyala_demo as pd

pd.IMPLICIT_SOLVENT = True
if not pd.ART.endswith("gbsa"):
    pd.ART = os.path.join(pd.ART, "gbsa")

N_RES = 3
VARIANTS = [
    ("tc", dict()),
    ("aug_tc", dict(augment=True)),
    ("aug_ar_tc", dict(augment=True, residue_ar=True)),
]


def main(n_eval=100000, n_tail=512):
    from bgflow_tpu.energies.peptide import backbone_dihedrals, build_peptide_topology
    from bgflow_tpu.ops.ic import torsion
    from bgflow_tpu.utils.checkpoint import restore_checkpoint

    blob = np.load(os.path.join(pd.ART, f"polyala{N_RES}_data.npz"))
    data = blob["data"]
    seq = ["ACE"] + ["ALA"] * N_RES + ["NME"]
    dihs = backbone_dihedrals(seq)
    quads = np.asarray([d["phi"] for d in dihs] + [d["psi"] for d in dihs])
    names = [f"phi{d['residue']}" for d in dihs] + [f"psi{d['residue']}" for d in dihs]
    n_atoms = len(build_peptide_topology(seq)[0])
    S = len(quads)

    def dih(xf):
        p = jnp.asarray(xf).reshape(-1, n_atoms, 3)
        return np.stack([
            np.asarray(torsion(p[:, a], p[:, b], p[:, c], p[:, d], 1e-7))
            for a, b, c, d in quads], axis=-1)

    # training-data marginal densities per dihedral (cold rung only —
    # T=1 support is what reweighting needs)
    cold = data[np.arange(len(data)) % 8 == 0]
    data_cv = dih(cold)
    n_bins = 36
    edges = np.linspace(-np.pi, np.pi, n_bins + 1)
    marg = []
    for s in range(S):
        h, _ = np.histogram(data_cv[:, s], bins=edges)
        p = (h + 0.5) / (h + 0.5).sum()  # light smoothing: log stays finite
        marg.append(np.log(p))
    marg = np.stack(marg)  # (S, n_bins)

    def support_score(cv):
        which = np.clip(np.searchsorted(edges, cv) - 1, 0, n_bins - 1)
        return np.take_along_axis(
            marg, which.T, axis=-1
        ).sum(axis=0)  # (N,)

    out = {"n_eval": n_eval, "n_tail": n_tail,
           "note": "support_score = sum_s log p_data(bin(cv_s)); "
                   "uniform-over-bins reference = "
                   f"{S * np.log(1.0 / n_bins):.1f}"}
    for tag, kw in VARIANTS:
        ckpt = os.path.join(pd.ART, f"polyala{N_RES}_ckpt_{tag}")
        if not os.path.isdir(ckpt):
            out[tag] = {"missing": True}
            continue
        gen = pd._make_gen(N_RES, data, False, kw.get("residue_ar", False),
                           statistics=pd._load_stats(ckpt), tcond=True)
        params = restore_checkpoint(ckpt)["params"]
        xs, lws = [], []
        key = jax.random.PRNGKey(41)
        for i in range(n_eval // 25000):
            key, sub = jax.random.split(key)
            o = gen.sample(params, sub, 25000, with_log_weights=True)
            xs.append(np.asarray(o.xs[0]))
            lws.append(np.asarray(o.log_weights, np.float64))
        x = np.concatenate(xs)
        lw = np.concatenate(lws)
        fin = np.isfinite(lw)
        x, lw = x[fin], lw[fin]
        order = np.argsort(lw)
        tail_idx = order[-n_tail:]
        bulk_idx = order[len(lw) // 4: -len(lw) // 4]
        u = np.asarray(gen.target.energy(jnp.asarray(x[tail_idx])))
        u_bulk = np.asarray(gen.target.energy(jnp.asarray(x[bulk_idx[:4096]])))
        cv_tail = dih(x[tail_idx])
        cv_bulk = dih(x[bulk_idx[:4096]])
        sc_tail = support_score(cv_tail)
        sc_bulk = support_score(cv_bulk)
        sc_data = support_score(data_cv[:4096])
        w = np.exp(lw - lw.max())
        out[tag] = {
            "pooled_efficiency_pct": round(
                100.0 * float((w.sum() ** 2) / (len(lw) * (w**2).sum())), 5),
            "logw_tail_span_nats": round(float(lw[tail_idx].max() - np.median(lw)), 1),
            "top64_weight_share": round(float(np.sort(w)[-64:].sum() / w.sum()), 4),
            "support_score": {
                "tail_median": round(float(np.median(sc_tail)), 1),
                "bulk_median": round(float(np.median(sc_bulk)), 1),
                "data_median": round(float(np.median(sc_data)), 1),
            },
            "tail_in_supported_bins": round(float(
                (sc_tail > np.quantile(sc_data, 0.05)).mean()), 3),
            "energy": {
                "tail_median": round(float(np.median(u)), 1),
                "bulk_median": round(float(np.median(u_bulk)), 1),
                "data_mean": round(float(np.mean(np.asarray(
                    gen.target.energy(jnp.asarray(cold[:4096]))))), 1),
            },
        }
        print(tag, json.dumps(out[tag]), flush=True)
    path = os.path.join(pd.ART, "r5_ala3_attribution.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
