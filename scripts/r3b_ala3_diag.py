"""ALA3 log-weight forensics from the surviving checkpoint only (CPU-safe).

Round-3 continuation: the training npz files are gone (gitignored), but
``polyala3_ckpt`` (24k steps) and its stats sidecar survive.  This runs the
same forensics as polyala_logw_diag.py minus the data-ensemble comparison:
is the ESS ~2/200k a numerically-rogue-sample pathology (fixable by a clamp)
or a genuinely broad weight distribution (an expressivity/coverage wall)?

Run:  JAX_PLATFORMS=cpu python scripts/r3b_ala3_diag.py [n_res] [--n=20000]
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
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
    from polyala_demo import _load_stats, _make_gen

    from bgflow_tpu.energies.peptide import build_polyala_forcefield
    from bgflow_tpu.utils.checkpoint import restore_checkpoint

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    kv = dict(f.lstrip("-").split("=", 1) for f in sys.argv[1:] if f.startswith("--") and "=" in f)
    n_res = int(args[0]) if args else 3
    n = int(kv.get("n", 20000))

    ckpt = os.path.join(ART, f"polyala{n_res}_ckpt")
    stats = _load_stats(ckpt)
    assert stats is not None, "stats sidecar required (data npz files are gone)"
    gen = _make_gen(n_res, None, False, False, use_pallas=False, statistics=stats)
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
        "n": n,
        "frac_nonfinite": float(1 - finite.mean()),
        "ess": round(ess(lwf), 3),
        "top16_logw_minus_median": [round(float(lwf[i] - np.median(lwf)), 2) for i in topk],
        "ess_drop_top_k": {k: round(ess(np.delete(lwf, order[:k])), 2) for k in (0, 1, 2, 4, 8, 16, 64, 256)},
        "logw_quantiles_rel_median": {
            q: round(float(np.quantile(lwf, q) - np.median(lwf)), 2)
            for q in (0.001, 0.05, 0.25, 0.75, 0.95, 0.999)
        },
        "logw_bulk_std_5_95": round(float(np.std(
            lwf[(lwf > np.quantile(lwf, 0.05)) & (lwf < np.quantile(lwf, 0.95))])), 3),
    }

    def _terms(xs_flat):
        p = xs_flat.reshape(xs_flat.shape[0], -1, 3)
        return {name: np.asarray(fn(p)) / ff.kt for name, fn in (
            ("bond", ff.bond_energy), ("angle", ff.angle_energy),
            ("torsion", ff.torsion_energy), ("nonbonded", ff.nonbonded_energy))}

    idx_f = np.nonzero(finite)[0]
    sel = idx_f[topk[:8]]
    xs = x[jnp.asarray(sel)]
    u_top = np.asarray(gen.target.energy(xs))
    rep["top8_u_kt"] = [round(float(v), 1) for v in u_top]
    rep["top8_logq"] = [round(float(v), 1) for v in np.asarray(-lw[sel] - u_top)]
    rep["top8_terms"] = {k: [round(float(v), 1) for v in vals] for k, vals in _terms(xs).items()}
    mid = idx_f[order[len(order) // 2: len(order) // 2 + 8]]
    xm = x[jnp.asarray(mid)]
    u_mid = np.asarray(gen.target.energy(xm))
    rep["mid8_u_kt"] = [round(float(v), 1) for v in u_mid]
    rep["mid8_logq"] = [round(float(v), 1) for v in np.asarray(-lw[mid] - u_mid)]
    rep["model_terms_mean"] = {k: round(float(v.mean()), 2) for k, v in _terms(x[:8192]).items()}
    rep["model_terms_mean"]["total"] = round(float(jnp.mean(ff.energy(x[:8192]))), 2)
    print(json.dumps(rep, indent=1), flush=True)
    with open(os.path.join(ART, f"polyala{n_res}_logw_diag_r3b.json"), "w") as fh:
        json.dump(rep, fh, indent=1)


if __name__ == "__main__":
    main()
