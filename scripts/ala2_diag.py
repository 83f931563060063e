"""ESS diagnostics across ala2 training checkpoints.

For each checkpoint: sample n from the model, report ESS / logw stats and a
decomposition that tells WHERE the importance-weight variance comes from:

  logw = -u(x) - log q(x) + const

- ``u_top`` / ``logq_top``: target energy and model log-density of the top-10
  weighted samples vs the median sample.  High weight = model UNDER-covers a
  region p visits (u small there but q tiny) -> NLL/coverage problem; the
  anneal's reverse-KL term causes this when it narrows modes.
- ``ess_drop_top``: ESS after removing the top-k weights — if ESS jumps, the
  estimate is tail-dominated (few under-covered pockets), not a bulk misfit.

Usage:  python scripts/ala2_diag.py <ckpt_dir> <data: exact|aug> [n_eval]
"""
import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts")


def main(ckpt_dir, which="exact", n_eval=50_000, seed=7):
    import bgflow_tpu as bg
    from bgflow_tpu.models.ala2 import make_ala2_generator
    from bgflow_tpu.utils.checkpoint import restore_checkpoint, latest_step

    if which == "aug":
        data = np.load(os.path.join(ART, "ala2_train_data.npz"))["data"]
    else:
        data = np.load(os.path.join(ART, "ala2_exact_data.npz"))["data"][:-8192]
    gen = make_ala2_generator(
        data, hidden=(128, 128), num_bins=8, keepdims=9, use_pallas_spline=True
    )
    step = latest_step(ckpt_dir)
    st = restore_checkpoint(ckpt_dir, step=step)
    raw = st["params"] if isinstance(st, dict) and "params" in st else st
    # restored-without-template pytrees come back as lists/dicts; graft the
    # leaves onto a freshly-initialized params structure
    template = gen.init(jax.random.PRNGKey(0))
    params = jax.tree.unflatten(
        jax.tree.structure(template), jax.tree.leaves(raw)
    )

    out = gen.sample(params, jax.random.PRNGKey(seed), n_eval, with_log_weights=True)
    x = out.xs[0]
    logw = np.asarray(out.log_weights, np.float64)
    u = np.asarray(gen.target.energy(x), np.float64).ravel()
    logq = -logw - u  # up to a constant

    finite = np.isfinite(logw)
    lw = logw[finite] - logw[finite].max()
    w = np.exp(lw)
    ess = w.sum() ** 2 / (w**2).sum()
    order = np.argsort(lw)[::-1]

    def ess_drop(k):
        ww = w[order[k:]]
        return float(ww.sum() ** 2 / (ww**2).sum())

    med = order[len(order) // 2]
    res = {
        "ckpt": ckpt_dir,
        "step": int(step),
        "n": int(n_eval),
        "ess": float(ess),
        "eff_pct": float(100 * ess / n_eval),
        "logw_std": float(lw.std()),
        "ess_drop_top10": ess_drop(10),
        "ess_drop_top100": ess_drop(100),
        "u_top10_mean": float(u[finite][order[:10]].mean()),
        "u_median": float(u[finite][med]),
        "u_mean": float(u[finite].mean()),
        "u_std": float(u[finite].std()),
        "logq_top10_mean": float(logq[finite][order[:10]].mean()),
        "logq_median": float(logq[finite][med]),
        "logq_std": float(logq[finite].std()),
        "frac_nonfinite": float(1 - finite.mean()),
    }
    # phi-basin occupancy + reweighted basin dF (science criteria)
    from bgflow_tpu.ops.ic import torsion

    p = np.asarray(x).reshape(-1, 22, 3)
    phi = np.asarray(
        torsion(p[:, 4], p[:, 6], p[:, 8], p[:, 14], 1e-7), np.float64
    )[finite]
    pos = phi > 0.2
    s_pos, s_neg = w[pos].sum(), w[~pos].sum()
    res["phi_pos_frac_model"] = float(pos.mean())
    res["n_model_samples_pos"] = int(pos.sum())
    if s_pos > 0 and s_neg > 0:
        res["dF_basins_bg_kt"] = float(np.log(s_pos / s_neg))
        ess_pos = s_pos**2 / max((w[pos] ** 2).sum(), 1e-300)
        ess_neg = s_neg**2 / max((w[~pos] ** 2).sum(), 1e-300)
        res["dF_bg_err_kt"] = float(np.sqrt(1.0 / ess_pos + 1.0 / ess_neg))
        res["ess_basin_pos"] = float(ess_pos)
    print(json.dumps(res, indent=1), flush=True)
    return res


if __name__ == "__main__":
    ckpt = sys.argv[1]
    which = sys.argv[2] if len(sys.argv) > 2 else "exact"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000
    main(ckpt, which, n)
