"""Tempered-proposal importance sampling for the ALA3 BG.

The r3b forensics (artifacts/polyala3_logw_diag_r3b.json) show the ESS ~1/20k
is a smooth heavy RIGHT tail — the flow under-covers important regions by
e^15..e^25 — not a numerics pathology.  The standard remedy when q is too
thin: draw from the model at elevated temperature T_s (the BG is
temperature-aware end to end, so q_Ts is still tractable exactly via
z, dlogp), and importance-reweight to the T=1 target:

    log w = -u_target(x, T=1) - log q_Ts(x)
          = [u_prior(z, T_s) + dlogp_Ts] - u_target(x, 1)

The T_s-dependent prior normalization is constant across samples and drops
out of the self-normalized ESS.  This is exact importance sampling (no bias),
trading bulk weight variance for tail coverage.

Run:  JAX_PLATFORMS=cpu python scripts/r3b_ala3_tempered_eval.py [n_res] [--n=20000]
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
    lw = lw[np.isfinite(lw)]
    lw = lw - lw.max()
    w = np.exp(lw)
    return float(w.sum() ** 2 / (w**2).sum())


def main():
    from polyala_demo import _load_stats, _make_gen

    from bgflow_tpu.utils.checkpoint import restore_checkpoint

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    kv = dict(f.lstrip("-").split("=", 1) for f in sys.argv[1:] if f.startswith("--") and "=" in f)
    n_res = int(args[0]) if args else 3
    n = int(kv.get("n", 20000))

    ckpt = os.path.join(ART, f"polyala{n_res}_ckpt")
    gen = _make_gen(n_res, None, False, False, use_pallas=False,
                    statistics=_load_stats(ckpt))
    params = restore_checkpoint(ckpt)["params"]

    @jax.jit
    def draw(key, t_s):
        out = gen.sample(params, key, n, temperature=t_s,
                         with_latent=True, with_dlogp=True)
        u_model = gen.prior.energy(*out.zs, temperature=t_s) + out.dlogp
        u_tgt = gen.target.energy(*out.xs, temperature=1.0)
        return u_model - u_tgt

    rep = {"n_res": n_res, "n": n, "by_temperature": {}}
    for t_s in (1.0, 1.02, 1.05, 1.08, 1.12, 1.2, 1.35, 1.5):
        lws = []
        for rep_i in range(2):
            lw = np.asarray(draw(jax.random.PRNGKey(100 * rep_i + 7), t_s), np.float64)
            lws.append(lw)
        lw = np.concatenate(lws)
        e = ess(lw)
        lwf = lw[np.isfinite(lw)]
        rep["by_temperature"][str(t_s)] = {
            "ess": round(e, 2),
            "efficiency_pct": round(100.0 * e / len(lw), 4),
            "top1_minus_median": round(float(np.max(lwf) - np.median(lwf)), 2),
            "q95_minus_median": round(float(np.quantile(lwf, 0.95) - np.median(lwf)), 2),
        }
        print(t_s, rep["by_temperature"][str(t_s)], flush=True)

    with open(os.path.join(ART, f"polyala{n_res}_tempered_eval.json"), "w") as fh:
        json.dump(rep, fh, indent=1)


if __name__ == "__main__":
    main()
