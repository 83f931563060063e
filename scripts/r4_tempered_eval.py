"""Tempered-proposal importance sampling through a TEMPERATURE-CONDITIONED
ALA3 BG — supersedes the round-3 null result.

Round 3 recorded artifacts/polyala3_tempered_eval.json as a structural
null: with uniform torsion priors and no temperature input, q is
T-independent, so "sampling the model at T_s" changed nothing.  The
``--tcond`` variant (``Coupling(temperature_feature=True)``, trained on
all ladder rungs at their own temperatures) gives q(x | T) a real
temperature axis; this script redoes the exact importance-sampling sweep:

    x ~ q(. | T_s),   log w = [u_prior(z, T_s) + dlogp_Ts] - u_target(x, 1)

(exact, self-normalized — the T_s-dependent prior constant drops out).

Run:  python scripts/r4_tempered_eval.py [n_res] [--gbsa] [--n=20000]
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


def ess(lw):
    lw = lw[np.isfinite(lw)]
    lw = lw - lw.max()
    w = np.exp(lw)
    return float(w.sum() ** 2 / (w**2).sum())


def main():
    import polyala_demo as pd

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    kv = dict(f.lstrip("-").split("=", 1) for f in flags if "=" in f)
    n_res = int(args[0]) if args else 3
    n = int(kv.get("n", 20000))
    if "--gbsa" in flags:
        pd.IMPLICIT_SOLVENT = True
        pd.ART = os.path.join(pd.ART, "gbsa")

    from bgflow_tpu.utils.checkpoint import restore_checkpoint

    data = np.load(os.path.join(pd.ART, f"polyala{n_res}_data.npz"))["data"]
    ckpt = os.path.join(pd.ART, f"polyala{n_res}_ckpt_tc")
    gen = pd._make_gen(n_res, data, False, False,
                       statistics=pd._load_stats(ckpt), tcond=True)
    params = restore_checkpoint(ckpt)["params"]

    @jax.jit
    def draw(key, t_s):
        out = gen.sample(params, key, n, temperature=t_s,
                         with_latent=True, with_dlogp=True)
        u_model = gen.prior.energy(*out.zs, temperature=t_s) + out.dlogp
        u_tgt = gen.target.energy(*out.xs, temperature=1.0)
        return u_model - u_tgt

    rep = {
        "n_res": n_res,
        "n": 2 * n,
        "model": "temperature-conditioned (--tcond), trained on all rungs",
        "implicit_solvent": bool(pd.IMPLICIT_SOLVENT),
        "by_temperature": {},
    }
    for t_s in (1.0, 1.02, 1.05, 1.08, 1.12, 1.2, 1.35, 1.5):
        lws = []
        for rep_i in range(2):
            lw = np.asarray(draw(jax.random.PRNGKey(100 * rep_i + 7),
                                 jnp.float32(t_s)), np.float64)
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

    # temperature TRANSFER: how well does q(. | tau) match the tau-target?
    # (the ala2_temperature.py sweep, now with a genuinely T-dependent model)
    @jax.jit
    def draw_transfer(key, tau):
        out = gen.sample(params, key, n, temperature=tau,
                         with_latent=True, with_dlogp=True)
        u_model = gen.prior.energy(*out.zs, temperature=tau) + out.dlogp
        u_tgt = gen.target.energy(*out.xs, temperature=tau)
        return u_model - u_tgt

    rep["transfer_by_temperature"] = {}
    for tau in (0.85, 1.0, 1.15, 1.15**2, 1.15**3, 1.15**5, 1.15**7):
        lw = np.concatenate([
            np.asarray(draw_transfer(jax.random.PRNGKey(50 * i + 3),
                                     jnp.float32(tau)), np.float64)
            for i in range(2)
        ])
        e = ess(lw)
        rep["transfer_by_temperature"][f"{tau:.4g}"] = {
            "ess": round(e, 2),
            "efficiency_pct": round(100.0 * e / len(lw), 4),
        }
        print("transfer", round(tau, 4),
              rep["transfer_by_temperature"][f"{tau:.4g}"], flush=True)

    path = os.path.join(pd.ART, f"polyala{n_res}_tempered_eval_tc.json")
    with open(path, "w") as fh:
        json.dump(rep, fh, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
