"""Round-5 LJ13 capacity sweep + log-weight tail attribution (VERDICT r4 #5).

Settles whether the 1.27% efficiency of the equivariant LJ13 BG is an
architecture ceiling or under-training:

  sweep — train/eval variants over (n_blocks, n_rbf, n_iter):
            base      ( 8, 32, 24k)  — round-4 result, reused
            depth     (12, 32, 24k)
            features  ( 8, 64, 24k)
            both      (12, 64, 24k)
            long      ( 8, 32, 48k)
  tail  — attribution of the base model's log-weight tail: are the
          worst-weighted samples LJ core overlaps (min pair distance
          << r_m, astronomically positive energy) or well-formed cluster
          geometries in under-covered basins (energy fine, logw bad)?

Writes artifacts/lj13_sweep_r5.json.

Run:  python scripts/r5_lj13_sweep.py [--stages=sweep,tail] [--iters=24000]
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts")
OUT = os.path.join(ART, "lj13_sweep_r5.json")

VARIANTS = [
    ("depth", 12, 32, None),
    ("features", 8, 64, None),
    ("both", 12, 64, None),
    ("long", 8, 32, 48000),
    # round-5 extension: depth was the live lever (8 -> 12 blocks doubled
    # efficiency; features flat; longer training hurt) — push the axis
    ("depth16", 16, 32, None),
    ("depth20", 20, 32, None),
    ("depth24", 24, 32, None),
    ("depth28", 28, 32, None),
]


def run_variant(name, blocks, rbf, iters):
    tag = "" if iters is None else f"_i{iters}"
    env = dict(os.environ, LJ13_BLOCKS=str(blocks), LJ13_RBF=str(rbf),
               LJ13_TAG=tag)
    it = iters or 24000
    t0 = time.time()
    subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "lj13_science.py"),
         "train", "eval", f"--iters={it}"],
        env=env, check=True,
    )
    suffix = ("" if (blocks, rbf) == (8, 32) else f"_b{blocks}_r{rbf}") + tag
    res = json.load(open(os.path.join(ART, f"lj13_science{suffix}.json")))
    return {
        "variant": name, "n_blocks": blocks, "n_rbf": rbf, "n_iter": it,
        "sampling_efficiency_pct": res["sampling_efficiency_pct"],
        "logw_std": res["logw_std"],
        "energy_hist_intersection_reweighted": res["energy_hist_intersection_reweighted"],
        "energy_free_energy_rmsd_kt": res.get("energy_free_energy_rmsd_kt"),
        "train_seconds": round(time.time() - t0, 0),
    }


def tail_attribution(n_eval=65536, n_tail=2048):
    """Where does the base model's logw variance live?"""
    from bgflow_tpu.utils.backend import ensure_reachable_backend

    ensure_reachable_backend()
    import numpy as np
    import jax
    import jax.numpy as jnp
    import lj13_science as L
    import bgflow_tpu as bg
    from bgflow_tpu.utils.checkpoint import restore_checkpoint

    gen = L.make_gen(8, 32)
    params = restore_checkpoint(os.path.join(ART, "lj13_ckpt"))["params"]
    lj = L.make_target()
    out = gen.sample(params, jax.random.PRNGKey(23), n_eval, with_log_weights=True)
    x = np.asarray(out.xs[0]).reshape(n_eval, 13, 3)
    lw = np.asarray(out.log_weights, np.float64)
    u = np.asarray(lj.energy(out.xs[0]), np.float64)

    d = np.linalg.norm(x[:, :, None] - x[:, None, :], axis=-1)
    iu = np.triu_indices(13, 1)
    dmin = d[:, iu[0], iu[1]].min(axis=-1)

    # the weight variance is carried by the HIGHEST logw samples
    # (sum w^2 / (sum w)^2); attribute both ends
    hi = np.argsort(lw)[-n_tail:]
    lo = np.argsort(lw)[:n_tail]
    bulk = np.argsort(lw)[n_eval // 4: -n_eval // 4]

    def stats(idx):
        return {
            "logw_range": [round(float(lw[idx].min()), 1), round(float(lw[idx].max()), 1)],
            "min_pair_dist_median": round(float(np.median(dmin[idx])), 4),
            "min_pair_dist_q05": round(float(np.quantile(dmin[idx], 0.05)), 4),
            "frac_overlap_dmin_lt_0.7rm": round(float((dmin[idx] < 0.7).mean()), 4),
            "energy_median": round(float(np.median(u[idx])), 2),
            "frac_energy_gt_100": round(float((u[idx] > 100).mean()), 4),
        }

    w = np.exp(lw - lw.max())
    top_w_share = float(np.sort(w)[-64:].sum() / w.sum())
    return {
        "n_eval": n_eval,
        "n_tail": n_tail,
        "top64_weight_share": round(top_w_share, 4),
        "high_logw_tail (dominates ESS)": stats(hi),
        "low_logw_tail (clashes)": stats(lo),
        "bulk": stats(bulk),
    }


def main():
    kv = dict(f.lstrip("-").split("=", 1)
              for f in sys.argv[1:] if f.startswith("--") and "=" in f)
    stages = kv.get("stages", "sweep,tail").split(",")
    results = {}
    if os.path.exists(OUT):
        results = json.load(open(OUT))
    base = json.load(open(os.path.join(ART, "lj13_science.json")))
    results.setdefault("sweep", [{
        "variant": "base", "n_blocks": 8, "n_rbf": 32, "n_iter": 24000,
        "sampling_efficiency_pct": base["sampling_efficiency_pct"],
        "logw_std": base["logw_std"],
        "energy_hist_intersection_reweighted": base["energy_hist_intersection_reweighted"],
        "energy_free_energy_rmsd_kt": base.get("energy_free_energy_rmsd_kt"),
    }])
    if "sweep" in stages:
        for name, b, r, it in VARIANTS:
            if any(row["variant"] == name for row in results["sweep"]):
                continue
            print(f"[lj13 sweep] {name}", flush=True)
            results["sweep"].append(run_variant(name, b, r, it))
            with open(OUT, "w") as fh:
                json.dump(results, fh, indent=1)
    if "tail" in stages:
        print("[lj13 sweep] tail attribution", flush=True)
        results["tail_attribution"] = tail_attribution()
        with open(OUT, "w") as fh:
            json.dump(results, fh, indent=1)
    print(json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    main()
