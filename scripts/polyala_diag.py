"""Per-term energy diagnosis of a trained poly-alanine BG.

Locates WHERE model samples carry excess energy relative to the training
data (bond / angle / torsion / nonbonded split, plus bond-length and
angle deviation statistics) — the ALA3 eval shows good per-dihedral
marginal overlap but ~100 kT mean excess energy, and this script says
which term is responsible.

Run:  python scripts/polyala_diag.py [n_res] [--neutra] [--augment] [--marginals]
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


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from polyala_demo import _make_gen, _tag, _training_set

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    n_res = int(args[0]) if args else 3
    augment = "--augment" in flags
    marginals = "--marginals" in flags
    neutra = "--neutra" in flags

    from bgflow_tpu.energies.peptide import build_polyala_forcefield
    from bgflow_tpu.utils.checkpoint import restore_checkpoint

    data, _ = _training_set(n_res, augment, neutra, marginals)
    gen = _make_gen(n_res, data, marginals)
    ckpt = os.path.join(ART, f"polyala{n_res}_ckpt{_tag(augment, marginals, False, neutra)}")
    params = restore_checkpoint(ckpt)["params"]
    ff = build_polyala_forcefield(n_res)

    n = 8192
    out = gen.sample(params, jax.random.PRNGKey(3), n)
    xm = out.xs[0]
    xd = jnp.asarray(data[:n])

    def terms(x):
        return {
            "bond": float(jnp.mean(ff.bond_energy(x))),
            "angle": float(jnp.mean(ff.angle_energy(x))),
            "torsion": float(jnp.mean(ff.torsion_energy(x))),
            "nonbonded": float(jnp.mean(ff.nonbonded_energy(x))),
            "total": float(jnp.mean(ff.energy(x))),
        }

    def quantiles(x):
        e = ff.energy(x)
        qs = np.quantile(np.asarray(e), [0.05, 0.25, 0.5, 0.75, 0.95, 0.999])
        return [round(float(q), 2) for q in qs]

    rep = {
        "n_res": n_res,
        "config": {"augment": augment, "marginals": marginals, "neutra": neutra},
        "model": terms(xm),
        "data": terms(xd),
        "model_energy_quantiles": quantiles(xm),
        "data_energy_quantiles": quantiles(xd),
    }
    print(json.dumps(rep, indent=1), flush=True)
    with open(os.path.join(ART, f"polyala{n_res}_diag{_tag(augment, marginals, False, neutra)}.json"), "w") as fh:
        json.dump(rep, fh, indent=1)


if __name__ == "__main__":
    main()
