"""Arbiter: which GBSA ALA3 ensemble is equilibrated — ladder cold rung or
NeuTra?

The two claim T=1 means ~6 kT apart (artifacts/gbsa/r4_neutra_diag.json).
Run long plain x-space HMC at T=1 from BOTH starting pools and watch the
running mean energy: if the two converge to a common value, that value is
the equilibrium mean and the other pool was biased.  Pure MCMC — no flow,
no reweighting — so the verdict is model-free.

Run:  python scripts/r4_equil_arbiter.py [n_res] [--iters=3000]
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

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "gbsa")


def main():
    from bgflow_tpu.energies.peptide import build_polyala_forcefield
    from bgflow_tpu.samplers.iterative import SamplerState
    from bgflow_tpu.samplers.mcmc import HMCStep

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    kv = dict(f.lstrip("-").split("=", 1) for f in sys.argv[1:] if "=" in f)
    n_res = int(args[0]) if args else 3
    n_iter = int(kv.get("iters", 3000))
    n_chains = 256  # per pool
    scan_chunk = 100

    ff = build_polyala_forcefield(n_res, implicit_solvent=True)
    lad = np.load(os.path.join(ART, f"polyala{n_res}_data.npz"))["data"]
    cold = lad[np.arange(len(lad)) % 8 == 0]
    neu = np.load(os.path.join(ART, f"polyala{n_res}_neutra.npz"))["data"]
    x0 = jnp.asarray(np.concatenate([
        cold[:: max(1, len(cold) // n_chains)][:n_chains],
        neu[:: max(1, len(neu) // n_chains)][:n_chains],
    ]), jnp.float32)

    hmc = HMCStep(ff, step_size=2e-3, n_leapfrog=10, n_steps=1)
    state = SamplerState(samples=(x0,), energies=ff.energy(x0),
                         step_count=jnp.zeros((), jnp.int32))

    @jax.jit
    def chunk(state, key):
        def body(s, sub):
            s = hmc.step(s, sub)
            return s, jnp.stack([
                jnp.mean(s.energies[:n_chains]),
                jnp.mean(s.energies[n_chains:]),
            ])

        return jax.lax.scan(body, state, jax.random.split(key, scan_chunk))

    key = jax.random.PRNGKey(17)
    t0 = time.time()
    traces = []
    for i in range(-(-n_iter // scan_chunk)):
        key, sub = jax.random.split(key)
        state, tr = chunk(state, sub)
        traces.append(np.asarray(tr))
        m = traces[-1].mean(axis=0)
        print(f"iter {(i+1)*scan_chunk}: <u> ladder-pool {m[0]:.2f} "
              f"neutra-pool {m[1]:.2f} kT  ({time.time()-t0:.0f}s)", flush=True)
    tr = np.concatenate(traces)  # (n_iter, 2)
    tail = tr[-max(1, len(tr) // 4):]
    res = {
        "n_res": n_res,
        "n_iter_hmc": int(len(tr)),
        "n_chains_per_pool": n_chains,
        "start_mean_u_kt": {"ladder_pool": float(tr[0, 0]), "neutra_pool": float(tr[0, 1])},
        "final_quarter_mean_u_kt": {
            "ladder_pool": round(float(tail[:, 0].mean()), 3),
            "neutra_pool": round(float(tail[:, 1].mean()), 3),
        },
        "gap_final_kt": round(float(tail[:, 0].mean() - tail[:, 1].mean()), 3),
        "trace_every_100": [[round(float(a), 2), round(float(b), 2)]
                            for a, b in tr[::100]],
    }
    print(json.dumps({k: v for k, v in res.items() if k != "trace_every_100"},
                     indent=1), flush=True)
    with open(os.path.join(ART, f"r4_equil_arbiter_{n_res}.json"), "w") as fh:
        json.dump(res, fh, indent=1)


if __name__ == "__main__":
    main()
