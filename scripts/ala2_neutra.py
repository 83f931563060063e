"""NeuTra (flow-preconditioned HMC) on the trained ala2 flagship.

Three claims, one artifact (artifacts/ala2_neutra.json):

1. With a GOOD flow the latent pushforward is well-conditioned: the tuned
   HMC step is large and acceptance healthy (contrast: a mediocre ALA3
   checkpoint tunes into the 1e-3 regime).
2. Mixing across barriers: chains seeded in the rare C7ax basin (the
   training data over-represents it at ~4.7%) must ESCAPE over the phi
   barrier toward the ~1e-5 equilibrium occupancy (dF ~ -11.6 kT,
   ala2_science.json).  Latent chains escape within tens of iterations;
   x-space HMC chains at the same gradient budget essentially never do
   (the barrier is worth ~e^10 waiting times).  Escape fraction and
   median escape time are the headline mixing numbers.
3. Within-basin mixing: per-chain-mean-subtracted IACTs of cos/sin of
   phi/psi (this deliberately EXCLUDES the cross-basin mode, which the
   escape statistics cover; for frozen x-space chains it reports the
   deceptively fast within-basin relaxation).

Run (CPU ok):  python scripts/ala2_neutra.py [n_chains] [n_iter]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bgflow_tpu.utils.backend import ensure_reachable_backend

ON_TPU = ensure_reachable_backend()
import jax
import jax.numpy as jnp

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts")


def phi_psi_of(frames):
    from bgflow_tpu.ops.ic import torsion

    x = jnp.asarray(frames).reshape(-1, 22, 3)
    phi = torsion(x[:, 4], x[:, 6], x[:, 8], x[:, 14], 1e-7)
    psi = torsion(x[:, 6], x[:, 8], x[:, 14], x[:, 16], 1e-7)
    return np.asarray(phi), np.asarray(psi)


def iact(series):
    """Integrated autocorrelation time of a (n_iter, n_chains) series.

    Chain-mean-subtracted FFT autocorrelation averaged over chains;
    initial-positive-sequence truncation (Geyer).  1.0 = iid."""
    s = np.asarray(series, np.float64)
    n = s.shape[0]
    s = s - s.mean(axis=0, keepdims=True)
    f = np.fft.rfft(s, n=2 * n, axis=0)
    acov = np.fft.irfft(f * np.conj(f), axis=0)[:n].mean(axis=1)
    if acov[0] <= 0:
        return float("nan")
    rho = acov / acov[0]
    tau = 1.0
    for k in range(1, n):
        if rho[k] <= 0:
            break
        tau += 2.0 * rho[k]
    return float(tau)


def dihedral_iacts(phi, psi):
    return {
        "cos_phi": iact(np.cos(phi)),
        "sin_phi": iact(np.sin(phi)),
        "cos_psi": iact(np.cos(psi)),
        "sin_psi": iact(np.sin(psi)),
    }


def escape_stats(phi_series, start_phi):
    """Escape of chains seeded in the C7ax basin (phi0 > 0.2).

    Returns (n_seeded, escaped_fraction, median_escape_iteration) where an
    escape is the first iteration with phi < 0 (well inside C7eq/alphaR).
    """
    s = np.asarray(phi_series)
    seeded = np.asarray(start_phi) > 0.2
    n = int(seeded.sum())
    if n == 0:
        return {"n_seeded": 0, "escaped_fraction": float("nan"),
                "median_escape_iteration": float("nan")}
    crossed = s[:, seeded] < 0.0  # (n_iter, n_seeded)
    ever = crossed.any(axis=0)
    first = np.where(ever, crossed.argmax(axis=0), s.shape[0])
    return {
        "n_seeded": n,
        "escaped_fraction": float(ever.mean()),
        "median_escape_iteration": float(np.median(first[ever])) if ever.any() else float("nan"),
    }


def main(n_chains=256, n_iter=256):
    import bgflow_tpu as bg
    from bgflow_tpu.models.ala2 import make_ala2_generator
    from bgflow_tpu.samplers.iterative import SamplerState
    from bgflow_tpu.samplers.mcmc import HMCStep, tune_hmc_step_size
    from bgflow_tpu.utils.checkpoint import restore_checkpoint

    train_path = os.path.join(ART, "ala2_train_data.npz")
    if os.path.exists(train_path):
        data = np.load(train_path)["data"]
    else:
        data = np.load(os.path.join(ART, "ala2_exact_data.npz"))["data"][:-8192]
    gen = make_ala2_generator(
        data, hidden=(128, 128), num_bins=8, keepdims=9,
        use_pallas_spline=jax.default_backend() == "tpu",
    )
    template = gen.init(jax.random.PRNGKey(0))
    params = restore_checkpoint(os.path.join(ART, "ala2_ckpt"), template=template)

    key = jax.random.PRNGKey(3)
    x0 = jnp.asarray(data[:: max(1, len(data) // n_chains)][:n_chains])
    n_leapfrog, stride = 10, 2
    n_burnin = 100

    # ---- NeuTra chains -------------------------------------------------
    t0 = time.time()
    res = bg.neutra_sample(
        gen, params, key, n_samples=n_chains * n_iter, n_chains=n_chains,
        x0=x0, n_burnin=n_burnin, stride=stride, n_leapfrog=n_leapfrog,
    )
    t_neutra = time.time() - t0
    phi_f, psi_f = phi_psi_of(res.xs[0])
    phi_nt = phi_f.reshape(n_iter, n_chains)
    psi_nt = psi_f.reshape(n_iter, n_chains)
    occ = float(np.mean(phi_nt > 0.2))
    occ_first = float(np.mean(phi_nt[: n_iter // 2] > 0.2))
    occ_second = float(np.mean(phi_nt[n_iter // 2 :] > 0.2))

    # ---- x-space HMC at the same gradient budget ----------------------
    ff = gen.target
    step_x, acc_x = tune_hmc_step_size(
        ff, x0, jax.random.fold_in(key, 50), step_size=2e-3, n_leapfrog=n_leapfrog,
    )
    hmc = HMCStep(ff, step_size=step_x, n_leapfrog=n_leapfrog, n_steps=stride)
    state = SamplerState(
        samples=(x0,), energies=ff.energy(x0), step_count=jnp.zeros((), jnp.int32)
    )
    advance = jax.jit(hmc.step)
    k = jax.random.fold_in(key, 51)
    for _ in range(n_burnin // stride):
        k, sub = jax.random.split(k)
        state = advance(state, sub)
    phix, psix = [], []
    for _ in range(n_iter):
        k, sub = jax.random.split(k)
        state = advance(state, sub)
        p, q = phi_psi_of(state.samples[0])
        phix.append(p)
        psix.append(q)
    phi_x = np.stack(phix, axis=0)  # (n_iter, n_chains)
    psi_x = np.stack(psix, axis=0)

    iact_nt = dihedral_iacts(phi_nt, psi_nt)
    iact_x = dihedral_iacts(phi_x, psi_x)

    phi0 = np.asarray(phi_psi_of(x0)[0])
    x0_occ = float(np.mean(phi0 > 0.2))
    out = {
        "n_chains": n_chains,
        "n_iter": n_iter,
        "hmc": {"n_leapfrog": n_leapfrog, "stride": stride, "n_burnin": n_burnin},
        "start_c7ax_fraction": x0_occ,
        "neutra": {
            "step_size": res.step_size,
            "tuning_acceptance": res.acceptance,
            "c7ax_occupancy": occ,
            "c7ax_occupancy_first_half": occ_first,
            "c7ax_occupancy_second_half": occ_second,
            "c7ax_escape": escape_stats(phi_nt, phi0),
            "iact_within_basin_iterations": iact_nt,
            "mean_energy_kt": float(res.energies.mean()),
            "seconds": round(t_neutra, 1),
        },
        "xspace_hmc_same_budget": {
            "step_size": step_x,
            "tuning_acceptance": acc_x,
            "c7ax_occupancy": float(np.mean(phi_x > 0.2)),
            "c7ax_escape": escape_stats(phi_x, phi0),
            "iact_within_basin_iterations": iact_x,
        },
        "equilibrium_c7ax_occupancy_reference": 9.4e-6,  # ala2_science.json dF
    }
    with open(os.path.join(ART, "ala2_neutra.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main(
        n_chains=int(sys.argv[1]) if len(sys.argv) > 1 else 256,
        n_iter=int(sys.argv[2]) if len(sys.argv) > 2 else 256,
    )
