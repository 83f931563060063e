"""2D Ramachandran free-energy validation of the ala2 flagship.

Extends the 1D phi-PMF science closeout (scripts/ala2_science.py) to the
full (phi, psi) surface: the BG-reweighted 2D PMF must agree with an
independent 2D umbrella-sampling + joint-MBAR estimate over all bins both
methods sample well.

Phases (resumable; artifacts under artifacts/):

  umbrella — (phi, psi) umbrella grid (vector CV, both dims periodic),
             HMC windows run as ONE batch, joint MBAR unbiasing
             -> ala2_rama2d_umbrella.npz
  bg       — sample the trained flagship checkpoint (ala2_ckpt), weighted
             2D histogram -> PMF                     -> ala2_rama2d_bg.npz
  compare  — RMSD/maxdev over shared well-sampled bins
             -> ala2_rama2d.json

Run:  python scripts/ala2_rama2d.py <phase> (TPU: ambient env; CPU:
      env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu).
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
ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts")

DATA_PATH = os.path.join(ART, "ala2_exact_data.npz")
TRAIN_DATA_PATH = os.path.join(ART, "ala2_train_data.npz")
UMB_PATH = os.path.join(ART, "ala2_rama2d_umbrella.npz")
BG_PATH = os.path.join(ART, "ala2_rama2d_bg.npz")
RESULTS_PATH = os.path.join(ART, "ala2_rama2d.json")

N_BINS = 24  # PMF grid (both axes), [-pi, pi)


def cv_phi_psi(x):
    """(B, 66) -> (B, 2) backbone (phi, psi) in radians."""
    from bgflow_tpu.ops.ic import torsion

    p = x.reshape(-1, 22, 3)
    phi = torsion(p[:, 4], p[:, 6], p[:, 8], p[:, 14], 1e-7)
    psi = torsion(p[:, 6], p[:, 8], p[:, 14], p[:, 16], 1e-7)
    return jnp.stack([phi, psi], axis=-1)


def _edges():
    return np.linspace(-np.pi, np.pi, N_BINS + 1)


def _hist2d(cv, log_w=None):
    """Weighted counts + raw counts on the PMF grid; cv: (N, 2) numpy."""
    cv = np.asarray(cv)
    e = _edges()
    if log_w is None:
        w = np.ones(cv.shape[0])
    else:
        log_w = np.asarray(log_w, dtype=np.float64)
        finite = np.isfinite(log_w)
        cv, log_w = cv[finite], log_w[finite]
        w = np.exp(log_w - log_w.max())
    hist, _, _ = np.histogram2d(cv[:, 0], cv[:, 1], bins=(e, e), weights=w)
    counts, _, _ = np.histogram2d(cv[:, 0], cv[:, 1], bins=(e, e))
    p = hist / hist.sum()
    f = np.where(p > 0, -np.log(np.maximum(p, 1e-300)), np.nan)
    return f - np.nanmin(f), counts.astype(np.int64)


def umbrella(n_side=16, n_iterations=400, k_umbrella=50.0, stride=10, seed=3):
    """(phi, psi) umbrella grid -> joint-MBAR-unbiased frames.

    n_side^2 windows advance as one HMC batch (the vector-CV path of
    ``samplers/umbrella.py``); both CV dims are periodic.
    """
    from bgflow_tpu.energies.ala2 import ALA2_REFERENCE_XYZ, build_ala2_forcefield
    from bgflow_tpu.models.ala2 import ALA2_MASSES
    from bgflow_tpu.samplers.umbrella import UmbrellaSampling

    ff = build_ala2_forcefield()
    g = np.linspace(-np.pi, np.pi, n_side, endpoint=False)
    centers = np.stack(np.meshgrid(g, g, indexing="ij"), axis=-1).reshape(-1, 2)
    masses = jnp.asarray(np.repeat(ALA2_MASSES, 3) / ALA2_MASSES.min())
    us = UmbrellaSampling(
        ff, cv_phi_psi, jnp.asarray(centers), k_umbrella=k_umbrella,
        cv_period=2 * np.pi, mover="hmc", hmc_step_size=2e-3,
        hmc_leapfrog=10, masses=masses, stride=stride, n_burnin=400,
    )
    # seed each window with the exact-ensemble frame nearest its center in
    # the torus metric (equilibrated orthogonal dofs; the bias pulls the
    # dihedrals the rest of the way during burn-in)
    frames = jnp.asarray(np.load(DATA_PATH)["data"])
    cvs = cv_phi_psi(frames)  # (N, 2)
    d = jnp.mod(cvs[None, :, :] - jnp.asarray(centers)[:, None, :] + np.pi,
                2 * np.pi) - np.pi
    x0 = frames[jnp.argmin(jnp.sum(d * d, axis=-1), axis=1)]
    t0 = time.time()
    samples = us.run(jax.random.PRNGKey(seed), x0, n_iterations)
    print(f"umbrella2d: {samples.shape} in {time.time() - t0:.0f}s", flush=True)
    cv_vals, log_w = us.unbiased_log_weights(samples)
    f, counts = _hist2d(cv_vals, log_w)
    np.savez_compressed(
        UMB_PATH,
        cv=np.asarray(cv_vals), log_weights=np.asarray(log_w),
        pmf=f, counts=counts, centers=centers,
        k_umbrella=k_umbrella, n_iterations=n_iterations,
    )
    print(f"umbrella2d: {np.isfinite(f).sum()}/{f.size} bins populated", flush=True)


def bg(n_eval=200_000, chunk=50_000, seed=2):
    """Sample the trained flagship; importance-weighted 2D PMF."""
    from bgflow_tpu.models.ala2 import make_ala2_generator
    from bgflow_tpu.utils.checkpoint import restore_checkpoint

    if os.path.exists(TRAIN_DATA_PATH):
        data = np.load(TRAIN_DATA_PATH)["data"]
    else:
        data = np.load(DATA_PATH)["data"][:-8192]
    gen = make_ala2_generator(
        data, hidden=(128, 128), num_bins=8, keepdims=9,
        use_pallas_spline=jax.default_backend() == "tpu",
    )
    template = gen.init(jax.random.PRNGKey(0))
    params = restore_checkpoint(os.path.join(ART, "ala2_ckpt"), template=template)
    sample = jax.jit(lambda key: (
        lambda o: (o.xs[0], o.log_weights)
    )(gen.sample(params, key, chunk, with_log_weights=True)))
    cvs, lws = [], []
    key = jax.random.PRNGKey(seed)
    t0 = time.time()
    for i in range(-(-n_eval // chunk)):
        key, sub = jax.random.split(key)
        x, lw = sample(sub)
        cvs.append(np.asarray(cv_phi_psi(x)))
        lws.append(np.asarray(lw))
    cv = np.concatenate(cvs)[:n_eval]
    log_w = np.concatenate(lws)[:n_eval]
    print(f"bg: {cv.shape[0]} samples in {time.time() - t0:.0f}s", flush=True)
    f, counts = _hist2d(cv, log_w)
    np.savez_compressed(BG_PATH, cv=cv, log_weights=log_w, pmf=f, counts=counts)
    print(f"bg: {np.isfinite(f).sum()}/{f.size} bins populated", flush=True)


def compare(min_counts=50, well_kt=10.0):
    """RMSD between the two PMFs over bins both methods sample well.

    Two tiers: all shared bins (raw counts pass the threshold in both —
    umbrella raw counts are bias-inflated, so this tier reaches far up the
    free-energy surface where the BG's reweighted statistics are thin), and
    the well region (umbrella F <= ``well_kt``), where both estimates are
    statistically solid — that's the headline number, analogous to the 1D
    phi-PMF comparison in ala2_science.py.
    """
    ub = np.load(UMB_PATH)
    bgz = np.load(BG_PATH)
    f_u, c_u = ub["pmf"], ub["counts"]
    f_b, c_b = bgz["pmf"], bgz["counts"]
    ok = (
        np.isfinite(f_u) & np.isfinite(f_b)
        & (c_u >= min_counts) & (c_b >= min_counts)
    )

    def stats(mask):
        diff = f_b[mask] - f_u[mask]
        diff -= diff.mean()  # PMFs are min-shifted independently
        return {
            "n_bins": int(mask.sum()),
            "rmsd_kt": round(float(np.sqrt(np.mean(diff**2))), 4),
            "maxdev_kt": round(float(np.max(np.abs(diff))), 4),
            "pmf_range_kt": round(float(f_u[mask].max() - f_u[mask].min()), 2),
        }

    well = ok & (f_u <= well_kt)
    out = {
        "n_bins_grid": int(f_u.size),
        "min_counts": int(min_counts),
        "umbrella_bins_populated": int(np.isfinite(f_u).sum()),
        "bg_bins_populated": int(np.isfinite(f_b).sum()),
        "well_region": {"max_umbrella_pmf_kt": well_kt, **stats(well)},
        "all_shared_bins": stats(ok),
    }
    print(json.dumps(out, indent=1))
    with open(RESULTS_PATH, "w") as fh:
        json.dump(out, fh, indent=1)
    return out


if __name__ == "__main__":
    phase = sys.argv[1] if len(sys.argv) > 1 else "all"
    if phase in ("umbrella", "all"):
        umbrella()
    if phase in ("bg", "all"):
        bg()
    if phase in ("compare", "all"):
        compare()
