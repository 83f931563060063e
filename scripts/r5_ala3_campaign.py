"""Round-5 ALA3 GBSA campaign: attack the diagnosed coverage wall with the
two untried levers, stacked on tcond (VERDICT r4 item 2).

Levers:
  (b) importance-guided umbrella placement — new umbrella windows placed
      where the ROUND-4 trained model's log-weight right tail lives:
      per-dihedral windows at the tail samples' dihedral quantiles plus
      JOINT windows (all backbone dihedrals biased at once) seeded from
      the highest-logw samples themselves.  The r4 arbiter acquitted the
      training data's equilibration; the wall is the flow's joint
      coverage, so the new data targets exactly the configurations the
      target weights up and the flow misses.
  (c) residue_ar torsion couplings — residue-autoregressive conditioning
      on the GBSA target (previously only run on vacuum ALA3).

Stages (each standalone):
  tgt      — tail analysis of the r4 tc checkpoint + targeted umbrella run
             -> artifacts/gbsa/polyala3_umbrella_tgt.npz
  full     — train tc+aug(tgt)+ar, eval, science   (the gate variant)
  aug      — ablation: tc+aug(tgt) without ar
  ar       — ablation: tc+ar without coverage data
  report   — pooled-efficiency comparison of the variants

Run:  python scripts/r5_ala3_campaign.py [--stages=tgt,full,aug,ar]
      [--iters=N]
"""
import json
import os
import sys
import time

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
T0 = time.time()


def stamp(msg):
    print(f"[r5 {time.strftime('%H:%M:%S')} +{time.time()-T0:.0f}s] {msg}",
          flush=True)


def targeted_umbrella_phase(n_res=N_RES, n_tail=256, per_dih_windows=4,
                            n_joint=24, n_iterations=500, seed=17):
    from bgflow_tpu.energies.peptide import (
        PEPTIDE_MASSES, backbone_dihedrals, build_peptide_topology,
        build_polyala_forcefield, polyala_z_matrix, polyala_reference_xyz,
    )
    from bgflow_tpu.ops.geometry import kabsch_align
    from bgflow_tpu.ops.ic import torsion
    from bgflow_tpu.samplers.umbrella import UmbrellaSampling
    from bgflow_tpu.utils.checkpoint import restore_checkpoint

    # ---- the r4 tc model's log-weight right tail ----
    blob = np.load(os.path.join(pd.ART, f"polyala{n_res}_data.npz"))
    data = blob["data"]
    ckpt = os.path.join(pd.ART, f"polyala{n_res}_ckpt_tc")
    gen = pd._make_gen(n_res, data, False, statistics=pd._load_stats(ckpt),
                       tcond=True)
    params = restore_checkpoint(ckpt)["params"]
    xs, lws = [], []
    key = jax.random.PRNGKey(3)
    for i in range(4):
        key, sub = jax.random.split(key)
        out = gen.sample(params, sub, 25000, with_log_weights=True)
        xs.append(np.asarray(out.xs[0]))
        lws.append(np.asarray(out.log_weights, np.float64))
    x = np.concatenate(xs)
    lw = np.concatenate(lws)
    finite = np.isfinite(lw)
    x, lw = x[finite], lw[finite]
    order = np.argsort(lw)[::-1]
    tail_x = x[order[:n_tail]]
    stamp(f"tail: top {n_tail} of {len(lw)} samples span logw "
          f"[{lw[order[n_tail-1]]:.1f}, {lw[order[0]]:.1f}] vs median {np.median(lw):.1f}")

    seq = ["ACE"] + ["ALA"] * n_res + ["NME"]
    dihs = backbone_dihedrals(seq)
    quads = [d["phi"] for d in dihs] + [d["psi"] for d in dihs]
    S = len(quads)
    atoms, _ = build_peptide_topology(seq)
    n_atoms = len(atoms)
    masses_amu = PEPTIDE_MASSES(atoms)
    masses = jnp.asarray(np.repeat(masses_amu, 3) / masses_amu.min())
    ff = build_polyala_forcefield(n_res, implicit_solvent=True)
    qa = np.asarray(quads)

    def cv(xf):
        p = xf.reshape(-1, n_atoms, 3)
        return jnp.stack(
            [torsion(p[:, a], p[:, b], p[:, c], p[:, d], 1e-7)
             for a, b, c, d in qa], axis=-1)

    tail_cv = np.asarray(cv(jnp.asarray(tail_x)))  # (n_tail, S)

    # per-dihedral windows at tail quantiles
    centers, mask, seeds = [], [], []
    qs = np.linspace(0.1, 0.9, per_dih_windows)
    for s in range(S):
        vals = tail_cv[:, s]
        for q in qs:
            c = np.zeros(S)
            c[s] = np.quantile(vals, q)
            m = np.zeros(S)
            m[s] = 1.0
            centers.append(c)
            mask.append(m)
            # seed: the tail sample nearest this center in dihedral s
            d = np.abs(np.mod(vals - c[s] + np.pi, 2 * np.pi) - np.pi)
            seeds.append(tail_x[np.argmin(d)])

    # joint windows: greedily pick tail samples far apart in CV space
    picked = [0]
    for i in range(1, len(tail_cv)):
        d = np.abs(np.mod(tail_cv[i] - tail_cv[picked] + np.pi, 2 * np.pi) - np.pi)
        if np.min(np.linalg.norm(d, axis=-1)) > 0.8:
            picked.append(i)
        if len(picked) >= n_joint:
            break
    stamp(f"windows: {len(centers)} per-dihedral + {len(picked)} joint")
    for i in picked:
        centers.append(tail_cv[i])
        mask.append(np.ones(S))
        seeds.append(tail_x[i])

    centers = jnp.asarray(np.stack(centers))
    cv_mask = jnp.asarray(np.stack(mask))
    x0 = jnp.asarray(np.stack(seeds))
    # joint windows use a softer spring: all S dihedrals are restrained at
    # once and the goal is local equilibration around the tail mode, not a
    # tight pin
    k_vec = np.where(np.asarray(cv_mask).sum(-1) > 1, 12.0, 40.0)

    us = UmbrellaSampling(
        ff, cv, centers, k_umbrella=jnp.asarray(k_vec)[:, None],
        cv_period=2 * np.pi, cv_mask=cv_mask, mover="hmc",
        hmc_step_size=2e-3, hmc_leapfrog=10, masses=masses,
        stride=10, n_burnin=300,
    )
    t0 = time.time()
    samples = us.run(jax.random.PRNGKey(seed), x0, n_iterations)
    stamp(f"targeted umbrella: {samples.shape} in {time.time()-t0:.0f}s")
    cv_vals, log_w = us.unbiased_log_weights(samples)

    frames = np.asarray(samples).reshape(-1, 3 * n_atoms)
    ref = jnp.asarray(polyala_reference_xyz(n_res), jnp.float32)
    _, fixed = polyala_z_matrix(n_res)
    aligned = []
    for i in range(0, frames.shape[0], 16384):
        chunk = jnp.asarray(frames[i:i + 16384], jnp.float32).reshape(-1, n_atoms, 3)
        aligned.append(np.asarray(kabsch_align(chunk, ref, atoms=fixed)))
    frames = np.concatenate(aligned).reshape(-1, 3 * n_atoms)

    w = np.exp(np.asarray(log_w) - np.max(np.asarray(log_w)))
    w /= w.sum()
    np.savez_compressed(
        os.path.join(pd.ART, f"polyala{n_res}_umbrella_tgt.npz"),
        frames=frames, cv=np.asarray(cv_vals),
        log_weights=np.asarray(log_w),
        n_per_dih=len(qs) * S, n_joint=len(picked),
    )
    stamp(f"targeted umbrella: {frames.shape[0]} frames, "
          f"weight-ESS {1.0/np.sum(w**2):.0f}")


def run_variant(tag_kw, n_iter, label):
    stamp(f"train {label} ({n_iter} iters)")
    pd.train_phase(N_RES, n_iter=n_iter, tcond=True, **tag_kw)
    stamp(f"eval {label}")
    pd.eval_phase(N_RES, n_eval=50000, tcond=True, **tag_kw)
    stamp(f"science {label}")
    import polyala_science

    flags = ["--gbsa", "--tcond"]
    if tag_kw.get("augment"):
        flags.append("--augment")
    if tag_kw.get("residue_ar"):
        flags.append("--ar")
    sys.argv = ["polyala_science.py", str(N_RES)] + flags
    polyala_science.main()


def main():
    kv = dict(f.lstrip("-").split("=", 1)
              for f in sys.argv[1:] if f.startswith("--") and "=" in f)
    stages = kv.get("stages", "tgt,full,aug,ar").split(",")
    n_iter = int(kv.get("iters", 24000))
    if "tgt" in stages:
        stamp("targeted umbrella phase")
        targeted_umbrella_phase()
    if "full" in stages:
        run_variant(dict(augment=True, residue_ar=True), n_iter, "tc+aug(tgt)+ar")
    if "aug" in stages:
        run_variant(dict(augment=True), n_iter, "tc+aug(tgt)")
    if "ar" in stages:
        run_variant(dict(residue_ar=True), n_iter, "tc+ar")
    stamp("campaign done")


if __name__ == "__main__":
    main()
