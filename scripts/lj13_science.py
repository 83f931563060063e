"""LJ13 equivariant-flow science: exact data -> trained BG -> validated ESS.

The equivariant stack's flagship result (VERDICT r2 item 7): the
13-particle Lennard-Jones cluster — the system the reference's
kernel-dynamics / equivariant-RNVP line of work targets
(``bgflow/nn/flow/dynamics/kernel_dynamic.py``,
``notebooks/example_equivariant_RNVP.ipynb``) — taken to a *measured*
result: sampling efficiency and energy-histogram agreement against an
independent replica-exchange ensemble, recorded as an artifact.

Model: augmented equivariant coupling BG on the mean-free pair (x, v) —
E(3)- and permutation-equivariant kernel shifts with invariant global
scales, Gaussian kinetic channel (so importance weights on the joint are
exact for the x-marginal).

Phases (resumable):
  data   — HMC + replica-exchange exact ensemble at T=1 (cold rung kept)
  train  — NLL training of the augmented equivariant coupling BG
  eval   — ESS / efficiency, reweighted energy-histogram agreement vs the
           data ensemble, flow-perturbation cross-check; writes
           artifacts/lj13_science.json

Run:  python scripts/lj13_science.py <phase> [--iters=N] [--batch=N]
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

import bgflow_tpu as bg

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts")
DATA_PATH = os.path.join(ART, "lj13_data.npz")

# round-5 capacity sweep knobs (VERDICT r4 item 5): architecture via env so
# every variant keeps its own checkpoint/results file
N_BLOCKS = int(os.environ.get("LJ13_BLOCKS", "8"))
N_RBF = int(os.environ.get("LJ13_RBF", "32"))
_SUFFIX = ("" if (N_BLOCKS, N_RBF) == (8, 32) else f"_b{N_BLOCKS}_r{N_RBF}") + \
    os.environ.get("LJ13_TAG", "")
CKPT = os.path.join(ART, f"lj13_ckpt{_SUFFIX}")
RESULTS = os.path.join(ART, f"lj13_science{_SUFFIX}.json")

N, D = 13, 3
DIM = N * D


def make_target(two_event_dims=False):
    lj = bg.LennardJonesPotential(
        DIM, N, eps=1.0, rm=1.0, oscillator=True, oscillator_scale=1.0,
        two_event_dims=two_event_dims,
    )
    return lj


def _remove_mean(x):
    p = x.reshape(-1, N, D)
    return (p - p.mean(axis=1, keepdims=True)).reshape(x.shape)


def data_phase(n_samples=131072, n_ladders=128, seed=0,
               temperatures=tuple(1.2**i for i in range(6)),
               step_size=1e-2, n_leapfrog=10, n_burnin=600, stride=5,
               scan_chunk=128):
    """Exact-Boltzmann LJ13 ensemble: HMC + replica exchange, cold rung kept.

    Ladder spacing follows the 1 + sqrt(2/D) rule (39 dof -> <= 1.23x); the
    loop runs in chunked lax.scan blocks — per-iteration host round-trips
    dominate wall-clock on a tunneled accelerator (see
    models/polyala.py::generate_polyala_data_exact)."""
    from bgflow_tpu.parallel.tempering import ReplicaExchangeStep
    from bgflow_tpu.samplers.iterative import SamplerState
    from bgflow_tpu.samplers.mcmc import HMCStep

    lj = make_target()
    temps = jnp.asarray(temperatures, jnp.float32)
    k = temps.shape[0]
    temps_flat = jnp.tile(temps, n_ladders)

    # start from a jittered icosahedral-ish cluster: minimize from random
    key = jax.random.PRNGKey(seed)
    x0 = 0.7 * jax.random.normal(key, (n_ladders * k, DIM))
    x0 = _remove_mean(x0)

    @jax.jit
    def gd_block(x):
        def body(xx, _):
            g = jax.grad(lambda v: jnp.sum(lj.energy(v)))(xx)
            g = jnp.clip(g, -50.0, 50.0)
            return _remove_mean(xx - 1e-3 * g), None

        return jax.lax.scan(body, x, None, length=200)[0]

    for _ in range(10):
        x0 = gd_block(x0)
    print(f"minimized starts: <u> {float(lj.energy(x0).mean()):.1f} kT", flush=True)

    hmc = HMCStep(lj, step_size=step_size, n_leapfrog=n_leapfrog,
                  target_temperatures=temps_flat, n_steps=stride)
    rex = ReplicaExchangeStep(lj, temps)

    def one_iteration(state, key):
        k1, k2 = jax.random.split(key)
        state = hmc.step(state, k1)
        return rex.step(state, k2)

    @jax.jit
    def burn_chunk(state, key):
        def body(s, sub):
            return one_iteration(s, sub), None

        return jax.lax.scan(body, state, jax.random.split(key, scan_chunk))[0]

    @jax.jit
    def collect_chunk(state, key):
        def body(s, sub):
            s = one_iteration(s, sub)
            return s, s.samples[0][0::k]  # cold rung

        return jax.lax.scan(body, state, jax.random.split(key, scan_chunk))

    state = SamplerState(samples=(x0,), energies=lj.energy(x0),
                         step_count=jnp.zeros((), jnp.int32))
    t0 = time.time()
    for _ in range(-(-n_burnin // scan_chunk)):
        key, sub = jax.random.split(key)
        state = burn_chunk(state, sub)
    jax.block_until_ready(state.energies)
    print(f"lj13 data: burn-in done in {time.time()-t0:.0f}s", flush=True)
    n_iter = -(-n_samples // n_ladders)
    frames = []
    n_chunks = -(-n_iter // scan_chunk)
    for i in range(n_chunks):
        key, sub = jax.random.split(key)
        state, xs = collect_chunk(state, sub)
        frames.append(np.asarray(xs).reshape(-1, DIM))
        print(f"lj13 data: chunk {i+1}/{n_chunks} at {time.time()-t0:.0f}s", flush=True)
    data = np.concatenate(frames)[:n_samples]
    data = np.asarray(_remove_mean(jnp.asarray(data)))
    u = np.asarray(lj.energy(jnp.asarray(data)))
    print(f"data: {data.shape} in {time.time()-t0:.0f}s, "
          f"<u> {u.mean():.2f} kT, std {u.std():.2f}", flush=True)
    np.savez_compressed(DATA_PATH, data=data, energies=u)


def make_gen(n_blocks=None, n_rbf=None, hidden=(128, 128), high_energy=1e3):
    n_blocks = N_BLOCKS if n_blocks is None else n_blocks
    n_rbf = N_RBF if n_rbf is None else n_rbf
    lj = make_target()
    target = bg.ProductEnergy([
        bg.LinLogCutEnergy(lj, high_energy=high_energy, max_energy=1e9),
        bg.MeanFreeNormalDistribution(DIM, N, two_event_dims=False),
    ])
    prior = bg.ProductDistribution([
        bg.MeanFreeNormalDistribution(DIM, N, two_event_dims=False),
        bg.MeanFreeNormalDistribution(DIM, N, two_event_dims=False),
    ])
    flow = bg.EquivariantCouplingFlow(N, D, n_blocks=n_blocks, n_rbf=n_rbf, hidden=hidden)
    return bg.BoltzmannGenerator(prior, flow, target)


def train_phase(n_iter=12000, batch=1024, seed=1):
    import optax

    blob = np.load(DATA_PATH)
    data = jnp.asarray(blob["data"])
    # fixed kinetic channel per frame (fresh draws each epoch would also
    # work; fixed v is an unbiased augmented-NLL sample and jits simply)
    v = jax.random.normal(jax.random.PRNGKey(seed + 100), data.shape)
    v = _remove_mean(v)
    sampler = bg.DataSetSampler(data, v)

    gen = make_gen()
    params = gen.init(jax.random.PRNGKey(0))
    trainer = bg.KLTrainer(
        gen, train_energy=False,
        optimizer=optax.chain(
            optax.clip_by_global_norm(100.0),
            optax.adam(optax.cosine_decay_schedule(2e-3, n_iter, 1e-2)),
        ),
    )
    params, opt_state, reporter = trainer.train(
        params, jax.random.PRNGKey(seed), n_iter, data=sampler,
        batchsize=batch, scan_chunk=500, progress_interval=1,
        checkpoint_dir=CKPT,
    )
    print("final NLL:", reporter.losses()[0][-20:].mean(), flush=True)


def eval_phase(n_eval=65536, seed=7):
    from bgflow_tpu.utils.checkpoint import restore_checkpoint

    blob = np.load(DATA_PATH)
    data, u_data = blob["data"], blob["energies"]
    gen = make_gen()
    params = restore_checkpoint(CKPT)["params"]
    lj = make_target()

    out = gen.sample(params, jax.random.PRNGKey(seed), n_eval, with_log_weights=True)
    lw = out.log_weights
    finite = jnp.isfinite(lw)
    ess = float(bg.effective_sample_size(jnp.where(finite, lw, -jnp.inf)))
    x = out.xs[0]
    u_model = np.asarray(lj.energy(x))

    # reweighted energy-histogram agreement vs the exact ensemble
    w = np.asarray(jax.nn.softmax(jnp.where(finite, lw, -jnp.inf)))
    lo, hi = np.quantile(u_data, 0.0005), np.quantile(u_data, 0.9995)
    edges = np.linspace(lo, hi, 41)
    h_data, _ = np.histogram(u_data, bins=edges, density=True)
    h_raw, _ = np.histogram(u_model, bins=edges, density=True)
    h_rw, _ = np.histogram(u_model, bins=edges, weights=w, density=True)
    db = np.diff(edges)[0]

    def intersection(h):
        return float(np.minimum(h, h_data).sum() * db)

    ok = (h_data > 0) & (h_rw > 0)
    f_dev = np.log(h_rw[ok]) - np.log(h_data[ok])
    f_dev -= f_dev.mean()

    res = {
        "n_eval": n_eval,
        "n_data": int(len(data)),
        "ess": round(ess, 2),
        "sampling_efficiency_pct": round(100.0 * ess / n_eval, 4),
        "logw_std": round(float(jnp.std(jnp.where(finite, lw, jnp.nan), where=finite)), 3),
        "frac_nonfinite_logw": round(float(1 - jnp.mean(finite.astype(jnp.float32))), 6),
        "mean_u_data": round(float(u_data.mean()), 3),
        "mean_u_model_raw": round(float(u_model.mean()), 3),
        "mean_u_model_reweighted": round(float(np.sum(w * u_model)), 3),
        "energy_hist_intersection_raw": intersection(h_raw),
        "energy_hist_intersection_reweighted": intersection(h_rw),
        "energy_free_energy_rmsd_kt": round(float(np.sqrt(np.mean(f_dev**2))), 4),
        "energy_hist_bins_compared": int(ok.sum()),
    }
    print(json.dumps(res, indent=1), flush=True)
    existing = {}
    if os.path.exists(RESULTS):
        existing = json.load(open(RESULTS))
    existing.update(res)
    with open(RESULTS, "w") as fh:
        json.dump(existing, fh, indent=1)


def perturb_phase(n_eval=65536, seed=9,
                  sigmas=(0.002, 0.005, 0.01, 0.02, 0.05), from_lv=False):
    """Flow-perturbation (Jacobian-free) weights on the trained model.

    Round-2 item 7 / round-3 item 8: measure whether the extended-space
    estimator improves the reweighting ESS over the exact-Jacobian
    deterministic weights (whose logw tail is heavy, logw_std ~200).  The
    Gaussian perturbation convolves the model density — a sigma sweep
    records where (if anywhere) the smoothing beats the added kernel
    variance.  Results land next to the deterministic numbers in
    lj13_science.json."""
    from bgflow_tpu.flows.perturbation import flow_perturbation_sample
    from bgflow_tpu.utils.checkpoint import restore_checkpoint

    gen = make_gen()
    ckpt = CKPT + "_lv" if from_lv else CKPT
    params = restore_checkpoint(ckpt)["params"]
    out_rows = []
    for sigma in sigmas:
        res = flow_perturbation_sample(
            params, gen.prior, gen.flow, gen.target,
            jax.random.PRNGKey(seed), n_eval, sigma=sigma,
        )
        lw = res.log_weights
        finite = jnp.isfinite(lw)
        ess = float(bg.effective_sample_size(jnp.where(finite, lw, -jnp.inf)))
        row = {
            "sigma": sigma,
            "ess": round(ess, 2),
            "sampling_efficiency_pct": round(100.0 * ess / n_eval, 4),
            "logw_std": round(
                float(jnp.std(jnp.where(finite, lw, jnp.nan), where=finite)), 3),
            "frac_nonfinite_logw": round(
                float(1 - jnp.mean(finite.astype(jnp.float32))), 6),
        }
        print(json.dumps(row), flush=True)
        out_rows.append(row)
    existing = {}
    if os.path.exists(RESULTS):
        existing = json.load(open(RESULTS))
    existing["flow_perturbation" + ("_lv" if from_lv else "")] = {
        "n_eval": n_eval,
        "note": "extended-space Jacobian-free weights (arXiv:2407.10666) "
                "vs the deterministic exact-Jacobian weights above",
        "sigma_sweep": out_rows,
    }
    with open(RESULTS, "w") as fh:
        json.dump(existing, fh, indent=1)


def finetune_phase(n_iter=3000, batch=1024, lv_batch=1024, w_lv=0.05, seed=3):
    """Log-variance fine-tune against the heavy logw tail (logw_std ~200).

    Same recipe as the ALA3 lv rung: NLL anchor + Huberized Var[log w] over
    reparametrized model samples.  Writes CKPT_lv; evaluate with
    ``eval --lv`` / ``perturb --lv``."""
    import optax

    from bgflow_tpu.utils.checkpoint import restore_checkpoint

    blob = np.load(DATA_PATH)
    data = jnp.asarray(blob["data"])
    v = jax.random.normal(jax.random.PRNGKey(seed + 100), data.shape)
    v = _remove_mean(v)
    sampler = bg.DataSetSampler(data, v)

    gen = make_gen()
    params = restore_checkpoint(CKPT)["params"]
    import shutil

    if os.path.isdir(CKPT + "_lv"):
        shutil.rmtree(CKPT + "_lv")
    trainer = bg.KLTrainer(
        gen, train_energy=False, train_logvar=True,
        optimizer=optax.chain(
            optax.clip_by_global_norm(50.0),
            optax.adam(optax.cosine_decay_schedule(2e-4, n_iter, 1e-2)),
        ),
    )
    w_logvar = optax.linear_schedule(0.0, w_lv, max(1, n_iter // 4))
    params, opt_state, reporter = trainer.train(
        params, jax.random.PRNGKey(seed), n_iter, data=sampler,
        batchsize=batch, n_logvar_samples=lv_batch, w_logvar=w_logvar,
        scan_chunk=250, progress_interval=1, checkpoint_dir=CKPT + "_lv",
    )
    print("final loss:", reporter.losses()[0][-20:].mean(), flush=True)


def eval_lv_phase(n_eval=65536, seed=7):
    """Deterministic-weight eval of the lv-finetuned checkpoint; results go
    under the 'lv_finetune' key of lj13_science.json."""
    global CKPT, RESULTS
    orig_ckpt, orig_res = CKPT, RESULTS
    try:
        CKPT = CKPT + "_lv"
        RESULTS = os.path.join(ART, "lj13_science_lv.json")
        eval_phase(n_eval=n_eval, seed=seed)
    finally:
        lv = json.load(open(RESULTS))
        CKPT, RESULTS = orig_ckpt, orig_res
        existing = json.load(open(RESULTS)) if os.path.exists(RESULTS) else {}
        existing["lv_finetune"] = lv
        with open(RESULTS, "w") as fh:
            json.dump(existing, fh, indent=1)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    kv = dict(f.lstrip("-").split("=", 1) for f in flags if "=" in f)
    unknown = set(kv) - {"iters", "batch", "lv"}
    if unknown:
        raise SystemExit(f"unknown flag(s): {sorted(unknown)}")
    phases = set(args) if args else {"all"}
    tkw = {}
    if "iters" in kv:
        tkw["n_iter"] = int(kv["iters"])
    if "batch" in kv:
        tkw["batch"] = int(kv["batch"])
    if phases & {"data", "all"}:
        data_phase()
    if phases & {"train", "all"}:
        train_phase(**tkw)
    if phases & {"eval", "all"}:
        eval_phase()
    if "finetune" in phases:
        finetune_phase(**tkw)
    if "eval_lv" in phases:
        eval_lv_phase()
    if "perturb" in phases:
        perturb_phase(from_lv="--lv" in flags)
