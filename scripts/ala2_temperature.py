"""Zero-shot temperature transfer of the trained ala2 flagship.

The whole stack is temperature-aware (T-scaled priors, T-scaled target,
temperature-threaded flows — the reference's temperature-steerable
distributions, redesigned functionally).  This evaluates how far the
flagship checkpoint, trained at T = 1 (300 K), transfers when sampled at
other reduced temperatures purely through that machinery: sample at
``temperature=tau``, reweight against the target at ``tau``, and read off
ESS and basin occupancy.  No retraining, no new data.

Writes artifacts/ala2_temperature.json.

Run:  python scripts/ala2_temperature.py (CPU:
      env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu)
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

TEMPERATURES = (0.8, 0.9, 1.0, 1.1, 1.25)


def main(n_eval=100_000, seed=2):
    import bgflow_tpu as bg
    from bgflow_tpu.models.ala2 import make_ala2_generator
    from bgflow_tpu.ops.ic import torsion
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

    def phi_of(x):
        p = x.reshape(-1, 22, 3)
        return torsion(p[:, 4], p[:, 6], p[:, 8], p[:, 14], 1e-7)

    rows = []
    key = jax.random.PRNGKey(seed)
    for tau in TEMPERATURES:
        key, sub = jax.random.split(key)
        out = gen.sample(params, sub, n_eval, temperature=tau, with_log_weights=True)
        lw = out.log_weights
        finite = jnp.isfinite(lw)
        lw_safe = jnp.where(finite, lw, -jnp.inf)
        ess = float(bg.effective_sample_size(lw_safe))
        phi = phi_of(out.xs[0])
        w = jnp.exp(lw_safe - jnp.max(lw_safe))
        pos = float(jnp.sum(w * (phi > 0.2)) / jnp.sum(w))
        rows.append({
            "temperature": tau,
            "ess": round(ess, 1),
            "sampling_efficiency_pct": round(100.0 * ess / n_eval, 3),
            "logw_std": round(float(jnp.std(jnp.where(finite, lw, jnp.nan),
                                            where=finite)), 2),
            "phi_pos_frac_reweighted": float(pos),
        })
        print(rows[-1], flush=True)

    out = {"n_eval": n_eval, "trained_at": 1.0, "rows": rows}
    with open(os.path.join(ART, "ala2_temperature.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
