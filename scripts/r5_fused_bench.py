"""Round-5: fused-sampler throughput + on-TPU validation at flagship shapes.

Run:  python scripts/r5_fused_bench.py [batch_log2] [lanes]
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from bench import make_flagship  # noqa: E402
from bgflow_tpu.ops.sample_fused import make_fused_sampler  # noqa: E402


def ondevice(fn, key, iters=16, label=""):
    @jax.jit
    def run(m, k):
        def body(i, acc):
            out = fn(jax.random.fold_in(k, i))
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.mean(l).astype(jnp.float32) for l in leaves)
            return acc + s * 1e-6
        return jax.lax.fori_loop(0, m, body, jnp.float32(0.0))

    base = 2
    v = float(run(jnp.int32(base), key))
    assert np.isfinite(v), f"{label}: non-finite"
    t0 = time.perf_counter(); float(run(jnp.int32(base), key)); tb = time.perf_counter() - t0
    t0 = time.perf_counter(); float(run(jnp.int32(base + iters), key)); tf = time.perf_counter() - t0
    dt = (tf - tb) / iters
    print(f"{label:44s} {dt*1e3:9.3f} ms")
    return dt


def main(batch_log2=20, lanes=1024):
    B = 1 << batch_log2
    key = jax.random.PRNGKey(0)
    gen, params = make_flagship(key, transformer="spline", use_pallas=True)
    fused = make_fused_sampler(gen, lanes=lanes)

    # --- validation on TPU: debug_u vs the XLA flow ---
    nval = 4096
    kv = jax.random.PRNGKey(5)
    u = jax.random.uniform(kv, (nval, 66), minval=1e-3, maxval=1 - 1e-3)
    fused_val = make_fused_sampler(gen, lanes=nval)
    x_f, dl_f = jax.jit(lambda p, u: fused_val(p, kv, nval, debug_u=u))(params, u)
    zs = (u[:, 0:17], u[:, 17:34], u[:, 34:51], u[:, 51:66])
    xs_r, dl_r = jax.jit(lambda p, zz: gen.flow.forward(p, zz))(params, zs)
    xerr = float(jnp.max(jnp.abs(x_f - xs_r[0])))
    derr = float(jnp.max(jnp.abs(dl_f - dl_r)))
    print(f"TPU validation: x err {xerr:.2e}  dlogp err {derr:.2e}")
    # bf16 conditioners in the reference path too -> tolerances are loose
    assert xerr < 0.1 and derr < 1.0, "fused/XLA mismatch on TPU"

    # --- PRNG-mode sanity ---
    x_p, dl_p = jax.jit(lambda p: fused_val(p, jax.random.PRNGKey(1), nval))(params)
    assert np.isfinite(np.asarray(x_p)).all() and np.isfinite(np.asarray(dl_p)).all()
    print(f"PRNG mode: x mean {float(jnp.mean(x_p)):.4f} std {float(jnp.std(x_p)):.4f} "
          f"(XLA ref mean {float(jnp.mean(xs_r[0])):.4f} std {float(jnp.std(xs_r[0])):.4f})")

    # --- throughput ---
    t_old = ondevice(lambda k: gen.sample(params, k, B).xs[0], key,
                     label=f"gen.sample (current path) B={B}")
    t_new = ondevice(lambda k: fused(params, k, B)[0], key,
                     label=f"fused sampler B={B} lanes={lanes}")
    print(f"\ncurrent: {B/t_old:,.0f} samples/s")
    print(f"fused:   {B/t_new:,.0f} samples/s   speedup {t_old/t_new:.2f}x")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20,
         int(sys.argv[2]) if len(sys.argv) > 2 else 1024)
