"""Bisect the cost of the flagship spline couplings on the TPU.

Uses ``bgflow_tpu.utils.profiling.measure_op`` (on-device fori_loop with
latency cancellation) — naive host-side timing is meaningless on the axon
tunnel backend whose block_until_ready does not block.  Large arrays are
passed as jit parameters (closure-captured device arrays embed into the
HLO and exceed the remote-compile size limit).

Run:  python scripts/profile_block0.py [batch]
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bgflow_tpu.utils.profiling import measure_op


def report(label, fn, *args, iters=10):
    dt = measure_op(fn, *args, iters=iters)
    print(f"{label:36s} {dt*1e3:9.3f} ms", flush=True)
    return dt


def dep(a, i):
    # fuse the loop index into the array without changing values materially;
    # the multiplier must not be exactly 0.0 or XLA's algebraic simplifier
    # folds the whole perturbation away and hoists the body out of the loop
    return a + jnp.float32(i).astype(a.dtype) * 1e-30


def main(batch=1 << 20):
    from bench import make_flagship

    key = jax.random.PRNGKey(0)
    gen, params = make_flagship(key, transformer="spline")

    big = jnp.zeros((1 << 28,), jnp.float32)
    t = report("sanity: 1 GiB add", lambda i, b: b + (1.0 + i), big, iters=50)
    print(f"  -> implied HBM BW {2 * big.nbytes / t / 1e9:,.0f} GB/s")

    report("full gen.sample", lambda i: gen.sample(
        params, jax.random.fold_in(key, i), batch).xs[0])

    zs = gen.prior.sample(key, batch)
    zs = zs if isinstance(zs, tuple) else (zs,)
    print("prior channels:", [z.shape for z in zs])

    block = gen.flow.blocks[0]
    p0 = params[0]
    report("block0 (Coupling) fwd",
           lambda i, *z: block.forward(p0, tuple(dep(a, i) for a in z))[0][0], *zs)

    tr = block.transformer
    y = jnp.concatenate([zs[i] for i in block.transformed], axis=-1)
    cond = jnp.concatenate([zs[i] for i in block.on], axis=-1)
    print("y:", y.shape, y.dtype, "cond:", cond.shape, cond.dtype)

    report("transformer.forward",
           lambda i, c, yy: tr.forward(p0, dep(c, i), dep(yy, i), inverse=False)[0],
           cond, y)

    raw_t = jax.jit(lambda p, c: tr.params_net.apply_transposed(p, c))(p0, cond)
    print("raw_t:", raw_t.shape, raw_t.dtype)
    report("conditioner apply_transposed",
           lambda i, c: tr.params_net.apply_transposed(p0, dep(c, i)), cond)

    from bgflow_tpu.ops.rqs_pallas import rq_spline_pallas_slab

    D = y.shape[-1]
    nc = tr._noncircular_indices(D)
    n_bins = (raw_t.shape[0] - len(nc)) // (D * 3)
    report("rq_spline_pallas_slab (real raw_t)",
           lambda i, yy, rr: rq_spline_pallas_slab(
               dep(yy, i), dep(rr, i), num_bins=n_bins, noncircular_indices=nc,
               inverse=True, left=tr.left, right=tr.right,
               bottom=tr.bottom, top=tr.top)[0],
           y, raw_t)

    prev = 0.0
    for j in range(1, len(gen.flow.blocks) + 1):
        sub = gen.flow[:j]
        subp = params[:j]
        name = type(gen.flow.blocks[j - 1]).__name__
        t = measure_op(
            lambda i, *z, s=sub, p=subp: s.forward(p, tuple(dep(a, i) for a in z))[0][0],
            *zs,
        )
        print(f"  blocks[0:{j}] ({name:10s}) {t*1e3:9.3f} ms   delta {(t-prev)*1e3:7.3f} ms",
              flush=True)
        prev = t


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20)
