"""Bisect the cost of flagship coupling block 0 on the TPU.

profile_flagship.py shows ~50 ms per coupling at batch 1M, while micro
timings of the conditioner and the slab spline in isolation show ~0.05 ms.
This script times the REAL block 0 (same objects, same inputs) and its
internals to find where the two measurements diverge, plus an HBM
bandwidth sanity op to validate the timing harness itself.

Run:  python scripts/profile_block0.py [batch]
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def timeit(fn, *args, iters=10, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:34s} {dt*1e3:9.3f} ms", flush=True)
    return dt


def main(batch=1 << 20):
    from bench import make_flagship

    key = jax.random.PRNGKey(0)
    gen, params = make_flagship(key, transformer="spline")

    # bandwidth sanity: copy 1 GB
    big = jnp.zeros((1 << 28,), jnp.float32)  # 1 GiB
    t = timeit(jax.jit(lambda a: a + 1.0), big, label="sanity: 1 GiB add")
    print(f"  -> implied HBM BW {2 * big.nbytes / t / 1e9:,.0f} GB/s")

    zs = gen.prior.sample(key, batch)
    zs = jax.block_until_ready(zs if isinstance(zs, tuple) else (zs,))
    print("prior channels:", [z.shape for z in zs])

    block = gen.flow.blocks[0]
    p0 = params[0]
    timeit(jax.jit(lambda p, xs: block.forward(p, xs)[0]), p0, zs,
           label=f"block0 ({type(block).__name__}) fwd")

    tr = block.transformer
    y = jnp.concatenate([zs[i] for i in block.transformed], axis=-1)
    cond = jnp.concatenate([zs[i] for i in block.on], axis=-1)
    print("transformer:", type(tr).__name__, "net:", type(tr.params_net).__name__,
          "has apply_transposed:", hasattr(tr.params_net, "apply_transposed"),
          "use_pallas:", getattr(tr, "use_pallas", None))
    print("y:", y.shape, y.dtype, "cond:", cond.shape, cond.dtype)

    timeit(jax.jit(lambda p, c, yy: tr.forward(p, c, yy, inverse=False)[0]),
           p0, cond, y, label="transformer.forward")

    raw_t = jax.jit(lambda p, c: tr.params_net.apply_transposed(p, c))(p0, cond)
    raw_t = jax.block_until_ready(raw_t)
    print("raw_t:", raw_t.shape, raw_t.dtype)
    timeit(jax.jit(lambda p, c: tr.params_net.apply_transposed(p, c)), p0, cond,
           label="conditioner apply_transposed")

    from bgflow_tpu.ops.rqs_pallas import rq_spline_pallas_slab

    D = y.shape[-1]
    nc = tr._noncircular_indices(D)
    n_bins = (raw_t.shape[0] - len(nc)) // (D * 3)
    timeit(
        jax.jit(lambda yy, rr: rq_spline_pallas_slab(
            yy, rr, num_bins=n_bins, noncircular_indices=nc,
            inverse=True, left=tr.left, right=tr.right,
            bottom=tr.bottom, top=tr.top,
        )),
        y, raw_t, label="rq_spline_pallas_slab (real raw_t)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20)
