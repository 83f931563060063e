"""Component timing of the flagship spline sampling path on the TPU.

Times each stage of BoltzmannGenerator.sample separately to locate the gap
between the spline flagship and the affine path:

  prior      — prior sampling alone
  flow       — flow forward (z -> x), which splits into per-block timings
  full       — gen.sample end-to-end

Run:  python scripts/profile_flagship.py [batch]
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bgflow_tpu as bg  # noqa: E402


def timeit(fn, *args, iters=10, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:34s} {dt*1e3:9.2f} ms")
    return dt


def main(batch=1 << 20):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench import make_flagship

    key = jax.random.PRNGKey(0)
    gen, params = make_flagship(key, transformer="spline")
    print(f"batch = {batch}")

    full = jax.jit(lambda p, k: gen.sample(p, k, batch).xs[0])
    t_full = timeit(full, params, key, label="full gen.sample")

    prior = jax.jit(lambda k: gen.prior.sample(k, batch))
    t_prior = timeit(prior, key, label="prior.sample")

    z = jax.block_until_ready(prior(key))
    zs = z if isinstance(z, tuple) else (z,)

    fwd = jax.jit(lambda p, zz: gen.flow.forward(p, zz)[0])
    t_flow = timeit(fwd, params, zs, label="flow.forward (all blocks)")

    # cumulative per-block timing: forward through the first j blocks
    blocks = gen.flow.blocks
    n = len(blocks)
    prev = 0.0
    for j in range(1, n + 1):
        sub = gen.flow[:j]
        subp = params[:j]
        f = jax.jit(lambda p, zz, s=sub: s.forward(p, zz)[0])
        try:
            t = timeit(f, subp, zs, label=f"  blocks[0:{j}] ({type(blocks[j-1]).__name__})")
            print(f"{'':40s} delta {(t-prev)*1e3:7.2f} ms")
            prev = t
        except Exception as e:  # noqa: BLE001
            print(f"  blocks[0:{j}]: failed ({e})")
            break

    print(f"\nsamples/s full path: {batch / t_full:,.0f}")
    print(f"prior fraction:  {t_prior / t_full:.1%}")
    print(f"flow fraction:   {t_flow / t_full:.1%}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20)
