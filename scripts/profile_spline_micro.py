"""Micro-profile of one spline coupling's internals on the TPU.

Times, at flagship shapes (batch 1M, D=17 torsions, K=8 bins, 128x128 bf16
conditioner), each piece of the ~50 ms/coupling cost found by
profile_flagship.py:

  cond        — conditioner apply_transposed (matmuls, feature-major out)
  slab-full   — rq_spline_pallas_slab end-to-end (slab build + kernel)
  kernel      — the fused Pallas kernel alone on pre-slabbed inputs
  slab-build  — slab construction alone (static gathers + pads + x.T)

Run:  python scripts/profile_spline_micro.py [batch] [D]
"""
import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bgflow_tpu.nets.dense import DenseNet
from bgflow_tpu.ops import rqs_pallas as rp


def timeit(fn, *args, iters=20, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:26s} {dt*1e3:9.3f} ms")
    return dt


def main(batch=1 << 20, D=17, K=8, cond_dim=15):
    key = jax.random.PRNGKey(0)
    n_out = 3 * K * D + D
    net = DenseNet([2 * cond_dim, 128, 128, n_out], compute_dtype=jnp.bfloat16)
    params = net.init(key)
    x = jax.random.uniform(key, (batch, 2 * cond_dim))
    y = jax.random.uniform(jax.random.fold_in(key, 1), (batch, D))
    raw_t = jax.random.normal(jax.random.fold_in(key, 2), (n_out, batch)) * 0.1

    print(f"batch={batch} D={D} K={K} n_out={n_out}")

    cond = jax.jit(lambda p, xx: net.apply_transposed(p, xx))
    timeit(cond, params, x, label="cond apply_transposed")

    full = jax.jit(
        lambda yy, rr: rp.rq_spline_pallas_slab(
            yy, rr, num_bins=K, noncircular_indices=np.arange(D), inverse=True
        )
    )
    timeit(full, y, raw_t, label="slab-full (build+kernel)")

    # pre-slabbed kernel alone
    n = D * batch
    block_rows = 64
    chunk = block_rows * 128
    n_pad = (-n) % chunk
    n_rows = (n + n_pad) // 128

    def build_slabs(yy, rr):
        woff, hoff, soff, ncoff = 0, K * D, 2 * K * D, 3 * K * D

        def slab(rows, k_dim):
            arr = rr[rows].reshape(k_dim, n)
            if n_pad:
                arr = jnp.pad(arr, ((0, 0), (0, n_pad)))
            return arr.reshape(k_dim, n_rows, 128)

        wf = slab(rp._slab_perm(woff, D, K), K)
        hf = slab(rp._slab_perm(hoff, D, K), K)
        s_rows = rp._slab_perm(soff, D, K)
        last_rows = np.asarray([ncoff + d for d in range(D)])
        sf = slab(np.concatenate([s_rows, last_rows]), K + 1)
        xf = yy.T.reshape(n)
        if n_pad:
            xf = jnp.pad(xf, (0, n_pad), constant_values=0.5)
        return xf.reshape(n_rows, 128), wf, hf, sf

    slabs = jax.jit(build_slabs)(y, raw_t)
    jax.block_until_ready(slabs)
    timeit(jax.jit(build_slabs), y, raw_t, label="slab-build alone")

    kern = jax.jit(
        functools.partial(
            rp._invoke_rqs_kernel,
            num_bins=K, inverse=True, left=0.0, right=1.0, bottom=0.0,
            top=1.0, min_bin_width=1e-3, min_bin_height=1e-3,
            min_derivative=1e-3, identity_init=True,
            block_rows=block_rows, interpret=False,
        )
    )
    timeit(kern, *slabs, label="pallas kernel alone")

    for br in (8, 16, 32, 128, 256, 512):
        if (n + ((-n) % (br * 128))) // 128 % br == 0:
            kern_b = jax.jit(
                functools.partial(
                    rp._invoke_rqs_kernel,
                    num_bins=K, inverse=True, left=0.0, right=1.0, bottom=0.0,
                    top=1.0, min_bin_width=1e-3, min_bin_height=1e-3,
                    min_derivative=1e-3, identity_init=True,
                    block_rows=br, interpret=False,
                )
            )
            try:
                timeit(kern_b, *slabs, label=f"kernel block_rows={br}")
            except Exception as e:  # noqa: BLE001
                print(f"kernel block_rows={br}: failed ({type(e).__name__})")


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20,
        int(sys.argv[2]) if len(sys.argv) > 2 else 17,
    )
