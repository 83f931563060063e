"""Bisect rq_spline_pallas_slab: slab building vs kernel vs block size.

Measured with the on-device fori_loop harness (utils.profiling.measure_op).
Run:  python scripts/profile_rqs_slab.py [batch]
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bgflow_tpu.utils.profiling import measure_op
from bgflow_tpu.ops.rqs_pallas import (
    _invoke_rqs_kernel, _slab_perm, rq_spline_pallas_slab, _LANES,
)


def report(label, fn, *args, iters=10):
    dt = measure_op(fn, *args, iters=iters)
    print(f"{label:44s} {dt*1e3:9.3f} ms", flush=True)
    return dt


def dep(a, i):
    return a + jnp.float32(i).astype(a.dtype) * 1e-30


def main(batch=1 << 20):
    D, K = 17, 8
    nc = (0, 1, 2)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (batch, D), jnp.float32)
    raw_t = jax.random.normal(key, (3 * K * D + len(nc), batch), jnp.float32) * 0.1
    print(f"batch={batch} D={D} K={K}  raw_t {raw_t.nbytes/1e9:.2f} GB", flush=True)

    report("full rq_spline_pallas_slab", lambda i, xx, rr: rq_spline_pallas_slab(
        dep(xx, i), dep(rr, i), num_bins=K, noncircular_indices=nc, inverse=True)[0],
        x, raw_t)

    # slab building alone (gather + pad + reshape), mirroring _rqs_slab_core
    n = D * batch
    for block_rows in (64,):
        chunk = block_rows * _LANES
        n_pad = (-n) % chunk
        n_rows = (n + n_pad) // _LANES

        def build_slabs(rr):
            def slab(rows, k_dim):
                arr = rr[rows].reshape(k_dim, n)
                if n_pad:
                    arr = jnp.pad(arr, ((0, 0), (0, n_pad)))
                return arr.reshape(k_dim, n_rows, _LANES)

            wf = slab(_slab_perm(0, D, K), K)
            hf = slab(_slab_perm(K * D, D, K), K)
            s_rows = _slab_perm(2 * K * D, D, K)
            nc_rank = {int(d): r for r, d in enumerate(nc)}
            last = np.asarray([3 * K * D + nc_rank[d] if d in nc_rank
                               else 2 * K * D + d * K for d in range(D)])
            sf = slab(np.concatenate([s_rows, last]), K + 1)
            return wf, hf, sf

        report(f"slab build (gather+pad) br={block_rows}",
               lambda i, rr: build_slabs(dep(rr, i)), raw_t)

        wf, hf, sf = jax.jit(build_slabs)(raw_t)

        def xslab(xx):
            xf = xx.T.reshape(n)
            if n_pad:
                xf = jnp.pad(xf, (0, n_pad), constant_values=0.5)
            return xf.reshape(n_rows, _LANES)

        report("x transpose+pad", lambda i, xx: xslab(dep(xx, i)), x)
        xf = jax.jit(xslab)(x)

        for br in (64, 128, 256, 512):
            if n_rows % br:
                continue
            report(f"kernel only  block_rows={br}",
                   lambda i, a, b, c, d_, br=br: _invoke_rqs_kernel(
                       dep(a, i), dep(b, i), dep(c, i), dep(d_, i),
                       num_bins=K, inverse=True, left=0.0, right=1.0,
                       bottom=0.0, top=1.0, min_bin_width=1e-3,
                       min_bin_height=1e-3, min_derivative=1e-3,
                       identity_init=True, block_rows=br, interpret=False)[0],
                   xf, wf, hf, sf)

    # reshape-only slab variant: rows already in slab order (what a
    # pre-permuted conditioner final layer would emit)
    pre = jnp.concatenate(
        [raw_t[_slab_perm(0, D, K)], raw_t[_slab_perm(K * D, D, K)],
         raw_t[_slab_perm(2 * K * D, D, K)], raw_t[: D]], axis=0)

    def build_noperm(rr):
        def slab(lo, k_dim):
            arr = rr[lo:lo + k_dim * D].reshape(k_dim, n)
            if n_pad:
                arr = jnp.pad(arr, ((0, 0), (0, n_pad)))
            return arr.reshape(k_dim, n_rows, _LANES)
        return slab(0, K), slab(K * D, K), slab(2 * K * D, K + 1)

    report("slab build, pre-permuted rows (pad only)",
           lambda i, rr: build_noperm(dep(rr, i)), pre)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20)
