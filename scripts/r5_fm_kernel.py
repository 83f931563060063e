"""Round-5 experiment: feature-major fused coupling kernel prototype.

Tests whether the conditioner trunk can run INSIDE the Pallas kernel at
near-MXU speed when everything is feature-major:

    cond (F, Cw) tile  ->  h = silu(W1t @ cond + b1)   (128, Cw)
                       ->  h = silu(W2t @ h + b2)      (128, Cw)
                       ->  slab = Wf @ h + bf          (R, Cw)
                       ->  _rqs_math on (Dp, Cw) x tile

(The round-4 batch-major attempt was ~25x off peak.)  Also tests in-kernel
hardware PRNG for the inputs.

Run:  python scripts/r5_fm_kernel.py [batch_log2]
"""
import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bgflow_tpu.ops.rqs_pallas import _rqs_math  # noqa: E402


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
    float(run(jnp.int32(base), key))
    t0 = time.perf_counter(); float(run(jnp.int32(base), key)); tb = time.perf_counter() - t0
    t0 = time.perf_counter(); float(run(jnp.int32(base + iters), key)); tf = time.perf_counter() - t0
    dt = (tf - tb) / iters
    print(f"{label:52s} {dt*1e3:9.3f} ms")
    return dt


SPLINE_CFG = dict(
    inverse=True, left=0.0, right=1.0, bottom=0.0, top=1.0,
    min_bin_width=1e-3, min_bin_height=1e-3, min_derivative=1e-3,
    shift=float(np.log(np.expm1(1.0 - 1e-3))),
)


def make_fm_kernel(B, D, K, F, Cw, n_trunk=2, use_prng=True, do_spline=True,
                   mm_dtype=jnp.bfloat16):
    """Feature-major fused block: in-kernel PRNG + trunk + final + spline."""
    Dp = -(-D // 8) * 8
    Fp = -(-F // 8) * 8
    R = (3 * K + 1) * Dp
    H = 128

    def kernel(seed_ref, w1_ref, b1_ref, w2_ref, b2_ref, wf_ref, bf_ref,
               y_ref, ldj_ref):
        step = pl.program_id(0)
        if use_prng:
            pltpu.prng_seed(seed_ref[0] + step)
            cond_bits = pltpu.prng_random_bits((Fp, Cw))
            cond = (cond_bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
            x_bits = pltpu.prng_random_bits((Dp, Cw))
            x = (x_bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
        else:
            cond = jnp.zeros((Fp, Cw), jnp.float32) + 0.1 * seed_ref[0]
            x = jnp.zeros((Dp, Cw), jnp.float32) + 0.3

        def mm(Wt, a):
            return jax.lax.dot_general(
                Wt.astype(mm_dtype), a.astype(mm_dtype),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

        h = cond
        if n_trunk >= 1:
            h = jax.nn.silu(mm(w1_ref[...], h) + b1_ref[...])
        if n_trunk >= 2:
            h = jax.nn.silu(mm(w2_ref[...], h) + b2_ref[...])
        raw = mm(wf_ref[...], h) + bf_ref[...]

        if do_spline:
            w = [raw[k * Dp:(k + 1) * Dp] for k in range(K)]
            hh = [raw[(K + k) * Dp:(K + k + 1) * Dp] for k in range(K)]
            s = [raw[(2 * K + k) * Dp:(2 * K + k + 1) * Dp] for k in range(K + 1)]
            y, ldj = _rqs_math(x, w, hh, s, num_bins=K, **SPLINE_CFG)
            y_ref[...] = y
            ldj_ref[...] = jnp.sum(ldj[:D], axis=0, keepdims=True)
        else:
            y_ref[...] = raw[:Dp]
            ldj_ref[...] = jnp.sum(raw[:1], axis=0, keepdims=True)

    rng = np.random.RandomState(0)
    w1 = jnp.asarray(rng.randn(H, Fp) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.randn(H, 1) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(H, H) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.randn(H, 1) * 0.1, jnp.float32)
    wf = jnp.asarray(rng.randn(R, H) * 0.01, jnp.float32)
    bf = jnp.asarray(rng.randn(R, 1) * 0.01, jnp.float32)

    grid = (B // Cw,)
    const = lambda shape: pl.BlockSpec(shape, lambda j: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            const(w1.shape), const(b1.shape), const(w2.shape), const(b2.shape),
            const(wf.shape), const(bf.shape),
        ],
        out_specs=(
            pl.BlockSpec((Dp, Cw), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cw), lambda j: (0, j), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Dp, B), jnp.float32),
            jax.ShapeDtypeStruct((1, B), jnp.float32),
        ),
    )

    def fn(seed):
        return call(seed, w1, b1, w2, b2, wf, bf)

    return fn


def main(batch_log2=20):
    B = 1 << batch_log2
    key = jax.random.PRNGKey(0)
    D, K = 17, 8
    print(f"batch={B} D={D} K={K}")

    def seed_of(k):
        return jax.random.key_data(k).astype(jnp.int32).reshape(-1)[:1]

    for label, kw in [
        ("prng only (no trunk, no spline)", dict(n_trunk=0, do_spline=False, F=15)),
        ("prng + final matmul only", dict(n_trunk=0, do_spline=False, F=128)),
        ("prng + 2-matmul trunk + final (no spline)", dict(n_trunk=2, do_spline=False, F=15)),
        ("prng + trunk + final + spline  F=15", dict(n_trunk=2, do_spline=True, F=15)),
        ("prng + trunk + final + spline  F=51", dict(n_trunk=2, do_spline=True, F=51)),
        ("spline only (prng x, raw=final(prng))", dict(n_trunk=0, do_spline=True, F=128)),
    ]:
        for Cw in (1024, 2048):
            try:
                fn = make_fm_kernel(B, D, K, Cw=Cw, K_=None, **{**kw, "K": K})
            except TypeError:
                fn = make_fm_kernel(B, D, K, Cw=Cw, **kw)
            try:
                ondevice(lambda k, f=fn: f(seed_of(k)), key,
                         label=f"{label} Cw={Cw}")
            except Exception as e:  # noqa: BLE001
                print(f"{label} Cw={Cw}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
