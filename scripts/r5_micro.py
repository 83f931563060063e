"""Round-5 micro-profile: one flagship coupling block, decomposed, with
tunnel-safe on-device timing.

Each measured fn consumes a fresh key (defeats loop-invariant hoisting);
the cost of generating its random inputs is measured separately (gen-*)
and can be subtracted.

Run:  python scripts/r5_micro.py [batch_log2]
"""
import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bgflow_tpu.nets.dense import DenseNet  # noqa: E402
from bgflow_tpu.ops.rqs_fused import fused_row_order, rqs_fused_mlp  # noqa: E402


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
    print(f"{label:46s} {dt*1e3:9.3f} ms")
    return dt


def main(batch_log2=20, D=19, K=8, F=15):
    B = 1 << batch_log2
    key = jax.random.PRNGKey(0)
    R = 3 * K * D + D
    net = DenseNet([F, 128, 128, R], compute_dtype=jnp.bfloat16)
    params = net.init(key)
    order = fused_row_order(D, K, np.array([], dtype=int))
    Wf = params[-1]["w"][:, order]
    bf = params[-1]["b"][order]
    layers_full = tuple((params[i]["w"], params[i]["b"]) for i in range(2)) + ((Wf, bf),)
    acts = (jax.nn.silu, jax.nn.silu)

    print(f"batch={B} D={D} K={K} F={F}")

    # baselines: random generation alone
    t_gen_c = ondevice(lambda k: jax.random.normal(k, (B, F)), key, label="gen cond (B,F) f32")
    t_gen_x = ondevice(lambda k: jax.random.uniform(k, (B, D)), key, label="gen x (B,D) f32")
    t_gen_h = ondevice(lambda k: jax.random.normal(k, (B, 128), jnp.bfloat16), key,
                       label="gen h (B,128) bf16")

    # trunk alone
    def trunk(k):
        c = jax.random.normal(k, (B, F))
        return net.apply_trunk(params, c)
    t_trunk = ondevice(trunk, key, label="trunk MLP (gen + 2 matmuls)")
    print(f"{'':46s} net of gen: {(t_trunk-t_gen_c)*1e3:7.3f} ms")

    # fused final-matmul+spline kernel alone (h, x generated in-loop)
    def fused(k, lanes=1024):
        k1, k2 = jax.random.split(k)
        h = jax.random.normal(k1, (B, 128), jnp.bfloat16)
        x = jax.random.uniform(k2, (B, D))
        return rqs_fused_mlp(x, h, ((Wf, bf),), K, activations=(),
                             inverse=True, matmul_dtype=jnp.bfloat16,
                             lanes=lanes)
    t_fused = ondevice(fused, key, label="fused final+spline (gen + kernel)")
    print(f"{'':46s} net of gen: {(t_fused-t_gen_h-t_gen_x)*1e3:7.3f} ms")

    for lanes in (2048, 4096, 8192):
        t = ondevice(functools.partial(fused, lanes=lanes), key,
                     label=f"fused kernel lanes={lanes}")
        print(f"{'':46s} net of gen: {(t-t_gen_h-t_gen_x)*1e3:7.3f} ms")

    # whole-MLP-in-kernel variant (trunk inside Pallas)
    def fused_all(k, lanes=1024):
        k1, k2 = jax.random.split(k)
        c = jax.random.normal(k1, (B, F))
        x = jax.random.uniform(k2, (B, D))
        return rqs_fused_mlp(x, c, layers_full, K, activations=acts,
                             inverse=True, matmul_dtype=jnp.bfloat16,
                             lanes=lanes)
    for lanes in (1024, 2048, 4096):
        t = ondevice(functools.partial(fused_all, lanes=lanes), key,
                     label=f"FULL-MLP fused lanes={lanes}")
        print(f"{'':46s} net of gen: {(t-t_gen_c-t_gen_x)*1e3:7.3f} ms")

    # end-to-end block emulation: trunk in XLA + fused kernel (current path)
    def block(k):
        k1, k2 = jax.random.split(k)
        c = jax.random.normal(k1, (B, F))
        x = jax.random.uniform(k2, (B, D))
        h = net.apply_trunk(params, c).astype(jnp.bfloat16)
        return rqs_fused_mlp(x, h, ((Wf, bf),), K, activations=(),
                             inverse=True, matmul_dtype=jnp.bfloat16)
    t_blk = ondevice(block, key, label="block = XLA trunk + fused kernel")
    print(f"{'':46s} net of gen: {(t_blk-t_gen_c-t_gen_x)*1e3:7.3f} ms")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
