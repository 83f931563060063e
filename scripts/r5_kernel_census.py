"""Round-5 perf forensics: kernel census + per-stage on-device timing of the
flagship spline sampling path.

Two outputs:
  1. A census of the compiled executable's ENTRY kernels (opcode histogram,
     top kernels by HBM traffic) — identifies WHAT the 929 kernels are.
  2. Per-stage on-device timings (two-length fori_loop differencing, the
     only reliable timer through the axon tunnel) — identifies WHERE the
     wall-clock goes: prior, each coupling block, IC-domain map, cartesian
     reconstruction.

Run:  python scripts/r5_kernel_census.py [batch_log2]
"""
import os
import re
import sys
import time
from collections import Counter, defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

import bgflow_tpu as bg  # noqa: E402
from bench import make_flagship  # noqa: E402


def ondevice_time(fn, *args, iters=16, label=""):
    """Rate via two-length on-device fori_loop differencing (tunnel-safe)."""

    @jax.jit
    def run(m, *a):
        def body(i, acc):
            out = fn(jax.random.fold_in(a[-1], i), *a[:-1])
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.mean(l).astype(jnp.float32) for l in leaves)
            return acc + s * 1e-6
        return jax.lax.fori_loop(0, m, body, jnp.float32(0.0))

    base = 2
    float(run(jnp.int32(base), *args))  # compile+warm
    t0 = time.perf_counter(); float(run(jnp.int32(base), *args)); t_base = time.perf_counter() - t0
    t0 = time.perf_counter(); float(run(jnp.int32(base + iters), *args)); t_full = time.perf_counter() - t0
    dt = (t_full - t_base) / iters
    print(f"{label:44s} {dt*1e3:9.3f} ms/iter")
    return dt


def census(fn, *args, label=""):
    txt = jax.jit(fn).lower(*args).compile().as_text()
    m = re.search(r"^ENTRY [^{]+\{(.*?)^\}", txt, re.S | re.M)
    body = m.group(1)
    inst_re = re.compile(
        r"^\s*(?:ROOT\s+)?(%?[\w.\-]+)\s*=\s*((?:\([^)]*\)|[\w\[\]{},:()#\s*]+?))\s+([\w\-]+)\(")
    ops = Counter()
    fusion_kinds = Counter()
    rows = []
    for line in body.splitlines():
        mm = inst_re.match(line)
        if not mm:
            continue
        name, type_str, opcode = mm.groups()
        if opcode in ("parameter", "constant", "tuple", "get-tuple-element",
                      "bitcast", "after-all"):
            continue
        ops[opcode] += 1
        if opcode == "fusion":
            fk = re.search(r'kind=(\w+)', line)
            fusion_kinds[fk.group(1) if fk else "?"] += 1
        rows.append((name.lstrip("%"), opcode, type_str.strip()[:80], line))
    print(f"\n=== census: {label} — {sum(ops.values())} kernels ===")
    for op, n in ops.most_common(20):
        print(f"  {op:32s} {n}")
    if fusion_kinds:
        print("  fusion kinds:", dict(fusion_kinds))
    # biggest results
    from bgflow_tpu.utils.roofline import _shape_bytes
    sized = sorted(rows, key=lambda r: -_shape_bytes(r[2]))
    print("  top-12 kernels by result bytes:")
    for name, opcode, ts, _ in sized[:12]:
        print(f"    {_shape_bytes(ts)/2**20:8.1f} MiB  {opcode:24s} {name[:60]}")
    # per-opcode result-byte totals + small-kernel count
    by_op = defaultdict(float)
    small = 0
    for name, opcode, ts, _ in rows:
        b = _shape_bytes(ts)
        by_op[opcode] += b
        if b < (1 << 20):
            small += 1
    print(f"  kernels with result < 1 MiB: {small}")
    print("  result bytes by opcode (MiB):")
    for op, b in sorted(by_op.items(), key=lambda kv: -kv[1])[:10]:
        print(f"    {op:28s} {b/2**20:10.1f}")
    # show the top-level whiles and a sample of copy-starts
    for name, opcode, ts, line in rows:
        if opcode == "while":
            print(f"  WHILE: {line.strip()[:160]}")
    n_shown = 0
    for name, opcode, ts, line in rows:
        if opcode == "copy-start" and n_shown < 8:
            print(f"  COPY: {line.strip()[:140]}")
            n_shown += 1
    return rows


def main(batch_log2=20):
    n = 1 << batch_log2
    key = jax.random.PRNGKey(0)
    gen, params = make_flagship(key, transformer="spline")
    print(f"batch = {n}, backend = {jax.default_backend()}")

    # --- stage timing ---
    t_full = ondevice_time(
        lambda k, p: gen.sample(p, k, n).xs[0], params, key,
        label="full gen.sample")
    t_prior = ondevice_time(
        lambda k: gen.prior.sample(k, n), key, label="prior.sample")

    zs = jax.jit(lambda k: gen.prior.sample(k, n))(key)
    zs = zs if isinstance(zs, tuple) else (zs,)

    blocks = gen.flow.blocks
    print(f"flow has {len(blocks)} top-level blocks:")
    for i, b in enumerate(blocks):
        print(f"  [{i}] {type(b).__name__}")
    prev = t_prior
    for j in range(1, len(blocks) + 1):
        sub = gen.flow[:j]
        subp = params[:j]
        # prior INSIDE the timed fn (key-dependent: defeats loop hoisting)
        def f(k, p, s=sub):
            z = gen.prior.sample(k, n)
            zz = z if isinstance(z, tuple) else (z,)
            return s.forward(p, zz)[0]
        try:
            t = ondevice_time(f, subp, key,
                              label=f"  prior+blocks[0:{j}] (+{type(blocks[j-1]).__name__})")
            print(f"{'':48s} delta {(t-prev)*1e3:7.3f} ms")
            prev = t
        except Exception as e:  # noqa: BLE001
            print(f"  blocks[0:{j}]: failed ({type(e).__name__}: {e})")
            break

    print(f"\nsamples/s full: {n/t_full:,.0f};  prior {t_prior/t_full:.1%} of full")

    # --- kernel census ---
    census(lambda p, k: gen.sample(p, k, n).xs[0], params, key, label="full sample")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
