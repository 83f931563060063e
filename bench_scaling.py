"""Weak-scaling benchmark: sharded sampling/training over an N-device mesh.

The driver's bench runs single-chip (`bench.py`); this script measures the
multi-device path.  On real hardware run it on a pod slice; without one it
runs on virtual CPU devices to validate scaling *mechanics* (not speed):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python bench_scaling.py

Prints one JSON line per device count with per-device throughput and
weak-scaling efficiency (per-device throughput at N devices / at 1 device).
"""
import json
import time

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import bgflow_tpu as bg
from bgflow_tpu.parallel.mesh import make_mesh
from bench import make_flagship

# virtual CPU devices validate mechanics, not speed — keep the batch small
# there so the sweep finishes quickly; use the full batch on real chips
PER_DEVICE_BATCH = 65536 if jax.default_backend() == "tpu" else 8192


def measure(n_devices: int, params, gen, key):
    mesh = make_mesh(n_devices)
    n = PER_DEVICE_BATCH * n_devices
    rep = NamedSharding(mesh, P())
    params_r = jax.device_put(params, rep)

    @jax.jit
    def sample(params, key):
        return gen.sample(params, key, n).xs[0]

    with mesh:
        x = sample(params_r, key)
        jax.block_until_ready(x)
        iters = 10
        t0 = time.perf_counter()
        for i in range(iters):
            x = sample(params_r, jax.random.fold_in(key, i))
        jax.block_until_ready(x)
        t1 = time.perf_counter()
    return n * iters / (t1 - t0)


def main():
    backend = jax.default_backend()
    if backend != "tpu":
        print(json.dumps({
            "backend": f"{backend}-virtual-{len(jax.devices())}dev",
            "note": ("virtual devices share one physical host: aggregate "
                     "throughput validates sharding mechanics; per-device "
                     "efficiency is only meaningful on a real pod slice"),
        }))
    key = jax.random.PRNGKey(0)
    # affine path: on virtual CPU devices the Pallas kernels would run in
    # the (slow) interpreter; sharding mechanics are identical
    gen, params = make_flagship(key, transformer="affine")
    n_available = len(jax.devices())
    counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= n_available]
    base_per_device = None
    for c in counts:
        sps = measure(c, params, gen, key)
        per_device = sps / c
        if base_per_device is None:
            base_per_device = per_device
        print(json.dumps({
            "metric": "ala2_bg_samples_per_sec_sharded",
            "devices": c,
            "value": round(sps, 1),
            "per_device": round(per_device, 1),
            "weak_scaling_efficiency": round(per_device / base_per_device, 3),
        }))


if __name__ == "__main__":
    main()
