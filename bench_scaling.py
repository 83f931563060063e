"""Weak-scaling benchmark: sharded sampling + DP training over an N-device mesh.

Pod-ready harness (VERDICT r2 item 5): per-device batch is held CONSTANT,
so under perfect weak scaling the step time is flat in N.  For every device
count it reports

- ``step_time_ms``            — on-device two-length-difference timing
  (``utils.profiling.measure_op``; host-side loops measure nothing through
  the axon tunnel's non-blocking ``block_until_ready``),
- ``step_time_ratio_vs_1dev`` — the weak-scaling signal a pod run can be
  compared against directly (1.0 = perfect),
- for the DP train step, ``comm_fraction_est`` — measured, not modeled:
  the same shard_map step is timed WITH and WITHOUT the gradient ``pmean``
  (identical compute, only the collective differs), so
  (t_full - t_local)/t_full isolates the all-reduce cost,
- ``param_bytes`` — the all-reduce volume for context.

On virtual CPU devices (one physical host) the numbers validate MECHANICS
and are labeled ``host_contention: true`` — threads contend for the same
cores, so ratios are pessimistic; on a real pod slice the same JSON schema
applies unchanged.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python bench_scaling.py
"""
import json

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

import bgflow_tpu as bg
from bgflow_tpu.parallel.mesh import make_mesh, make_sharded_sampler
from bgflow_tpu.utils.profiling import measure_op_stats
from bench import make_flagship

ON_TPU = jax.default_backend() == "tpu"
# weak scaling: constant work per device
SAMPLE_BATCH_PER_DEVICE = 65536 if ON_TPU else 4096
TRAIN_BATCH_PER_DEVICE = 1024 if ON_TPU else 256


def _consume(tree):
    s = jnp.float32(0.0)
    for leaf in jax.tree_util.tree_leaves(tree):
        s = s + jnp.mean(leaf).astype(jnp.float32)
    return s


def measure_sampling(mesh, gen, params, key, n_devices):
    """Explicitly sharded sampling (``make_sharded_sampler``).

    Round 4 ran plain ``gen.sample`` under the mesh and trusted GSPMD to
    partition it; HLO inspection showed it did not (zero collectives, no
    partition-id — the whole computation was REPLICATED on every device),
    which is why the r4 'sampling weak scaling' collapsed 38x at 8 virtual
    devices: every device computed the full 8-device batch under host
    contention.  With the shard_map sampler each device draws only its own
    sub-batch."""
    n = SAMPLE_BATCH_PER_DEVICE * n_devices
    params_r = jax.device_put(params, NamedSharding(mesh, P()))
    sampler = make_sharded_sampler(mesh, gen, n)

    def fn(i, params):
        return sampler(params, jax.random.fold_in(key, i)).xs[0]

    with mesh:
        return measure_op_stats(fn, params_r, iters=8 if ON_TPU else 3)


def measure_train(mesh, gen, params, key, n_devices, with_comm):
    """One DP NLL train-gradient step under shard_map.

    ``with_comm=False`` runs the identical per-shard compute but skips the
    gradient pmean — the difference to ``with_comm=True`` is the all-reduce.
    """
    n_local = TRAIN_BATCH_PER_DEVICE
    x = gen.sample(params, key, n_local * n_devices).xs[0]
    x = jax.device_put(x, NamedSharding(mesh, P("dp")))
    params_r = jax.device_put(params, NamedSharding(mesh, P()))

    def loss(p, xb):
        return jnp.mean(gen.energy(p, xb))

    def local_step(p, xb):
        l, g = jax.value_and_grad(loss)(p, xb)
        if with_comm:
            g = jax.tree_util.tree_map(lambda t: jax.lax.pmean(t, "dp"), g)
            l = jax.lax.pmean(l, "dp")
        # reduce to one scalar per shard (consumes every grad leaf)
        return jnp.reshape(l + 1e-12 * _consume(g), (1,))

    sharded = shard_map(
        local_step, mesh=mesh, in_specs=(P(), P("dp")), out_specs=P("dp"),
        check_vma=False,
    )

    def fn(i, params, xb):
        return sharded(params, xb * (1.0 + 0.0 * i))

    with mesh:
        return measure_op_stats(fn, params_r, x, iters=8 if ON_TPU else 3)


def main():
    backend = jax.default_backend()
    n_available = len(jax.devices())
    host_contention = backend != "tpu"
    header = {
        "backend": backend,
        "n_devices_available": n_available,
        "host_contention": host_contention,
        "sample_batch_per_device": SAMPLE_BATCH_PER_DEVICE,
        "train_batch_per_device": TRAIN_BATCH_PER_DEVICE,
    }
    if host_contention:
        header["note"] = (
            "virtual devices share one physical host: ratios validate "
            "sharding mechanics and are pessimistic; schema matches pod runs"
        )
    print(json.dumps(header))

    key = jax.random.PRNGKey(0)
    # affine path: on virtual CPU devices the Pallas kernels would run in
    # the (slow) interpreter; sharding mechanics are identical
    gen, params = make_flagship(key, transformer="affine", use_pallas=ON_TPU)
    param_bytes = sum(
        np.prod(l.shape) * l.dtype.itemsize for l in jax.tree_util.tree_leaves(params)
    )

    counts = [c for c in (1, 2, 4, 8, 16, 32, 64) if c <= n_available]
    t_sample_1 = t_train_1 = None

    def block(stats, t_ref):
        """Timing block: median step time with (lo, hi) spread; the timer
        escalates iterations until the two-length difference is positive
        and stable, and flags unresolved measurements instead of ever
        emitting a negative time (r4 defect: SCALING_r04 dp_train anchor
        was -0.197 ms)."""
        t = stats["dt"]
        out = {
            "step_time_ms": round(1e3 * t, 3),
            "step_time_ms_spread": [round(1e3 * stats["dt_lo"], 3),
                                    round(1e3 * stats["dt_hi"], 3)],
            "timer_iters": stats["iters"],
            "step_time_ratio_vs_1dev": round(t / t_ref, 3),
            "weak_scaling_efficiency": round(t_ref / t, 3),
        }
        if not stats["resolved"]:
            out["unresolved_timing"] = True
        return out

    for c in counts:
        mesh = make_mesh(c)
        s_s = measure_sampling(mesh, gen, params, key, c)
        s_full = measure_train(mesh, gen, params, key, c, with_comm=True)
        s_local = measure_train(mesh, gen, params, key, c, with_comm=False)
        t_s, t_full, t_local = s_s["dt"], s_full["dt"], s_local["dt"]
        if t_sample_1 is None:
            t_sample_1, t_train_1 = t_s, t_full
        comm_frac = max(0.0, (t_full - t_local) / t_full) if c > 1 else 0.0
        samp = block(s_s, t_sample_1)
        samp["samples_per_sec"] = round(SAMPLE_BATCH_PER_DEVICE * c / t_s, 1)
        train = block(s_full, t_train_1)
        train["comm_fraction_est"] = round(comm_frac, 3)
        train["param_bytes"] = int(param_bytes)
        print(json.dumps({
            "devices": c,
            "sampling": samp,
            "dp_train": train,
            "host_contention": host_contention,
        }))


if __name__ == "__main__":
    main()
