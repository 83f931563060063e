"""Multi-process self-check: a real 2-process (multi-host) DP train step.

The package's distributed entry (``initialize_distributed`` +
``make_multihost_mesh``) exercised end-to-end on any machine: the launcher
spawns N OS processes, each joins the gRPC coordinator, builds the
(hosts, dp) hybrid mesh over gloo CPU collectives, and runs one
data-parallel NLL train step on a deterministic batch.  Both the 2-process
pytest (``tests/test_multihost.py``) and the driver dryrun's optional
multi-process mode (``__graft_entry__.dryrun_multichip``) go through this
module, so the code path that would run on a pod (swap gloo for ICI/DCN)
is CI-checked.

Run a worker directly:  ``python -m bgflow_tpu.parallel.selfcheck <pid> <nproc> <port>``
"""
from __future__ import annotations

import os
import re
import socket
import subprocess
import sys
from typing import List, Tuple

RESULT_RE = re.compile(r"RESULT loss=(-?[\d.]+) fp=(-?[\d.]+)")

__all__ = ["build_model_and_batch", "train_step_fn", "fingerprint",
           "worker_main", "launch_multiprocess_check"]


def build_model_and_batch():
    """Deterministic tiny BG + batch (identical in every process)."""
    import jax
    import bgflow_tpu as bg

    prior = bg.NormalDistribution(2)
    target = bg.DoubleWellEnergy(2)
    shift = bg.DenseNet([1, 16, 1])
    scale = bg.DenseNet([1, 16, 1])
    flow = bg.Chain([
        bg.Split(1, axis=-1),
        bg.Coupling(bg.AffineTransformer(shift, scale)),
        bg.Merge(1, axis=-1),
    ])
    gen = bg.BoltzmannGenerator(prior, flow, target)
    params = gen.init(jax.random.PRNGKey(0))
    batch = jax.random.normal(jax.random.PRNGKey(1), (64, 2))
    return gen, params, batch


def train_step_fn(gen):
    import jax
    import jax.numpy as jnp
    import optax

    opt = optax.adam(1e-3)

    def loss(p, x):
        return jnp.mean(gen.energy(p, x))

    @jax.jit
    def step(p, s, x):
        l, g = jax.value_and_grad(loss)(p, x)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s, l

    return opt, step


def fingerprint(params) -> float:
    import jax
    import jax.numpy as jnp

    return float(sum(jnp.sum(jnp.abs(l)) for l in jax.tree_util.tree_leaves(params)))


def worker_main(pid: int, nproc: int, port: str, n_local: int = 4,
                x64: bool = True) -> None:
    from bgflow_tpu.parallel.mesh import initialize_distributed, make_multihost_mesh

    initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
        platform="cpu",
        num_local_cpu_devices=n_local,
    )
    import jax

    if x64:
        jax.config.update("jax_enable_x64", True)
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == nproc
    assert jax.device_count() == n_local * nproc

    mesh = make_multihost_mesh()
    assert mesh.shape == {"hosts": nproc, "dp": n_local}

    gen, params, batch = build_model_and_batch()
    opt, step = train_step_fn(gen)
    opt_state = opt.init(params)

    # global batch sharded over BOTH axes; this process contributes its rows
    spec = NamedSharding(mesh, P(("hosts", "dp")))
    rows_per_proc = batch.shape[0] // nproc
    local = np.asarray(batch)[pid * rows_per_proc:(pid + 1) * rows_per_proc]
    x = jax.make_array_from_process_local_data(spec, local, batch.shape)
    rep = NamedSharding(mesh, P())
    p_r = jax.device_put(params, rep)
    s_r = jax.device_put(opt_state, rep)
    with mesh:
        p2, _, l2 = step(p_r, s_r, x)
    print(f"RESULT loss={float(l2):.10f} fp={fingerprint(p2):.10f}", flush=True)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def launch_multiprocess_check(n_processes: int = 2, timeout: float = 300.0,
                              ) -> List[Tuple[float, float]]:
    """Spawn the worker processes; return each worker's (loss, fingerprint).

    Raises ``RuntimeError`` when a worker fails — with its full output, so
    CI logs show the real error.
    """
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device counts
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "bgflow_tpu.parallel.selfcheck",
             str(i), str(n_processes), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for i in range(n_processes)
    ]
    outs = [p.communicate(timeout=timeout)[0] for p in procs]
    results = []
    for p, out in zip(procs, outs):
        if p.returncode != 0:
            raise RuntimeError(f"selfcheck worker failed:\n{out}")
        m = RESULT_RE.search(out)
        if not m:
            raise RuntimeError(f"no RESULT line in selfcheck worker output:\n{out}")
        results.append((float(m.group(1)), float(m.group(2))))
    return results


if __name__ == "__main__":
    worker_main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
