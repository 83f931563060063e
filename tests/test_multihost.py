"""Multi-host (multi-process) backend: a real 2-process CPU launch.

The TPU-native replacement for the reference's single-host worker pool
(``bgflow/distribution/energy/openmm.py:194-196``), per SURVEY §2.6: two
OS processes join a coordinator, build a (hosts=2, dp=4) hybrid mesh, and
run one data-parallel train step whose numerics must match the
single-process result.  Cross-process collectives ride the gloo CPU
backend here; on a pod the same code path rides DCN/ICI.
"""
import pytest

from tests.conftest import assert_close
from bgflow_tpu.parallel.selfcheck import (
    build_model_and_batch,
    fingerprint,
    launch_multiprocess_check,
    train_step_fn,
)


@pytest.mark.slow
def test_two_process_dp_step_matches_single_process():
    # single-process reference numerics (in this process, virtual devices)
    gen, params, batch = build_model_and_batch()
    opt, step = train_step_fn(gen)
    p1, _, l1 = step(params, opt.init(params), batch)
    fp1 = fingerprint(p1)

    results = launch_multiprocess_check(n_processes=2)

    # both processes agree with each other and with single-process numerics
    (l_a, fp_a), (l_b, fp_b) = results
    assert_close(l_a, l_b, 1e-9)
    assert_close(fp_a, fp_b, 1e-9)
    assert_close(l_a, float(l1), 1e-5)
    assert_close(fp_a, fp1, 1e-4)


def test_multihost_mesh_single_process_degenerates():
    """Without a distributed init, make_multihost_mesh gives a (1, n) mesh —
    code written for the two-axis mesh runs unchanged at any scale."""
    import jax
    from bgflow_tpu.parallel.mesh import make_multihost_mesh

    mesh = make_multihost_mesh()
    assert mesh.shape == {"hosts": 1, "dp": jax.device_count()}
