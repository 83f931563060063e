"""Atom-axis (model-parallel) sharded force field == dense force field."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bgflow_tpu.energies.ala2 import ALA2_REFERENCE_XYZ, build_ala2_forcefield
from bgflow_tpu.parallel.energy import ShardedForceFieldEnergy, make_mesh_2d
from bgflow_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _batch(key, n=16, scale=0.01):
    ref = jnp.asarray(ALA2_REFERENCE_XYZ, jnp.float32).reshape(-1)
    return ref[None, :] + scale * jax.random.normal(key, (n, ref.shape[0]), jnp.float32)


def test_sharded_energy_matches_dense():
    ff = build_ala2_forcefield()
    mesh = make_mesh(8, axis_name="mp")
    sh = ShardedForceFieldEnergy(mesh, ff)
    x = _batch(jax.random.PRNGKey(0))
    e_dense = ff.energy(x)
    e_shard = sh.energy(x)
    np.testing.assert_allclose(np.asarray(e_shard), np.asarray(e_dense), rtol=2e-5)


def test_sharded_energy_with_gbsa_and_temperature():
    ff = build_ala2_forcefield(implicit_solvent=True)
    mesh = make_mesh(8, axis_name="mp")
    sh = ShardedForceFieldEnergy(mesh, ff)
    x = _batch(jax.random.PRNGKey(1), n=8)
    np.testing.assert_allclose(
        np.asarray(sh.energy(x, temperature=1.5)),
        np.asarray(ff.energy(x, temperature=1.5)),
        rtol=2e-5,
    )


def test_sharded_force_matches_dense():
    ff = build_ala2_forcefield()
    mesh = make_mesh(8, axis_name="mp")
    sh = ShardedForceFieldEnergy(mesh, ff)
    x = _batch(jax.random.PRNGKey(2), n=4)
    f_dense = np.asarray(ff.force_kj(x))
    f_shard = np.asarray(sh.force_kj(x))
    scale = np.abs(f_dense).max()
    np.testing.assert_allclose(f_shard / scale, f_dense / scale, atol=3e-5)


def test_model_parallel_md_matches_dense():
    """BAOAB MD driven by the sharded energy reproduces the dense trajectory
    (same keys -> same noise -> same positions, model-parallel forces)."""
    from bgflow_tpu.samplers.md import baoab_run

    ff = build_ala2_forcefield()
    mesh = make_mesh(8, axis_name="mp")
    sh = ShardedForceFieldEnergy(mesh, ff)
    x0 = _batch(jax.random.PRNGKey(4), n=2, scale=0.0)
    key = jax.random.PRNGKey(5)
    traj_dense = np.asarray(baoab_run(ff, x0, key, 20, timestep=5e-4)[0])
    traj_shard = np.asarray(baoab_run(sh, x0, key, 20, timestep=5e-4)[0])
    np.testing.assert_allclose(traj_shard, traj_dense, atol=1e-4)


def test_sharded_energy_under_jit_batch_sharded():
    """2-D (dp, mp) mesh: outer batch sharding composes with the row shard."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    ff = build_ala2_forcefield()
    mesh = make_mesh_2d(2, 4)
    sh = ShardedForceFieldEnergy(mesh, ff, batch_axis="dp")
    x = _batch(jax.random.PRNGKey(3), n=16)
    e_dense = np.asarray(ff.energy(x))
    e_fn = jax.jit(sh.energy)
    x_sh = jax.device_put(x, NamedSharding(mesh, P("dp")))
    e_shard = np.asarray(e_fn(x_sh))
    np.testing.assert_allclose(e_shard, e_dense, rtol=2e-5)
