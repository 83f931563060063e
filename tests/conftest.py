"""Test configuration.

Runs everything on CPU with 8 virtual XLA devices so multi-chip sharding
logic is exercised without TPU hardware (the pattern recommended for JAX SPMD
testing; the driver separately dry-runs the real multi-chip path).

x64 is enabled so tests can check tight (1e-7-ish) tolerances in float64 the
way the reference's IC tests do (``tests/nn/flow/crd_transform/test_ic.py``),
while float32 paths are tested with their own tolerances.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax

# The ambient environment may pin JAX_PLATFORMS to a TPU plugin (and its
# sitecustomize re-sets the env var), so the env-var route is unreliable;
# jax.config wins as long as no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compilation cache: the suite is compile-bound on CPU, and
# repeat runs hit the cache (first run pays, iteration is fast)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(params=[jnp.float32, jnp.float64], ids=["f32", "f64"])
def dtype(request):
    return request.param


@pytest.fixture
def tol(dtype):
    """Round-trip tolerance per dtype (reference uses 1e-4 f32 / 1e-7 f64)."""
    return 1e-4 if dtype == jnp.float32 else 1e-7


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


def assert_close(a, b, tol, msg=""):
    a, b = np.asarray(a), np.asarray(b)
    np.testing.assert_allclose(a, b, atol=tol, rtol=tol, err_msg=msg)
