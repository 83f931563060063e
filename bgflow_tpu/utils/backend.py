"""Backend selection helpers for environments with a flaky accelerator.

Some deployments reach the TPU through a remote PJRT plugin whose backend
initialization blocks *forever* when the pool is unreachable (no deadline
in the plugin).  An in-process ``jax.devices()`` call can never be
cancelled, so reachability must be probed in a throwaway subprocess with a
hard timeout — then, if the accelerator is down, the CPU platform is
pinned via ``jax.config`` (which wins over env-var re-pinning by any
ambient sitecustomize, as long as no backend has been initialized yet).

Usage, before ANY other jax backend touch::

    from bgflow_tpu.utils.backend import ensure_reachable_backend
    on_tpu = ensure_reachable_backend()   # False -> CPU was pinned
"""
from __future__ import annotations

import os
import subprocess
import sys

__all__ = ["tpu_reachable", "ensure_reachable_backend"]


def tpu_reachable(timeout: float = 300.0) -> bool:
    """True iff a non-CPU backend initializes within ``timeout`` seconds
    (probed in a subprocess — see module docstring for why)."""
    forced = os.environ.get("JAX_PLATFORMS", "")
    if forced and "tpu" not in forced and "axon" not in forced:
        return False  # caller already pinned a non-TPU platform
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert any(d.platform != 'cpu' for d in jax.devices())"],
            timeout=timeout, capture_output=True,
        )
        return r.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False


def ensure_reachable_backend(timeout: float = 300.0, verbose: bool = True) -> bool:
    """Probe the accelerator; pin the CPU platform if it is unreachable.

    Returns True when a working accelerator backend is available, False
    when CPU was pinned.  Must be called before any jax backend touch
    (device queries, jit execution, ...)."""
    import jax

    try:
        from jax._src import xla_bridge as _xb

        if _xb.backends_are_initialized():
            # too late to re-pin; report what this process already holds
            return any(d.platform != "cpu" for d in jax.devices())
    except (ImportError, AttributeError):
        pass
    if str(jax.config.jax_platforms or "").startswith("cpu"):
        return False  # caller already pinned CPU via jax.config
    forced = os.environ.get("JAX_PLATFORMS", "")
    if forced and "tpu" not in forced and "axon" not in forced:
        # an explicit non-TPU pin (cpu, cuda, ...): enforce it via
        # jax.config — an ambient sitecustomize may have registered an
        # accelerator plugin that wins over the env var, so the env route
        # alone is unreliable (same hazard the docstring describes)
        jax.config.update("jax_platforms", forced)
        return not forced.startswith("cpu")
    if tpu_reachable(timeout=timeout):
        return True
    jax.config.update("jax_platforms", "cpu")
    if verbose:
        print("bgflow_tpu: accelerator unreachable, pinned CPU backend",
              file=sys.stderr)
    return False
