"""Observability: profiler traces and named scopes.

The reference's only instrumentation is a debug logger (SURVEY.md section 5);
here every hot phase can carry a ``jax.named_scope`` (visible in XLA HLO and
TPU profiles) and whole runs can be traced with the JAX profiler for
tensorboard/perfetto.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax

__all__ = ["trace", "scope", "Timer"]


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace: ``with trace('/tmp/tb'): run()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def scope(name: str):
    """Named scope context/decorator for profile-visible phase labels."""
    return jax.named_scope(name)


class Timer:
    """Wall-clock timer that blocks on device completion.

    >>> with Timer() as t: result = step(...)
    >>> t.elapsed
    """

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.elapsed: Optional[float] = None
        self._result = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync:
            # block on any pending computation the timed region produced
            jax.effects_barrier()
        self.elapsed = time.perf_counter() - self._t0
        return False
