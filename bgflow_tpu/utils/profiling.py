"""Observability: profiler traces and named scopes.

The reference's only instrumentation is a debug logger (SURVEY.md section 5);
here every hot phase can carry a ``jax.named_scope`` (visible in XLA HLO and
TPU profiles) and whole runs can be traced with the JAX profiler for
tensorboard/perfetto.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp

__all__ = ["trace", "scope", "Timer", "measure_op", "measure_op_stats"]


def measure_op_stats(fn: Callable, *args, iters: int = 10, base: int = 2,
                     repeats: int = 5, max_rounds: int = 4) -> dict:
    """Robust per-call device latency of ``fn(i, *args) -> pytree``.

    Same on-device two-length-difference scheme as :func:`measure_op`, but
    the difference is taken ``repeats`` times and summarized by its MEDIAN
    with a (min, max) spread.  For sub-millisecond ops the single
    difference of round 4 was noise-dominated — ``SCALING_r04.json``
    published a *negative* step time — so if the median is non-positive or
    the spread exceeds the median, the iteration count is quadrupled and
    the measurement retried (up to ``max_rounds``), which scales the
    signal while the host-side noise stays constant.

    Returns ``{"dt": float (>0), "dt_lo": float, "dt_hi": float,
    "iters": int, "resolved": bool}``; ``resolved=False`` flags a
    measurement that never stabilized (dt is then the best positive
    estimate, or the last median clamped to the timer floor).
    """

    @jax.jit
    def run(m, *a):
        def body(i, acc):
            # consume EVERY element of every output leaf: slicing a single
            # element lets XLA's simplifier compute just that element
            # through elementwise/matmul chains, silently deleting the op
            # under measurement
            s = jnp.float32(0.0)
            for leaf in jax.tree.leaves(fn(i, *a)):
                s = s + jnp.mean(leaf).astype(jnp.float32)
            return acc + s * 1e-12

        return jax.lax.fori_loop(0, m, body, jnp.float32(0.0))

    float(run(jnp.int32(base), *args))  # compile + warm
    last = None
    for round_i in range(max_rounds):
        diffs = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(run(jnp.int32(base), *args))
            t_base = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(run(jnp.int32(base + iters), *args))
            t_full = time.perf_counter() - t0
            diffs.append((t_full - t_base) / iters)
        diffs.sort()
        med = diffs[len(diffs) // 2]
        lo, hi = diffs[0], diffs[-1]
        last = {"dt": med, "dt_lo": lo, "dt_hi": hi, "iters": iters,
                "resolved": med > 0 and (hi - lo) < max(med, 1e-12)}
        if last["resolved"]:
            return last
        iters *= 4
    # never return a non-positive time: clamp to the best positive info
    if last["dt"] <= 0:
        pos = [d for d in (last["dt_lo"], last["dt_hi"]) if d > 0]
        last["dt"] = min(pos) if pos else 1e-9
    return last


def measure_op(fn: Callable, *args, iters: int = 10, base: int = 2) -> float:
    """True per-call device latency of ``fn(i, *args) -> pytree`` in seconds.

    Some backends (the axon TPU tunnel) have a non-blocking
    ``block_until_ready``, so host-side timing loops over async dispatches
    measure nothing.  This helper runs the loop ON DEVICE: one jitted
    executable whose traced iteration count drives a ``fori_loop`` that
    calls ``fn(i, *args)`` and folds every output leaf into a scalar
    accumulator (preventing dead-code elimination), synced by a 4-byte
    scalar fetch.  The tunnel round-trip (~30 ms) and loop overhead cancel
    in the two-length difference; repeats/escalation in
    :func:`measure_op_stats` guard against noise-dominated differences.

    Pass large arrays through ``*args`` (they become jit parameters) — a
    closure-captured device array is embedded into the HLO as a literal,
    which breaks remote-compile size limits.  ``fn`` must make its
    computation depend on the traced index ``i`` (fold it into a PRNG key
    or add ``i * 0`` to an input) or XLA hoists the body out of the loop
    and the measurement collapses.
    """
    return measure_op_stats(fn, *args, iters=iters, base=base)["dt"]


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
