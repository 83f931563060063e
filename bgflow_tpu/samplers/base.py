"""Sampler protocol.

Reference: ``bgflow/distribution/sampling/base.py:9-68``.  The torch version
mutates a global RNG; here every sampler consumes an explicit ``PRNGKey`` so
sampling is pure, reproducible, jittable, and shardable.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax


class Sampler:
    def __init__(self, return_hook: Optional[Callable] = None):
        # post-processing hook applied to the tuple of sampled tensors
        self._return_hook = return_hook if return_hook is not None else (lambda *xs: xs)

    def _sample(self, key, n_samples: int):
        raise NotImplementedError

    def _sample_with_temperature(self, key, n_samples: int, temperature):
        raise NotImplementedError(
            f"{type(self).__name__} does not support temperature-scaled sampling"
        )

    def sample_to_host(self, key, n_samples: int, batch_size: int = 64, temperature=1.0):
        """Sample in device-sized chunks and assemble on the host as numpy.

        The reference's chunked ``sample_to_cpu`` (``sampling/base.py:57-68``)
        for sample counts that exceed device memory.
        """
        import numpy as np
        import jax

        chunks = []
        remaining = n_samples
        while remaining > 0:
            key, sub = jax.random.split(key)
            n = min(batch_size, remaining)
            out = self.sample(sub, n, temperature=temperature)
            out = out if isinstance(out, tuple) else (out,)
            chunks.append(tuple(np.asarray(o) for o in out))
            remaining -= n
        n_fields = len(chunks[0])
        result = tuple(
            np.concatenate([c[i] for c in chunks], axis=0) for i in range(n_fields)
        )
        return result if len(result) > 1 else result[0]

    def sample(self, key, n_samples: int, temperature=1.0):
        """Draw ``n_samples`` samples.  Returns a single array or a tuple."""
        if isinstance(temperature, float) and temperature == 1.0:
            out = self._sample(key, n_samples)
        else:
            out = self._sample_with_temperature(key, n_samples, temperature)
        if not isinstance(out, tuple):
            out = (out,)
        out = self._return_hook(*out)
        if isinstance(out, tuple) and len(out) == 1:
            return out[0]
        return out
