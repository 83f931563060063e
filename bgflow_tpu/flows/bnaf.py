"""Block neural autoregressive flow (BNAF).

Reference: ``bgflow/nn/flow/bnaf.py:144-246`` with log-space block-diagonal
Jacobian accumulation (``utils/tensorops.py:log_dot_exp``).  Strictly
increasing triangular-block networks; forward-only density estimator (no
closed-form inverse), dlogp exact via the chained log block diagonals.
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..core.flow import Flow

__all__ = ["BNAFlow", "log_dot_exp"]


def log_dot_exp(log_a, log_b):
    """Numerically stable log(exp(log_a) @ exp(log_b)) over trailing axes."""
    max_a = jnp.max(log_a, axis=-1, keepdims=True)
    max_b = jnp.max(log_b, axis=-2, keepdims=True)
    prod = jnp.einsum(
        "...ik,...kj->...ij", jnp.exp(log_a - max_a), jnp.exp(log_b - max_b)
    )
    return jnp.log(prod) + max_a + max_b


def _masks(d: int, a: int, b: int):
    diag = np.zeros((a * d, b * d), dtype=bool)
    for i in range(d):
        diag[a * i : a * (i + 1), b * i : b * (i + 1)] = True
    row_block = np.arange(a * d) // a
    col_block = np.arange(b * d) // b
    off = row_block[:, None] < col_block[None, :]
    return diag, off


class BNAFlow(Flow):
    """dim-dimensional BNAF with hidden block factors ``block_sizes``.

    ``block_sizes`` must start and end with 1, e.g. (1, 8, 8, 1).
    Forward-only (the inverse would require numerical root finding).
    """

    def __init__(self, dim: int, block_sizes: Sequence[int]):
        assert block_sizes[0] == 1 and block_sizes[-1] == 1
        assert all(s > 0 for s in block_sizes)
        self.dim = dim
        self.block_sizes = tuple(block_sizes)
        self._layer_masks = [
            _masks(dim, a, b) for a, b in zip(block_sizes[:-1], block_sizes[1:])
        ]
        # nonlinearities between interior linear layers (reference bnaf.py:236-239)
        self._gate_after = [
            0 < i < len(block_sizes) - 2 for i in range(len(block_sizes) - 1)
        ]

    def init(self, key):
        params = []
        for (a, b), gated in zip(
            zip(self.block_sizes[:-1], self.block_sizes[1:]), self._gate_after
        ):
            key, k1, k2 = jax.random.split(key, 3)
            w = jax.random.normal(k1, (a * self.dim, b * self.dim)) / np.sqrt(
                a * self.dim + b * self.dim
            )
            diag_mask, _ = _masks(self.dim, a, b)
            # diagonal entries parameterized in log space (positivity)
            w = jnp.where(diag_mask, jnp.log(jnp.abs(w) + 1e-3), w)
            layer = {
                "weight": w,
                "log_diag": jnp.log(jax.random.uniform(k2, (1, b * self.dim), minval=1e-2)),
                "bias": jnp.zeros((1, b * self.dim)),
            }
            if gated:
                layer["log_alpha"] = jnp.zeros((1, b * self.dim))
                layer["log_beta"] = jnp.zeros((1, b * self.dim))
            params.append(layer)
        return params

    def _linear(self, layer, diag_mask, off_mask, x, accum):
        w = layer["weight"]
        weight = jnp.exp(w) * diag_mask + w * off_mask
        norm = jnp.linalg.norm(weight, axis=-1, keepdims=True)
        weight = jnp.exp(layer["log_diag"]) * weight / norm
        x = x @ weight + layer["bias"]
        # log of the block-diagonal entries
        a = diag_mask.shape[0] // self.dim
        b = diag_mask.shape[1] // self.dim
        log_blocks = (layer["log_diag"] + w - jnp.log(norm))[diag_mask].reshape(
            1, self.dim, a, b
        )
        log_blocks = jnp.broadcast_to(log_blocks, (x.shape[0], self.dim, a, b))
        accum = log_blocks if accum is None else log_dot_exp(accum, log_blocks)
        return x, accum

    def _gate(self, layer, x, accum):
        alpha = jnp.exp(layer["log_alpha"])
        beta = jax.nn.sigmoid(layer["log_beta"])
        log_diag = jnp.log(beta + (1.0 - beta) * alpha * (1.0 - jnp.tanh(alpha * x) ** 2))
        x = beta * x + (1.0 - beta) * jnp.tanh(alpha * x)
        accum = accum + log_diag.reshape(x.shape[0], accum.shape[1], 1, accum.shape[3])
        return x, accum

    def _forward(self, params, xs, **kwargs):
        (x,) = xs
        accum = None
        for layer, (diag_mask, off_mask), gated in zip(
            params, self._layer_masks, self._gate_after
        ):
            x, accum = self._linear(layer, jnp.asarray(diag_mask), jnp.asarray(off_mask), x, accum)
            if gated:
                x, accum = self._gate(layer, x, accum)
        ldj = jnp.sum(accum.reshape(x.shape[0], -1), axis=-1)
        return (x,), ldj

    def _inverse(self, params, xs, **kwargs):
        raise NotImplementedError(
            "BNAF has no closed-form inverse (density estimation only)."
        )
