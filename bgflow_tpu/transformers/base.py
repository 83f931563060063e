"""Transformer protocol: a conditional bijector ``y' = tau(y; theta(x))``.

Reference: ``bgflow/nn/flow/transformer/base.py:7-16``.

A transformer has ``init(key) -> params`` and
``forward(params, cond, y, inverse=False, **kwargs) -> (y', ldj)`` where
``ldj`` has shape ``(batch,)`` (already summed over the feature axis).
"""
from __future__ import annotations


class Transformer:
    def init(self, key):
        return ()

    def forward(self, params, cond, y, inverse: bool = False, **kwargs):
        if inverse:
            return self._inverse(params, cond, y, **kwargs)
        return self._forward(params, cond, y, **kwargs)

    def _forward(self, params, cond, y, **kwargs):
        raise NotImplementedError

    def _inverse(self, params, cond, y, **kwargs):
        raise NotImplementedError
