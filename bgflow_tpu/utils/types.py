"""Type/packing helpers (API parity with ``bgflow/utils/types.py:16-60``)."""
from __future__ import annotations

import numpy as np
import jax

__all__ = ["pack_tensor_in_tuple", "unpack_tensor_tuple", "is_list_or_tuple", "as_numpy"]


def is_list_or_tuple(x) -> bool:
    return isinstance(x, (list, tuple))


def pack_tensor_in_tuple(seq):
    """Array -> (array,); sequences pass through as tuples."""
    if is_list_or_tuple(seq):
        return tuple(seq)
    return (seq,)


def unpack_tensor_tuple(seq):
    """1-tuples unwrap to their element; longer tuples pass through."""
    if is_list_or_tuple(seq) and len(seq) == 1:
        return seq[0]
    return tuple(seq) if is_list_or_tuple(seq) else seq


def as_numpy(x, dtype=None):
    """Device array / nested sequence -> numpy array."""
    arr = np.asarray(x)
    return arr if dtype is None else arr.astype(dtype)
