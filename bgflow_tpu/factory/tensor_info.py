"""Named tensor channels and shape bookkeeping for the builder DSL.

Reference: ``bgflow/factory/tensor_info.py:17-371``.  A ``TensorInfo`` names
one channel of the multi-tensor flow state and records its topology
(circular / cartesian); ``ShapeDictionary`` is an ordered mapping
TensorInfo -> shape that mirrors split/merge operations so the builder can
wire coupling layers by index.
"""
from __future__ import annotations

from collections import OrderedDict
from typing import NamedTuple, Optional, Sequence, Union

import numpy as np

__all__ = [
    "TensorInfo",
    "ShapeDictionary",
    "BONDS",
    "ANGLES",
    "TORSIONS",
    "FIXED",
    "ORIGIN",
    "ROTATION",
    "AUGMENTED",
    "TARGET",
]


class TensorInfo(NamedTuple):
    name: str
    is_circular: bool = False
    is_cartesian: bool = False


BONDS = TensorInfo("BONDS", False, False)
ANGLES = TensorInfo("ANGLES", False, False)
TORSIONS = TensorInfo("TORSIONS", True, False)
FIXED = TensorInfo("FIXED", False, True)
ORIGIN = TensorInfo("ORIGIN", False, True)
ROTATION = TensorInfo("ROTATION", False, False)
AUGMENTED = TensorInfo("AUGMENTED", False, False)
TARGET = TensorInfo("TARGET", False, True)


class ShapeDictionary(OrderedDict):
    """Ordered TensorInfo -> shape map with split/merge/insert bookkeeping."""

    @staticmethod
    def from_coordinate_transform(
        coordinate_transform,
        dim_augmented: int = 0,
        n_constraints: int = 0,
        remove_origin_and_rotation: bool = True,
    ) -> "ShapeDictionary":
        from ..flows.ic import GlobalInternalCoordinateTransformation

        info = ShapeDictionary()
        if coordinate_transform.dim_bonds > 0:
            info[BONDS] = (coordinate_transform.dim_bonds - n_constraints,)
        if coordinate_transform.dim_angles > 0:
            info[ANGLES] = (coordinate_transform.dim_angles,)
        if coordinate_transform.dim_torsions > 0:
            info[TORSIONS] = (coordinate_transform.dim_torsions,)
        if coordinate_transform.dim_fixed > 0:
            info[FIXED] = (coordinate_transform.dim_fixed,)
        if dim_augmented > 0:
            info[AUGMENTED] = (dim_augmented,)
        if (
            isinstance(coordinate_transform, GlobalInternalCoordinateTransformation)
            and not remove_origin_and_rotation
        ):
            info[ORIGIN] = (1, 3)
            info[ROTATION] = (3,)
        return info

    # -- structural updates ----------------------------------------------
    def split(self, key: TensorInfo, into: Sequence[TensorInfo], sizes: Sequence[int], dim: int = -1):
        index = self.index(key)
        if sum(sizes) != self[key][dim]:
            raise ValueError(f"split sizes {sizes} do not sum up to total ({self[key]})")
        all_sizes = list(self[key])
        del self[key]
        for f in into:
            assert f not in self
        for el, size in zip(reversed(into), reversed(list(sizes))):
            all_sizes[dim] = size
            self.insert(el, index, tuple(all_sizes))

    def merge(self, keys: Sequence[TensorInfo], to: TensorInfo, index: Optional[int] = None, dim: int = -1):
        size = sum(self[f][dim] for f in keys)
        all_sizes = list(self[keys[0]])
        all_sizes[dim] = size
        first_index = min(self.index(f) for f in keys)
        for f in keys:
            del self[f]
        assert to not in self
        if index is None:
            index = first_index
        self.insert(to, index, tuple(all_sizes))

    def replace(self, key: TensorInfo, other: Union[str, TensorInfo]) -> TensorInfo:
        if isinstance(other, str):
            other = key._replace(name=other)
        self.insert(other, self.index(key), self[key])
        del self[key]
        return other

    def copy(self) -> "ShapeDictionary":
        clone = ShapeDictionary()
        for key in self:
            clone[key] = self[key]
        return clone

    def insert(self, key: TensorInfo, index: int, size):
        if index < 0:
            index = len(self) - index
        assert key not in self
        self[key] = size
        for i, k in enumerate(list(self)):
            if index <= i < len(self) - 1:
                self.move_to_end(k)

    # -- queries ----------------------------------------------------------
    def index(self, key: TensorInfo, keys=None) -> int:
        keys = self if keys is None else keys
        return list(keys).index(key)

    def names(self, keys=None):
        keys = self if keys is None else keys
        return [key.name for key in keys]

    def dim_all(self, keys=None, dim: int = -1) -> int:
        keys = self if keys is None else keys
        return sum(self[key][dim] for key in keys)

    def dim_circular(self, keys=None, dim: int = -1) -> int:
        keys = self if keys is None else keys
        return sum(self[key][dim] for key in keys if key.is_circular)

    def dim_noncircular(self, keys=None, dim: int = -1) -> int:
        keys = self if keys is None else keys
        return sum(self[key][dim] for key in keys if not key.is_circular)

    def is_circular(self, keys=None, dim: int = -1) -> np.ndarray:
        keys = self if keys is None else keys
        return np.concatenate(
            [np.full(self[key][dim], key.is_circular) for key in keys]
        ).astype(bool)

    def circular_indices(self, keys=None, dim: int = -1) -> np.ndarray:
        keys = self if keys is None else keys
        return np.arange(self.dim_all(keys, dim))[self.is_circular(keys, dim)]

    def dim_cartesian(self, keys=None, dim: int = -1) -> int:
        keys = self if keys is None else keys
        return sum(self[key][dim] for key in keys if key.is_cartesian)

    def is_cartesian(self, keys=None, dim: int = -1) -> np.ndarray:
        keys = self if keys is None else keys
        return np.concatenate(
            [np.full(self[key][dim], key.is_cartesian) for key in keys]
        ).astype(bool)

    def cartesian_indices(self, keys=None, dim: int = -1) -> np.ndarray:
        keys = self if keys is None else keys
        return np.arange(self.dim_all(keys, dim))[self.is_cartesian(keys, dim)]
