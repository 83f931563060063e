"""Minimal trajectory IO (host side).

Replaces the reference's mdtraj-based helpers
(``bgflow/utils/openmm.py:6-59``: ``save_latent_samples_as_trajectory``,
``NumpyReporter``) without the mdtraj dependency: multi-model PDB and
xyz writers plus a npz reporter.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

__all__ = ["save_pdb_trajectory", "save_xyz_trajectory", "NumpyReporter"]


def save_pdb_trajectory(filename: str, positions_nm, atom_names: Sequence[str],
                        residue_names: Optional[Sequence[str]] = None,
                        residue_ids: Optional[Sequence[int]] = None) -> None:
    """Write (n_frames, n_atoms, 3) nm positions as a multi-MODEL PDB."""
    pos = np.asarray(positions_nm).reshape(len(positions_nm), -1, 3) * 10.0  # nm -> A
    n_atoms = pos.shape[1]
    residue_names = residue_names or ["UNK"] * n_atoms
    residue_ids = residue_ids or [1] * n_atoms
    with open(filename, "w") as f:
        for m, frame in enumerate(pos, start=1):
            f.write(f"MODEL     {m:4d}\n")
            for i in range(n_atoms):
                name = atom_names[i][:4]
                f.write(
                    f"ATOM  {i + 1:5d} {name:<4s}{residue_names[i][:3]:>4s} X{residue_ids[i]:4d}    "
                    f"{frame[i, 0]:8.3f}{frame[i, 1]:8.3f}{frame[i, 2]:8.3f}  1.00  0.00\n"
                )
            f.write("ENDMDL\n")
        f.write("END\n")


def save_xyz_trajectory(filename: str, positions_nm, atom_names: Sequence[str]) -> None:
    """Write (n_frames, n_atoms, 3) nm positions in xyz format (Angstrom)."""
    pos = np.asarray(positions_nm).reshape(len(positions_nm), -1, 3) * 10.0
    with open(filename, "w") as f:
        for frame in pos:
            f.write(f"{frame.shape[0]}\n\n")
            for name, p in zip(atom_names, frame):
                f.write(f"{name} {p[0]:.5f} {p[1]:.5f} {p[2]:.5f}\n")


class NumpyReporter:
    """Accumulate sample arrays and flush them to an .npz file."""

    def __init__(self, filename: str):
        self.filename = filename
        self._frames = []

    def report(self, samples) -> None:
        self._frames.append(np.asarray(samples))

    def save(self, **extra) -> None:
        np.savez(self.filename, samples=np.stack(self._frames), **extra)

    def __len__(self):
        return len(self._frames)
