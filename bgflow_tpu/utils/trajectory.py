"""Minimal trajectory IO (host side).

Replaces the reference's mdtraj-based helpers
(``bgflow/utils/openmm.py:6-59``: ``save_latent_samples_as_trajectory``,
``NumpyReporter``) without the mdtraj dependency: multi-model PDB and
xyz writers plus a npz reporter.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

__all__ = ["save_pdb_trajectory", "save_xyz_trajectory", "save_dcd_trajectory", "read_dcd_trajectory", "NumpyReporter"]


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


def save_dcd_trajectory(filename: str, positions_nm) -> None:
    """Write frames as a CHARMM/NAMD-style DCD file (readable by mdtraj,
    VMD, MDAnalysis — the interop format the reference reaches through
    mdtraj in ``bgflow/utils/openmm.py:6-59``).

    ``positions_nm``: (n_frames, n_atoms, 3) in nm (DCD stores Angstrom).
    Pure numpy — no mdtraj dependency.
    """
    import struct

    pos = np.asarray(positions_nm, dtype=np.float32)
    if pos.ndim == 2:
        pos = pos.reshape(pos.shape[0], -1, 3)
    n_frames, n_atoms, _ = pos.shape
    pos_ang = pos * 10.0

    def record(payload: bytes) -> bytes:
        return struct.pack("<i", len(payload)) + payload + struct.pack("<i", len(payload))

    with open(filename, "wb") as fh:
        # header record: 'CORD' + 20 int32 control words
        icntrl = [0] * 20
        icntrl[0] = n_frames  # NSET
        icntrl[1] = 1  # ISTART
        icntrl[2] = 1  # NSAVC
        icntrl[3] = n_frames  # NSTEP
        icntrl[7] = n_atoms * 3 - 6  # NDEGF (conventional)
        icntrl[9] = 0x409C4104  # AKMA timestep bit pattern (1 fs), cosmetic
        icntrl[19] = 24  # CHARMM version stamp
        fh.write(record(b"CORD" + struct.pack("<20i", *icntrl)))
        title = b"Created by bgflow_tpu".ljust(80)[:80]
        fh.write(record(struct.pack("<i", 1) + title))
        fh.write(record(struct.pack("<i", n_atoms)))
        for f in range(n_frames):
            for axis in range(3):
                fh.write(record(pos_ang[f, :, axis].tobytes()))


def read_dcd_trajectory(filename: str) -> np.ndarray:
    """Read a DCD written by ``save_dcd_trajectory`` (or any fixed-atom,
    no-unit-cell DCD).  Returns (n_frames, n_atoms, 3) in nm."""
    import struct

    def read_record(fh):
        raw = fh.read(4)
        if not raw:
            return None
        (n,) = struct.unpack("<i", raw)
        payload = fh.read(n)
        fh.read(4)
        return payload

    with open(filename, "rb") as fh:
        header = read_record(fh)
        assert header[:4] == b"CORD", "not a DCD file"
        icntrl = struct.unpack("<20i", header[4:84])
        n_frames = icntrl[0]
        read_record(fh)  # titles
        (n_atoms,) = struct.unpack("<i", read_record(fh))
        frames = np.empty((n_frames, n_atoms, 3), dtype=np.float32)
        for f in range(n_frames):
            for axis in range(3):
                frames[f, :, axis] = np.frombuffer(read_record(fh), dtype=np.float32)
    return frames * 0.1
