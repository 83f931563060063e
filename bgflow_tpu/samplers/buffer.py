"""Metropolized replay buffer with HDF5 persistence.

Reference: ``bgflow/distribution/sampling/buffer.py:14-404`` (netCDF4 there,
h5py here — same paradigm: device-side metropolized updates, host-side
reporter for trajectories/statistics/resume).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .dataset import DataSetSampler
from .mcmc import metropolis_accept

__all__ = ["MetropolizedReplayBuffer", "ReplayBufferHDF5Reporter"]


class MetropolizedReplayBuffer(DataSetSampler):
    """A sample reservoir updated by Metropolis moves against random entries.

    A proposal x' replaces a random buffer entry x with probability
    min(1, exp(-(u_t(x') - u_t(x)) + (u_p(x') - u_p(x)))) where u_t is the
    target and u_p the (unconditional) proposal energy.
    """

    def __init__(
        self,
        *data,
        target_energy=None,
        proposal_energy=None,
        energies=None,
        temperature_scaling: float = 1.0,
        reporter=None,
    ):
        data = tuple(jnp.asarray(d) for d in data)
        if energies is None:
            if target_energy is None:
                raise ValueError("Either target_energy or energies has to be specified.")
            energies = target_energy.energy(*data)
        else:
            energies = jnp.asarray(energies)
            if energies.shape != (data[0].shape[0],):
                raise ValueError(
                    f"Expected energies of shape {(data[0].shape[0],)}, got {energies.shape}."
                )
        super().__init__(*data)
        self.energies = energies
        self.target_energy = target_energy
        self.proposal_energy = proposal_energy
        self.temperature_scaling = temperature_scaling
        self.reporter = reporter
        if reporter is not None:
            reporter.write_buffer(*self.data, energies=self.energies)

    @property
    def samples(self):
        return self.data

    def update(self, key, *proposals, energies=None, proposal_energies=None, forced_update=False):
        """Propose replacing random buffer entries; returns n_accepted."""
        proposals = tuple(jnp.asarray(p) for p in proposals)
        if energies is None:
            energies = self.target_energy.energy(*proposals)
        if proposal_energies is None:
            proposal_energies = self.proposal_energy.energy(*proposals)
        n_prop = proposals[0].shape[0]
        key_idx, key_accept = jax.random.split(key)
        rand_indices = jax.random.permutation(key_idx, self.n)[:n_prop]
        rand_samples = tuple(d[rand_indices] for d in self.data)
        rand_energies = self.energies[rand_indices]
        # asymmetric proposal correction: log g(x'|x) - log g(x|x')
        # = -u_p(x') + u_p(x)
        delta_log_prob = -proposal_energies + self.proposal_energy.energy(*rand_samples)
        accepted = metropolis_accept(
            key_accept,
            rand_energies / self.temperature_scaling,
            energies / self.temperature_scaling,
            delta_log_prob,
        )
        if forced_update:
            accepted = jnp.ones_like(accepted)
        acc_mask = accepted
        new_data = []
        for d, p in zip(self.data, proposals):
            sel = jnp.where(acc_mask.reshape(-1, *([1] * (p.ndim - 1))), p, d[rand_indices])
            new_data.append(d.at[rand_indices].set(sel))
        self.data = tuple(new_data)
        self.energies = self.energies.at[rand_indices].set(
            jnp.where(acc_mask, energies, rand_energies)
        )
        n_accepted = int(jnp.sum(accepted))
        if self.reporter is not None:
            idx = np.asarray(rand_indices)[np.asarray(accepted)]
            acc_samples = [np.asarray(p)[np.asarray(accepted)] for p in proposals]
            self.reporter.write(
                *acc_samples,
                buffer=self,
                energies=np.asarray(energies)[np.asarray(accepted)],
                indices=idx,
                forced_update=forced_update,
                n_proposed=n_prop,
            )
        return n_accepted


class ReplayBufferHDF5Reporter:
    """h5py-backed reporter: appendable accepted-sample trajectory, running
    statistics, and periodic full-buffer snapshots (resume by reopening)."""

    def __init__(self, filename: str, mode: Optional[str] = None, write_buffer_interval: int = 100):
        import h5py

        if mode is None:
            mode = "r+" if os.path.isfile(filename) else "w"
        self.file = h5py.File(filename, mode)
        self.write_buffer_interval = write_buffer_interval
        self.step = int(self.file["stats/step"].shape[0]) if "stats" in self.file else 0

    def _append(self, path, array):
        array = np.atleast_1d(np.asarray(array))
        if path not in self.file:
            self.file.create_dataset(
                path, data=array[None] if array.ndim else array,
                maxshape=(None, *array.shape), chunks=True,
            )
        else:
            ds = self.file[path]
            ds.resize(ds.shape[0] + 1, axis=0)
            ds[-1] = array

    def write_buffer(self, *samples, energies):
        grp = self.file.require_group("buffer")
        for i, s in enumerate(samples):
            name = f"samples_{i}"
            if name in grp:
                del grp[name]
            grp.create_dataset(name, data=np.asarray(s))
        if "energies" in grp:
            del grp["energies"]
        grp.create_dataset("energies", data=np.asarray(energies))
        self.file.flush()

    def write(self, *samples, buffer, energies, indices, forced_update, n_proposed):
        for i, s in enumerate(samples):
            for row, idx in zip(np.asarray(s), np.asarray(indices)):
                self._append(f"accepted/samples_{i}", row)
        for e, idx in zip(np.asarray(energies), np.asarray(indices)):
            self._append("accepted/energies", e)
            self._append("accepted/indices", idx)
        buf_e = np.asarray(buffer.energies)
        self._append("stats/step", self.step)
        self._append("stats/mean_energy", buf_e.mean())
        self._append("stats/min_energy", buf_e.min())
        self._append("stats/max_energy", buf_e.max())
        self._append("stats/median_energy", np.median(buf_e))
        self._append("stats/n_proposed", n_proposed)
        self._append("stats/n_accepted", len(np.asarray(energies)))
        self._append("stats/forced", int(forced_update))
        if self.step % self.write_buffer_interval == 0:
            self.write_buffer(*buffer.samples, energies=buffer.energies)
        self.step += 1
        self.file.flush()

    @property
    def stats(self):
        return {k: np.asarray(self.file[f"stats/{k}"]) for k in self.file["stats"]}

    def close(self):
        self.file.close()
