"""E(n)-equivariant coupling (RNVP) flows for particle systems.

Deterministic counterpart of the equivariant CNF (``flows/cnf.py``'s
``KernelDynamics``), mirroring the reference's equivariant-RNVP notebook
(``notebooks/example_equivariant_RNVP.ipynb``): an augmented flow over a
pair ``(x, v)`` of mean-free particle arrays, alternating

    v' = exp(s(x)) * v + t(x)        (then the same for x given v)

with an *invariant* global log-scale ``s`` (an MLP of the mean-pooled RBF
distance fingerprint) and an *equivariant* kernel shift

    t_i = sum_{j != i} <w, rbf(d_ij)> (x_i - x_j),

which is rotation- and permutation-equivariant and exactly mean-free
(antisymmetry of ``x_i - x_j`` under the symmetric kernel).  Because the
scale is one invariant scalar per sample, the mean-free subspace is
preserved exactly and the block log-det is ``(N - 1) * D * s`` — the
flow's Jacobian restricted to that subspace is ``exp(s) * (I + shift
Jacobian contribution)``... the shift is conditioned on the OTHER channel,
so the coupling Jacobian is triangular and the log-det is the scale term
alone, as in any RealNVP block.

Identity at init: the kernel weights and a scale gate start at zero.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..core.flow import Flow
from ..nets.dense import DenseNet
from ..ops.rbf import kernelize_with_rbf

__all__ = ["EquivariantCouplingFlow"]


def _pair_distances(x, n_particles, n_dims, eps):
    p = x.reshape(-1, n_particles, n_dims)
    diff = p[:, :, None, :] - p[:, None, :, :]
    d = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + eps)
    return p, diff, d


class EquivariantCouplingFlow(Flow):
    """Stack of equivariant (x, v) coupling blocks on mean-free particles.

    Operates on a 2-tuple of ``(B, n_particles * n_dims)`` arrays; use a
    mean-free prior on both channels (``MeanFreeNormalDistribution``) and
    an augmented target ``ProductEnergy([target, kinetic])``.
    """

    def __init__(
        self,
        n_particles: int,
        n_dims: int,
        n_blocks: int = 4,
        n_rbf: int = 16,
        r_max: float = 4.0,
        hidden: Sequence[int] = (32,),
        eps: float = 1e-6,
    ):
        self.n_particles = int(n_particles)
        self.n_dims = int(n_dims)
        self.n_blocks = int(n_blocks)
        self.n_rbf = int(n_rbf)
        self.mus = jnp.linspace(0.0, float(r_max), self.n_rbf)
        self.gamma = float(r_max) / self.n_rbf
        self.eps = float(eps)
        self.scale_nets = [
            DenseNet([self.n_rbf, *hidden, 1]) for _ in range(2 * self.n_blocks)
        ]

    def init(self, key):
        keys = jax.random.split(key, 2 * self.n_blocks)
        return tuple(
            {
                "kernel": jnp.zeros(self.n_rbf),
                "scale_gate": jnp.zeros(()),
                "scale_net": net.init(k),
            }
            for net, k in zip(self.scale_nets, keys)
        )

    # -- one half-block: transform `a` conditioned on `cond` ----------------
    def _cond_terms(self, layer_params, net, cond):
        _, diff, d = _pair_distances(cond, self.n_particles, self.n_dims, self.eps)
        feats = kernelize_with_rbf(d[..., None], self.mus, self.gamma)  # (B,N,N,K)
        mask = 1.0 - jnp.eye(self.n_particles)
        # invariant global log-scale: mean-pooled fingerprint -> MLP -> gate
        fingerprint = jnp.sum(feats * mask[None, :, :, None], axis=2).mean(axis=1)
        s = layer_params["scale_gate"] * net.apply(
            layer_params["scale_net"], fingerprint
        )[..., 0]  # (B,)
        # equivariant mean-free kernel shift
        w = jnp.einsum("bijk,k->bij", feats, layer_params["kernel"]) * mask[None]
        t = jnp.sum(w[..., None] * diff, axis=2)  # (B, N, D)
        return s, t.reshape(cond.shape[0], -1)

    def _dof(self):
        return (self.n_particles - 1) * self.n_dims

    def _apply(self, params, xs, inverse: bool):
        x, v = xs
        ldj = jnp.zeros(x.shape[0], dtype=x.dtype)
        order = range(self.n_blocks)
        for b in (reversed(order) if inverse else order):
            pv, px = params[2 * b], params[2 * b + 1]
            net_v, net_x = self.scale_nets[2 * b], self.scale_nets[2 * b + 1]
            if not inverse:
                s, t = self._cond_terms(pv, net_v, x)  # update v | x
                v = jnp.exp(s)[:, None] * v + t
                ldj = ldj + self._dof() * s
                s, t = self._cond_terms(px, net_x, v)  # update x | v
                x = jnp.exp(s)[:, None] * x + t
                ldj = ldj + self._dof() * s
            else:
                s, t = self._cond_terms(px, net_x, v)
                x = (x - t) * jnp.exp(-s)[:, None]
                ldj = ldj - self._dof() * s
                s, t = self._cond_terms(pv, net_v, x)
                v = (v - t) * jnp.exp(-s)[:, None]
                ldj = ldj - self._dof() * s
        return (x, v), ldj

    def _forward(self, params, xs, **kwargs):
        return self._apply(params, xs, inverse=False)

    def _inverse(self, params, xs, **kwargs):
        return self._apply(params, xs, inverse=True)
