"""E(3)-invariant graph-network conditioner.

TPU-native replacement for the reference's nequip/allegro conditioner stack
(``bgflow/factory/GNN_factory.py:29-511``, ``conditioner_factory.py:86-211``):
message passing over the dense pair graph with RBF-featurized distances.
Using only invariant features (distances) keeps the conditioner E(3)-
invariant — exactly the symmetry the coupling conditioner needs — while
every op is a dense batched matmul (MXU-friendly), with no torch/e3nn
dependency.

The ``GNNConditioner`` mirrors the reference's input handling: circular
features are sin/cos-wrapped, cartesian features are routed through the GNN,
and the dense head consumes [wrapped-circular, noncircular, GNN readout].
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.rbf import kernelize_with_rbf
from .dense import DenseNet, Net

__all__ = ["InvariantGNN", "EquivariantGNN", "EquivariantGNNL2", "GNNConditioner"]


def bessel_basis(d, n_rbf: int, r_max: float, eps: float = 1e-8):
    """Bessel radial basis sqrt(2/rc)·sin(n·pi·d/rc)/d, n = 1..K — the
    radial basis family of the reference's nequip/allegro configs
    (``GNN_factory.py::NormalizedBasis``), smoother extrapolation than
    Gaussians near d=0."""
    n = jnp.arange(1, n_rbf + 1, dtype=d.dtype)
    x = jnp.pi * d[..., None] / r_max
    return jnp.sqrt(2.0 / r_max) * jnp.sin(n * x) / (d[..., None] + eps)


class InvariantGNN(Net):
    """Distance-based message passing over a dense atom graph.

    Input (B, n_atoms*3) cartesian coordinates -> (B, dim_out) invariant
    embedding.  Messages m_ij = MLP([h_i, h_j, RBF(d_ij)]); node update
    h_i' = MLP([h_i, sum_j m_ij]); readout = MLP(mean_i h_i).
    """

    def __init__(
        self,
        n_atoms: int,
        dim_out: int,
        n_features: int = 32,
        n_layers: int = 2,
        n_rbf: int = 16,
        r_max: float = 1.0,
        activation=jax.nn.silu,
        attention_heads: int = 0,
    ):
        self.n_atoms = n_atoms
        self.dim_out = dim_out
        self.n_features = n_features
        self.n_layers = n_layers
        self.n_rbf = n_rbf
        self.mus = jnp.linspace(0.0, r_max, n_rbf)
        self.gamma = r_max / n_rbf
        f = n_features
        self.embed = DenseNet([n_rbf, f], activation=None)
        self.message_nets = [
            DenseNet([2 * f + n_rbf, f, f], activation=activation) for _ in range(n_layers)
        ]
        self.update_nets = [
            DenseNet([2 * f, f], activation=activation) for _ in range(n_layers)
        ]
        # optional multi-head self-attention over atom features before the
        # pooled readout — the reference's optional MHA/Transformer head on
        # the GNN conditioner (conditioner_factory.py:139-154, GNN_factory)
        self.attention_heads = int(attention_heads)
        if self.attention_heads:
            assert f % self.attention_heads == 0, "n_features must divide into heads"
            self.attn_qkv = DenseNet([f, 3 * f], activation=None)
            self.attn_out = DenseNet([f, f], activation=None)
            self.attn_mlp = DenseNet([f, 2 * f, f], activation=activation)
        self.readout = DenseNet([f, f, dim_out], activation=activation)

    def init(self, key):
        keys = jax.random.split(key, 5 + 2 * self.n_layers)
        params = {
            "embed": self.embed.init(keys[0]),
            "messages": [n.init(k) for n, k in zip(self.message_nets, keys[1 : 1 + self.n_layers])],
            "updates": [
                n.init(k)
                for n, k in zip(self.update_nets, keys[1 + self.n_layers : 1 + 2 * self.n_layers])
            ],
            "readout": self.readout.init(keys[-3]),
        }
        if self.attention_heads:
            params["attn"] = {
                "qkv": self.attn_qkv.init(keys[-2]),
                "out": self.attn_out.init(keys[-1]),
                "mlp": self.attn_mlp.init(jax.random.fold_in(keys[-1], 1)),
            }
        return params

    def node_features(self, params, x):
        """The shared trunk: (B, n_atoms*3) -> per-atom features (B, N, F)."""
        b = x.shape[0]
        pos = x.reshape(b, self.n_atoms, 3)
        diff = pos[:, :, None, :] - pos[:, None, :, :]
        d = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)  # (B, N, N)
        rbf = kernelize_with_rbf(d[..., None], self.mus, self.gamma)  # (B, N, N, K)
        mask = 1.0 - jnp.eye(self.n_atoms)

        # initial node features from the atom's distance fingerprint
        h = self.embed.apply(params["embed"], jnp.sum(rbf * mask[None, :, :, None], axis=2))
        for msg_net, msg_p, upd_net, upd_p in zip(
            self.message_nets, params["messages"], self.update_nets, params["updates"]
        ):
            hi = jnp.broadcast_to(h[:, :, None, :], (b, self.n_atoms, self.n_atoms, h.shape[-1]))
            hj = jnp.broadcast_to(h[:, None, :, :], (b, self.n_atoms, self.n_atoms, h.shape[-1]))
            edge_in = jnp.concatenate([hi, hj, rbf], axis=-1)
            m = msg_net.apply(msg_p, edge_in) * mask[None, :, :, None]
            agg = jnp.sum(m, axis=2)
            h = h + upd_net.apply(upd_p, jnp.concatenate([h, agg], axis=-1))
        if self.attention_heads:
            h = h + self._attention(params["attn"], h)
            h = h + self.attn_mlp.apply(params["attn"]["mlp"], h)
        return h

    def _attention(self, params, h):
        b, n, f = h.shape
        nh = self.attention_heads
        dh = f // nh
        qkv = self.attn_qkv.apply(params["qkv"], h)  # (B, N, 3F)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(a):  # (B, N, F) -> (B, nh, N, dh)
            return jnp.transpose(a.reshape(b, n, nh, dh), (0, 2, 1, 3))

        q, k, v = heads(q), heads(k), heads(v)
        att = jax.nn.softmax(jnp.einsum("bhnd,bhmd->bhnm", q, k) / jnp.sqrt(float(dh)))
        o = jnp.einsum("bhnm,bhmd->bhnd", att, v)
        o = jnp.transpose(o, (0, 2, 1, 3)).reshape(b, n, f)
        return self.attn_out.apply(params["out"], o)

    def apply(self, params, x):
        h = self.node_features(params, x)
        return self.readout.apply(params["readout"], jnp.mean(h, axis=1))


class EquivariantGNN(Net):
    """E(3)-equivariant message passing with scalar + vector node channels.

    PaiNN-style architecture (polarizable atom interaction network): each
    node carries invariant scalars s (B, N, F) and equivariant vectors
    v (B, N, F, 3).  Messages are continuous-filter convolutions — an RBF
    filter of the distance gates an MLP of the neighbor scalars, and the
    vector channel receives both the neighbor's vectors and the edge
    direction — followed by a gated node update that mixes vector channels
    through two feature-space linear maps (U, V) and their invariant
    products.  The readout is invariant ([s, |v|] -> MLP -> mean pool), so
    the whole net is E(3)-invariant end-to-end while propagating l=1
    geometric information internally — the capability class of the
    reference's nequip/allegro conditioners
    (``bgflow/factory/GNN_factory.py:29-511``) without an e3nn dependency;
    every op is a dense batched matmul or elementwise op on the MXU/VPU.
    """

    def __init__(
        self,
        n_atoms: int,
        dim_out: int,
        n_features: int = 32,
        n_layers: int = 2,
        n_rbf: int = 16,
        r_max: float = 1.0,
        activation=jax.nn.silu,
        attention_heads: int = 0,
        eps: float = 1e-8,
    ):
        self.n_atoms = n_atoms
        self.dim_out = dim_out
        self.n_features = n_features
        self.n_layers = n_layers
        self.n_rbf = n_rbf
        self.mus = jnp.linspace(0.0, r_max, n_rbf)
        self.gamma = r_max / n_rbf
        self.eps = float(eps)
        f = n_features
        self.embed = DenseNet([n_rbf, f], activation=None)
        # message block: phi(s_j) -> 3F gated by filter W(rbf) -> 3F
        self.msg_phi = [
            DenseNet([f, f, 3 * f], activation=activation) for _ in range(n_layers)
        ]
        self.msg_filter = [
            DenseNet([n_rbf, 3 * f], activation=None) for _ in range(n_layers)
        ]
        # update block: a([s, |Vv|]) -> 3F
        self.upd_a = [
            DenseNet([2 * f, f, 3 * f], activation=activation) for _ in range(n_layers)
        ]
        self.attention_heads = int(attention_heads)
        if self.attention_heads:
            assert f % self.attention_heads == 0
            self.attn_qkv = DenseNet([f, 3 * f], activation=None)
            self.attn_out = DenseNet([f, f], activation=None)
            self.attn_mlp = DenseNet([f, 2 * f, f], activation=activation)
        self.readout = DenseNet([2 * f, f, dim_out], activation=activation)

    def init(self, key):
        f = self.n_features
        keys = jax.random.split(key, 2 + 3 * self.n_layers + 3)
        params = {
            "embed": self.embed.init(keys[0]),
            "msg_phi": [n.init(k) for n, k in zip(self.msg_phi, keys[1 : 1 + self.n_layers])],
            "msg_filter": [
                n.init(k)
                for n, k in zip(self.msg_filter, keys[1 + self.n_layers : 1 + 2 * self.n_layers])
            ],
            "upd_a": [
                n.init(k)
                for n, k in zip(self.upd_a, keys[1 + 2 * self.n_layers : 1 + 3 * self.n_layers])
            ],
            # U, V: feature-space linear maps applied channelwise to vectors
            "U": [
                jax.random.normal(jax.random.fold_in(keys[-3], i), (f, f)) / np.sqrt(f)
                for i in range(self.n_layers)
            ],
            "V": [
                jax.random.normal(jax.random.fold_in(keys[-2], i), (f, f)) / np.sqrt(f)
                for i in range(self.n_layers)
            ],
            "readout": self.readout.init(keys[-1]),
        }
        if self.attention_heads:
            params["attn"] = {
                "qkv": self.attn_qkv.init(jax.random.fold_in(keys[-1], 1)),
                "out": self.attn_out.init(jax.random.fold_in(keys[-1], 2)),
                "mlp": self.attn_mlp.init(jax.random.fold_in(keys[-1], 3)),
            }
        return params

    def node_features(self, params, x):
        """(B, n_atoms*3) -> invariant per-atom features (B, N, 2F): the
        scalar channel plus vector norms (shared-trunk protocol, same as
        InvariantGNN.node_features)."""
        b = x.shape[0]
        N, F = self.n_atoms, self.n_features
        pos = x.reshape(b, N, 3)
        diff = pos[:, :, None, :] - pos[:, None, :, :]  # (B, N, N, 3)
        d2 = jnp.sum(diff * diff, axis=-1)
        d = jnp.sqrt(d2 + self.eps)
        dir_ij = diff / (d[..., None] + self.eps)
        rbf = kernelize_with_rbf(d[..., None], self.mus, self.gamma)  # (B,N,N,K)
        mask = (1.0 - jnp.eye(N))[None, :, :, None]

        s = self.embed.apply(params["embed"], jnp.sum(rbf * mask, axis=2))
        v = jnp.zeros((b, N, F, 3), x.dtype)
        for li in range(self.n_layers):
            # ---- message block (continuous-filter convolution)
            phi = self.msg_phi[li].apply(params["msg_phi"][li], s)  # (B,N,3F)
            W = self.msg_filter[li].apply(params["msg_filter"][li], rbf)  # (B,N,N,3F)
            gated = W * phi[:, None, :, :] * mask  # gate neighbor j's features
            g_s, g_vv, g_vd = jnp.split(gated, 3, axis=-1)  # each (B,N,N,F)
            ds = jnp.sum(g_s, axis=2)
            dv = jnp.sum(
                g_vv[..., None] * v[:, None, :, :, :]
                + g_vd[..., None] * dir_ij[:, :, :, None, :],
                axis=2,
            )
            s = s + ds
            v = v + dv
            # ---- update block (gated equivariant node update)
            U, V = params["U"][li], params["V"][li]
            Uv = jnp.einsum("bnfc,fg->bngc", v, U)
            Vv = jnp.einsum("bnfc,fg->bngc", v, V)
            Vv_norm = jnp.sqrt(jnp.sum(Vv * Vv, axis=-1) + self.eps)
            a = self.upd_a[li].apply(
                params["upd_a"][li], jnp.concatenate([s, Vv_norm], axis=-1)
            )
            a_ss, a_sv, a_vv = jnp.split(a, 3, axis=-1)
            s = s + a_ss + a_sv * jnp.sum(Uv * Vv, axis=-1)
            v = v + a_vv[..., None] * Uv
        if self.attention_heads:
            s = s + InvariantGNN._attention(self, params["attn"], s)
            s = s + self.attn_mlp.apply(params["attn"]["mlp"], s)
        v_norm = jnp.sqrt(jnp.sum(v * v, axis=-1) + self.eps)
        return jnp.concatenate([s, v_norm], axis=-1)

    def apply(self, params, x):
        h = self.node_features(params, x)
        return self.readout.apply(params["readout"], jnp.mean(h, axis=1))


class EquivariantGNNL2(Net):
    """E(3)-equivariant message passing with l = 0, 1, 2 node channels.

    The nequip/allegro capability class (higher-order equivariant features,
    ``/root/reference/bgflow/factory/GNN_factory.py:29-511`` wires l >= 2
    nets with Bessel bases) implemented with explicit tensor algebra instead
    of an e3nn dependency: every irrep operation is written out as dense
    batched einsums over 3-vectors and symmetric-traceless 3x3 tensors —
    XLA contracts them on the MXU without gather/scatter.

    Node state per atom: scalars ``s`` (B,N,F), vectors ``v`` (B,N,F,3),
    symmetric-traceless rank-2 tensors ``t`` (B,N,F,3,3).  Edge geometry
    enters through the unit vector r̂ and its l=2 spherical tensor
    Y2(r̂) = r̂ r̂ᵀ − I/3.  The message block is a continuous-filter
    convolution with 9 gated tensor-product paths (the allowed couplings
    up to l=2):

        l0 <- l0,  l0 <- l1·r̂,  l0 <- l2:Y2          (scalars)
        l1 <- l1,  l1 <- r̂,     l1 <- l2·r̂           (vectors)
        l2 <- l2,  l2 <- Y2,    l2 <- P2(l1 ⊗ r̂)     (tensors)

    with P2(A) = (A+Aᵀ)/2 − tr(A)/3·I the projection onto l=2.  The node
    update extends PaiNN's gated update with feature-space linear maps
    (P, Q) on the tensor channel and the invariants ⟨Pt, Qt⟩_F.  The
    readout is invariant ([s, |v|, |t|_F] -> MLP -> mean pool), so the
    conditioner output is exactly E(3)-invariant while l=2 geometric
    information (bond-angular anisotropy that vectors cannot carry)
    propagates internally.

    ``radial_basis``: "gaussian" (RBF, matching the other GNNs) or
    "bessel" (the reference's nequip basis family).
    """

    def __init__(
        self,
        n_atoms: int,
        dim_out: int,
        n_features: int = 32,
        n_layers: int = 2,
        n_rbf: int = 16,
        r_max: float = 1.0,
        activation=jax.nn.silu,
        attention_heads: int = 0,
        radial_basis: str = "bessel",
        eps: float = 1e-8,
    ):
        self.n_atoms = n_atoms
        self.dim_out = dim_out
        self.n_features = n_features
        self.n_layers = n_layers
        self.n_rbf = n_rbf
        self.r_max = float(r_max)
        self.radial_basis = radial_basis
        if radial_basis not in ("gaussian", "bessel"):
            raise ValueError(f"unknown radial_basis {radial_basis!r}")
        self.mus = jnp.linspace(0.0, r_max, n_rbf)
        self.gamma = r_max / n_rbf
        self.eps = float(eps)
        f = n_features
        self.embed = DenseNet([n_rbf, f], activation=None)
        self.msg_phi = [
            DenseNet([f, f, 9 * f], activation=activation) for _ in range(n_layers)
        ]
        self.msg_filter = [
            DenseNet([n_rbf, 9 * f], activation=None) for _ in range(n_layers)
        ]
        # update invariants: [s, |Vv|, |Qt|_F] -> 5 gate channels
        self.upd_a = [
            DenseNet([3 * f, f, 5 * f], activation=activation) for _ in range(n_layers)
        ]
        self.attention_heads = int(attention_heads)
        if self.attention_heads:
            assert f % self.attention_heads == 0
            self.attn_qkv = DenseNet([f, 3 * f], activation=None)
            self.attn_out = DenseNet([f, f], activation=None)
            self.attn_mlp = DenseNet([f, 2 * f, f], activation=activation)
        self.readout = DenseNet([3 * f, f, dim_out], activation=activation)

    def init(self, key):
        f = self.n_features
        keys = jax.random.split(key, 2 + 3 * self.n_layers + 5)

        def lin(k, i):
            return jax.random.normal(jax.random.fold_in(k, i), (f, f)) / np.sqrt(f)

        params = {
            "embed": self.embed.init(keys[0]),
            "msg_phi": [n.init(k) for n, k in zip(self.msg_phi, keys[1 : 1 + self.n_layers])],
            "msg_filter": [
                n.init(k)
                for n, k in zip(self.msg_filter, keys[1 + self.n_layers : 1 + 2 * self.n_layers])
            ],
            "upd_a": [
                n.init(k)
                for n, k in zip(self.upd_a, keys[1 + 2 * self.n_layers : 1 + 3 * self.n_layers])
            ],
            "U": [lin(keys[-5], i) for i in range(self.n_layers)],
            "V": [lin(keys[-4], i) for i in range(self.n_layers)],
            "P": [lin(keys[-3], i) for i in range(self.n_layers)],
            "Q": [lin(keys[-2], i) for i in range(self.n_layers)],
            "readout": self.readout.init(keys[-1]),
        }
        if self.attention_heads:
            params["attn"] = {
                "qkv": self.attn_qkv.init(jax.random.fold_in(keys[-1], 1)),
                "out": self.attn_out.init(jax.random.fold_in(keys[-1], 2)),
                "mlp": self.attn_mlp.init(jax.random.fold_in(keys[-1], 3)),
            }
        return params

    def node_features(self, params, x):
        """(B, n_atoms*3) -> invariant per-atom features (B, N, 3F):
        scalars + vector norms + tensor Frobenius norms."""
        b = x.shape[0]
        N, F = self.n_atoms, self.n_features
        pos = x.reshape(b, N, 3)
        diff = pos[:, :, None, :] - pos[:, None, :, :]  # (B,N,N,3)
        d2 = jnp.sum(diff * diff, axis=-1)
        d = jnp.sqrt(d2 + self.eps)
        rhat = diff / (d[..., None] + self.eps)
        eye3 = jnp.eye(3, dtype=x.dtype)
        # Y2(r̂) = r̂ r̂ᵀ − I/3 : the l=2 spherical tensor of the edge
        y2 = rhat[..., :, None] * rhat[..., None, :] - eye3 / 3.0  # (B,N,N,3,3)
        if self.radial_basis == "bessel":
            rbf = bessel_basis(d, self.n_rbf, self.r_max, self.eps)
        else:
            rbf = kernelize_with_rbf(d[..., None], self.mus, self.gamma)
        mask = (1.0 - jnp.eye(N))[None, :, :, None]

        s = self.embed.apply(params["embed"], jnp.sum(rbf * mask, axis=2))
        v = jnp.zeros((b, N, F, 3), x.dtype)
        t = jnp.zeros((b, N, F, 3, 3), x.dtype)
        for li in range(self.n_layers):
            # ---- message block: 9 gated tensor-product paths
            phi = self.msg_phi[li].apply(params["msg_phi"][li], s)  # (B,N,9F)
            W = self.msg_filter[li].apply(params["msg_filter"][li], rbf)
            gated = W * phi[:, None, :, :] * mask  # (B,N,N,9F), gates on j
            (g_s, g_sv, g_st,
             g_vv, g_vd, g_vt,
             g_tt, g_td, g_tv) = jnp.split(gated, 9, axis=-1)
            # scalars
            ds = (
                jnp.sum(g_s, axis=2)
                + jnp.einsum("bnjf,bjfx,bnjx->bnf", g_sv, v, rhat)
                + jnp.einsum("bnjf,bjfxy,bnjxy->bnf", g_st, t, y2)
            )
            # vectors
            dv = (
                jnp.einsum("bnjf,bjfx->bnfx", g_vv, v)
                + jnp.einsum("bnjf,bnjx->bnfx", g_vd, rhat)
                + jnp.einsum("bnjf,bjfxy,bnjy->bnfx", g_vt, t, rhat)
            )
            # tensors: l2<-l2, l2<-Y2, l2<-P2(v ⊗ r̂)
            dt = (
                jnp.einsum("bnjf,bjfxy->bnfxy", g_tt, t)
                + jnp.einsum("bnjf,bnjxy->bnfxy", g_td, y2)
            )
            a_vt = jnp.einsum("bnjf,bjfx,bnjy->bnfxy", g_tv, v, rhat)
            sym = 0.5 * (a_vt + jnp.swapaxes(a_vt, -1, -2))
            tr = jnp.einsum("bnfxx->bnf", sym)
            dt = dt + sym - tr[..., None, None] * eye3 / 3.0
            s = s + ds
            v = v + dv
            t = t + dt
            # ---- gated node update with l=2 invariants
            U, V = params["U"][li], params["V"][li]
            P, Q = params["P"][li], params["Q"][li]
            Uv = jnp.einsum("bnfc,fg->bngc", v, U)
            Vv = jnp.einsum("bnfc,fg->bngc", v, V)
            Pt = jnp.einsum("bnfxy,fg->bngxy", t, P)
            Qt = jnp.einsum("bnfxy,fg->bngxy", t, Q)
            Vv_norm = jnp.sqrt(jnp.sum(Vv * Vv, axis=-1) + self.eps)
            Qt_norm = jnp.sqrt(jnp.sum(Qt * Qt, axis=(-1, -2)) + self.eps)
            a = self.upd_a[li].apply(
                params["upd_a"][li], jnp.concatenate([s, Vv_norm, Qt_norm], axis=-1)
            )
            a_ss, a_sv, a_st, a_vv, a_tt = jnp.split(a, 5, axis=-1)
            s = (
                s + a_ss
                + a_sv * jnp.sum(Uv * Vv, axis=-1)
                + a_st * jnp.sum(Pt * Qt, axis=(-1, -2))
            )
            v = v + a_vv[..., None] * Uv
            t = t + a_tt[..., None, None] * Pt
        if self.attention_heads:
            s = s + InvariantGNN._attention(self, params["attn"], s)
            s = s + self.attn_mlp.apply(params["attn"]["mlp"], s)
        v_norm = jnp.sqrt(jnp.sum(v * v, axis=-1) + self.eps)
        t_norm = jnp.sqrt(jnp.sum(t * t, axis=(-1, -2)) + self.eps)
        return jnp.concatenate([s, v_norm, t_norm], axis=-1)

    def apply(self, params, x):
        h = self.node_features(params, x)
        return self.readout.apply(params["readout"], jnp.mean(h, axis=1))


class GNNConditioner(Net):
    """Coupling conditioner: GNN on cartesian inputs + dense head on the rest.

    Mirrors the reference's split (``conditioner_factory.py:86-211``):
    circular features -> sin/cos pairs, cartesian -> GNN embedding,
    everything concatenated into a dense output head.
    """

    def __init__(
        self,
        dim_out: int,
        circular_indices: np.ndarray,
        cartesian_indices: np.ndarray,
        other_indices: np.ndarray,
        hidden: Sequence[int] = (128, 128),
        gnn_features: int = 32,
        gnn_layers: int = 2,
        gnn_out: int = 64,
        r_max: float = 1.0,
        activation=jax.nn.silu,
        attention_heads: int = 0,
        gnn_type: str = "invariant",
        cartesian_map=None,
    ):
        """``cartesian_map``: optional static ``(matrix, offset)`` pair
        applied to the cartesian block before the GNN — ``xyz = z @ matrix
        + offset``.  Needed when the flow's cartesian field is PCA-whitened
        (``MixedCoordinateTransformation``): whitened coordinates scale each
        principal direction by 1/std, so "distances" in that space are
        dominated by the near-rigid residual directions and mean nothing to
        a geometric GNN; de-whitening with the stored ``t_blacken``/``mean``
        constants restores physical nm geometry.  The pair is a data-derived
        constant (like the whitening itself), not a trainable parameter."""
        self.circular = np.asarray(circular_indices, dtype=int)
        self.cartesian = np.asarray(cartesian_indices, dtype=int)
        self.other = np.asarray(other_indices, dtype=int)
        assert len(self.cartesian) % 3 == 0
        if cartesian_map is not None:
            matrix, offset = cartesian_map
            self._cart_matrix = jnp.asarray(matrix)
            self._cart_offset = jnp.asarray(offset)
            assert self._cart_matrix.shape[0] == len(self.cartesian)
            n_atoms = self._cart_matrix.shape[1] // 3
        else:
            self._cart_matrix = None
            self._cart_offset = None
            n_atoms = len(self.cartesian) // 3
        gnn_cls = {
            "invariant": InvariantGNN,
            "equivariant": EquivariantGNN,
            "l2": EquivariantGNNL2,
        }[gnn_type]
        self.gnn = gnn_cls(
            n_atoms, gnn_out, n_features=gnn_features, n_layers=gnn_layers, r_max=r_max,
            attention_heads=attention_heads,
        )
        head_in = 2 * len(self.circular) + len(self.other) + gnn_out
        self.head = DenseNet([head_in, *hidden, dim_out], activation=activation)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"gnn": self.gnn.init(k1), "head": self.head.init(k2)}

    def apply(self, params, x):
        feats = []
        if len(self.circular):
            c = x[..., self.circular]
            arg = 2 * jnp.pi * c
            feats.extend([jnp.cos(arg), jnp.sin(arg)])
        if len(self.other):
            feats.append(x[..., self.other])
        cart = x[..., self.cartesian]
        if self._cart_matrix is not None:
            cart = cart @ self._cart_matrix + self._cart_offset
        feats.append(self.gnn.apply(params["gnn"], cart))
        return self.head.apply(params["head"], jnp.concatenate(feats, axis=-1))
