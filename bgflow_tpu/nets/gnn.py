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

__all__ = ["InvariantGNN", "GNNConditioner"]


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
    ):
        self.circular = np.asarray(circular_indices, dtype=int)
        self.cartesian = np.asarray(cartesian_indices, dtype=int)
        self.other = np.asarray(other_indices, dtype=int)
        assert len(self.cartesian) % 3 == 0
        n_atoms = len(self.cartesian) // 3
        self.gnn = InvariantGNN(
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
        feats.append(self.gnn.apply(params["gnn"], x[..., self.cartesian]))
        return self.head.apply(params["head"], jnp.concatenate(feats, axis=-1))
