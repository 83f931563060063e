"""Conditioner networks.

Small MLPs in the ``init/apply`` style.  A net is a static object with
``init(key) -> params`` and ``apply(params, x) -> y``.  Matmuls are emitted as
single ``jnp.dot`` calls so XLA can tile them onto the MXU and fuse the
elementwise activations; with typical conditioner widths (64-512) a whole
coupling block compiles into a handful of fused HLOs.

Reference semantics: ``bgflow/nn/dense.py:9-54`` (DenseNet, MeanFreeDenseNet)
and ``bgflow/nn/periodic.py:7-58`` (WrapPeriodic, WrapDistances).
"""
from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Union

import numpy as np
import jax
import jax.numpy as jnp


class Net:
    """Protocol: ``init(key) -> params``; ``apply(params, x) -> y``."""

    def init(self, key):
        raise NotImplementedError

    def apply(self, params, x):
        raise NotImplementedError

    def __call__(self, params, x):
        return self.apply(params, x)


class DenseNet(Net):
    """Multi-layer perceptron.

    Parameters
    ----------
    units : sequence of ints — layer widths including input and output dim.
    activation : callable or sequence of callables (one per hidden layer),
        or None for a linear map.
    weight_scale : multiplies the initial weights (reference
        ``dense.py:33``); ``weight_scale=0`` with ``bias_scale=0`` yields the
        identity-at-init flows used by the statistical tests.
    bias_scale : if > 0, biases start uniform in [0, bias_scale); else zero.
    """

    def __init__(
        self,
        units: Sequence[int],
        activation: Union[Callable, Sequence[Callable], None] = jax.nn.silu,
        weight_scale: float = 1.0,
        bias_scale: float = 0.0,
        compute_dtype=None,
    ):
        self.units = tuple(int(u) for u in units)
        n_hidden = len(self.units) - 2
        if activation is None or callable(activation):
            self.activations = (activation,) * n_hidden
        else:
            assert len(activation) == n_hidden
            self.activations = tuple(activation)
        self.weight_scale = float(weight_scale)
        self.bias_scale = float(bias_scale)
        # compute_dtype=jnp.bfloat16 runs the matmuls on the MXU's fast
        # bf16 path (f32 accumulation via preferred_element_type); params
        # and activations stay f32 outside the dot
        self.compute_dtype = compute_dtype

    @property
    def dim_in(self):
        return self.units[0]

    @property
    def dim_out(self):
        return self.units[-1]

    def init(self, key):
        params = []
        for din, dout in zip(self.units[:-1], self.units[1:]):
            key, wkey, bkey = jax.random.split(key, 3)
            # Kaiming-uniform fan-in init (matches torch.nn.Linear defaults)
            bound = 1.0 / math.sqrt(din)
            w = jax.random.uniform(wkey, (din, dout), minval=-bound, maxval=bound)
            w = w * self.weight_scale
            if self.bias_scale > 0.0:
                b = jax.random.uniform(bkey, (dout,)) * self.bias_scale
            else:
                b = jnp.zeros((dout,))
            params.append({"w": w, "b": b})
        return params

    def _layer(self, p, x, out_dtype):
        if self.compute_dtype is not None:
            return jnp.dot(
                x.astype(self.compute_dtype),
                p["w"].astype(self.compute_dtype),
                preferred_element_type=out_dtype,
            ) + p["b"]
        return jnp.dot(x, p["w"], preferred_element_type=x.dtype) + p["b"]

    def apply(self, params, x):
        n_layers = len(self.units) - 1
        out_dtype = x.dtype
        for i, p in enumerate(params):
            x = self._layer(p, x, out_dtype)
            if i < n_layers - 1:
                act = self.activations[i]
                if act is not None:
                    x = act(x)
        return x

    def apply_trunk(self, params, x):
        """All layers except the last (activations applied): the trunk
        activations consumed by the fused coupling kernel
        (``ops/rqs_fused.py``), which performs the final matmul itself."""
        out_dtype = x.dtype
        for i, p in enumerate(params[:-1]):
            x = self._layer(p, x, out_dtype)
            act = self.activations[i]
            if act is not None:
                x = act(x)
        return x

    def fused_mlp_spec(self, params, x):
        """(x_in, layers, activations) for the fully-fused coupling kernel
        (``ops/rqs_fused.py::rqs_fused_mlp``): the kernel runs the whole
        MLP on the MXU with VMEM-resident weights."""
        return x, tuple((p["w"], p["b"]) for p in params), self.activations

    def apply_transposed(self, params, x, row_order=None):
        """``apply`` with the output emitted feature-major: (dim_out, B).

        The final matmul contracts via ``dot_general`` with swapped output
        order, so the MXU writes the transposed layout directly — no HBM
        transpose.  This is the layout the fused Pallas spline kernel's
        parameter slabs want (``ops/rqs_pallas.py``); transposing the
        (B, 3*K*D) conditioner output after the fact costs more HBM traffic
        than the whole spline evaluation.

        ``row_order`` (static int array, duplicates allowed) reorders the
        output rows by permuting the final layer's weight columns at trace
        time — the consumer gets its preferred row layout (e.g. the spline
        kernel's slab-contiguous order) for free instead of paying an HBM
        gather on the (dim_out, B) result.
        """
        out_dtype = x.dtype
        for i, p in enumerate(params[:-1]):
            x = self._layer(p, x, out_dtype)
            act = self.activations[i]
            if act is not None:
                x = act(x)
        p = params[-1]
        w, b = p["w"], p["b"]
        if row_order is not None:
            w = w[:, row_order]
            b = b[row_order]
        if self.compute_dtype is not None:
            out = jax.lax.dot_general(
                w.astype(self.compute_dtype),
                x.astype(self.compute_dtype),
                (((0,), (1,)), ((), ())),
                preferred_element_type=out_dtype,
            )
        else:
            out = jax.lax.dot_general(
                w, x, (((0,), (1,)), ((), ())), preferred_element_type=x.dtype
            )
        return out + b[:, None]


class MeanFreeDenseNet(DenseNet):
    """DenseNet whose output is projected onto the mean-free subspace.

    Reference: ``dense.py:51-54``.
    """

    def apply(self, params, x):
        y = super().apply(params, x)
        return y - jnp.mean(y, axis=-1, keepdims=True)

    def _no_fused(self, params, x, **kwargs):
        # the mean-free output projection happens AFTER the final layer, so
        # the split-at-last-layer fused paths cannot represent this net
        raise NotImplementedError("MeanFreeDenseNet has no fused-kernel form")

    apply_trunk = _no_fused
    apply_transposed = _no_fused
    fused_mlp_spec = _no_fused


class WrapPeriodic(Net):
    """sin/cos-embed circular input features before feeding the net.

    Indices in ``indices`` (static) are replaced by their (cos, sin) pair on
    the circle of period ``right - left``; non-circular features pass through.
    Output ordering is [cos(circ), sin(circ), noncirc], matching the
    reference (``periodic.py:30-37``) so conditioner input dims line up as
    ``n_noncircular + 2 * n_circular``.
    """

    def __init__(self, net: Net, left: float = 0.0, right: float = 1.0, indices=slice(None)):
        self.net = net
        self.left = float(left)
        self.right = float(right)
        self.indices = indices

    def init(self, key):
        return self.net.init(key)

    def apply(self, params, x):
        idx = np.arange(x.shape[-1])[self.indices]
        other = np.setdiff1d(np.arange(x.shape[-1]), idx)
        y = x[..., idx]
        arg = 2 * jnp.pi * (y - self.left) / (self.right - self.left)
        x = jnp.concatenate([jnp.cos(arg), jnp.sin(arg), x[..., other]], axis=-1)
        return self.net.apply(params, x)

    def apply_transposed(self, params, x, row_order=None):
        idx = np.arange(x.shape[-1])[self.indices]
        other = np.setdiff1d(np.arange(x.shape[-1]), idx)
        y = x[..., idx]
        arg = 2 * jnp.pi * (y - self.left) / (self.right - self.left)
        x = jnp.concatenate([jnp.cos(arg), jnp.sin(arg), x[..., other]], axis=-1)
        return self.net.apply_transposed(params, x, row_order=row_order)

    def apply_trunk(self, params, x):
        idx = np.arange(x.shape[-1])[self.indices]
        other = np.setdiff1d(np.arange(x.shape[-1]), idx)
        y = x[..., idx]
        arg = 2 * jnp.pi * (y - self.left) / (self.right - self.left)
        x = jnp.concatenate([jnp.cos(arg), jnp.sin(arg), x[..., other]], axis=-1)
        return self.net.apply_trunk(params, x)

    def fused_mlp_spec(self, params, x):
        idx = np.arange(x.shape[-1])[self.indices]
        other = np.setdiff1d(np.arange(x.shape[-1]), idx)
        y = x[..., idx]
        arg = 2 * jnp.pi * (y - self.left) / (self.right - self.left)
        x = jnp.concatenate([jnp.cos(arg), jnp.sin(arg), x[..., other]], axis=-1)
        return self.net.fused_mlp_spec(params, x)


class WrapDistances(Net):
    """Replace a block of flattened xyz features by their pairwise distances.

    Reference: ``periodic.py:40-58``; output ordering [other, distances].
    """

    def __init__(self, net: Net, indices=slice(None)):
        self.net = net
        self.indices = indices

    def init(self, key):
        return self.net.init(key)

    def apply(self, params, x):
        idx = np.arange(x.shape[-1])[self.indices]
        other = np.setdiff1d(np.arange(x.shape[-1]), idx)
        pts = x[..., idx].reshape(*x.shape[:-1], -1, 3)
        diff = pts[..., :, None, :] - pts[..., None, :, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        n = pts.shape[-2]
        iu, ju = np.triu_indices(n, k=1)
        dists = jnp.sqrt(jnp.clip(d2[..., iu, ju], 1e-12))
        x = jnp.concatenate([x[..., other], dists], axis=-1)
        return self.net.apply(params, x)


class Lambda(Net):
    """A parameter-free function as a Net."""

    def __init__(self, fn):
        self.fn = fn

    def init(self, key):
        return ()

    def apply(self, params, x):
        return self.fn(x)
