"""Conditioner / transformer / prior factories for the builder.

Reference: ``bgflow/factory/conditioner_factory.py:23-73,224-253``,
``transformer_factory.py:11-87``, ``distribution_factory.py:11-56``.

Registries map transformer types to (a) the conditioner output dims they
need and (b) their construction; priors are built per tensor field.
"""
from __future__ import annotations

from typing import Mapping

import numpy as np
import jax
import jax.numpy as jnp

from ..nets.dense import DenseNet, WrapPeriodic
from ..transformers.affine import AffineTransformer
from ..transformers.spline import ConditionalSplineTransformer
from ..distributions.normal import NormalDistribution, TruncatedNormalDistribution
from ..distributions.uniform import UniformDistribution

__all__ = ["make_conditioners", "make_transformer", "make_distribution",
           "CONDITIONER_FACTORIES", "CONDITIONER_OUT_DIMS",
           "TRANSFORMER_FACTORIES", "DISTRIBUTION_FACTORIES"]


# ------------------------------------------------------------ conditioners


def _make_dense_conditioner(
    dim_in, dim_out, hidden=(128, 128), activation=jax.nn.silu, compute_dtype=None, **kwargs
):
    return DenseNet([dim_in, *hidden, dim_out], activation=activation, compute_dtype=compute_dtype)


def _make_gnn_conditioner(
    dim_in,
    dim_out,
    shape_info=None,
    on=None,
    hidden=(128, 128),
    activation=jax.nn.silu,
    gnn_features=32,
    gnn_layers=2,
    gnn_out=64,
    r_max=1.0,
    attention_heads=0,
    gnn_type="invariant",
    cartesian_map=None,
    **kwargs,
):
    """E(3)-invariant GNN on the cartesian conditioner inputs (the
    nequip-conditioner equivalent, reference ``conditioner_factory.py:86-211``).

    ``cartesian_map``: static (matrix, offset) de-whitening applied before
    the GNN (see ``GNNConditioner``) — pass the coordinate transform's
    ``whiten_statistics`` blacken constants when the cartesian field is
    PCA-whitened."""
    from ..nets.gnn import GNNConditioner

    assert shape_info is not None and on is not None
    circular = shape_info.circular_indices(on)
    cartesian = shape_info.cartesian_indices(on)
    all_idx = np.arange(shape_info.dim_all(on))
    other = np.setdiff1d(all_idx, np.concatenate([circular, cartesian]))
    return GNNConditioner(
        dim_out,
        circular_indices=circular,
        cartesian_indices=cartesian,
        other_indices=other,
        hidden=hidden,
        gnn_features=gnn_features,
        gnn_layers=gnn_layers,
        gnn_out=gnn_out,
        r_max=r_max,
        activation=activation,
        attention_heads=attention_heads,
        gnn_type=gnn_type,
        cartesian_map=cartesian_map,
    )


CONDITIONER_FACTORIES = {
    "dense": _make_dense_conditioner,
    "GNN": _make_gnn_conditioner,
}

# conditioner types that embed circular inputs themselves (no WrapPeriodic)
_SELF_WRAPPING_CONDITIONERS = {"GNN"}
# conditioner types whose trunk is shared across a coupling's heads
_SHARED_TRUNK_CONDITIONERS = {"GNN"}


def _spline_out_dims(what, shape_info, transformer_kwargs={}, num_bins=8, **kwargs):
    dim_out = 3 * num_bins * shape_info.dim_all(what) + shape_info.dim_noncircular(what)
    return {"params_net": dim_out}


def _affine_out_dims(what, shape_info, transformer_kwargs={}, use_scaling=True, **kwargs):
    dim_out = shape_info.dim_all(what)
    out_dims = {"shift_net": dim_out}
    if use_scaling and not any(f.is_circular for f in what):
        out_dims["scale_net"] = dim_out
    return out_dims


def _smooth_out_dims(what, shape_info, transformer_kwargs={}, n_components=4, **kwargs):
    return {"params_net": 5 * n_components * shape_info.dim_all(what)}


CONDITIONER_OUT_DIMS = {
    ConditionalSplineTransformer: _spline_out_dims,
    AffineTransformer: _affine_out_dims,
}


def _register_smooth():
    from ..transformers.smooth import SmoothSigmoidTransformer

    CONDITIONER_OUT_DIMS[SmoothSigmoidTransformer] = _smooth_out_dims

    def _make_smooth(what, shape_info, conditioners, n_components=4, **kwargs):
        all_circ = bool(shape_info.is_circular(what).all())
        return SmoothSigmoidTransformer(
            **conditioners, n_components=n_components, is_circular=all_circ, **kwargs
        )

    TRANSFORMER_FACTORIES[SmoothSigmoidTransformer] = _make_smooth


def make_conditioners(
    transformer_type,
    what,
    on,
    shape_info,
    transformer_kwargs={},
    conditioner_type="dense",
    temperature_feature=False,
    **kwargs,
):
    """Build the conditioner nets a transformer needs for a coupling layer.

    Circular conditioner inputs are sin/cos-embedded (input dim
    ``n_noncircular + 2 * n_circular``, reference
    ``conditioner_factory.py:63-70``).  ``temperature_feature`` sizes the
    nets for one extra (non-circular) log-temperature input column — the
    matching ``Coupling(temperature_feature=True)`` appends it at call time.
    """
    net_factory = CONDITIONER_FACTORIES[conditioner_type]
    dim_out_factory = CONDITIONER_OUT_DIMS[transformer_type]
    dim_out = dim_out_factory(
        what=what, shape_info=shape_info, transformer_kwargs=transformer_kwargs, **kwargs
    )
    # expensive conditioners (GNN) build ONE net serving all heads: the
    # trunk is computed once per coupling and shared — the functional form
    # of the reference's GNN-output caching (conditioner_factory.py:139-154)
    shared = conditioner_type in _SHARED_TRUNK_CONDITIONERS and len(dim_out) > 1
    had_scale = "scale_net" in dim_out
    if shared:
        dim_out = {"params_net": sum(dim_out.values())}
    dim_in = shape_info.dim_noncircular(on) + 2 * shape_info.dim_circular(on)
    if temperature_feature:
        dim_in += 1
    conditioners = {}
    for name, dim in dim_out.items():
        net = net_factory(dim_in, dim, shape_info=shape_info, on=on, **kwargs)
        if (
            shape_info.dim_circular(on) > 0
            and conditioner_type not in _SELF_WRAPPING_CONDITIONERS
        ):
            net = WrapPeriodic(net, indices=shape_info.circular_indices(on))
        conditioners[name] = net
    if shared:
        conditioners["use_scaling"] = had_scale
    return conditioners


# ------------------------------------------------------------ transformers


def _make_spline_transformer(what, shape_info, conditioners, **kwargs):
    return ConditionalSplineTransformer(
        **conditioners, is_circular=shape_info.is_circular(what), **kwargs
    )


def _make_affine_transformer(what, shape_info, conditioners, **kwargs):
    n_circ = shape_info.dim_circular(what)
    if n_circ not in (0, shape_info.dim_all(what)):
        raise NotImplementedError(
            "Circular affine transformers are not supported for partly circular indices."
        )
    if "params_net" in conditioners:
        return AffineTransformer(
            params_net=conditioners["params_net"],
            use_scaling=conditioners.get("use_scaling", True),
            is_circular=n_circ > 0,
            **kwargs,
        )
    return AffineTransformer(**conditioners, is_circular=n_circ > 0, **kwargs)


TRANSFORMER_FACTORIES = {
    ConditionalSplineTransformer: _make_spline_transformer,
    AffineTransformer: _make_affine_transformer,
}

_register_smooth()


def make_transformer(transformer_type, what, shape_info, conditioners, **kwargs):
    return TRANSFORMER_FACTORIES[transformer_type](
        what=what, shape_info=shape_info, conditioners=conditioners, **kwargs
    )


# ------------------------------------------------------------------ priors


def _make_uniform(shape, low=0.0, high=1.0, **kwargs):
    return UniformDistribution(
        low=jnp.full(shape, low), high=jnp.full(shape, high), **kwargs
    )


def _make_normal(shape, **kwargs):
    assert len(shape) == 1
    return NormalDistribution(shape[0], **kwargs)


def _make_truncated_normal(shape, mu=1.0, sigma=1.0, lower_bound=0.0, upper_bound=np.inf, **kwargs):
    return TruncatedNormalDistribution(
        mu=jnp.full(shape, mu),
        sigma=jnp.full(shape, sigma),
        lower_bound=lower_bound,
        upper_bound=upper_bound,
        **kwargs,
    )


DISTRIBUTION_FACTORIES = {
    UniformDistribution: _make_uniform,
    NormalDistribution: _make_normal,
    TruncatedNormalDistribution: _make_truncated_normal,
}


def make_distribution(distribution_type, shape, **kwargs):
    return DISTRIBUTION_FACTORIES[distribution_type](shape, **kwargs)
