"""High-level builder DSL for Boltzmann generators.

Reference: ``bgflow/factory/generator_builder.py:50-536``.  The builder keeps
a ``ShapeDictionary`` of the current tensor channels, appends flow layers
that transform them, and finally assembles
``ProductDistribution prior -> Chain flow -> ProductEnergy target``.

All bookkeeping happens at build time on the host; the resulting flow is a
static ``Chain`` whose parameters are an explicit pytree — one ``jit`` traces
the whole generator.
"""
from __future__ import annotations

import logging
import warnings
from typing import Mapping, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..bg import BoltzmannGenerator
from ..core.flow import Chain, Flow, Inverse
from ..core.structural import Coupling, Merge, SetConstant, Split, Wrap
from ..distributions.normal import NormalDistribution
from ..distributions.product import ProductDistribution, ProductEnergy
from ..distributions.uniform import UniformDistribution
from ..flows.cdf import CDFTransform
from ..flows.elementwise import ConstantAffineFlow
from ..flows.ic import GlobalInternalCoordinateTransformation
from ..flows.modulo import CircularShiftFlow, IncreaseMultiplicityFlow
from ..transformers.spline import ConditionalSplineTransformer
from .icmarginals import InternalCoordinateMarginals
from .registries import make_conditioners, make_distribution, make_transformer
from .tensor_info import (
    AUGMENTED,
    ANGLES,
    BONDS,
    FIXED,
    ORIGIN,
    ROTATION,
    TARGET,
    TORSIONS,
    TensorInfo,
)

__all__ = ["BoltzmannGeneratorBuilder"]

logger = logging.getLogger("bgflow_tpu")


def _tuple(thing):
    if isinstance(thing, tuple) and not hasattr(thing, "_fields"):
        return thing
    if isinstance(thing, list):
        return tuple(thing)
    return (thing,)


def zero_params(params):
    """Zero every leaf of a parameter pytree (identity-initialized flow)."""
    return jax.tree_util.tree_map(jnp.zeros_like, params)


class BoltzmannGeneratorBuilder:
    """Mutable flow-graph builder.

    Examples
    --------
    >>> shape_info = ShapeDictionary()
    >>> shape_info[BONDS] = (10,)
    >>> shape_info[ANGLES] = (20,)
    >>> builder = BoltzmannGeneratorBuilder(shape_info)
    >>> builder.add_condition(BONDS, on=ANGLES)
    >>> generator = builder.build_generator()
    >>> params = generator.init(jax.random.PRNGKey(0))
    """

    def __init__(self, prior_dims, target=None):
        self.default_transformer_type = ConditionalSplineTransformer
        self.default_conditioner_type = "dense"
        self.default_transformer_kwargs = dict()
        self.default_conditioner_kwargs = dict()
        self.default_prior_type = UniformDistribution
        self.default_prior_kwargs = dict()

        self.prior_dims = prior_dims
        self.current_dims = self.prior_dims.copy()
        self.layers = []
        self.transformer_type = dict()
        self.transformer_kwargs = dict()
        self.conditioner_type = dict()
        self.conditioner_kwargs = dict()
        self.prior_type = dict()
        self.prior_kwargs = dict()
        self.targets = dict()
        if target is not None:
            self.targets[TARGET] = target
        if AUGMENTED in self.prior_dims:
            dim = self.prior_dims[AUGMENTED]
            self.targets[AUGMENTED] = NormalDistribution(dim[-1])
        # group name -> list of layer indices (for per-group optimizers)
        self.param_groups: Mapping[str, list] = dict()
        dims = "; ".join(f"{f.name}: {self.prior_dims[f]}" for f in prior_dims)
        logger.info(f"builder fields: {dims}")

    # -- assembly ---------------------------------------------------------
    def build_generator(self, check_target: bool = True) -> BoltzmannGenerator:
        generator = BoltzmannGenerator(
            prior=self.build_prior(),
            flow=self.build_flow(),
            target=self.build_target(check_target=check_target),
        )
        self.clear()
        return generator

    def build_flow(self) -> Chain:
        return Chain(self.layers)

    def build_prior(self):
        priors = []
        for field in self.prior_dims:
            prior_type = self.prior_type.get(field, self.default_prior_type)
            prior_kwargs = self.prior_kwargs.get(field, self.default_prior_kwargs)
            priors.append(
                make_distribution(prior_type, self.prior_dims[field], **prior_kwargs)
            )
        return ProductDistribution(priors) if len(priors) > 1 else priors[0]

    def build_target(self, check_target: bool = False):
        targets = []
        for field in self.current_dims:
            if field in self.targets:
                targets.append(self.targets[field])
            elif check_target:
                warnings.warn(f"No target energy for {field}.", UserWarning)
        if len(targets) > 1:
            return ProductEnergy(targets)
        if len(targets) == 1:
            return targets[0]
        return None

    def clear(self):
        self.layers = []
        self.current_dims = self.prior_dims.copy()

    # -- coupling ---------------------------------------------------------
    def add_condition(
        self,
        what,
        on=tuple(),
        param_groups=tuple(),
        conditioner_type=None,
        transformer_type=None,
        transformer_kwargs=dict(),
        **conditioner_kwargs,
    ):
        """Add a coupling layer transforming ``what`` conditioned on ``on``."""
        on = _tuple(on)
        what = _tuple(what)
        if len(on) == 0:
            raise ValueError("add_condition requires at least one conditioning field (on=...).")
        if len(what) == 0:
            raise ValueError("Need to transform something.")

        def _resolve(overrides, per_field, default, label):
            if overrides is not None:
                return overrides
            values = [per_field.get(el, default) for el in what]
            if not all(v == values[0] for v in values):
                raise ValueError(f"Fields with different {label} cannot be transformed together.")
            return values[0]

        transformer_type = _resolve(
            transformer_type, self.transformer_type, self.default_transformer_type, "transformer_type"
        )
        conditioner_type = _resolve(
            conditioner_type, self.conditioner_type, self.default_conditioner_type, "conditioner_type"
        )
        tkw = [
            {**self.transformer_kwargs.get(el, self.default_transformer_kwargs), **transformer_kwargs}
            for el in what
        ]
        if not all(k == tkw[0] for k in tkw):
            raise ValueError("Fields with different transformer_kwargs cannot be transformed together.")
        transformer_kwargs = tkw[0]
        ckw = [
            {**self.conditioner_kwargs.get(el, self.default_conditioner_kwargs), **conditioner_kwargs}
            for el in what
        ]
        if not all(k == ckw[0] for k in ckw):
            raise ValueError("Fields with different conditioner_kwargs cannot be transformed together.")
        conditioner_kwargs = ckw[0]

        conditioners = make_conditioners(
            transformer_type=transformer_type,
            conditioner_type=conditioner_type,
            transformer_kwargs=transformer_kwargs,
            what=what,
            on=on,
            shape_info=self.current_dims.copy(),
            **conditioner_kwargs,
        )
        transformer = make_transformer(
            transformer_type=transformer_type,
            what=what,
            shape_info=self.current_dims,
            conditioners=conditioners,
            **transformer_kwargs,
        )
        coupling = Coupling(
            transformer=transformer,
            transformed=[self.current_dims.index(f) for f in what],
            on=[self.current_dims.index(f) for f in on],
            # conditioners were sized for the extra log-T input column iff
            # this was set (make_conditioners consumed the same kwarg)
            temperature_feature=bool(
                conditioner_kwargs.get("temperature_feature", False)
            ),
        )
        logger.info(
            f"  + Coupling Layer: ({', '.join(f.name for f in on)}) "
            f"-> ({', '.join(f.name for f in what)})"
        )
        self.add_layer(coupling, param_groups=param_groups)

    # -- structural -------------------------------------------------------
    def add_layer(self, flow: Flow, what=None, inverse: bool = False, param_groups=tuple()):
        if inverse:
            flow = Inverse(flow)
        if what is not None:
            what = _tuple(what)
            indices = [self.current_dims.index(el) for el in what]
            flow = Wrap(flow, indices, indices)
        for group in param_groups:
            self.param_groups.setdefault(group, []).append(len(self.layers))
        self.layers.append(flow)

    def add_set_constant(self, what: TensorInfo, tensor):
        tensor = jnp.asarray(tensor)
        if what in self.current_dims:
            if self.current_dims[what] != tuple(tensor.shape):
                raise ValueError(f"Constant tensor must have shape {self.current_dims[what]}")
        else:
            if what in self.prior_dims:
                raise ValueError(f"Cannot set {what} constant; field was already deleted or replaced.")
            self.current_dims[what] = tuple(tensor.shape)
        index = self.current_dims.index(what)
        self.layers.append(SetConstant(indices=[index], values=[tensor]))
        logger.info(f"  + Set Constant: {what} at index {index}")

    def add_split(self, what: TensorInfo, into, sizes_or_indices, dim: int = -1):
        into = [
            TensorInfo(name=el, is_circular=what.is_circular) if isinstance(el, str) else el
            for el in into
        ]
        input_index = self.current_dims.index(what)
        split_flow = Split(*sizes_or_indices, axis=dim)
        if split_flow.sizes is None:
            sizes = [len(size) for size in sizes_or_indices]
        else:
            sizes = list(sizes_or_indices)
        self.current_dims.split(what, into, sizes, dim=dim)
        output_indices = [self.current_dims.index(el) for el in into]
        self.layers.append(Wrap(split_flow, indices=(input_index,), out_indices=output_indices))
        logger.info(f"  + Split: {what.name} -> ({', '.join(f.name for f in into)})")
        return tuple(into)

    def add_merge(self, what, to, dim: int = -1, output_index=None, sizes_or_indices=None):
        what = _tuple(what)
        if isinstance(to, str):
            to = TensorInfo(name=to, is_circular=what[0].is_circular)
        if not all(w.is_circular == to.is_circular for w in what):
            raise ValueError(
                "Refusing to merge circular and non-circular channels into one field: downstream circularity bookkeeping would be wrong."
            )
        input_indices = [self.current_dims.index(el) for el in what]
        if sizes_or_indices is None:
            sizes_or_indices = [self.current_dims[el][dim] for el in what]
        merge_flow = Merge(*sizes_or_indices, axis=dim)
        self.current_dims.merge(what, to=to, index=output_index)
        out_index = self.current_dims.index(to)
        self.layers.append(Wrap(merge_flow, indices=input_indices, out_indices=(out_index,)))
        logger.info(f"  + Merge: ({', '.join(f.name for f in what)}) -> {to.name}")
        return to

    # -- coordinate maps --------------------------------------------------
    def add_map_to_cartesian(
        self,
        coordinate_transform,
        fixed_origin_and_rotation: bool = True,
        bonds=BONDS,
        angles=ANGLES,
        torsions=TORSIONS,
        fixed=FIXED,
        origin=ORIGIN,
        rotation=ROTATION,
        out=TARGET,
    ):
        """Append the inverse IC transform: IC channels -> Cartesian ``out``."""
        ic_fields = [bonds, angles, torsions]
        if isinstance(coordinate_transform, GlobalInternalCoordinateTransformation):
            ic_fields.extend([origin, rotation])
            if fixed_origin_and_rotation:
                self.add_set_constant(origin, jnp.zeros((1, 3)))
                self.add_set_constant(rotation, jnp.array([0.5, 0.5, 0.5]))
        else:
            ic_fields.append(fixed)
        indices = [self.current_dims.index(ic) for ic in ic_fields]
        self.layers.append(
            Wrap(Inverse(coordinate_transform), indices=indices, out_indices=(min(indices),))
        )
        self.current_dims.merge(ic_fields, out)

    def add_map_to_ic_domains(self, cdfs=dict()):
        """Map uniform latents onto IC domains via inverse-CDF flows."""
        if len(cdfs) == 0:
            cdfs = InternalCoordinateMarginals(self.current_dims)
        for field in cdfs:
            if field in self.current_dims:
                entry = cdfs[field]
                icdf_flow = entry if isinstance(entry, Flow) else Inverse(CDFTransform(entry))
                self.layers.append(Wrap(icdf_flow, (self.current_dims.index(field),)))
            else:
                warnings.warn(f"Field {field} not in current dims. CDF is ignored.")

    # -- constraints ------------------------------------------------------
    def add_merge_constraints(self, constrained_indices, constrained_values, field=BONDS):
        """Re-insert constrained (constant) bonds among the free ones."""
        assert field in self.current_dims
        constrained_values = jnp.asarray(constrained_values)
        if len(constrained_indices) == 0:
            warnings.warn("add_merge_constraints skipped: no indices.", UserWarning)
            return
        n_total = len(constrained_indices) + self.current_dims[field][-1]
        constrained_indices = np.asarray(constrained_indices)
        free_indices = np.setdiff1d(np.arange(n_total), constrained_indices)
        field_constrained = TensorInfo(f"{field.name}_constrained", field.is_circular)
        self.add_set_constant(field_constrained, constrained_values)
        self.add_merge(
            (field, field_constrained),
            to=field,
            sizes_or_indices=(free_indices, constrained_indices),
        )

    def add_constrain_chirality(self, halpha_torsion_indices, right_handed=False, torsions=TORSIONS):
        """Constrain normalized h-alpha torsions to [0.5, 1] (or [0, 0.5])."""
        n = self.current_dims[torsions][-1]
        loc = np.zeros(n)
        scale = np.ones(n)
        loc[halpha_torsion_indices] = 0.5 * (1 - bool(right_handed))
        scale[halpha_torsion_indices] = 0.5
        return self.add_layer(ConstantAffineFlow(loc=loc, scale=scale), what=(torsions,))

    def add_torsion_multiplicities(self, multiplicities, torsions=TORSIONS):
        return self.add_layer(IncreaseMultiplicityFlow(multiplicities), what=(torsions,))

    def add_torsion_shifts(self, shifts, torsions=TORSIONS):
        return self.add_layer(CircularShiftFlow(shifts), what=(torsions,))
