"""Flagship model: alanine-dipeptide Boltzmann generator.

End-to-end parity with the reference's canonical example
(``notebooks/alanine_dipeptide_basics.py:139-358``): MD data -> mixed
internal-coordinate transform -> conditional-spline coupling flow ->
mixed NLL/KL training -> reweighted sampling.  Everything (data generation
included) runs on-device.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..bg import BoltzmannGenerator
from ..energies.ala2 import (
    ALA2_FIXED_ATOMS,
    ALA2_REFERENCE_XYZ,
    ALA2_Z_MATRIX,
    build_ala2_forcefield,
)
from ..energies.clipped import LinLogCutEnergy
from ..factory.builder import BoltzmannGeneratorBuilder
from ..factory.icmarginals import InternalCoordinateMarginals
from ..factory.tensor_info import ANGLES, BONDS, FIXED, TORSIONS, ShapeDictionary, TensorInfo
from ..flows.ic import MixedCoordinateTransformation
from ..samplers.md import baoab_run

__all__ = [
    "Ala2Model",
    "generate_ala2_data",
    "generate_ala2_data_exact",
    "make_ala2_generator",
]


def generate_ala2_data(
    key,
    n_samples: int = 4096,
    n_chains: int = 64,
    n_equilibration: int = 2000,
    timestep: float = 5e-4,
    friction: float = 5.0,
    temperature: float = 300.0,
    align: bool = True,
    dtype=jnp.float32,
):
    """On-device BAOAB MD trajectory of ala2, thinned into a training set.

    With ``align`` (default), every frame is Kabsch-superposed onto the
    reference geometry using the rigid-block atoms — the whitened fixed-atom
    channel then carries only internal fluctuations, which is what the PCA
    Gaussian can actually model (unaligned data mixes global pose into the
    whitening and Gaussian samples leave the rotation manifold, producing
    clashing reconstructions).
    """
    from ..ops.geometry import kabsch_align

    ff = build_ala2_forcefield(temperature=temperature)
    x0 = jnp.asarray(ALA2_REFERENCE_XYZ, dtype=dtype).reshape(1, -1).repeat(n_chains, 0)
    key_eq, key_prod = jax.random.split(key)
    xs = baoab_run(ff, x0, key_eq, n_steps=n_equilibration, timestep=timestep, friction=friction)
    n_prod = max(1, n_samples // n_chains)
    thin = 10
    xs = baoab_run(ff, xs[-1], key_prod, n_steps=n_prod * thin, timestep=timestep, friction=friction, thin=thin)
    data = xs.reshape(-1, 66)[:n_samples]
    if align:
        frames = data.reshape(-1, 22, 3)
        frames = kabsch_align(
            frames, jnp.asarray(ALA2_REFERENCE_XYZ, dtype=dtype), atoms=ALA2_FIXED_ATOMS
        )
        data = frames.reshape(-1, 66)
    return data


ALA2_MASSES = np.array(
    # amu per atom, ordering of ALA2_ATOMS (H=1.008, C=12.011, N=14.007, O=15.999)
    [1.008, 12.011, 1.008, 1.008, 12.011, 15.999, 14.007, 1.008, 12.011, 1.008,
     12.011, 1.008, 1.008, 1.008, 12.011, 15.999, 14.007, 1.008, 12.011, 1.008,
     1.008, 1.008]
)


def generate_ala2_data_exact(
    key,
    n_samples: int = 65536,
    n_ladders: int = 64,
    temperatures=(1.0, 1.5, 2.25, 3.375),
    step_size: float = 4e-3,
    n_leapfrog: int = 10,
    n_burnin: int = 200,
    stride: int = 5,
    temperature: float = 300.0,
    align: bool = True,
    dtype=jnp.float32,
):
    """Exact-Boltzmann ala2 training data: HMC + replica exchange.

    Unlike ``generate_ala2_data`` (unadjusted BAOAB, whose dt bias made the
    round-1 data non-Boltzmann), every move here is Metropolis-corrected —
    HMC within each temperature, neighbor swaps across the ladder — so the
    T=1 marginal is exactly exp(-u) regardless of step size, and the
    tempering ladder carries chains over the phi barrier.  Temperatures are
    reduced multiples of the physical ``temperature``.

    Returns (n_samples, 66) frames from the T=1 rungs, Kabsch-aligned.
    """
    from ..ops.geometry import kabsch_align
    from ..parallel.tempering import ReplicaExchangeStep
    from ..samplers.iterative import SamplerState
    from ..samplers.mcmc import HMCStep

    temps = jnp.asarray(temperatures, dtype=dtype)
    k = temps.shape[0]
    temps_flat = jnp.tile(temps, n_ladders)
    masses = jnp.asarray(np.repeat(ALA2_MASSES, 3) / ALA2_MASSES.min(), dtype=dtype)

    ff = build_ala2_forcefield(temperature=temperature)
    x0 = jnp.asarray(ALA2_REFERENCE_XYZ, dtype=dtype).reshape(1, -1)
    x0 = jnp.repeat(x0, n_ladders * k, axis=0)

    # Compile ONE iteration body (stride HMC sweeps as a lax.scan inside
    # HMCStep.n_steps, then one exchange) and Python-loop the dispatches.
    # Programs containing force-gradient scan bodies compile slowly on the
    # remote-compile TPU path (~minutes per body copy); a monolithic
    # whole-trajectory scan would pay that several times over, while the
    # per-call dispatch overhead of this loop is negligible against the
    # device work per call.
    hmc = HMCStep(
        ff,
        step_size=step_size,
        n_leapfrog=n_leapfrog,
        target_temperatures=temps_flat,
        masses=masses,
        n_steps=stride,
    )
    rex = ReplicaExchangeStep(ff, temps)

    @jax.jit
    def one_iteration(state, key):
        k1, k2 = jax.random.split(key)
        state = hmc.step(state, k1)
        return rex.step(state, k2)

    state = SamplerState(
        samples=(x0,),
        energies=ff.energy(x0),
        step_count=jnp.zeros((), dtype=jnp.int32),
    )
    for i in range(n_burnin):
        key, sub = jax.random.split(key)
        state = one_iteration(state, sub)
    n_iter = -(-n_samples // n_ladders)  # frames per ladder
    collected = []
    for i in range(n_iter):
        key, sub = jax.random.split(key)
        state = one_iteration(state, sub)
        collected.append(np.asarray(state.samples[0][0::k]))  # T=1 rungs
    cold = np.concatenate(collected, axis=0)[:n_samples]
    if align:
        ref = jnp.asarray(ALA2_REFERENCE_XYZ, dtype=dtype)
        # chunked: XLA's batched 3x3 SVD custom call overflows scoped VMEM
        # beyond ~100k rows on TPU
        out = []
        for i in range(0, cold.shape[0], 16384):
            chunk = jnp.asarray(cold[i : i + 16384]).reshape(-1, 22, 3)
            out.append(np.asarray(kabsch_align(chunk, ref, atoms=ALA2_FIXED_ATOMS)))
        cold = np.concatenate(out, axis=0).reshape(-1, 66)
    return jnp.asarray(cold)


def make_ala2_generator(
    data,
    temperature: float = 300.0,
    hidden=(128, 128),
    num_bins: int = 8,
    keepdims: int = 9,  # 3*5 - 6: aligned rigid block has only internal dof
    high_energy: float = 1e3,
    max_energy: float = 1e9,
    fixed_scale: float = 3.0,
    use_pallas_spline: bool = False,
    marginals_from: str = "data",
    implicit_solvent: bool = False,
    learnable_marginals: bool = False,
    temperature_conditioning: bool = False,
    fixed_gnn: bool = False,
    gnn_kwargs: dict = {},
    architecture=(
        (TORSIONS, FIXED),
        (FIXED, TORSIONS),
        (BONDS, (ANGLES, TORSIONS)),
        (ANGLES, (BONDS, TORSIONS)),
        (TORSIONS, (BONDS, ANGLES)),
        (FIXED, (BONDS, ANGLES, TORSIONS)),
    ),
    statistics=None,
) -> BoltzmannGenerator:
    """Assemble the spline-coupling ala2 BG (notebook-parity architecture).

    ``learnable_marginals``: append per-dim trainable RQ-spline marginal
    layers (``flows/marginal.py``) on BONDS/ANGLES/TORSIONS before the
    IC-domain map — corrects accumulated per-dof marginal mismatch that
    the couplings (which model cross-dependence) leave behind.

    ``statistics``: a ``gen.data_statistics`` pytree from a previous build —
    restores the data-derived constants (whitening PCA, marginal mu/sigma)
    exactly instead of refitting them to ``data`` (which may then be None);
    save it with the checkpoint so restores don't depend on the dataset.
    """
    crd = MixedCoordinateTransformation(
        None if statistics is not None else np.asarray(data),
        ALA2_Z_MATRIX, ALA2_FIXED_ATOMS, keepdims=keepdims,
        whiten_statistics=None if statistics is None else statistics["whiten"],
    )
    ff = build_ala2_forcefield(
        temperature=temperature, implicit_solvent=implicit_solvent
    )
    target = LinLogCutEnergy(ff, high_energy=high_energy, max_energy=max_energy)
    shape_info = ShapeDictionary.from_coordinate_transform(crd)
    builder = BoltzmannGeneratorBuilder(shape_info, target=target)
    tkw = dict(use_pallas=True) if use_pallas_spline else dict()
    # temperature_conditioning: every coupling conditioner sees log(T) as an
    # extra input — the model density becomes genuinely T-dependent (uniform
    # torsion priors alone make q temperature-independent; VERDICT r3 item 7)
    ckw = dict(temperature_feature=True) if temperature_conditioning else dict()
    if fixed_gnn and temperature_conditioning:
        raise NotImplementedError(
            "temperature_conditioning with the GNN conditioner needs a log-T "
            "node feature (not an appended input column); use one or the other"
        )
    for what, on in architecture:
        kw = dict(ckw)
        # NB: TensorInfo is a NamedTuple — isinstance(x, tuple) is True for
        # a bare field, which would make the membership test inspect its
        # FIELDS; dispatch on TensorInfo explicitly
        on_fields = (on,) if isinstance(on, TensorInfo) else tuple(on)
        if fixed_gnn and FIXED in on_fields:
            # E(3)-invariant GNN conditioner on the fixed-atom channel —
            # the reference's nequip-conditioner slot
            # (``conditioner_factory.py:86-211``); requires keepdims = 3 *
            # n_fixed so FIXED stays a per-atom coordinate channel.  The
            # field is PCA-whitened, so the conditioner de-whitens back to
            # physical nm geometry before message passing (cartesian_map).
            ws = crd.whiten_statistics
            kw.update(dict(
                conditioner_type="GNN",
                cartesian_map=(np.asarray(ws["t_blacken"]), np.asarray(ws["mean"])),
            ), **gnn_kwargs)
        builder.add_condition(
            what, on=on, hidden=hidden, num_bins=num_bins, transformer_kwargs=tkw,
            **kw,
        )
    if learnable_marginals:
        from ..flows.marginal import MarginalSplineFlow

        for field in (BONDS, ANGLES, TORSIONS):
            d = builder.current_dims[field][-1]
            builder.add_layer(
                MarginalSplineFlow(d, num_bins=num_bins, is_circular=field.is_circular),
                what=(field,),
            )
    # fixed_scale: std of the whitened-fixed-atom marginal.  The reference
    # defaults to 20 (very conservative); whitened coordinates are ~N(0,1),
    # and a tight marginal concentrates the spline's resolution where the
    # data lives (large scales waste bins and produce clashing geometries).
    marginals = InternalCoordinateMarginals(builder.current_dims, fixed_scale=fixed_scale)
    if statistics is not None:
        from ..distributions.normal import TruncatedNormalDistribution

        marginals[BONDS] = TruncatedNormalDistribution(
            mu=jnp.asarray(statistics["bond_mu"]),
            sigma=jnp.asarray(statistics["bond_sigma"]),
            lower_bound=1e-3, upper_bound=1.0,
        )
        marginals[ANGLES] = TruncatedNormalDistribution(
            mu=jnp.asarray(statistics["angle_mu"]),
            sigma=jnp.asarray(statistics["angle_sigma"]),
            lower_bound=1e-4, upper_bound=1.0,
        )
    elif marginals_from == "forcefield":
        # harmonic-equilibrium marginals: robust when data is thin/biased
        marginals.inform_with_force_field(
            ff, crd, bond_lower=1e-3, bond_upper=1.0, angle_lower=1e-4
        )
    elif marginals_from == "data":
        marginals.inform_with_data(
            jnp.asarray(data), crd, bond_lower=1e-3, bond_upper=1.0, angle_lower=1e-4
        )
    else:
        raise ValueError(f"marginals_from must be 'data' or 'forcefield', got {marginals_from!r}")
    builder.add_map_to_ic_domains(marginals)
    builder.add_map_to_cartesian(crd)
    gen = builder.build_generator()
    gen.data_statistics = statistics if statistics is not None else {
        "whiten": crd.whiten_statistics,
        "bond_mu": np.asarray(marginals[BONDS].mu),
        "bond_sigma": np.asarray(marginals[BONDS].sigma),
        "angle_mu": np.asarray(marginals[ANGLES].mu),
        "angle_sigma": np.asarray(marginals[ANGLES].sigma),
    }
    return gen


class Ala2Model(NamedTuple):
    """Bundled flagship model: generator + params + data."""

    generator: BoltzmannGenerator
    params: object
    data: jax.Array

    @staticmethod
    def create(key, n_data: int = 4096, **kwargs) -> "Ala2Model":
        key_data, key_init = jax.random.split(key)
        data = generate_ala2_data(key_data, n_samples=n_data)
        gen = make_ala2_generator(data, **kwargs)
        params = gen.init(key_init)
        return Ala2Model(generator=gen, params=params, data=data)
