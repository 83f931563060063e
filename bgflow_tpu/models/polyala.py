"""Poly-alanine Boltzmann generators: the scale-up model family.

Same architecture as the ala2 flagship (``models/ala2.py``), driven by the
template-based topology machinery (``energies/peptide.py``): ACE-(ALA)_n-NME
force field, bond-graph-derived z-matrix, mixed IC transform with a whitened
rigid block, conditional-spline couplings.  Demonstrates that the whole
stack — topology, force field, IC flow, fused spline kernels — is generic
over system size, not hard-wired to the 22-atom dipeptide.

Reference scope note: the reference reaches larger peptides only through
bgmol/OpenMM topologies; this module is the in-repo equivalent.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..bg import BoltzmannGenerator
from ..energies.clipped import LinLogCutEnergy
from ..energies.peptide import (
    PEPTIDE_MASSES,
    build_peptide_topology,
    build_polyala_forcefield,
    polyala_reference_xyz,
    polyala_z_matrix,
)
from ..factory.builder import BoltzmannGeneratorBuilder
from ..factory.icmarginals import InternalCoordinateMarginals
from ..factory.tensor_info import ANGLES, BONDS, FIXED, TORSIONS, ShapeDictionary
from ..flows.ic import MixedCoordinateTransformation
from ..samplers.md import baoab_run

__all__ = [
    "generate_polyala_data",
    "generate_polyala_data_exact",
    "make_polyala_generator",
]


def generate_polyala_data_exact(
    key,
    n_res: int,
    n_samples: int = 16384,
    n_ladders: int = 64,
    temperatures=tuple(1.15**i for i in range(8)),
    step_size: float = 2e-3,
    n_leapfrog: int = 10,
    n_burnin: int = 400,
    stride: int = 5,
    temperature: float = 300.0,
    align: bool = True,
    reference_xyz: Optional[np.ndarray] = None,
    return_all_rungs: bool = False,
    scan_chunk: int = 128,
    dtype=jnp.float32,
    implicit_solvent: bool = False,
):
    """Exact-Boltzmann poly-alanine data: HMC + replica exchange.

    With ``return_all_rungs`` the HOT rungs are returned too, with MBAR
    log-weights that unbias every frame to the T=1 ensemble — broader
    conformational coverage at zero extra simulation cost (the analogue of
    the ala2 science recipe's umbrella augmentation, using the tempering
    ladder itself as the biased ensembles).  Returns (frames, log_weights)
    suitable for ``DataSetSampler(frames, log_weights=...)``.

    The generic-length version of ``models/ala2.py::generate_ala2_data_exact``
    (see there for why Metropolis-corrected moves are load-bearing: BAOAB's
    dt bias made round-1 training data non-Boltzmann).

    HMC acceptance falls with dimension at fixed step size: ala2's tuned
    4e-3 gives only ~4% acceptance at ALA3 (126 dof) — chains freeze at
    the start structure and the "data" is not an equilibrated ensemble
    (this exact failure produced logw_std ~100-200 models).  The 2e-3
    default accepts ~70% at ALA3; re-measure when changing chain length.

    Ladder spacing must also shrink with dimension (exchange acceptance
    ~ exp(-D/2 * (dT/T)^2 / 2) collapses beyond 1 + sqrt(2/D) spacing —
    the same rule ``scripts/ala2_science.py::gen_data`` documents for 60
    dof).  Measured at ALA3 (126 dof): the round-2 default (1.0, 1.5,
    2.25, 3.375) swaps at 2.8% per attempt — the cold rung is effectively
    an isolated, kinetically trapped HMC chain — while the 1.15x 8-rung
    geometric ladder swaps at 44%.  That trapped "exact data" was the root
    cause of the ALA3 quality wall (logw_std 80-200 models that no amount
    of training fixed).

    The sampling loop runs in ``scan_chunk``-iteration ``lax.scan`` blocks
    on device; the host only receives one (chunk, chains, D) block per
    dispatch (the per-iteration host round-trip dominated wall-clock on a
    tunneled accelerator)."""
    from ..ops.geometry import kabsch_align
    from ..parallel.tempering import ReplicaExchangeStep
    from ..samplers.iterative import SamplerState
    from ..samplers.mcmc import HMCStep

    atoms, _ = build_peptide_topology(["ACE"] + ["ALA"] * n_res + ["NME"])
    masses_amu = PEPTIDE_MASSES(atoms)
    temps = jnp.asarray(temperatures, dtype=dtype)
    k = temps.shape[0]
    temps_flat = jnp.tile(temps, n_ladders)
    masses = jnp.asarray(np.repeat(masses_amu, 3) / masses_amu.min(), dtype=dtype)

    ff = build_polyala_forcefield(n_res, temperature=temperature, implicit_solvent=implicit_solvent)
    ref = polyala_reference_xyz(n_res) if reference_xyz is None else np.asarray(reference_xyz)
    n_atoms = ref.shape[0]
    _, fixed = polyala_z_matrix(n_res)
    x0 = jnp.asarray(ref, dtype=dtype).reshape(1, -1)
    x0 = jnp.repeat(x0, n_ladders * k, axis=0)

    hmc = HMCStep(
        ff, step_size=step_size, n_leapfrog=n_leapfrog,
        target_temperatures=temps_flat, masses=masses, n_steps=stride,
    )
    rex = ReplicaExchangeStep(ff, temps)

    def one_iteration(state, key):
        k1, k2 = jax.random.split(key)
        state = hmc.step(state, k1)
        return rex.step(state, k2)

    @jax.jit
    def burn_chunk(state, key):
        def body(s, sub):
            return one_iteration(s, sub), None

        return jax.lax.scan(body, state, jax.random.split(key, scan_chunk))[0]

    @jax.jit
    def collect_chunk(state, key):
        def body(s, sub):
            s = one_iteration(s, sub)
            out = (s.samples[0], s.energies) if return_all_rungs else (
                s.samples[0][0::k], s.energies[0::k])
            return s, out

        return jax.lax.scan(body, state, jax.random.split(key, scan_chunk))

    state = SamplerState(
        samples=(x0,),
        energies=ff.energy(x0),
        step_count=jnp.zeros((), dtype=jnp.int32),
    )
    import sys as _sys
    import time as _time

    _t0 = _time.time()
    for _ in range(-(-n_burnin // scan_chunk)):
        key, sub = jax.random.split(key)
        state = burn_chunk(state, sub)
    jax.block_until_ready(state.energies)
    print(f"polyala data: burn-in done in {_time.time()-_t0:.0f}s",
          file=_sys.stderr, flush=True)
    n_iter = -(-n_samples // n_ladders)
    collected = []
    collected_u = []
    n_chunks = -(-n_iter // scan_chunk)
    for i in range(n_chunks):
        key, sub = jax.random.split(key)
        state, (xs, us) = collect_chunk(state, sub)
        collected.append(np.asarray(xs).reshape(-1, xs.shape[-1]))
        collected_u.append(np.asarray(us).reshape(-1))
        print(f"polyala data: chunk {i+1}/{n_chunks} at {_time.time()-_t0:.0f}s",
              file=_sys.stderr, flush=True)
    n_keep = n_iter * (n_ladders * k if return_all_rungs else n_ladders)
    frames = np.concatenate(collected, axis=0)[:n_keep]
    collected_u = [np.concatenate(collected_u)[:n_keep]]
    if not return_all_rungs:
        frames = frames[:n_samples]

    def _align(arr):
        if not align:
            return jnp.asarray(arr)
        refj = jnp.asarray(ref, dtype=dtype)
        out = []
        for i in range(0, arr.shape[0], 16384):
            chunk = jnp.asarray(arr[i : i + 16384]).reshape(-1, n_atoms, 3)
            out.append(np.asarray(kabsch_align(chunk, refj, atoms=fixed)))
        return jnp.asarray(np.concatenate(out, axis=0).reshape(-1, 3 * n_atoms))

    if not return_all_rungs:
        return _align(frames)

    # MBAR over the K temperature states: reduced energies u_kn = u_n / T_k
    # (state.energies is u = U/kT at the physical temperature, i.e. the
    # T=1 reduced energy).  Target-state (T=1) weights:
    # log w_n = -u_n - logsumexp_k(log N_k + f_k - u_kn).
    from ..utils.free_energy import mbar as _mbar

    u_n = jnp.asarray(np.concatenate(collected_u, axis=0))
    # frame i in each iteration block belongs to temperature state i % k
    state_id = np.tile(np.arange(k), n_ladders * n_iter)
    temps_np = np.asarray(temperatures)
    u_kn = u_n[None, :] / jnp.asarray(temps_np, u_n.dtype)[:, None]
    n_per = np.bincount(state_id, minlength=k)
    f_k = _mbar(u_kn, jnp.asarray(n_per))
    log_denom = jax.scipy.special.logsumexp(
        jnp.log(jnp.asarray(n_per, u_n.dtype))[:, None] + f_k[:, None] - u_kn,
        axis=0,
    )
    log_w = -u_n - log_denom
    log_w = log_w - jax.scipy.special.logsumexp(log_w)
    return _align(frames), log_w


def generate_polyala_data(
    key,
    n_res: int,
    n_samples: int = 4096,
    n_chains: int = 64,
    n_equilibration: int = 2000,
    timestep: float = 5e-4,
    friction: float = 5.0,
    temperature: float = 300.0,
    align: bool = True,
    reference_xyz: Optional[np.ndarray] = None,
    dtype=jnp.float32,
    implicit_solvent: bool = False,
):
    """On-device BAOAB MD of ACE-(ALA)_n-NME, thinned and Kabsch-aligned
    (alignment on the rigid block; see ``models/ala2.py`` for why aligned
    data is load-bearing for the whitened fixed-atom channel)."""
    from ..ops.geometry import kabsch_align

    ff = build_polyala_forcefield(n_res, temperature=temperature, implicit_solvent=implicit_solvent)
    ref = polyala_reference_xyz(n_res) if reference_xyz is None else np.asarray(reference_xyz)
    n_atoms = ref.shape[0]
    _, fixed = polyala_z_matrix(n_res)
    x0 = jnp.asarray(ref, dtype=dtype).reshape(1, -1).repeat(n_chains, 0)
    key_eq, key_prod = jax.random.split(key)
    xs = baoab_run(ff, x0, key_eq, n_steps=n_equilibration, timestep=timestep, friction=friction)
    n_prod = max(1, n_samples // n_chains)
    thin = 10
    xs = baoab_run(
        ff, xs[-1], key_prod, n_steps=n_prod * thin, timestep=timestep,
        friction=friction, thin=thin,
    )
    data = xs.reshape(-1, 3 * n_atoms)[:n_samples]
    if align:
        frames = data.reshape(-1, n_atoms, 3)
        frames = kabsch_align(frames, jnp.asarray(ref, dtype=dtype), atoms=fixed)
        data = frames.reshape(-1, 3 * n_atoms)
    return data


def make_polyala_generator(
    n_res: int,
    data,
    temperature: float = 300.0,
    hidden=(128, 128),
    num_bins: int = 8,
    keepdims: int = 9,
    high_energy: float = 1e3,
    max_energy: float = 1e9,
    fixed_scale: float = 3.0,
    use_pallas_spline: bool = False,
    marginals_from: str = "forcefield",
    torsion_cross_couplings: int = 2,
    torsion_scheme: str = "even_odd",
    learnable_marginals: bool = False,
    implicit_solvent: bool = False,
    temperature_conditioning: bool = False,
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
    """Spline-coupling BG for ACE-(ALA)_n-NME (ala2-flagship architecture,
    generic over chain length).

    ``torsion_cross_couplings``: rounds of torsion-torsion couplings
    prepended to the ala2 stack.  Longer chains have several strongly
    coupled backbone dihedrals; the ala2 architecture conditions torsions
    only on the (small) whitened block and on bonds/angles, which cannot
    express torsion-torsion correlations at all.

    ``torsion_scheme``:
      * ``"even_odd"`` — alternate halves condition each other (RealNVP
        checkerboard along the torsion axis), ``torsion_cross_couplings``
        rounds.
      * ``"residue_ar"`` — residue-autoregressive: torsions grouped by the
        residue of their placed atom (z-matrix row order); group g is
        conditioned on all previous groups + FIXED, exactly the chain-rule
        factorization p(t) = prod_g p(t_g | t_<g).  One extra reverse
        even/odd round per ``torsion_cross_couplings > 1`` mixes information
        backwards.
    """
    z, fixed = polyala_z_matrix(n_res)
    crd = MixedCoordinateTransformation(
        None if statistics is not None else np.asarray(data),
        z, fixed, keepdims=keepdims, use_pallas=use_pallas_spline,
        whiten_statistics=None if statistics is None else statistics["whiten"],
    )
    ff = build_polyala_forcefield(n_res, temperature=temperature, implicit_solvent=implicit_solvent)
    target = LinLogCutEnergy(ff, high_energy=high_energy, max_energy=max_energy)
    shape_info = ShapeDictionary.from_coordinate_transform(crd)
    builder = BoltzmannGeneratorBuilder(shape_info, target=target)
    tkw = dict(use_pallas=True) if use_pallas_spline else dict()
    # temperature_conditioning: log(T) as an extra conditioner input on every
    # coupling (Coupling(temperature_feature=True)) so q(x | T) genuinely
    # depends on temperature — uniform torsion priors alone are T-independent
    ckw = dict(temperature_feature=True) if temperature_conditioning else dict()
    if torsion_cross_couplings and torsion_scheme == "even_odd":
        d_t = builder.current_dims[TORSIONS][-1]
        idx_a = np.arange(0, d_t, 2)
        idx_b = np.arange(1, d_t, 2)
        ta, tb = builder.add_split(TORSIONS, ["torsions_a", "torsions_b"], [idx_a, idx_b])
        for _ in range(torsion_cross_couplings):
            builder.add_condition(
                ta, on=(tb, FIXED), hidden=hidden, num_bins=num_bins, transformer_kwargs=tkw, **ckw
            )
            builder.add_condition(
                tb, on=(ta, FIXED), hidden=hidden, num_bins=num_bins, transformer_kwargs=tkw, **ckw
            )
        builder.add_merge((ta, tb), to=TORSIONS, sizes_or_indices=[idx_a, idx_b])
    elif torsion_cross_couplings and torsion_scheme == "residue_ar":
        # residue of each torsion's placed atom (z rows beyond the 3 seeded
        # reference atoms each contribute one torsion channel, in row order)
        def _residue_of(a):
            if a < 6:
                return 0
            if a >= 6 + 10 * n_res:
                return n_res + 1
            return 1 + (a - 6) // 10

        placed = [int(row[0]) for row in z]
        d_t = builder.current_dims[TORSIONS][-1]
        # torsion channel i corresponds to placed atom of z row i (the IC
        # transform measures one (bond, angle, torsion) triplet per row)
        res_of_torsion = np.asarray([_residue_of(placed[i]) for i in range(d_t)])
        groups = [np.nonzero(res_of_torsion == r)[0] for r in range(n_res + 2)]
        groups = [g for g in groups if len(g)]
        names = [f"torsions_res{gi}" for gi in range(len(groups))]
        fields = builder.add_split(TORSIONS, names, groups)
        for gi, f in enumerate(fields):
            on = (FIXED,) + tuple(fields[:gi])
            builder.add_condition(
                f, on=on, hidden=hidden, num_bins=num_bins, transformer_kwargs=tkw, **ckw
            )
        # reverse rounds: anti-causal even/odd mixing so early residues see
        # late ones too
        for _ in range(max(0, torsion_cross_couplings - 1)):
            for gi, f in enumerate(fields):
                on = (FIXED,) + tuple(fields[gi + 1:])
                if len(on) > 1:
                    builder.add_condition(
                        f, on=on, hidden=hidden, num_bins=num_bins, transformer_kwargs=tkw, **ckw
                    )
        builder.add_merge(fields, to=TORSIONS, sizes_or_indices=groups)
    elif torsion_cross_couplings:
        raise ValueError(f"unknown torsion_scheme {torsion_scheme!r}")
    for what, on in architecture:
        builder.add_condition(
            what, on=on, hidden=hidden, num_bins=num_bins, transformer_kwargs=tkw, **ckw
        )
    if learnable_marginals:
        # per-dof trainable marginal reshapers: with ~40 dofs per residue the
        # importance weights accumulate every small marginal mismatch the
        # couplings leave behind (ROADMAP: the ALA3 quality wall)
        from ..flows.marginal import MarginalSplineFlow

        for field in (BONDS, ANGLES, TORSIONS):
            d = builder.current_dims[field][-1]
            builder.add_layer(
                MarginalSplineFlow(d, num_bins=num_bins, is_circular=field.is_circular),
                what=(field,),
            )
    marginals = InternalCoordinateMarginals(builder.current_dims, fixed_scale=fixed_scale)
    if statistics is not None:
        # restore the exact data-derived marginal constants from a checkpoint
        # instead of refitting them (regenerated data is statistically but
        # not bit-identical; trained params pair with the ORIGINAL constants)
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
        marginals.inform_with_force_field(
            ff, crd, bond_lower=1e-3, bond_upper=1.0, angle_lower=1e-4
        )
    else:
        marginals.inform_with_data(
            jnp.asarray(data), crd, bond_lower=1e-3, bond_upper=1.0, angle_lower=1e-4
        )
    builder.add_map_to_ic_domains(marginals)
    builder.add_map_to_cartesian(crd)
    gen = builder.build_generator()
    # every data-derived constant in the model, as one checkpointable pytree
    # (save alongside params; pass back via ``statistics=`` to rebuild the
    # generator without the original dataset)
    gen.data_statistics = statistics if statistics is not None else {
        "whiten": crd.whiten_statistics,
        "bond_mu": np.asarray(marginals[BONDS].mu),
        "bond_sigma": np.asarray(marginals[BONDS].sigma),
        "angle_mu": np.asarray(marginals[ANGLES].mu),
        "angle_sigma": np.asarray(marginals[ANGLES].sigma),
    }
    return gen
