"""Force-field-informed IC marginals vs the data-informed path.

The reference's ``inform_with_force_field`` (``icmarginals.py:82-105``)
needs bgmol + an OpenMM system; here the in-repo ``ClassicalForceField``
supplies equilibrium values and force constants directly.  MD data sampled
from the same force field must produce statistically compatible marginals.
"""
import math

import pytest

import jax
import jax.numpy as jnp
import numpy as np

import bgflow_tpu as bg
from bgflow_tpu.energies.ala2 import (
    ALA2_FIXED_ATOMS,
    ALA2_Z_MATRIX,
    build_ala2_forcefield,
)
from bgflow_tpu.factory.icmarginals import InternalCoordinateMarginals
from bgflow_tpu.models.ala2 import generate_ala2_data


def _setup():
    key = jax.random.PRNGKey(0)
    data = generate_ala2_data(key, n_samples=512, n_chains=32, n_equilibration=500)
    crd = bg.MixedCoordinateTransformation(
        np.asarray(data), ALA2_Z_MATRIX, ALA2_FIXED_ATOMS, keepdims=9
    )
    builder_dims = bg.ShapeDictionary.from_coordinate_transform(crd)
    ff = build_ala2_forcefield()
    return data, crd, builder_dims, ff


@pytest.mark.slow
def test_ff_informed_matches_data_informed():
    data, crd, dims, ff = _setup()
    m_ff = InternalCoordinateMarginals(dims)
    m_ff.inform_with_force_field(ff, crd, bond_lower=1e-3, bond_upper=1.0)
    m_data = InternalCoordinateMarginals(dims)
    m_data.inform_with_data(
        jnp.asarray(data), crd, bond_lower=1e-3, bond_upper=1.0, angle_lower=1e-4
    )

    # bond means: equilibrium r0 vs MD average, must agree to a few percent
    mu_ff = np.asarray(m_ff[bg.BONDS].mu)
    mu_data = np.asarray(m_data[bg.BONDS].mu)
    assert np.max(np.abs(mu_ff - mu_data)) < 0.01  # nm

    # bond widths: equipartition sqrt(kT/k) vs MD std, same scale
    sig_ff = np.asarray(m_ff[bg.BONDS].sigma)
    sig_data = np.asarray(m_data[bg.BONDS].sigma)
    ratio = sig_data / sig_ff
    assert np.all(ratio > 0.5) and np.all(ratio < 2.0)

    # angle means in the normalized theta/pi domain
    amu_ff = np.asarray(m_ff[bg.ANGLES].mu)
    amu_data = np.asarray(m_data[bg.ANGLES].mu)
    assert np.max(np.abs(amu_ff - amu_data)) < 0.04


def test_ff_informed_values_are_equipartition():
    _, crd, dims, ff = _setup()
    m = InternalCoordinateMarginals(dims)
    m.inform_with_force_field(ff, crd)
    # first z-matrix row is atom 0 bonded to atom 1 (HH31-CH3, type HC-CT):
    # parm99 k=340 kcal/mol/A^2, r0=1.090 A
    kcal = 4.184
    k = 2.0 * 340.0 * kcal * 100.0  # our convention, kJ/mol/nm^2
    assert abs(float(m[bg.BONDS].mu[0]) - 0.109) < 1e-9
    assert abs(float(m[bg.BONDS].sigma[0]) - math.sqrt(ff.kt / k)) < 1e-9


def test_ff_informed_missing_term_raises():
    _, crd, dims, ff = _setup()
    # drop all angle terms: the informer must fail loudly, not guess
    bonded = ff.bonded._replace(
        angle_idx=jnp.zeros((0, 3), dtype=jnp.int64),
        angle_theta0=jnp.zeros(0),
        angle_k=jnp.zeros(0),
    )
    ff2 = bg.ClassicalForceField(22, bonded, ff.nonbonded)
    m = InternalCoordinateMarginals(dims)
    import pytest

    with pytest.raises(KeyError, match="angle"):
        m.inform_with_force_field(ff2, crd)


@pytest.mark.slow
def test_make_ala2_generator_with_ff_marginals():
    key = jax.random.PRNGKey(0)
    data = generate_ala2_data(key, n_samples=256, n_chains=16, n_equilibration=300)
    from bgflow_tpu.models.ala2 import make_ala2_generator
    gen = make_ala2_generator(data, marginals_from="forcefield", hidden=(16,), num_bins=4)
    params = gen.init(jax.random.PRNGKey(1))
    out = gen.sample(params, jax.random.PRNGKey(2), 32)
    assert bool(jnp.all(jnp.isfinite(out.xs[0])))
