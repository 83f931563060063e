"""Validation of the one-kernel fused sampling path (ops/sample_fused.py).

Oracle: the generator's own ``flow.forward`` applied to the same latent
uniforms (``debug_u`` mode) must reproduce x and dlogp — the fused kernel is
a reimplementation of prior -> couplings -> IC-domain maps -> whitening ->
NeRF reconstruction, so agreement here covers every stage at once.
"""
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import bgflow_tpu as bg
from bgflow_tpu.ops.sample_fused import (
    FusedSampleUnsupported,
    extract_spec,
    make_fused_sampler,
)


def _make_gen(key, use_pallas=False, fixed_scale=None):
    from bgflow_tpu.energies.ala2 import ALA2_FIXED_ATOMS, ALA2_Z_MATRIX
    from bgflow_tpu.factory.icmarginals import InternalCoordinateMarginals

    rng = np.random.RandomState(0)
    base = np.arange(22)[:, None] * np.array([[0.15, 0.1, 0.12]])
    data = (base[None] + 0.05 * rng.randn(512, 22, 3)).reshape(512, 66).astype(np.float32)
    crd = bg.MixedCoordinateTransformation(
        data, ALA2_Z_MATRIX, ALA2_FIXED_ATOMS, keepdims=15, use_pallas=use_pallas
    )
    shape_info = bg.ShapeDictionary.from_coordinate_transform(crd)
    builder = bg.BoltzmannGeneratorBuilder(shape_info)
    for what, on in [
        (bg.TORSIONS, bg.FIXED),
        (bg.FIXED, bg.TORSIONS),
        (bg.BONDS, (bg.ANGLES, bg.TORSIONS)),
        (bg.ANGLES, (bg.BONDS, bg.TORSIONS)),
        (bg.TORSIONS, (bg.BONDS, bg.ANGLES)),
        (bg.FIXED, (bg.BONDS, bg.ANGLES, bg.TORSIONS)),
    ]:
        builder.add_condition(what, on=on, hidden=(32, 32), num_bins=4,
                              compute_dtype=None)
    if fixed_scale is None:
        builder.add_map_to_ic_domains()
    else:
        builder.add_map_to_ic_domains(
            InternalCoordinateMarginals(builder.current_dims, fixed_scale=fixed_scale)
        )
    builder.add_map_to_cartesian(crd)
    gen = builder.build_generator(check_target=False)
    return gen, gen.init(key)


@pytest.fixture(scope="module")
def flagship():
    return _make_gen(jax.random.PRNGKey(0))


def test_extract_spec(flagship):
    gen, params = flagship
    spec = extract_spec(gen)
    assert spec["field_dims"] == [17, 17, 17, 15]
    assert len(spec["blocks"]) == 6
    kinds = [m["kind"] for m in spec["maps"]]
    assert kinds == ["truncnorm", "truncnorm", "uniform", "normal"]
    assert spec["mixed"]["n_total"] == 22


def _compare(gen, params, n=256, x_tol=5e-4, dlogp_tol=5e-2):
    run = make_fused_sampler(gen, lanes=n, interpret=True)
    key = jax.random.PRNGKey(7)
    u = jax.random.uniform(key, (n, 66), minval=1e-4, maxval=1.0 - 1e-4)
    x_fused, dlogp_fused = run(params, key, n, debug_u=u)
    zs = (u[:, 0:17], u[:, 17:34], u[:, 34:51], u[:, 51:66])
    xs_ref, dlogp_ref = gen.flow.forward(params, zs)
    x_ref = xs_ref[0]
    assert x_fused.shape == x_ref.shape
    err = np.max(np.abs(np.asarray(x_fused) - np.asarray(x_ref)))
    assert err < x_tol, f"coordinate mismatch: {err}"
    derr = np.max(np.abs(np.asarray(dlogp_fused) - np.asarray(dlogp_ref)))
    assert derr < dlogp_tol, f"dlogp mismatch: {derr}"
    return x_fused, dlogp_fused


def test_fused_matches_flow_forward_tight():
    """fixed_scale=1 keeps the FIXED inverse-CDF derivative O(30): every
    stage must agree with the XLA flow at f32-roundoff-amplification level."""
    gen, params = _make_gen(jax.random.PRNGKey(0), fixed_scale=1.0)
    _compare(gen, params, x_tol=1e-3, dlogp_tol=5e-2)


def test_fused_matches_flow_forward_default_marginals(flagship):
    """Default marginals (fixed_scale=20): the FIXED icdf derivative is
    sigma/phi(t) ~ 750 near the clip bounds, so f32 differences in the
    coupling outputs (~1e-5) legitimately amplify to ~1e-2 in coordinates —
    both implementations are f32-correct; the tolerance reflects the
    conditioning, not implementation error (see test above for the tight
    gate)."""
    gen, params = flagship
    _compare(gen, params, x_tol=3e-2, dlogp_tol=5e-2)


def test_fused_dlogp_inverse_consistency(flagship):
    """Flow-inverse round trip: for fused samples x with fused dlogp, the
    XLA inverse flow must satisfy dlogp_fwd = -dlogp_inv(x) — an
    end-to-end check of the fused log-det that is immune to the icdf tail
    amplification (it evaluates the inverse AT the fused samples)."""
    gen, params = flagship
    n = 256
    run = make_fused_sampler(gen, lanes=n, interpret=True)
    key = jax.random.PRNGKey(11)
    u = jax.random.uniform(key, (n, 66), minval=5e-3, maxval=1.0 - 5e-3)
    x_fused, dlogp_fused = run(params, key, n, debug_u=u)
    _, dlogp_inv = gen.flow.forward(params, (x_fused,), inverse=True)
    resid = np.asarray(dlogp_fused) + np.asarray(dlogp_inv)
    assert np.max(np.abs(resid)) < 0.1, f"dlogp round trip: {np.abs(resid).max()}"


def test_fused_prng_mode_runs(flagship):
    """Hardware-PRNG mode needs a real TPU; on CPU interpret it must either
    run or raise cleanly — here we only check the debug/TPU gate logic."""
    gen, params = flagship
    if jax.default_backend() != "tpu":
        pytest.skip("hardware PRNG path needs a TPU")
    run = make_fused_sampler(gen, lanes=256)
    x, dlogp = run(params, jax.random.PRNGKey(3), 512)
    assert np.isfinite(np.asarray(x)).all()
    assert np.isfinite(np.asarray(dlogp)).all()


def test_unsupported_generator_raises():
    """A generator outside the fused coverage must raise, not mis-sample."""
    energy = bg.DoubleWellEnergy(dim=2)
    prior = bg.NormalDistribution(2)
    flow = bg.Chain([])
    gen = bg.BoltzmannGenerator(prior, flow, energy)
    with pytest.raises(FusedSampleUnsupported):
        extract_spec(gen)
