"""Builder DSL integration tests.

Mirrors the reference's ``tests/factory/test_generator_builder.py:21-43``:
build a full generator for an alanine-dipeptide-like topology (mixed and
global IC transforms), sample, compute energies, round-trip.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bgflow_tpu as bg
from tests.test_ic import ALA2_FIXED, ALA2_Z_MATRIX, _random_ala2_xyz
from tests.conftest import assert_close


def _mixed_transform(dtype=jnp.float64):
    data = np.asarray(_random_ala2_xyz(jax.random.PRNGKey(42), 200, jnp.float64))
    return bg.MixedCoordinateTransformation(data, ALA2_Z_MATRIX, ALA2_FIXED, keepdims=15)


def test_builder_shape_dictionary():
    crd = _mixed_transform()
    info = bg.ShapeDictionary.from_coordinate_transform(crd)
    assert info[bg.BONDS] == (17,)
    assert info[bg.ANGLES] == (17,)
    assert info[bg.TORSIONS] == (17,)
    assert info[bg.FIXED] == (15,)
    assert info.dim_all() == 66
    assert info.dim_circular() == 17
    assert len(info.circular_indices()) == 17


def test_builder_split_merge_bookkeeping():
    info = bg.ShapeDictionary()
    info[bg.BONDS] = (10,)
    info[bg.ANGLES] = (20,)
    builder = bg.BoltzmannGeneratorBuilder(info)
    s1 = bg.TensorInfo("SPLIT_1")
    s2 = bg.TensorInfo("SPLIT_2")
    builder.add_split(bg.ANGLES, (s1, s2), (8, 12))
    assert builder.current_dims[s1] == (8,)
    assert builder.current_dims[s2] == (12,)
    builder.add_condition(s1, on=s2)
    builder.add_condition(bg.BONDS, on=s1)
    builder.add_merge((s1, s2), to=bg.ANGLES)
    gen = builder.build_generator(check_target=False)
    params = gen.init(jax.random.PRNGKey(0))
    out = gen.sample(params, jax.random.PRNGKey(1), 11)
    assert out.xs[0].shape == (11, 10)
    assert out.xs[1].shape == (11, 20)


@pytest.mark.slow
def test_builder_ala2_mixed_end_to_end(key):
    crd = _mixed_transform()
    shape_info = bg.ShapeDictionary.from_coordinate_transform(crd)
    target = bg.MultiDoubleWellPotential(66, 22, a=1.0, b=-2.0, c=0.5, offset=2.0, two_event_dims=False)
    builder = bg.BoltzmannGeneratorBuilder(shape_info, target=target)

    builder.add_condition(bg.TORSIONS, on=bg.FIXED)
    builder.add_condition(bg.FIXED, on=bg.TORSIONS)
    builder.add_condition(bg.BONDS, on=(bg.ANGLES, bg.TORSIONS))
    builder.add_condition(bg.ANGLES, on=bg.TORSIONS)
    builder.add_map_to_ic_domains()
    builder.add_map_to_cartesian(crd)
    gen = builder.build_generator()
    params = gen.init(key)

    out = gen.sample(params, key, 7, with_dlogp=True)
    x = out.xs[0]
    assert x.shape == (7, 66)
    assert jnp.all(jnp.isfinite(x))
    assert jnp.all(jnp.isfinite(out.dlogp))

    # NLL through the inverse path
    nll = gen.energy(params, x)
    assert nll.shape == (7,)
    assert jnp.all(jnp.isfinite(nll))

    # kldiv end to end
    kld = gen.kldiv(params, key, 7)
    assert jnp.all(jnp.isfinite(kld))

    # inverse(forward(z)) consistency: x -> latent -> x
    zs, neg_dlogp = gen.flow.forward(params, (x,), inverse=True)
    x2s, dlogp = gen.flow.forward(params, zs)
    assert_close(x, x2s[0], 1e-4)
    assert_close(dlogp, -neg_dlogp, 1e-4)


@pytest.mark.slow
def test_builder_ala2_global_end_to_end(key):
    zm = np.vstack([
        ALA2_Z_MATRIX,
        [[9, 8, 6, 14], [10, 8, 9, 6], [6, -1, -1, -1], [8, 6, -1, -1], [14, 8, 6, -1]],
    ])
    crd = bg.GlobalInternalCoordinateTransformation(zm)
    shape_info = bg.ShapeDictionary.from_coordinate_transform(crd)
    assert bg.FIXED not in shape_info
    builder = bg.BoltzmannGeneratorBuilder(shape_info)
    builder.add_condition(bg.TORSIONS, on=(bg.BONDS, bg.ANGLES))
    builder.add_condition(bg.BONDS, on=bg.ANGLES)
    builder.add_map_to_ic_domains()
    builder.add_map_to_cartesian(crd)
    gen = builder.build_generator(check_target=False)
    params = gen.init(key)
    out = gen.sample(params, key, 5, with_dlogp=True)
    x = out.xs[0]
    assert x.shape == (5, 66)
    assert jnp.all(jnp.isfinite(x))
    # origin is fixed at zero: first global atom (atom 6) sits at origin
    xr = x.reshape(5, 22, 3)
    assert_close(xr[:, 6], jnp.zeros((5, 3)), 1e-6)


def test_builder_constraints_and_augmentation(key):
    info = bg.ShapeDictionary()
    info[bg.BONDS] = (8,)
    info[bg.TORSIONS] = (5,)
    builder = bg.BoltzmannGeneratorBuilder(info)
    builder.add_condition(bg.BONDS, on=bg.TORSIONS)
    builder.add_torsion_shifts(jnp.asarray(0.25))
    builder.add_constrain_chirality([1, 2])
    # merge two constrained bonds back in
    builder.add_merge_constraints([0, 5], jnp.asarray([1.0, 2.0]))
    assert builder.current_dims[bg.BONDS] == (10,)
    gen = builder.build_generator(check_target=False)
    params = gen.init(key)
    out = gen.sample(params, key, 9, with_dlogp=True)
    bonds, torsions = out.xs
    assert bonds.shape == (9, 10)
    assert_close(bonds[:, 0], jnp.ones(9), 1e-6)
    assert_close(bonds[:, 5], 2.0 * jnp.ones(9), 1e-6)
    # chirality: torsions 1,2 in [0.5, 1]
    assert jnp.all(torsions[:, 1:3] >= 0.5)
    assert jnp.all(torsions[:, 1:3] <= 1.0)


def test_zero_params_identity(key):
    info = bg.ShapeDictionary()
    info[bg.BONDS] = (4,)
    info[bg.ANGLES] = (6,)
    builder = bg.BoltzmannGeneratorBuilder(info)
    builder.add_condition(bg.BONDS, on=bg.ANGLES)
    gen = builder.build_generator(check_target=False)
    params = bg.zero_params(gen.init(key))
    z = (jnp.linspace(0.1, 0.9, 4)[None].repeat(3, 0), jnp.linspace(0.2, 0.8, 6)[None].repeat(3, 0))
    ys, ldj = gen.flow.forward(params, z)
    # spline with zero params is the identity
    assert_close(ys[0], z[0], 1e-6)
    assert_close(ldj, jnp.zeros(3), 1e-6)


def test_builder_with_smooth_transformer(key):
    from bgflow_tpu.transformers.smooth import SmoothSigmoidTransformer

    info = bg.ShapeDictionary()
    info[bg.BONDS] = (4,)
    info[bg.TORSIONS] = (6,)
    builder = bg.BoltzmannGeneratorBuilder(info)
    builder.add_condition(
        bg.BONDS, on=bg.TORSIONS,
        transformer_type=SmoothSigmoidTransformer,
        transformer_kwargs=dict(n_components=4),
        n_components=4, hidden=(32,),
    )
    gen = builder.build_generator(check_target=False)
    params = gen.init(key)
    out = gen.sample(params, key, 9, with_dlogp=True)
    assert out.xs[0].shape == (9, 4)
    assert jnp.all((out.xs[0] >= 0) & (out.xs[0] <= 1))
    zs, neg_dlogp = gen.flow.forward(params, out.xs, inverse=True)
    xs2, dlogp = gen.flow.forward(params, zs)
    assert_close(out.xs[0], xs2[0], 1e-4)
