"""GNN conditioner: invariance and builder integration."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bgflow_tpu as bg
from bgflow_tpu.nets.gnn import InvariantGNN
from tests.test_ic import ALA2_FIXED, ALA2_Z_MATRIX, _random_ala2_xyz
from tests.conftest import assert_close


def test_gnn_e3_invariance(key):
    gnn = InvariantGNN(n_atoms=5, dim_out=8)
    params = gnn.init(key)
    x = jax.random.normal(key, (3, 15))
    y = gnn.apply(params, x)
    assert y.shape == (3, 8)
    # translation invariance
    shift = jnp.tile(jnp.asarray([0.3, -0.2, 0.5]), 5)
    assert_close(gnn.apply(params, x + shift), y, 1e-5)
    # rotation invariance
    theta = 0.7
    rot = jnp.asarray([
        [jnp.cos(theta), -jnp.sin(theta), 0.0],
        [jnp.sin(theta), jnp.cos(theta), 0.0],
        [0.0, 0.0, 1.0],
    ])
    xr = (x.reshape(3, 5, 3) @ rot.T).reshape(3, 15)
    assert_close(gnn.apply(params, xr), y, 1e-5)
    # permutation invariance (readout is a mean over atoms)
    perm = np.array([2, 0, 4, 1, 3])
    xp = x.reshape(3, 5, 3)[:, perm].reshape(3, 15)
    assert_close(gnn.apply(params, xp), y, 1e-5)


def test_gnn_conditioner_in_builder(key):
    data = np.asarray(_random_ala2_xyz(jax.random.PRNGKey(42), 128, jnp.float64))
    crd = bg.MixedCoordinateTransformation(data, ALA2_Z_MATRIX, ALA2_FIXED, keepdims=15)
    shape_info = bg.ShapeDictionary.from_coordinate_transform(crd)
    builder = bg.BoltzmannGeneratorBuilder(shape_info)
    # condition torsions on the (cartesian) fixed-atom channel via the GNN
    builder.add_condition(
        bg.TORSIONS, on=bg.FIXED, conditioner_type="GNN",
        hidden=(32,), gnn_features=8, gnn_layers=1, gnn_out=16,
    )
    builder.add_condition(bg.BONDS, on=bg.TORSIONS, hidden=(32,))
    gen = builder.build_generator(check_target=False)
    params = gen.init(key)
    out = gen.sample(params, key, 5, with_dlogp=True)
    assert all(jnp.all(jnp.isfinite(x)) for x in out.xs)
    assert jnp.all(jnp.isfinite(out.dlogp))
    # inverse consistency
    zs, neg_dlogp = gen.flow.forward(params, out.xs, inverse=True)
    xs2, dlogp2 = gen.flow.forward(params, zs)
    for a, b in zip(out.xs, xs2):
        assert_close(a, b, 1e-4)
