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


def test_gnn_attention_readout_invariance(key):
    """MHA readout preserves E(3) and permutation invariance of the pooled
    embedding (the reference's optional Transformer head, GNN_factory)."""
    gnn = InvariantGNN(n_atoms=6, dim_out=8, n_features=32, attention_heads=4)
    params = gnn.init(key)
    x = jax.random.normal(key, (3, 18))
    y = gnn.apply(params, x)
    shift = jnp.tile(jnp.asarray([0.1, 0.2, -0.4]), 6)
    assert_close(gnn.apply(params, x + shift), y, 1e-5)
    theta = 1.1
    rot = jnp.asarray([
        [jnp.cos(theta), 0.0, -jnp.sin(theta)],
        [0.0, 1.0, 0.0],
        [jnp.sin(theta), 0.0, jnp.cos(theta)],
    ])
    xr = (x.reshape(3, 6, 3) @ rot.T).reshape(3, 18)
    assert_close(gnn.apply(params, xr), y, 1e-5)
    # permutation invariance of the mean-pooled readout
    perm = np.array([3, 1, 5, 0, 4, 2])
    xp = x.reshape(3, 6, 3)[:, perm].reshape(3, 18)
    assert_close(gnn.apply(params, xp), y, 1e-5)
    # attention params actually contribute
    assert "attn" in params


@pytest.mark.slow
def test_gnn_shared_trunk_affine_coupling(key):
    """With a GNN conditioner on an affine coupling, the builder merges
    shift/scale heads into ONE net (single trunk evaluation, shared params)."""
    from bgflow_tpu.factory.registries import make_conditioners
    from bgflow_tpu.nets.gnn import GNNConditioner

    data = np.asarray(_random_ala2_xyz(jax.random.PRNGKey(42), 128, jnp.float64))
    crd = bg.MixedCoordinateTransformation(data, ALA2_Z_MATRIX, ALA2_FIXED, keepdims=15)
    info = bg.ShapeDictionary.from_coordinate_transform(crd)
    conds = make_conditioners(
        bg.AffineTransformer,
        what=(bg.BONDS,),
        on=(bg.FIXED,),
        shape_info=info,
        conditioner_type="GNN",
    )
    # merged: one params_net (not shift_net + scale_net), scaling preserved
    assert set(conds) == {"params_net", "use_scaling"}
    assert conds["use_scaling"] is True
    assert isinstance(conds["params_net"], GNNConditioner)
    assert conds["params_net"].head.dim_out == 2 * info[bg.BONDS][0]

    # and it builds + runs end-to-end through the builder
    builder = bg.BoltzmannGeneratorBuilder(info)
    builder.default_transformer_type = bg.AffineTransformer
    builder.add_condition(bg.BONDS, on=bg.FIXED, conditioner_type="GNN")
    builder.add_map_to_ic_domains()
    builder.add_map_to_cartesian(crd)
    gen = builder.build_generator(check_target=False)
    params = gen.init(key)
    out = gen.sample(params, jax.random.PRNGKey(1), 8)
    assert bool(jnp.all(jnp.isfinite(out.xs[0])))


def test_equivariant_gnn_invariance_and_signal(key):
    """EquivariantGNN (PaiNN-style scalar+vector channels): readout is
    E(3)-invariant, internal vector features carry geometric signal."""
    from bgflow_tpu.nets.gnn import EquivariantGNN

    gnn = EquivariantGNN(n_atoms=5, dim_out=8, n_features=16, n_layers=2)
    params = gnn.init(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (7, 15))
    y = gnn.apply(params, x)
    assert y.shape == (7, 8)
    assert bool(jnp.all(jnp.isfinite(y)))

    # translation invariance
    shift = jnp.tile(jnp.asarray([0.3, -0.1, 0.7]), 5)
    assert_close(gnn.apply(params, x + shift), y, 1e-5)

    # rotation invariance of the readout
    import numpy as np

    theta = 0.7
    R = np.array(
        [[np.cos(theta), -np.sin(theta), 0.0],
         [np.sin(theta), np.cos(theta), 0.0],
         [0.0, 0.0, 1.0]]
    )
    xr = (x.reshape(7, 5, 3) @ R.T).reshape(7, 15)
    assert_close(gnn.apply(params, xr), y, 1e-5)

    # permutation invariance of the pooled readout
    perm = np.array([2, 0, 4, 1, 3])
    xp = x.reshape(7, 5, 3)[:, perm].reshape(7, 15)
    assert_close(gnn.apply(params, xp), y, 1e-5)

    # the vector channel must actually contribute: zeroing the direction
    # pathway (third filter chunk) changes the output
    import jax as _jax

    p2 = _jax.tree_util.tree_map(lambda a: a, params)
    p2["msg_filter"] = [
        [{**layer[0], "w": layer[0]["w"].at[:, 2 * gnn.n_features :].set(0.0),
          "b": layer[0]["b"].at[2 * gnn.n_features :].set(0.0)}]
        for layer in params["msg_filter"]
    ]
    y2 = gnn.apply(p2, x)
    assert float(jnp.max(jnp.abs(y2 - y))) > 1e-4


def test_equivariant_gnn_internal_equivariance(key):
    """Internal vector features rotate with the input frame."""
    from bgflow_tpu.nets.gnn import EquivariantGNN
    import numpy as np

    gnn = EquivariantGNN(n_atoms=4, dim_out=4, n_features=8, n_layers=1)
    params = gnn.init(key)
    x = jax.random.normal(jax.random.PRNGKey(3), (3, 12))
    h = gnn.node_features(params, x)  # invariant features -> rotation fixed
    theta = 1.1
    R = np.array(
        [[1.0, 0.0, 0.0],
         [0.0, np.cos(theta), -np.sin(theta)],
         [0.0, np.sin(theta), np.cos(theta)]]
    )
    xr = (x.reshape(3, 4, 3) @ R.T).reshape(3, 12)
    hr = gnn.node_features(params, xr)
    assert_close(hr, h, 1e-5)


def test_equivariant_conditioner_in_builder(key):
    """gnn_type='equivariant' flows through the conditioner factory."""
    from bgflow_tpu.nets.gnn import GNNConditioner

    cond = GNNConditioner(
        6,
        circular_indices=np.array([], dtype=int),
        cartesian_indices=np.arange(12),
        other_indices=np.array([12, 13]),
        hidden=(16,),
        gnn_features=8,
        gnn_layers=1,
        gnn_out=8,
        gnn_type="equivariant",
    )
    params = cond.init(key)
    x = jax.random.normal(jax.random.PRNGKey(5), (9, 14))
    out = cond.apply(params, x)
    assert out.shape == (9, 6)
    g = jax.grad(lambda p: jnp.sum(cond.apply(p, x) ** 2))(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(a))) for a in flat)


def test_l2_gnn_invariance_and_l2_signal(key):
    """EquivariantGNNL2: the readout is exactly E(3)-invariant, and the
    l=2 tensor paths carry real signal (outputs change when they are cut),
    i.e. the net is in the nequip/allegro capability class rather than a
    reparametrized l<=1 net."""
    from bgflow_tpu.nets.gnn import EquivariantGNNL2

    gnn = EquivariantGNNL2(n_atoms=6, dim_out=8, n_features=16, n_layers=2)
    params = gnn.init(key)
    x = jax.random.normal(key, (3, 18))
    y = gnn.apply(params, x)
    assert y.shape == (3, 8) and bool(jnp.all(jnp.isfinite(y)))
    # translation invariance
    shift = jnp.tile(jnp.asarray([0.3, -0.1, 0.2]), 6)
    assert_close(gnn.apply(params, x + shift), y, 1e-5)
    # rotation invariance (proper rotation about a generic axis)
    theta = 0.9
    rot = jnp.asarray([
        [jnp.cos(theta), -jnp.sin(theta), 0.0],
        [jnp.sin(theta), jnp.cos(theta), 0.0],
        [0.0, 0.0, 1.0],
    ])
    xr = (x.reshape(3, 6, 3) @ rot.T).reshape(3, 18)
    assert_close(gnn.apply(params, xr), y, 1e-5)
    # reflection invariance (O(3), not just SO(3): all paths are even)
    xm = (x.reshape(3, 6, 3) * jnp.asarray([-1.0, 1.0, 1.0])).reshape(3, 18)
    assert_close(gnn.apply(params, xm), y, 1e-5)
    # permutation invariance of the pooled readout
    perm = np.array([4, 0, 5, 2, 1, 3])
    xp = x.reshape(3, 6, 3)[:, perm].reshape(3, 18)
    assert_close(gnn.apply(params, xp), y, 1e-5)

    # the l=2 paths contribute: zero the tensor-channel gates (g_st, g_vt,
    # g_tt, g_td, g_tv live in blocks 2, 5, 6, 7, 8 of the 9F filter
    # output) and the output must change
    import jax.tree_util as jtu

    f = gnn.n_features
    cut = jtu.tree_map(lambda a: a, params)
    for li in range(gnn.n_layers):
        w = cut["msg_filter"][li][-1]["w"]
        b = cut["msg_filter"][li][-1]["b"]
        m = np.ones(9 * f)
        for blk in (2, 5, 6, 7, 8):
            m[blk * f:(blk + 1) * f] = 0.0
        cut["msg_filter"][li][-1]["w"] = w * m[None, :]
        cut["msg_filter"][li][-1]["b"] = b * m
    y_cut = gnn.apply(cut, x)
    assert float(jnp.max(jnp.abs(y_cut - y))) > 1e-4


def test_l2_gnn_internal_tensor_equivariance(key):
    """The internal l=1/l=2 channels transform correctly: node_features
    (invariants built from them) match under rotation even when vectors and
    tensors are nonzero after several layers — plus the Bessel/Gaussian
    radial bases give different (finite) nets."""
    from bgflow_tpu.nets.gnn import EquivariantGNNL2

    for basis in ("bessel", "gaussian"):
        gnn = EquivariantGNNL2(
            n_atoms=5, dim_out=4, n_features=8, n_layers=3, radial_basis=basis
        )
        params = gnn.init(key)
        x = 0.4 * jax.random.normal(jax.random.fold_in(key, 1), (2, 15))
        h = gnn.node_features(params, x)
        theta = 1.3
        rot = jnp.asarray([
            [1.0, 0.0, 0.0],
            [0.0, jnp.cos(theta), -jnp.sin(theta)],
            [0.0, jnp.sin(theta), jnp.cos(theta)],
        ])
        xr = (x.reshape(2, 5, 3) @ rot.T).reshape(2, 15)
        assert_close(gnn.node_features(params, xr), h, 1e-5)


def test_l2_gnn_conditioner_in_builder(key):
    data = np.asarray(_random_ala2_xyz(jax.random.PRNGKey(42), 128, jnp.float64))
    crd = bg.MixedCoordinateTransformation(data, ALA2_Z_MATRIX, ALA2_FIXED, keepdims=15)
    shape_info = bg.ShapeDictionary.from_coordinate_transform(crd)
    builder = bg.BoltzmannGeneratorBuilder(shape_info)
    builder.add_condition(
        bg.TORSIONS, on=bg.FIXED, conditioner_type="GNN", gnn_type="l2",
        hidden=(32,), gnn_features=8, gnn_layers=1, gnn_out=16,
    )
    gen = builder.build_generator(check_target=False)
    params = gen.init(key)
    out = gen.sample(params, key, 4, with_dlogp=True)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in out.xs)
    zs, _ = gen.flow.forward(params, out.xs, inverse=True)
    xs2, _ = gen.flow.forward(params, zs)
    for a, b in zip(out.xs, xs2):
        assert_close(a, b, 1e-4)
