"""End-to-end training slice: README-parity double-well BG.

Reference anchor: ``README.md:54-96`` (2-D double well + RealNVP coupling +
Normal prior, mixed NLL/KL training).
"""
import pytest
import jax
import jax.numpy as jnp
import optax

import bgflow_tpu as bg


def make_realnvp_bg(key, dim=2, hidden=32, n_blocks=4):
    prior = bg.NormalDistribution(dim)
    target = bg.DoubleWellEnergy(dim)
    d1, d2 = dim // 2, dim - dim // 2
    blocks = [bg.Split(d1, axis=-1)]
    for i in range(n_blocks):
        din, dout = (d1, d2) if i % 2 == 0 else (d2, d1)
        shift = bg.DenseNet([din, hidden, hidden, dout], activation=jax.nn.silu)
        scale = bg.DenseNet([din, hidden, hidden, dout], activation=jax.nn.silu)
        blocks.append(bg.Coupling(bg.AffineTransformer(shift, scale)))
        blocks.append(bg.Swap())
    blocks.append(bg.Merge(d1, axis=-1))
    flow = bg.Chain(blocks)
    gen = bg.BoltzmannGenerator(prior, flow, target)
    return gen, gen.init(key)


def test_kl_training_reduces_loss(key):
    gen, params = make_realnvp_bg(key)
    trainer = bg.KLTrainer(gen, optimizer=optax.adam(2e-3), train_likelihood=False)
    step = trainer.make_train_step(batchsize_energy=256)
    opt_state = trainer.init(params)
    losses = []
    for i in range(120):
        key, sub = jax.random.split(key)
        params, opt_state, metrics = step(params, opt_state, sub)
        losses.append(float(metrics["loss"]))
    # reverse KL decreases substantially
    assert sum(losses[-20:]) / 20 < sum(losses[:20]) / 20 - 0.3


def test_mixed_training_with_data(key):
    gen, params = make_realnvp_bg(key)
    # "data": samples from the two wells
    key_d, key = jax.random.split(key)
    n = 2048
    wells = jnp.where(jax.random.bernoulli(key_d, shape=(n, 1)), 1.4, -1.4)
    x = jnp.concatenate([
        wells + 0.2 * jax.random.normal(key_d, (n, 1)),
        jax.random.normal(key, (n, 1)),
    ], axis=-1)
    data = bg.DataSetSampler(x)
    trainer = bg.KLTrainer(gen)
    params, opt_state, reporter = trainer.train(
        params, key, n_iter=60, data=data, batchsize=128, w_energy=0.5, w_likelihood=0.5,
    )
    assert len(reporter) == 60
    assert jnp.isfinite(reporter.recent()[0])


@pytest.mark.slow
def test_trained_bg_covers_both_wells(key):
    gen, params = make_realnvp_bg(key)
    trainer = bg.KLTrainer(gen, train_likelihood=False, optimizer=optax.adam(3e-3))
    step = trainer.make_train_step(batchsize_energy=512)
    opt_state = trainer.init(params)
    for _ in range(250):
        key, sub = jax.random.split(key)
        params, opt_state, _ = step(params, opt_state, sub)
    out = gen.sample(params, jax.random.PRNGKey(123), 4000, with_log_weights=True)
    ess = bg.effective_sample_size(out.log_weights)
    # a trained flow should reweight decently on this toy target
    assert ess > 400  # >10% efficiency
    # (mode coverage of both wells is not guaranteed for pure reverse-KL
    #  training; ESS is the meaningful check here)


def test_logvar_finetune_raises_ess(key):
    """Log-variance fine-tune: after an NLL pretrain on well data, adding the
    Var[log w] term (reparametrized model samples) shrinks the log-weight
    variance and raises reweighting ESS — the overdispersion fix that reverse
    KL can't deliver without mode collapse."""
    gen, params = make_realnvp_bg(key)
    key_d, key = jax.random.split(key)
    n = 4096
    wells = jnp.where(jax.random.bernoulli(key_d, shape=(n, 1)), 1.4, -1.4)
    x = jnp.concatenate([
        wells + 0.2 * jax.random.normal(key_d, (n, 1)),
        jax.random.normal(key, (n, 1)),
    ], axis=-1)
    data = bg.DataSetSampler(x)
    pre = bg.KLTrainer(gen, train_energy=False, optimizer=optax.adam(2e-3))
    params, opt_state, _ = pre.train(params, key, n_iter=150, data=data, batchsize=256)

    def ess_of(p):
        out = gen.sample(p, jax.random.PRNGKey(99), 4000, with_log_weights=True)
        return float(bg.effective_sample_size(out.log_weights))

    ess_pre = ess_of(params)
    ft = bg.KLTrainer(
        gen, train_energy=False, train_logvar=True, optimizer=optax.adam(5e-4)
    )
    step = ft.make_train_step(
        batchsize_likelihood=256, batchsize_logvar=256, w_logvar=0.05
    )
    opt2 = ft.init(params)
    for _ in range(120):
        key, kb, ks = jax.random.split(key, 3)
        batch = (data.sample(kb, 256),)
        params, opt2, metrics = step(params, opt2, ks, batch, 0)
    assert jnp.isfinite(metrics["logvar"])
    ess_post = ess_of(params)
    assert ess_post > ess_pre * 1.1


def test_nan_guard_skips_step(key):
    gen, params = make_realnvp_bg(key)

    class NaNTrainer(bg.KLTrainer):
        def loss(self, params, key, **kw):
            l, m = super().loss(params, key, **kw)
            return l + jnp.nan, m

    trainer = NaNTrainer(gen, train_likelihood=False)
    step = trainer.make_train_step(batchsize_energy=32)
    opt_state = trainer.init(params)
    new_params, _, metrics = step(params, opt_state, key)
    assert bool(metrics["skipped"])
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(new_params)):
        assert jnp.all(a == b)


def test_schedule_annealing_traced(key):
    """w_energy/temperature schedules are functions of the step counter,
    evaluated inside the one compiled step (no retrace per iteration)."""
    import optax

    gen, params = make_realnvp_bg(key)
    trainer = bg.KLTrainer(gen, train_likelihood=False)
    w_sched = optax.linear_schedule(0.0, 1.0, transition_steps=10)
    t_sched = lambda step: 2.0 - jnp.minimum(step, 10) / 10.0
    step = trainer.make_train_step(
        batchsize_energy=64, w_energy=w_sched, temperature=t_sched
    )
    opt_state = trainer.init(params)
    # at step 0 the KL weight is 0 -> the update must be a no-op
    p0, _, m0 = step(params, opt_state, key, None, jnp.asarray(0, jnp.int32))
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p0)):
        assert jnp.all(jnp.abs(a - b) < 1e-12)
    # at step 10 the weight is 1 -> parameters move
    p1, _, m1 = step(params, opt_state, key, None, jnp.asarray(10, jnp.int32))
    moved = any(
        bool(jnp.any(jnp.abs(a - b) > 0))
        for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p1))
    )
    assert moved


def test_train_with_test_nll_and_checkpoint(key, tmp_path):
    """held-out NLL tracking + orbax checkpointing wired into train()."""
    from bgflow_tpu.utils.checkpoint import restore_checkpoint

    gen, params = make_realnvp_bg(key)
    data = bg.DataSetSampler(jax.random.normal(key, (256, 2)) + 1.4)
    test = jax.random.normal(jax.random.PRNGKey(7), (64, 2)) + 1.4
    trainer = bg.KLTrainer(gen, train_energy=False)
    ckpt = str(tmp_path / "ckpt")
    params, opt_state, reporter = trainer.train(
        params,
        key,
        n_iter=12,
        data=data,
        batchsize=64,
        test_data=test,
        test_interval=4,
        checkpoint_dir=ckpt,
        checkpoint_interval=6,
    )
    losses = reporter.losses()
    assert len(losses) == 2  # loss + test_nll tracks
    import numpy as np

    assert np.isfinite(losses[1][-1])
    restored = restore_checkpoint(ckpt)
    assert restored["step"] == 12
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(restored["params"])
    ):
        assert jnp.allclose(jnp.asarray(a), jnp.asarray(b))


def test_train_scan_on_device_loop(key):
    """make_train_scan runs the whole loop in one executable and trains."""
    gen, params = make_realnvp_bg(key)
    data = bg.DataSetSampler(jax.random.normal(key, (256, 2)) + 1.4)
    trainer = bg.KLTrainer(gen, train_energy=False)
    run = trainer.make_train_scan(n_steps=40, batchsize_likelihood=64)
    opt_state = trainer.init(params)
    p2, o2, metrics = run(params, opt_state, key, data.data, None, 0)
    losses = metrics["loss"]
    assert losses.shape == (40,)
    assert bool(jnp.all(jnp.isfinite(losses)))
    # NLL should decrease over the scanned window
    assert float(jnp.mean(losses[-10:])) < float(jnp.mean(losses[:10]))
    # weighted draws path (categorical) also runs
    lw = jnp.zeros((256,))
    _, _, m2 = run(params, opt_state, key, data.data, lw, 0)
    assert bool(jnp.all(jnp.isfinite(m2["loss"])))


def test_train_scan_chunk_matches_schedules(key, tmp_path):
    """train(scan_chunk=...) chunks on device, keeps step-driven schedules
    advancing across chunk boundaries, and checkpoints at the end."""
    from bgflow_tpu.utils.checkpoint import restore_checkpoint

    gen, params = make_realnvp_bg(key)
    data = bg.DataSetSampler(jax.random.normal(key, (256, 2)) + 1.4)
    trainer = bg.KLTrainer(gen, train_energy=False)
    seen = []

    def w_sched(step):
        # record trace-time only; values flow through traced steps
        return 1.0 + 0.0 * step

    ckpt = str(tmp_path / "ckpt")
    params2, opt_state, reporter = trainer.train(
        params,
        key,
        n_iter=25,
        data=data,
        batchsize=64,
        w_likelihood=w_sched,
        scan_chunk=10,
        checkpoint_dir=ckpt,
    )
    losses = reporter.losses()[0]
    assert len(losses) == 25
    import numpy as np

    assert np.all(np.isfinite(losses))
    assert restore_checkpoint(ckpt)["step"] == 25
