"""Free-energy estimators, umbrella sampling, checkpointing, profiling."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bgflow_tpu as bg
from bgflow_tpu.samplers.umbrella import UmbrellaSampling
from bgflow_tpu.utils.checkpoint import latest_step, restore_checkpoint, save_checkpoint
from bgflow_tpu.utils.free_energy import bennett_acceptance_ratio, mbar, one_sided_reweighting
from bgflow_tpu.utils.profiling import Timer, scope
from tests.conftest import assert_close


def _gaussian_work_samples(key, delta_f=2.0, n=20000):
    """Two 1D Gaussians: u0 = x^2/2, u1 = (x-mu)^2/2 + delta_f (exact DF)."""
    mu = 1.0
    k0, k1 = jax.random.split(key)
    x0 = jax.random.normal(k0, (n,))
    x1 = mu + jax.random.normal(k1, (n,))
    u0 = lambda x: 0.5 * x**2
    u1 = lambda x: 0.5 * (x - mu) ** 2 + delta_f
    forward_work = u1(x0) - u0(x0)
    reverse_work = u0(x1) - u1(x1)
    return forward_work, reverse_work


def test_bar_recovers_exact_free_energy(key):
    fw, rw = _gaussian_work_samples(key, delta_f=2.0)
    df, ddf = bennett_acceptance_ratio(fw, rw)
    assert_close(df, 2.0, 3e-2)
    assert 0 < float(ddf) < 0.1


def test_bar_matches_one_sided_in_easy_case(key):
    fw, rw = _gaussian_work_samples(key, delta_f=0.5)
    df, _ = bennett_acceptance_ratio(fw, rw)
    df_fwd = one_sided_reweighting(fw)
    assert_close(df, df_fwd, 0.05)


def test_mbar_recovers_gaussian_ladder(key):
    """K shifted Gaussians with known free energies (all equal ~ 0)."""
    k_states = 4
    n = 5000
    mus = jnp.linspace(0, 1.5, k_states)
    offsets = jnp.asarray([0.0, 1.0, 2.0, 3.0])  # known f_k
    keys = jax.random.split(key, k_states)
    samples = jnp.concatenate([mus[i] + jax.random.normal(keys[i], (n,)) for i in range(k_states)])
    u_kn = 0.5 * (samples[None, :] - mus[:, None]) ** 2 + offsets[:, None]
    f_k = mbar(u_kn, jnp.full(k_states, n))
    assert_close(f_k, offsets - offsets[0], 5e-2)


def test_umbrella_sampling_double_well(key):
    """Umbrella windows along x of a 2D double well; MBAR PMF shows both
    wells lower than the barrier."""
    target = bg.DoubleWellEnergy(2)
    centers = jnp.linspace(-2.0, 2.0, 11)
    cv = lambda x: x[:, 0]
    us = UmbrellaSampling(target, cv, centers, k_umbrella=20.0, noise_std=0.25,
                          stride=5, n_burnin=100)
    x0 = jnp.stack([centers, jnp.zeros_like(centers)], axis=-1)
    samples = us.run(key, x0, n_iterations=400)
    assert samples.shape == (400, 11, 2)
    # windows stay near their centers
    cv_means = samples[..., 0].mean(axis=0)
    assert float(jnp.max(jnp.abs(cv_means - centers))) < 0.5
    f_k, _ = us.free_energies(samples)
    assert jnp.all(jnp.isfinite(f_k))
    pmf = us.pmf(samples, jnp.linspace(-2.5, 2.5, 26))
    pmf = pmf - pmf.min()
    mid = pmf[12]  # barrier bin near x=0
    left = pmf[4:9].min()
    right = pmf[17:22].min()
    assert float(mid) > float(left) + 1.0
    assert float(mid) > float(right) + 1.0


def test_umbrella_sampling_2d_periodic(key):
    """2D (phi, psi)-style umbrella grid on a separable periodic target;
    MBAR-reweighted observables match quadrature."""
    a = 2.0

    class TorusEnergy(bg.Energy):
        def __init__(self):
            super().__init__(2)

        def _energy(self, x):
            return -a * jnp.cos(x[:, 0]) - a * jnp.cos(x[:, 1] - 1.0)

    target = TorusEnergy()
    g = jnp.linspace(-jnp.pi, jnp.pi, 4, endpoint=False)
    centers = jnp.stack(jnp.meshgrid(g, g, indexing="ij"), axis=-1).reshape(-1, 2)
    us = UmbrellaSampling(
        target, cv=lambda x: x, centers=centers, k_umbrella=3.0,
        cv_period=2 * jnp.pi, noise_std=0.35, stride=4, n_burnin=200,
    )
    samples = us.run(key, centers, n_iterations=700)
    assert samples.shape == (700, 16, 2)
    cv_vals, log_w = us.unbiased_log_weights(samples)
    assert cv_vals.shape == (700 * 16, 2)
    w = jnp.exp(log_w)
    got = float(jnp.sum(w * (jnp.cos(cv_vals[:, 0]) > 0)))
    # quadrature reference on the separable x0 marginal
    xs = np.linspace(-np.pi, np.pi, 4001)
    p = np.exp(a * np.cos(xs))
    want = float(np.trapz(p * (np.cos(xs) > 0), xs) / np.trapz(p, xs))
    assert got == pytest.approx(want, abs=0.06)
    # the 2D PMF surface has its minimum at the (0, 1) mode
    bins = jnp.linspace(-jnp.pi, jnp.pi, 13)
    pmf = us.pmf2d(samples, bins, bins)
    i, j = np.unravel_index(int(jnp.argmin(pmf)), pmf.shape)
    bx = 0.5 * (bins[i] + bins[i + 1])
    by = 0.5 * (bins[j] + bins[j + 1])
    assert abs(float(bx) - 0.0) < 0.6 and abs(float(by) - 1.0) < 0.6


def test_umbrella_masked_per_component_sweeps(key):
    """cv_mask one-hot rows: independent per-component umbrella sweeps run
    as ONE batch with a joint MBAR (the per-dihedral peptide recipe)."""
    a = 2.0

    class TorusEnergy(bg.Energy):
        def __init__(self):
            super().__init__(2)

        def _energy(self, x):
            return -a * jnp.cos(x[:, 0]) - a * jnp.cos(x[:, 1] - 1.0)

    target = TorusEnergy()
    n_win = 8
    g = jnp.linspace(-jnp.pi, jnp.pi, n_win, endpoint=False)
    # sweep 0 biases component 0; sweep 1 biases component 1
    centers = jnp.concatenate([
        jnp.stack([g, jnp.zeros_like(g)], axis=-1),
        jnp.stack([jnp.zeros_like(g), g], axis=-1),
    ])
    mask = jnp.concatenate([
        jnp.tile(jnp.asarray([[1.0, 0.0]]), (n_win, 1)),
        jnp.tile(jnp.asarray([[0.0, 1.0]]), (n_win, 1)),
    ])
    us = UmbrellaSampling(
        target, cv=lambda x: x, centers=centers, k_umbrella=3.0,
        cv_period=2 * jnp.pi, cv_mask=mask, noise_std=0.35, stride=4,
        n_burnin=200,
    )
    samples = us.run(key, centers, n_iterations=900)
    assert samples.shape == (900, 2 * n_win, 2)
    # each window's biased component stays near its center
    cv_means_0 = samples[:, :n_win, 0]
    circ_mean = jnp.angle(jnp.mean(jnp.exp(1j * cv_means_0), axis=0))
    d = jnp.abs(jnp.mod(circ_mean - g + jnp.pi, 2 * jnp.pi) - jnp.pi)
    assert float(jnp.max(d)) < 0.8
    cv_vals, log_w = us.unbiased_log_weights(samples)
    w = jnp.exp(log_w)
    got = float(jnp.sum(w * (jnp.cos(cv_vals[:, 0]) > 0)))
    xs = np.linspace(-np.pi, np.pi, 4001)
    p = np.exp(a * np.cos(xs))
    want = float(np.trapz(p * (np.cos(xs) > 0), xs) / np.trapz(p, xs))
    assert got == pytest.approx(want, abs=0.08)


def test_checkpoint_roundtrip(tmp_path, key):
    state = {
        "params": {"w": jax.random.normal(key, (4, 4)), "b": jnp.zeros(4)},
        "step": jnp.asarray(7),
        "rng": key,
    }
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, 7, state)
    assert latest_step(d) == 7
    restored = restore_checkpoint(d, template=jax.tree_util.tree_map(jnp.zeros_like, state))
    for a, b in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)):
        assert_close(a, b, 1e-7)


def test_checkpoint_save_older_step_not_silently_dropped(tmp_path, key):
    """Orbax's manager skips saves at steps <= latest (preemption-resume
    semantics); save_checkpoint must force-write anyway — a retrain into a
    directory holding an older run's later-step checkpoint used to lose its
    parameters with no error."""
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, 24000, {"w": jnp.ones(3)})
    save_checkpoint(d, 8000, {"w": jnp.full(3, 2.0)})
    restored = restore_checkpoint(d, step=8000, template={"w": jnp.zeros(3)})
    assert_close(restored["w"], jnp.full(3, 2.0), 1e-7)


def test_timer_and_scope(key):
    with Timer() as t:
        with scope("test_phase"):
            x = jnp.sum(jax.random.normal(key, (100, 100)) ** 2)
    assert t.elapsed is not None and t.elapsed > 0
    assert jnp.isfinite(x)


@pytest.mark.slow
def test_ala2_phi_umbrella_pmf():
    """Scaled-down ala2 phi umbrella workflow: periodic windows + HMC moves
    + MBAR give a finite PMF with its minimum in the C7eq/alphaR region
    (phi < 0) — the free-energy route examples/free_energy_ala2.py runs at
    full size."""
    import numpy as np
    from bgflow_tpu.energies.ala2 import ALA2_REFERENCE_XYZ, build_ala2_forcefield
    from bgflow_tpu.models.ala2 import ALA2_MASSES
    from bgflow_tpu.ops.ic import torsion
    from bgflow_tpu.samplers.umbrella import UmbrellaSampling

    ff = build_ala2_forcefield()

    def cv(x):
        p = x.reshape(-1, 22, 3)
        return torsion(p[:, 4], p[:, 6], p[:, 8], p[:, 14], 1e-7)

    n_windows = 8
    centers = jnp.linspace(-np.pi, np.pi, n_windows, endpoint=False)
    masses = jnp.asarray(np.repeat(ALA2_MASSES, 3) / ALA2_MASSES.min())
    us = UmbrellaSampling(
        ff, cv, centers, k_umbrella=50.0, cv_period=2 * np.pi,
        mover="hmc", hmc_step_size=2e-3, hmc_leapfrog=5, masses=masses,
        stride=2, n_burnin=150,
    )
    x0 = jnp.repeat(
        jnp.asarray(ALA2_REFERENCE_XYZ, dtype=jnp.float32).reshape(1, -1),
        n_windows, axis=0,
    )
    samples = us.run(jax.random.PRNGKey(0), x0, 50)
    # windows actually track their centers (periodic bias works)
    cv_win = np.asarray(cv(samples[-1]))
    d = np.abs(np.mod(cv_win - np.asarray(centers) + np.pi, 2 * np.pi) - np.pi)
    assert np.median(d) < 0.6
    bins = jnp.linspace(-np.pi, np.pi, 13)
    pmf = np.asarray(us.pmf(samples, bins))
    pmf = pmf - pmf.min()
    assert np.all(np.isfinite(pmf))
    mids = np.asarray(0.5 * (bins[1:] + bins[:-1]))
    assert mids[int(np.argmin(pmf))] < 0.0  # minimum in the phi<0 basins
