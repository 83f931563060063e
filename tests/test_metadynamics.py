"""Well-tempered multi-walker metadynamics vs analytic free-energy surfaces."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bgflow_tpu as bg
from bgflow_tpu.samplers.metadynamics import Metadynamics


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


def test_double_well_pmf_matches_analytic(key):
    """Tilted quartic double well: the bias-derived PMF reproduces the exact
    (separable) x0 free-energy profile."""
    a, b, c = 1.0, -4.0, 1.0
    target = bg.DoubleWellEnergy(2, a=a, b=b, c=c)
    meta = Metadynamics(
        target, cv=lambda x: x[:, 0], grid_min=-3.0, grid_max=3.0, n_bins=60,
        sigma=0.2, height=0.4, gamma=8.0, noise_std=0.25,
    )
    x0 = jnp.stack([jnp.linspace(-1.7, 1.7, 64), jnp.zeros(64)], axis=-1)
    samples = meta.run(key, x0, n_iterations=1500)
    assert samples.shape == (1500, 64, 2)
    # walkers crossed the barrier in both directions
    assert float(jnp.min(samples[..., 0])) < -1.0
    assert float(jnp.max(samples[..., 0])) > 1.0

    nodes = np.asarray(meta.grid_nodes[0])
    pmf = np.asarray(meta.pmf())
    exact = a * nodes + b * nodes**2 + c * nodes**4
    exact = exact - exact.min()
    # compare where the exact profile is thermally relevant
    sel = exact < 6.0
    err = pmf[sel] - exact[sel]
    err = err - err.mean()  # PMFs match up to a constant
    assert float(np.max(np.abs(err))) < 1.5

    # well-to-well free-energy difference (minima of each half)
    left = slice(0, 30)
    right = slice(30, 60)
    d_est = pmf[right].min() - pmf[left].min()
    d_true = exact[right].min() - exact[left].min()
    assert d_est == pytest.approx(d_true, abs=0.8)


def test_periodic_cv_and_aux_carry(key):
    """Periodic 1D CV on a cosine torus: barrier height recovered; the bias
    grid is carried through the scan (nonzero, finite, correct shape)."""
    amp = 2.0

    class Torus(bg.Energy):
        def __init__(self):
            super().__init__(1)

        def _energy(self, x):
            return -amp * jnp.cos(x[:, 0])

    meta = Metadynamics(
        Torus(), cv=lambda x: x[:, 0], grid_min=-np.pi, grid_max=np.pi,
        n_bins=48, sigma=0.25, height=0.3, gamma=6.0, periodic=True,
        noise_std=0.3,
    )
    x0 = jnp.linspace(-2.0, 2.0, 48).reshape(-1, 1)
    meta.run(key, x0, n_iterations=1200)
    bias = np.asarray(meta.bias)
    assert bias.shape == (48,) and np.all(np.isfinite(bias)) and bias.max() > 0.1
    nodes = np.asarray(meta.grid_nodes[0])
    pmf = np.asarray(meta.pmf())
    exact = amp * (1.0 - np.cos(nodes))
    err = pmf - exact
    assert float(np.max(np.abs(err - err.mean()))) < 1.2


def test_2d_cv_grid_deposits(key):
    """2D CV path: bias accumulates on the (nx, ny) grid and the PMF valley
    sits at the target's mode."""
    class Quad(bg.Energy):
        def __init__(self):
            super().__init__(2)

        def _energy(self, x):
            return 2.0 * jnp.sum((x - jnp.asarray([0.5, -0.3])) ** 2, axis=-1)

    meta = Metadynamics(
        Quad(), cv=lambda x: x, grid_min=(-2.0, -2.0), grid_max=(2.0, 2.0),
        n_bins=(32, 32), sigma=0.3, height=0.25, gamma=8.0, noise_std=0.25,
    )
    x0 = jnp.zeros((32, 2))
    meta.run(key, x0, n_iterations=600)
    pmf = np.asarray(meta.pmf())
    assert pmf.shape == (32, 32)
    i, j = np.unravel_index(pmf.argmin(), pmf.shape)
    nx = np.asarray(meta.grid_nodes[0])
    ny = np.asarray(meta.grid_nodes[1])
    assert abs(nx[i] - 0.5) < 0.5 and abs(ny[j] + 0.3) < 0.5
