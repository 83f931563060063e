"""Trainable linear flows: diagonal affine, triangular, pseudo-orthogonal,
Kronecker-product, and invertible PPPP with its merge scheduler.

References: ``bgflow/nn/flow/{affine,triangular,orthogonal,kronecker,pppp}.py``.

The PPPP layer keeps its weight matrix, tracked inverse, and determinant in
the *params pytree* (with ``stop_gradient`` on the non-trainable slots —
the functional analogue of torch buffers); ``pppp_merge`` is a pure function
``params -> (params, merged)`` and the scheduler operates on
(params, opt_state) pytrees.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.flow import Flow

__all__ = [
    "AffineFlow",
    "TriuFlow",
    "PseudoOrthogonalFlow",
    "KroneckerProductFlow",
    "InvertiblePPPP",
    "pppp_merge",
    "PPPPScheduler",
]


class AffineFlow(Flow):
    """Elementwise y = exp(log_sigma) * x + mu (reference ``affine.py:9-43``)."""

    def __init__(self, n_dims: int, use_scaling: bool = True, use_translation: bool = True):
        self.n_dims = n_dims
        self.use_scaling = use_scaling
        self.use_translation = use_translation

    def init(self, key=None):
        params = {}
        if self.use_scaling:
            params["log_sigma"] = jnp.zeros(self.n_dims)
        if self.use_translation:
            params["mu"] = jnp.zeros(self.n_dims)
        return params

    def _forward(self, params, xs, **kwargs):
        (x,) = xs
        ldj = jnp.zeros(x.shape[0], dtype=x.dtype)
        if self.use_scaling:
            x = jnp.exp(params["log_sigma"]) * x
            ldj = ldj + jnp.sum(params["log_sigma"])
        if self.use_translation:
            x = x + params["mu"]
        return (x,), ldj

    def _inverse(self, params, xs, **kwargs):
        (x,) = xs
        ldj = jnp.zeros(x.shape[0], dtype=x.dtype)
        if self.use_translation:
            x = x - params["mu"]
        if self.use_scaling:
            x = jnp.exp(-params["log_sigma"]) * x
            ldj = ldj - jnp.sum(params["log_sigma"])
        return (x,), ldj


class TriuFlow(Flow):
    """y = (I + R) x + b with upper-triangular R (reference ``triangular.py``).

    The inverse is one ``solve_triangular`` — O(d^2) per sample, no LU.
    """

    def __init__(self, dim: int, shift: bool = True):
        self.dim = dim
        self.shift = shift
        self._iu = np.triu_indices(dim)

    def init(self, key=None):
        params = {"elements": jnp.zeros(len(self._iu[0]))}
        if self.shift:
            params["b"] = jnp.zeros(self.dim)
        return params

    def _matrix(self, params):
        r = jnp.zeros((self.dim, self.dim)).at[self._iu].set(params["elements"])
        return r + jnp.eye(self.dim)

    def _forward(self, params, xs, **kwargs):
        (x,) = xs
        r = self._matrix(params)
        ldj = jnp.full(x.shape[0], jnp.sum(jnp.log(jnp.abs(jnp.diag(r)))), dtype=x.dtype)
        y = jnp.einsum("ab,...b->...a", r, x)
        if self.shift:
            y = y + params["b"]
        return (y,), ldj

    def _inverse(self, params, xs, **kwargs):
        (y,) = xs
        r = self._matrix(params)
        ldj = jnp.full(y.shape[0], -jnp.sum(jnp.log(jnp.abs(jnp.diag(r)))), dtype=y.dtype)
        if self.shift:
            y = y - params["b"]
        x = jax.scipy.linalg.solve_triangular(r, y.T, lower=False).T
        return (x,), ldj


class PseudoOrthogonalFlow(Flow):
    """W x + b with a soft orthogonality penalty; unit Jacobian assumed.

    Reference ``orthogonal.py:13-90``.  Call ``penalty(params)`` and add it
    to the loss.
    """

    def __init__(self, dim: int, shift: bool = True, penalty_parameter: float = 1e5):
        self.dim = dim
        self.shift = shift
        self.penalty_parameter = penalty_parameter

    def init(self, key=None):
        params = {"W": jnp.eye(self.dim)}
        if self.shift:
            params["b"] = jnp.zeros(self.dim)
        return params

    def _forward(self, params, xs, **kwargs):
        (x,) = xs
        y = jnp.einsum("ab,...b->...a", params["W"], x)
        if self.shift:
            y = y + params["b"]
        return (y,), jnp.zeros(x.shape[0], dtype=x.dtype)

    def _inverse(self, params, xs, **kwargs):
        (y,) = xs
        if self.shift:
            y = y - params["b"]
        x = jnp.einsum("ba,...b->...a", params["W"], y)
        return (x,), jnp.zeros(y.shape[0], dtype=y.dtype)

    def penalty(self, params):
        w = params["W"]
        return self.penalty_parameter * jnp.sum(
            (jnp.eye(self.dim) - w.T @ w) ** 2
        )


def _kron(a, b):
    return jnp.einsum("ab,cd->acbd", a, b).reshape(
        a.shape[0] * b.shape[0], a.shape[1] * b.shape[1]
    )


class KroneckerProductFlow(Flow):
    """Linear flow whose matrix is a Kronecker product of 2x2 factors.

    O(log d) parameters for a d x d matrix; reference ``kronecker.py:35-80``.
    """

    def __init__(self, n_dim: int):
        assert n_dim > 0 and (n_dim & (n_dim - 1)) == 0, "n_dim must be a power of 2"
        self.n_dim = n_dim
        self.n_factors = int(np.log2(n_dim))

    def init(self, key):
        keys = jax.random.split(key, self.n_factors)
        qs = [jnp.linalg.qr(jax.random.normal(k, (2, 2)))[0] for k in keys]
        return {"factors": jnp.stack(qs), "bias": jnp.zeros(self.n_dim)}

    @staticmethod
    def _det2(m):
        return m[..., 0, 0] * m[..., 1, 1] - m[..., 1, 0] * m[..., 0, 1]

    def _assemble(self, factors):
        m = factors[0]
        det = self._det2(factors[0])
        power = 2
        for f in factors[1:]:
            det = det**2 * self._det2(f) ** power
            m = _kron(m, f)
            power *= 2
        return m, det

    def _forward(self, params, xs, **kwargs):
        (x,) = xs
        m, det = self._assemble(params["factors"])
        ldj = jnp.full(x.shape[0], jnp.log(jnp.abs(det)), dtype=x.dtype)
        return (x @ m + params["bias"],), ldj

    def _inverse(self, params, xs, **kwargs):
        (y,) = xs
        inv = jnp.linalg.inv(params["factors"])
        m, det = self._assemble(inv)
        ldj = jnp.full(y.shape[0], jnp.log(jnp.abs(det)), dtype=y.dtype)
        return ((y - params["bias"]) @ m,), ldj


class InvertiblePPPP(Flow):
    """Invertible linear layer trained by rank-one property-preserving
    parameter perturbations: W = A + u v^T with tracked inverse and
    determinant (reference ``pppp.py:14-235``).

    Gradients flow only into (u, v, b); (A, Ainv, detA) ride in the params
    pytree behind ``stop_gradient`` and are updated by ``pppp_merge``.
    """

    def __init__(self, dim: int, shift: bool = True, penalty_parameter: float = 0.1,
                 min_logdet: float = -2.0, max_logdet: float = 15.0):
        self.dim = dim
        self.shift = shift
        self.penalty_parameter = penalty_parameter
        self.min_logdet = min_logdet
        self.max_logdet = max_logdet

    def init(self, key):
        params = {
            "u": jnp.zeros(self.dim),
            "v": jax.random.normal(key, (self.dim,)),
            "A": jnp.eye(self.dim),
            "Ainv": jnp.eye(self.dim),
            "detA": jnp.ones(()),
        }
        if self.shift:
            params["b"] = jnp.zeros(self.dim)
        return params

    def _products(self, params):
        a_inv = jax.lax.stop_gradient(params["Ainv"])
        det_a = jax.lax.stop_gradient(params["detA"])
        ainv_u = a_inv @ params["u"]
        det_update = 1.0 + jnp.dot(params["v"], ainv_u)
        return a_inv, det_a, ainv_u, det_update

    def _forward(self, params, xs, **kwargs):
        (x,) = xs
        a = jax.lax.stop_gradient(params["A"])
        _, det_a, _, det_update = self._products(params)
        new_det = det_a * det_update
        ldj = jnp.full(x.shape[0], jnp.log(jnp.abs(new_det)), dtype=x.dtype)
        y = jnp.einsum("ij,...j->...i", a, x) + jnp.einsum(
            "i,j,...j->...i", params["u"], params["v"], x
        )
        if self.shift:
            y = y + params["b"]
        return (y,), ldj

    def _inverse(self, params, xs, **kwargs):
        (y,) = xs
        a_inv, det_a, ainv_u, det_update = self._products(params)
        new_det = det_a * det_update
        ldj = jnp.full(y.shape[0], -jnp.log(jnp.abs(new_det)), dtype=y.dtype)
        if self.shift:
            y = y - params["b"]
        ainv_y = jnp.einsum("ij,...j->...i", a_inv, y)
        x = ainv_y - (1.0 / det_update) * jnp.einsum(
            "i,k,...k->...i", ainv_u, params["v"], ainv_y
        )
        return (x,), ldj

    def penalty(self, params):
        """Soft barrier keeping log|det W| in [min_logdet, max_logdet]."""
        _, det_a, _, det_update = self._products(params)
        new_det = det_a * det_update

        def barrier(logdet):
            lo = jax.nn.relu(self.min_logdet - logdet) ** 2
            hi = jax.nn.relu(logdet - self.max_logdet) ** 2
            return lo + hi

        p = barrier(jnp.log(jnp.abs(det_update))) + barrier(jnp.log(jnp.abs(new_det)))
        return self.penalty_parameter * p


def pppp_merge(flow: InvertiblePPPP, params, key, force_merge: bool = False):
    """Merge the rank-one perturbation into (A, Ainv, detA); returns
    (new_params, merged: bool).  Host-side (numpy) — called between
    optimizer steps, not inside jit.
    """
    u = np.asarray(params["u"])
    v = np.asarray(params["v"])
    new = dict(params)
    if not np.all(np.isfinite(np.concatenate([u, v]))):
        new["v"] = jax.random.normal(key, (flow.dim,))
        new["u"] = jnp.zeros(flow.dim)
        return new, False
    a = np.asarray(params["A"])
    a_inv = np.asarray(params["Ainv"])
    det_a = float(params["detA"])
    ainv_u = a_inv @ u
    det_update = 1.0 + v @ ainv_u
    logabsdet_update = np.log(np.abs(det_update))
    logabsdet_new = np.log(np.abs(det_update * det_a))
    sane = (
        logabsdet_update > flow.min_logdet - 4
        and logabsdet_new > flow.min_logdet - 0.5
        and logabsdet_new < flow.max_logdet + 0.5
    )
    if sane or force_merge:
        vt_ainv = v @ a_inv
        new["detA"] = jnp.asarray(det_a * det_update)
        new["A"] = jnp.asarray(a + np.outer(u, v))
        new["Ainv"] = jnp.asarray(a_inv - np.outer(ainv_u, vt_ainv) / det_update)
        new["v"] = jax.random.normal(key, (flow.dim,))
        new["u"] = jnp.zeros(flow.dim)
        return new, True
    return dict(params), False


def _iterative_inverse_correction(a, a_inv, order: int = 7):
    """One hyperpower-iteration refinement of an approximate inverse
    (Soleymani 2012, order-7 scheme; reference ``pppp.py:328-348``)."""
    coeffs = [120.0, -393.0, 735.0, -861.0, 651.0, -315.0, 93.0, -15.0]
    error = a @ a_inv
    correction = error.copy()
    eye_scale = coeffs[1:]
    for c in reversed(eye_scale):
        correction = correction + c * np.eye(a.shape[0])
        correction = error @ correction
    correction = correction + coeffs[0] * np.eye(a.shape[0])
    return (1.0 / 16.0) * (a_inv @ correction)


class PPPPScheduler:
    """Schedules merges / inverse corrections for PPPP layers in a Chain.

    Operates on the functional (params, opt_state) pair: after a merge the
    adam moments of the refreshed ``v`` parameter are zeroed (reference
    ``pppp.py:238-325`` resets optimizer state on merge).
    """

    def __init__(self, flows_and_paths, n_force_merge: int = 10, n_correct: int = 50,
                 n_correct_steps: int = 1):
        # flows_and_paths: list of (InvertiblePPPP, fn params -> subparams,
        #                           fn (params, subparams) -> params)
        self.blocks = list(flows_and_paths)
        self.n_force_merge = n_force_merge
        self.n_correct = n_correct
        self.n_correct_steps = n_correct_steps
        self.i = 0

    def step(self, params, key):
        self.i += 1
        merged_any = False
        for flow, getter, setter in self.blocks:
            key, sub = jax.random.split(key)
            sub_params = getter(params)
            new_sub, merged = pppp_merge(
                flow, sub_params, sub,
                force_merge=self.n_force_merge is not None and self.i % self.n_force_merge == 0,
            )
            merged_any = merged_any or merged
            if self.n_correct is not None and self.i % self.n_correct == 0:
                a = np.asarray(new_sub["A"])
                a_inv = np.asarray(new_sub["Ainv"])
                for _ in range(self.n_correct_steps):
                    a_inv = _iterative_inverse_correction(a, a_inv)
                new_sub["Ainv"] = jnp.asarray(a_inv)
            params = setter(params, new_sub)
        return params, merged_any

    def penalty(self, params):
        return sum(flow.penalty(getter(params)) for flow, getter, _ in self.blocks)
