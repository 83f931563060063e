"""CDF-based flows: map between distributions through their CDFs.

Reference: ``bgflow/nn/flow/cdf.py:12-121``.  A ``CDFTransform`` maps a
distribution's support onto [0, 1]; composing one forward with another
inverse transfers samples between distributions (used by the builder's
``add_map_to_ic_domains`` to push uniform latents into bond/angle marginals).

The distribution object must expose ``cdf``, ``icdf`` and ``log_prob``
(elementwise, reducing only in the flow).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.flow import Chain, Flow, Inverse
from ..distributions.normal import TruncatedNormalDistribution


class CDFTransform(Flow):
    def __init__(self, distribution, eps: float = 1e-7):
        self.distribution = distribution
        self.eps = eps

    def _forward(self, params, xs, **kwargs):
        (x,) = xs
        y = self.distribution.cdf(x)
        logdet = self.distribution.log_prob(x)
        if self.eps is not None:
            y = jnp.clip(y, self.eps, 1.0 - self.eps)
            logdet = jnp.maximum(logdet, -1.0 / self.eps)
        return (y,), jnp.sum(logdet.reshape(logdet.shape[0], -1), axis=-1)

    def _inverse(self, params, xs, **kwargs):
        (x,) = xs
        if self.eps is not None:
            x = jnp.clip(x, self.eps, 1.0 - self.eps)
        y = self.distribution.icdf(x)
        logdet = -self.distribution.log_prob(y)
        if self.eps is not None:
            logdet = jnp.maximum(logdet, -1.0 / self.eps)
        return (y,), jnp.sum(logdet.reshape(logdet.shape[0], -1), axis=-1)


class LearnableTruncatedCDFFlow(Flow):
    """Trainable truncated-normal inverse-CDF layer: u in [0,1] -> x in
    [lower, upper] with learnable per-dim (mu, log_sigma).

    The functional counterpart of the reference's learnable
    ``TruncatedNormalDistribution(is_learnable=True)`` (``normal.py:138-143``):
    instead of trainable prior parameters, the marginal becomes a trainable
    first flow layer — same model family, parameters live in the flow pytree
    like everything else.
    """

    def __init__(self, mu_init, sigma_init=1.0, lower_bound: float = 0.0,
                 upper_bound: float = 1.0, eps: float = 1e-7):
        self.mu_init = jnp.atleast_1d(jnp.asarray(mu_init, dtype=jnp.result_type(float)))
        self.sigma_init = jnp.broadcast_to(
            jnp.asarray(sigma_init, dtype=self.mu_init.dtype), self.mu_init.shape
        )
        self.lower_bound = float(lower_bound)
        self.upper_bound = float(upper_bound)
        self.eps = eps

    def init(self, key=None):
        return {"mu": self.mu_init, "log_sigma": jnp.log(self.sigma_init)}

    def _dist(self, params):
        return TruncatedNormalDistribution(
            mu=params["mu"],
            sigma=jnp.exp(params["log_sigma"]),
            lower_bound=self.lower_bound,
            upper_bound=self.upper_bound,
        )

    def _forward(self, params, xs, **kwargs):
        (u,) = xs
        dist = self._dist(params)
        u = jnp.clip(u, self.eps, 1.0 - self.eps)
        x = dist.icdf(u)
        logdet = -jnp.maximum(dist.log_prob(x), -1.0 / self.eps)
        return (x,), jnp.sum(logdet.reshape(logdet.shape[0], -1), axis=-1)

    def _inverse(self, params, xs, **kwargs):
        (x,) = xs
        dist = self._dist(params)
        u = jnp.clip(dist.cdf(x), self.eps, 1.0 - self.eps)
        logdet = jnp.maximum(dist.log_prob(x), -1.0 / self.eps)
        return (u,), jnp.sum(logdet.reshape(logdet.shape[0], -1), axis=-1)


class DistributionTransferFlow(Chain):
    """source-sample -> uniform -> target-sample.  Reference ``cdf.py:49-63``."""

    def __init__(self, source_distribution, target_distribution, eps: float = 1e-7):
        super().__init__([
            CDFTransform(source_distribution, eps=eps),
            Inverse(CDFTransform(target_distribution, eps=eps)),
        ])


class ConstrainGaussianFlow(Flow):
    """Constrain a Gaussian variable to an interval via normal-CDF ->
    truncated-normal-ICDF.  Reference ``cdf.py:66-121``."""

    def __init__(
        self,
        mu,
        sigma=1.0,
        lower_bound: float = 0.0,
        upper_bound: float = np.inf,
        mu_out=None,
        sigma_out=None,
        eps: float = 1e-7,
    ):
        from ..distributions.normal import DiagonalNormal

        mu = jnp.atleast_1d(jnp.asarray(mu, dtype=jnp.result_type(float)))
        source = DiagonalNormal(mu, sigma)
        target = TruncatedNormalDistribution(
            mu=mu if mu_out is None else jnp.asarray(mu_out),
            sigma=sigma if sigma_out is None else jnp.asarray(sigma_out),
            lower_bound=lower_bound,
            upper_bound=upper_bound,
        )
        self._trafo = DistributionTransferFlow(source, target, eps)
        self._trafo_params = self._trafo.init(None)
        self.lower_bound = float(lower_bound)
        self.upper_bound = float(upper_bound)

    def _forward(self, params, xs, **kwargs):
        (ys, dlogp) = self._trafo.forward(self._trafo_params, xs)
        y = jnp.clip(ys[0], self.lower_bound, self.upper_bound)
        return (y,), dlogp

    def _inverse(self, params, xs, **kwargs):
        return self._trafo.forward(self._trafo_params, xs, inverse=True)
