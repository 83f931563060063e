"""Boltzmann generator API.

Reference: ``bgflow/bg.py:13-165``.  The BG couples a prior distribution, a
flow, and a target energy; it is itself an energy (exact NLL via the inverse
flow) and a sampler (prior -> forward flow).

Everything here is a pure function of ``(params, key)`` — wrap any of the
methods in ``jax.jit`` (they close over the static flow/prior/target objects)
or in ``pjit`` with a sharded batch axis.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .core.flow import as_tuple
from .energies.base import Energy
from .samplers.base import Sampler


def unnormalized_kl_div(params, prior, flow, target, key, n_samples, temperature=1.0):
    """Reverse-KL estimator: u_target(F(z)) - log|det J_F|(z), z ~ prior."""
    key_prior, key_flow = jax.random.split(key)
    z = as_tuple(prior.sample(key_prior, n_samples, temperature=temperature))
    x, dlogp = flow.forward(params, z, temperature=temperature, key=key_flow)
    return target.energy(*x, temperature=temperature) - dlogp


def unnormalized_nll(params, prior, flow, *x, temperature=1.0, key=None):
    """Exact negative log-likelihood via the inverse flow."""
    z, neg_dlogp = flow.forward(params, x, inverse=True, temperature=temperature, key=key)
    return prior.energy(*z, temperature=temperature) - neg_dlogp


def log_weights_given_latent(x, z, dlogp, prior, target, temperature=1.0, normalize=True):
    """log w = u_prior(z) + dlogp - u_target(x) (+ logsumexp normalization)."""
    x, z = as_tuple(x), as_tuple(z)
    logw = (
        prior.energy(*z, temperature=temperature)
        + dlogp
        - target.energy(*x, temperature=temperature)
    )
    if normalize:
        logw = logw - jax.scipy.special.logsumexp(logw, axis=0)
    return logw


def effective_sample_size(log_weights):
    """Kish ESS; log weights need not be normalized."""
    return jnp.exp(
        2.0 * jax.scipy.special.logsumexp(log_weights, axis=0)
        - jax.scipy.special.logsumexp(2.0 * log_weights, axis=0)
    )


def sampling_efficiency(log_weights):
    """Kish ESS / n."""
    return effective_sample_size(log_weights) / log_weights.shape[0]


class BGSample(NamedTuple):
    """Everything ``BoltzmannGenerator.sample`` can produce (None if not requested)."""

    xs: tuple
    zs: Optional[tuple] = None
    dlogp: Optional[jax.Array] = None
    energy: Optional[jax.Array] = None
    log_weights: Optional[jax.Array] = None
    weights: Optional[jax.Array] = None

    @property
    def x(self):
        return self.xs[0] if len(self.xs) == 1 else self.xs


class BoltzmannGenerator(Energy, Sampler):
    def __init__(self, prior, flow, target=None):
        source = target if target is not None else prior
        Energy.__init__(self, [list(s) for s in source.event_shapes])
        Sampler.__init__(self)
        self.prior = prior
        self.flow = flow
        self.target = target

    def init(self, key):
        return self.flow.init(key)

    # -- sampling ----------------------------------------------------------
    def sample(
        self,
        params,
        key,
        n_samples,
        temperature=1.0,
        with_latent=False,
        with_dlogp=False,
        with_energy=False,
        with_log_weights=False,
        with_weights=False,
    ) -> BGSample:
        key_prior, key_flow = jax.random.split(key)
        z = as_tuple(self.prior.sample(key_prior, n_samples, temperature=temperature))
        x, dlogp = self.flow.forward(params, z, temperature=temperature, key=key_flow)
        out = dict(xs=x)
        if with_latent:
            out["zs"] = z
        if with_dlogp:
            out["dlogp"] = dlogp
        if with_energy or with_log_weights or with_weights:
            bg_energy = self.prior.energy(*z, temperature=temperature) + dlogp
            if with_energy:
                out["energy"] = bg_energy
            if with_log_weights or with_weights:
                target_energy = self.target.energy(*x, temperature=temperature)
                logw = bg_energy - target_energy
                if with_log_weights:
                    out["log_weights"] = logw
                if with_weights:
                    out["weights"] = jax.nn.softmax(logw, axis=0)
        return BGSample(**out)

    # -- energy / losses ---------------------------------------------------
    def energy(self, params, *x, temperature=1.0):
        """NLL of x under the generator (up to the prior's normalization)."""
        return unnormalized_nll(params, self.prior, self.flow, *x, temperature=temperature)

    def kldiv(self, params, key, n_samples, temperature=1.0):
        return unnormalized_kl_div(
            params, self.prior, self.flow, self.target, key, n_samples, temperature=temperature
        )

    def log_weights(self, params, *x, temperature=1.0, normalize=True):
        z, neg_dlogp = self.flow.forward(params, x, inverse=True, temperature=temperature)
        return log_weights_given_latent(
            x, z, -neg_dlogp, self.prior, self.target, temperature=temperature, normalize=normalize
        )

    def log_weights_given_latent(self, x, z, dlogp, temperature=1.0, normalize=True):
        return log_weights_given_latent(
            x, z, dlogp, self.prior, self.target, temperature=temperature, normalize=normalize
        )

    def latent_energy(self, params, temperature=1.0, gaussianize=False) -> "PushforwardEnergy":
        """The target's latent-space image under the current flow (see
        :class:`PushforwardEnergy`) — run MCMC/HMC chains on it for
        flow-preconditioned ("NeuTra") sampling of the target.

        ``gaussianize=True`` prepends an inverse-CDF map to every prior
        channel that exposes ``cdf``/``icdf`` (e.g. the Uniform[0, 1] IC
        channels of builder-made generators), so the chain runs in an
        UNCONSTRAINED space where z ~ N(0, I) pushes forward to the prior
        — box-constrained latents would otherwise break HMC (flat energy
        outside the box).  Channels without cdf/icdf (e.g. the whitened
        Gaussian FIXED channel) are passed through unchanged; the chain
        stays exact either way (any diffeomorphism works — the map only
        sets the geometry)."""
        flow, flow_params = self.flow, params
        if gaussianize:
            from .core.flow import Chain
            from .core.structural import Wrap
            from .distributions.normal import DiagonalNormal
            from .flows.cdf import DistributionTransferFlow

            components = getattr(self.prior, "components", (self.prior,))
            fronts = []
            idx = 0
            for comp in components:
                shapes = comp.event_shapes
                if (
                    len(shapes) == 1
                    and hasattr(comp, "cdf")
                    and hasattr(comp, "icdf")
                ):
                    import math

                    dim = math.prod(shapes[0]) if shapes[0] else 1
                    fronts.append(Wrap(
                        DistributionTransferFlow(DiagonalNormal(jnp.zeros(dim)), comp),
                        indices=(idx,),
                    ))
                idx += len(shapes)
            flow = Chain(fronts + [self.flow])
            flow_params = tuple(f.init(None) for f in fronts) + (params,)
        return PushforwardEnergy(
            flow, flow_params, self.target, self.prior.event_shapes,
            temperature=temperature,
        )


class PushforwardEnergy(Energy):
    """Latent-space image of a target under a flow:
    ``u_z(z) = u_x(F(z)) / T - log|det J_F|(z)``.

    Running ANY MCMC sampler on this energy is flow-preconditioned
    ("NeuTra") sampling: a trained flow maps the multimodal target to a
    near-Gaussian latent, where HMC or random-walk chains cross barriers
    that are insurmountable in x-space.  The chain is exact with respect
    to the (tempered) target for any flow quality — the flow only affects
    mixing speed.  Map chain states to target space with :meth:`push`.

    Capability beyond the reference (whose ``LatentProposal``-style MCMC
    exists here too, ``samplers/mcmc.py``); the HMC-on-pushforward design
    follows the flow-preconditioned HMC literature (arXiv:2112.01586).

    Note: the sampling temperature is fixed at construction (it scales
    only the target term, not the log-det); call ``energy(z)`` without a
    ``temperature`` argument.
    """

    def __init__(self, flow, params, target, latent_event_shapes, temperature=1.0):
        super().__init__([list(s) for s in latent_event_shapes])
        self.flow = flow
        self.params = params
        self.target = target
        self.temperature = temperature

    def _energy(self, *zs):
        x, dlogp = self.flow.forward(self.params, zs)
        return self.target.energy(*x, temperature=self.temperature) - dlogp

    def push(self, *zs):
        """Map latent chain states to target-space samples."""
        x, _ = self.flow.forward(self.params, zs)
        return x if len(x) > 1 else x[0]

    def pull(self, *xs):
        """Map target-space configurations to latent chain states (the
        inverse of :meth:`push`, with the same single-tensor unwrapping) —
        the standard way to initialize NeuTra chains inside the typical
        set (e.g. from training-data frames)."""
        z, _ = self.flow.forward(self.params, xs, inverse=True)
        return z if len(z) > 1 else z[0]
