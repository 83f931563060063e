"""Training loops.

Reference: ``bgflow/nn/training/trainers.py:13-205`` (KLTrainer, LossReporter).

TPU-first design: the whole optimization step — prior sampling, forward and
inverse flow passes, target energy, gradients, optimizer update, and the
NaN-step guard — is ONE jitted function.  The Python loop only feeds keys and
collects scalar metrics, so steps/s is bounded by device compute, not host
dispatch.  For multi-chip data parallelism, pass ``mesh``/shardings via
``make_train_step``'s ``in_shardings`` (see ``bgflow_tpu.parallel``).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax


class LossReporter:
    """Accumulate labeled per-iteration losses (host side)."""

    def __init__(self, *labels):
        self._labels = labels
        self._raw = [[] for _ in labels]

    def report(self, *losses):
        assert len(losses) == len(self._labels)
        for i, l in enumerate(losses):
            self._raw[i].append(float(l))

    def recent(self, n_smooth=1):
        return np.array([np.mean(raw[-n_smooth:]) if raw else np.nan for raw in self._raw])

    def losses(self, n_smooth=1):
        out = []
        for raw in self._raw:
            arr = np.asarray(raw)
            if n_smooth > 1 and len(arr) >= n_smooth:
                kernel = np.ones(n_smooth) / n_smooth
                arr = np.convolve(arr, kernel, mode="valid")
            out.append(arr)
        return out

    def __len__(self):
        return len(self._raw[0]) if self._raw else 0


def _tree_all_finite(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.all(jnp.stack([jnp.all(jnp.isfinite(l)) for l in leaves]))


class KLTrainer:
    """Mixed NLL / reverse-KL / log-variance trainer with NaN-step skipping.

    Parameters
    ----------
    bg : BoltzmannGenerator
    optimizer : optax.GradientTransformation (default: adam(5e-3), matching
        the reference's default ``trainers.py:64``)
    train_likelihood / train_energy : include the NLL / KL loss terms.
    train_logvar : include the log-variance loss ``Var_batch[log w]`` over
        fully reparametrized model samples, where ``log w = -u(x) - log q(x)``
        (the unnormalized importance log-weight).  Zero iff ``q = p``; unlike
        reverse KL it penalizes BOTH log-weight tails — the overdispersion
        tail (model mass at high energy) AND the underweighted-core tail that
        caps sampling efficiency — and it directly targets the reweighting
        ESS (``ESS ~ n / E[w^2]``, controlled by ``Var[log w]``).  Use as a
        fine-tune term with an NLL anchor: like reverse KL it is blind to
        modes the model has already dropped.
    logvar_huber : Huber scale (nats) for the log-variance deviations.  Raw
        squared deviations are catastrophically heavy-tailed on molecular
        targets (one clipped-clash sample sits ~1e3 nats below the mean, so
        its squared term — and gradient — dwarfs the batch and destroys the
        model; observed as mode collapse on ALA3).  Deviations beyond the
        scale contribute linearly, bounding every sample's gradient by
        ``2 * logvar_huber * d(log w)/d(theta)``.  None = pure variance.
    custom_loss : optional ``fn(params, key) -> scalar`` added with weight
        ``w_custom``.
    """

    def __init__(
        self,
        bg,
        optimizer: Optional[optax.GradientTransformation] = None,
        train_likelihood: bool = True,
        train_energy: bool = True,
        train_logvar: bool = False,
        logvar_huber: Optional[float] = 10.0,
        custom_loss: Optional[Callable] = None,
        likelihood_temperature_from_batch: bool = False,
    ):
        self.bg = bg
        self.optimizer = optimizer if optimizer is not None else optax.adam(5e-3)
        self.train_likelihood = train_likelihood
        self.train_energy = train_energy
        self.train_logvar = train_logvar
        self.logvar_huber = logvar_huber
        self.custom_loss = custom_loss
        # multi-temperature NLL: the LAST tensor of each batch tuple is a
        # per-sample (B,) temperature vector (ride it through DataSetSampler
        # as an aligned tensor) — the way a temperature-conditioned model
        # (Coupling(temperature_feature=True)) learns from a replica ladder
        self.likelihood_temperature_from_batch = bool(likelihood_temperature_from_batch)
        self._step_cache = {}

    def init(self, params):
        return self.optimizer.init(params)

    def loss(
        self,
        params,
        key,
        batch=None,
        n_kl_samples: int = 0,
        n_logvar_samples: int = 0,
        w_likelihood=1.0,
        w_energy=1.0,
        w_logvar=1.0,
        w_custom: float = 1.0,
        temperature=1.0,
    ):
        """Weighted mixed loss.  Returns (scalar, metrics dict)."""
        metrics = {}
        total = 0.0
        wsum = 0.0
        key_kl, key_lv, key_custom = jax.random.split(key, 3)
        if self.train_energy and n_kl_samples > 0:
            kll = jnp.mean(self.bg.kldiv(params, key_kl, n_kl_samples, temperature=temperature))
            metrics["kl"] = kll
            total = total + w_energy * kll
            wsum += w_energy
        if self.train_logvar and n_logvar_samples > 0:
            out = self.bg.sample(
                params, key_lv, n_logvar_samples,
                temperature=temperature, with_log_weights=True,
            )
            lw = out.log_weights
            # non-finite log-weights (clipped-energy overflow etc.) would
            # poison the variance; average over the finite ones only
            finite = jnp.isfinite(lw)
            n_f = jnp.maximum(jnp.sum(finite), 1)
            lwc = jnp.where(finite, lw, 0.0)
            mean = jnp.sum(lwc) / n_f
            dev = lwc - mean
            if self.logvar_huber is not None:
                d = self.logvar_huber
                sq = jnp.where(
                    jnp.abs(dev) <= d, dev**2, 2.0 * d * jnp.abs(dev) - d * d
                )
            else:
                sq = dev**2
            lv = jnp.sum(jnp.where(finite, sq, 0.0)) / n_f
            metrics["logvar"] = lv
            total = total + w_logvar * lv
            wsum += w_logvar
        if self.train_likelihood and batch is not None:
            batch = batch if isinstance(batch, tuple) else (batch,)
            t_like = temperature
            if self.likelihood_temperature_from_batch:
                batch, t_like = batch[:-1], batch[-1]
            nll = jnp.mean(self.bg.energy(params, *batch, temperature=t_like))
            metrics["nll"] = nll
            total = total + w_likelihood * nll
            wsum += w_likelihood
        if self.custom_loss is not None:
            cl = self.custom_loss(params, key_custom)
            metrics["custom"] = cl
            total = total + w_custom * cl
            wsum += w_custom
        # weights may be traced schedule values — keep the max branchless
        return total / jnp.maximum(wsum, 1e-12), metrics

    def make_train_step(
        self,
        batchsize_likelihood: int = 0,
        batchsize_energy: int = 0,
        batchsize_logvar: int = 0,
        w_likelihood=1.0,
        w_energy=1.0,
        w_logvar=1.0,
        temperature=1.0,
        clip_grad_norm: Optional[float] = None,
    ):
        """Build one jitted update: (params, opt_state, key, batch?, step) -> ...

        ``w_likelihood`` / ``w_energy`` / ``temperature`` may each be a
        float or an optax-style schedule ``fn(step) -> value`` — the TPU
        shape of the reference's ``(interval, scheduler)`` hooks
        (``trainers.py:96,149-152``): annealing is traced into the one
        compiled step, driven by the ``step`` counter argument (pass a
        jnp int32 scalar so schedule changes don't retrace).  Learning-rate
        schedules go through the optax optimizer as usual.

        The NaN guard mirrors the reference (``trainers.py:198-201``): if any
        gradient is non-finite the whole update is skipped, branchlessly.
        """
        return jax.jit(
            self._build_step_fn(
                batchsize_likelihood=batchsize_likelihood,
                batchsize_energy=batchsize_energy,
                batchsize_logvar=batchsize_logvar,
                w_likelihood=w_likelihood,
                w_energy=w_energy,
                w_logvar=w_logvar,
                temperature=temperature,
                clip_grad_norm=clip_grad_norm,
            )
        )

    def _build_step_fn(
        self,
        batchsize_likelihood=0,
        batchsize_energy=0,
        batchsize_logvar=0,
        w_likelihood=1.0,
        w_energy=1.0,
        w_logvar=1.0,
        temperature=1.0,
        clip_grad_norm=None,
    ):
        """The un-jitted update step (shared by make_train_step and the
        on-device scan loop)."""
        optimizer = self.optimizer
        if clip_grad_norm is not None:
            optimizer = optax.chain(optax.clip_by_global_norm(clip_grad_norm), self.optimizer)

        def resolve(value, step):
            return value(step) if callable(value) else value

        def loss_fn(params, key, batch, step):
            return self.loss(
                params,
                key,
                batch=batch,
                n_kl_samples=batchsize_energy,
                n_logvar_samples=batchsize_logvar,
                w_likelihood=resolve(w_likelihood, step),
                w_energy=resolve(w_energy, step),
                w_logvar=resolve(w_logvar, step),
                temperature=resolve(temperature, step),
            )

        def train_step(params, opt_state, key, batch=None, step=0):
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, key, batch, step
            )
            finite = _tree_all_finite(grads) & jnp.isfinite(loss)
            updates, new_opt_state = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            # skip the step entirely on non-finite gradients
            params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(finite, new, old), new_params, params
            )
            opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(finite, new, old), new_opt_state, opt_state
            )
            metrics["loss"] = loss
            metrics["skipped"] = ~finite
            return params, opt_state, metrics

        return train_step

    def make_train_scan(
        self,
        n_steps: int,
        batchsize_likelihood: int = 0,
        batchsize_energy: int = 0,
        batchsize_logvar: int = 0,
        w_likelihood=1.0,
        w_energy=1.0,
        w_logvar=1.0,
        temperature=1.0,
        clip_grad_norm: Optional[float] = None,
    ):
        """Build one jitted call that runs ``n_steps`` update steps on device.

        Per-step host dispatch dominates small-batch training on remote
        accelerators (the reference steps its optimizer from Python,
        ``trainers.py:84-201``; so does :meth:`train`).  Here the whole loop
        is a ``lax.scan`` inside one executable: minibatch indices are drawn
        on device from the device-resident dataset (uniform, or categorical
        when ``log_weights`` is given), so a call only pays one dispatch.

        Returns ``run(params, opt_state, key, data=(), log_weights=None,
        step0=0) -> (params, opt_state, metrics)`` where ``data`` is a tuple
        of arrays (pass ``DatasetSampler.data``) and ``metrics`` holds
        per-step (n_steps,) arrays (loss etc.).  ``step0 + i`` drives any
        schedule arguments, so chunked calls continue annealing seamlessly.
        """
        step_fn = self._build_step_fn(
            batchsize_likelihood=batchsize_likelihood,
            batchsize_energy=batchsize_energy,
            batchsize_logvar=batchsize_logvar,
            w_likelihood=w_likelihood,
            w_energy=w_energy,
            w_logvar=w_logvar,
            temperature=temperature,
            clip_grad_norm=clip_grad_norm,
        )
        bs = int(batchsize_likelihood)

        @jax.jit
        def run(params, opt_state, key, data=(), log_weights=None, step0=0):
            data_t = tuple(data)

            def body(carry, i):
                params, opt_state, key = carry
                key, kb, ks = jax.random.split(key, 3)
                if data_t and bs > 0:
                    n = data_t[0].shape[0]
                    if log_weights is None:
                        idx = jax.random.randint(kb, (bs,), 0, n)
                    else:
                        idx = jax.random.categorical(kb, log_weights, shape=(bs,))
                    batch = tuple(jnp.take(d, idx, axis=0) for d in data_t)
                else:
                    batch = None
                params, opt_state, metrics = step_fn(params, opt_state, ks, batch, step0 + i)
                return (params, opt_state, key), metrics

            (params, opt_state, _), metrics = jax.lax.scan(
                body,
                (params, opt_state, key),
                jnp.arange(n_steps, dtype=jnp.int32),
            )
            return params, opt_state, metrics

        return run

    def train(
        self,
        params,
        key,
        n_iter: int,
        data=None,
        opt_state=None,
        batchsize: int = 128,
        n_kl_samples: Optional[int] = None,
        n_logvar_samples: Optional[int] = None,
        w_likelihood=1.0,
        w_energy=1.0,
        w_logvar=1.0,
        temperature=1.0,
        progress_interval: Optional[int] = None,
        reporter: Optional[LossReporter] = None,
        test_data=None,
        test_interval: Optional[int] = None,
        test_batchsize: int = 512,
        checkpoint_dir: Optional[str] = None,
        checkpoint_interval: Optional[int] = None,
        start_step: int = 0,
        scan_chunk: int = 0,
    ):
        """Run ``n_iter`` optimization steps; returns (params, opt_state, reporter).

        * ``w_likelihood``/``w_energy``/``temperature`` accept floats or
          ``fn(step)`` schedules (annealing); LR schedules go through optax.
        * ``test_data``: held-out samples; their NLL is evaluated every
          ``test_interval`` iterations and recorded by the reporter
          (reference: ``trainers.py:165-175`` test-NLL track).
        * ``checkpoint_dir``: orbax-checkpoint ``{params, opt_state, step}``
          every ``checkpoint_interval`` iterations and at the end; resume by
          restoring and passing ``params``/``opt_state``/``start_step``.
        * ``scan_chunk`` > 0 runs the loop on device in chunks of that many
          steps via :meth:`make_train_scan` (one dispatch per chunk instead
          of per step; ~10x faster small-batch training through a remote
          accelerator).  ``data`` must then be a DatasetSampler (or None);
          test NLL and checkpoints happen at chunk boundaries.
        """
        if opt_state is None:
            opt_state = self.init(params)
        if scan_chunk:
            return self._train_scanned(
                params, key, n_iter, data, opt_state, batchsize, n_kl_samples,
                n_logvar_samples, w_likelihood, w_energy, w_logvar,
                temperature, progress_interval,
                reporter, test_data, test_interval, test_batchsize,
                checkpoint_dir, checkpoint_interval, start_step, scan_chunk,
            )
        n_kl = batchsize if n_kl_samples is None else n_kl_samples
        n_lv = batchsize if n_logvar_samples is None else n_logvar_samples
        step = self.make_train_step(
            batchsize_likelihood=batchsize if data is not None else 0,
            batchsize_energy=n_kl if self.train_energy and self.bg.target is not None else 0,
            batchsize_logvar=n_lv if self.train_logvar and self.bg.target is not None else 0,
            w_likelihood=w_likelihood,
            w_energy=w_energy,
            w_logvar=w_logvar,
            temperature=temperature,
        )
        track_test = test_data is not None
        if track_test:
            test_interval = test_interval or max(1, n_iter // 20)
            test_batch = jnp.asarray(test_data)[:test_batchsize]
            test_nll = jax.jit(
                lambda p: jnp.mean(self.bg.energy(p, test_batch))
            )
        if reporter is None:
            reporter = LossReporter("loss", "test_nll") if track_test else LossReporter("loss")
        last_test = np.nan
        for i in range(n_iter):
            global_step = start_step + i
            key, key_step, key_data = jax.random.split(key, 3)
            batch = None
            if data is not None:
                sampled = data.sample(key_data, batchsize)
                batch = sampled if isinstance(sampled, tuple) else (sampled,)
            params, opt_state, metrics = step(
                params, opt_state, key_step, batch, jnp.asarray(global_step, jnp.int32)
            )
            if track_test:
                if (i + 1) % test_interval == 0 or i == n_iter - 1:
                    last_test = float(test_nll(params))
                reporter.report(metrics["loss"], last_test)
            else:
                reporter.report(metrics["loss"])
            if progress_interval and (i + 1) % progress_interval == 0:
                extra = f" test_nll={last_test:.4f}" if track_test else ""
                print(f"iter {i + 1}/{n_iter}: loss={float(metrics['loss']):.4f}{extra}")
            if checkpoint_dir and checkpoint_interval and (i + 1) % checkpoint_interval == 0:
                from ..utils.checkpoint import save_checkpoint

                save_checkpoint(
                    checkpoint_dir,
                    global_step + 1,
                    {"params": params, "opt_state": opt_state, "step": global_step + 1},
                )
        if checkpoint_dir:
            from ..utils.checkpoint import save_checkpoint

            save_checkpoint(
                checkpoint_dir,
                start_step + n_iter,
                {"params": params, "opt_state": opt_state, "step": start_step + n_iter},
            )
        return params, opt_state, reporter

    def _train_scanned(
        self, params, key, n_iter, data, opt_state, batchsize, n_kl_samples,
        n_logvar_samples, w_likelihood, w_energy, w_logvar, temperature,
        progress_interval, reporter,
        test_data, test_interval, test_batchsize, checkpoint_dir,
        checkpoint_interval, start_step, scan_chunk,
    ):
        """On-device chunked training loop (``train(scan_chunk=...)``)."""
        n_kl = batchsize if n_kl_samples is None else n_kl_samples
        n_lv = batchsize if n_logvar_samples is None else n_logvar_samples
        data_arrays = ()
        log_weights = None
        if data is not None:
            if not hasattr(data, "data"):
                raise TypeError(
                    "train(scan_chunk=...) needs a DatasetSampler (device-"
                    f"resident arrays) for likelihood training, got {type(data)}"
                )
            data_arrays = data.data
            log_weights = getattr(data, "log_weights", None)
        make = lambda n: self.make_train_scan(
            n,
            batchsize_likelihood=batchsize if data is not None else 0,
            batchsize_energy=n_kl if self.train_energy and self.bg.target is not None else 0,
            batchsize_logvar=n_lv if self.train_logvar and self.bg.target is not None else 0,
            w_likelihood=w_likelihood,
            w_energy=w_energy,
            w_logvar=w_logvar,
            temperature=temperature,
        )
        full = min(scan_chunk, n_iter)
        run = make(full)
        run_tail = None
        track_test = test_data is not None
        if track_test:
            test_batch = jnp.asarray(test_data)[:test_batchsize]
            test_nll = jax.jit(lambda p: jnp.mean(self.bg.energy(p, test_batch)))
        if reporter is None:
            reporter = LossReporter("loss", "test_nll") if track_test else LossReporter("loss")
        last_test = np.nan
        done = 0
        while done < n_iter:
            chunk = min(full, n_iter - done)
            if chunk == full:
                fn = run
            else:
                run_tail = run_tail if run_tail is not None else make(chunk)
                fn = run_tail
            key, sub = jax.random.split(key)
            params, opt_state, metrics = fn(
                params, opt_state, sub, data_arrays, log_weights,
                jnp.asarray(start_step + done, jnp.int32),
            )
            losses = np.asarray(metrics["loss"])
            done += chunk
            if track_test:
                last_test = float(test_nll(params))
                for l in losses:
                    reporter.report(l, last_test)
            else:
                for l in losses:
                    reporter.report(l)
            if progress_interval:
                extra = f" test_nll={last_test:.4f}" if track_test else ""
                print(f"iter {done}/{n_iter}: loss={losses[-1]:.4f}{extra}")
            if checkpoint_dir and checkpoint_interval:
                from ..utils.checkpoint import save_checkpoint

                save_checkpoint(
                    checkpoint_dir,
                    start_step + done,
                    {"params": params, "opt_state": opt_state, "step": start_step + done},
                )
        if checkpoint_dir:
            from ..utils.checkpoint import save_checkpoint

            save_checkpoint(
                checkpoint_dir,
                start_step + n_iter,
                {"params": params, "opt_state": opt_state, "step": start_step + n_iter},
            )
        return params, opt_state, reporter
