"""Conditional rational-quadratic spline transformer.

Reference: ``bgflow/nn/flow/transformer/spline.py:14-204``.  The RQS math is
in-repo (``bgflow_tpu/ops/rqs.py``) instead of delegating to ``nflows``.

Conventions carried over from the reference:

* ``params_net(x)`` emits ``y_dim * 3 * n_bins + n_noncircular`` raw params;
  ``n_bins`` is inferred from the net output width.
* Slopes are made periodic by appending the first slope at the end
  (continuity of the pdf across the boundary); non-circular dims get their
  own independent final slope from the extra params.
* The transformer's *forward* applies the spline's inverse direction (inverse
  CDF convention, reference ``spline.py:128-157``).
* Note: the reference's ``_n_noncircular`` returns ``is_circular.sum()`` in
  the mixed case (``spline.py:190-196``) which miscounts; we use the correct
  ``(~is_circular).sum()``.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .base import Transformer
from ..ops.rqs import rq_spline


class ConditionalSplineTransformer(Transformer):
    def __init__(
        self,
        params_net,
        is_circular=False,
        left: float = 0.0,
        right: float = 1.0,
        bottom: float = 0.0,
        top: float = 1.0,
        use_pallas: bool = False,
    ):
        self.params_net = params_net
        self.is_circular = np.asarray(is_circular, dtype=bool)
        self.left = float(left)
        self.right = float(right)
        self.bottom = float(bottom)
        self.top = float(top)
        # opt-in fused Pallas kernel (ops/rqs_pallas.py); numerically
        # equivalent to the XLA path
        self.use_pallas = bool(use_pallas)

    def init(self, key):
        return self.params_net.init(key)

    def _n_noncircular(self, y_dim: int) -> int:
        if self.is_circular.ndim == 0:
            return 0 if bool(self.is_circular) else y_dim
        return int(np.sum(~self.is_circular))

    def _noncircular_indices(self, y_dim: int):
        if self.is_circular.ndim == 0:
            return np.array([], dtype=int) if bool(self.is_circular) else np.arange(y_dim)
        return np.nonzero(~self.is_circular)[0]

    def _compute_params(self, params, x, y_dim: int):
        raw = self.params_net.apply(params, x)
        batch_shape = raw.shape[:-1]
        n_noncirc = self._n_noncircular(y_dim)
        n_bins = (raw.shape[-1] - n_noncirc) // (y_dim * 3)
        if raw.shape[-1] != y_dim * 3 * n_bins + n_noncirc:
            raise ValueError(
                f"params_net output ({raw.shape[-1]}) does not match "
                f"y_dim*3*n_bins + n_noncircular = {y_dim}*3*{n_bins} + {n_noncirc}"
            )
        w = raw[..., : n_bins * y_dim].reshape(*batch_shape, y_dim, n_bins)
        h = raw[..., n_bins * y_dim : 2 * n_bins * y_dim].reshape(*batch_shape, y_dim, n_bins)
        s = raw[..., 2 * n_bins * y_dim : 3 * n_bins * y_dim].reshape(*batch_shape, y_dim, n_bins)
        noncirc = raw[..., 3 * n_bins * y_dim :]
        # periodic wrap: final slope equals first slope
        slopes = jnp.concatenate([s, s[..., :1]], axis=-1)
        idx = self._noncircular_indices(y_dim)
        if len(idx) > 0:
            slopes = slopes.at[..., idx, -1].set(noncirc)
        return w, h, slopes

    def _net_compute_dtype(self):
        """The wrapped net's matmul compute dtype (unwraps WrapPeriodic)."""
        net = self.params_net
        while not hasattr(net, "compute_dtype") and hasattr(net, "net"):
            net = net.net
        return getattr(net, "compute_dtype", None)

    @staticmethod
    def _net_out_dim(params):
        """Final-layer output width from an MLP-style params pytree, or None."""
        try:
            return int(params[-1]["b"].shape[0])
        except (TypeError, KeyError, IndexError, AttributeError):
            return None

    def _apply(self, params, x, y, spline_inverse: bool):
        if self.use_pallas and hasattr(self.params_net, "apply_transposed"):
            # relayout-free fast path: the conditioner's last matmul emits
            # feature-major (out, B) with its rows already in the Pallas
            # kernel's slab order (the final weight columns are permuted at
            # trace time — ops/rqs_pallas.py slab_row_order), so the kernel
            # slabs are pure reshape views.  Numerically identical to the
            # packed path below.
            from ..ops.rqs_pallas import (
                rq_spline_pallas_slab,
                rq_spline_pallas_slab2,
                slab_row_order,
            )

            y_dim = y.shape[-1]
            n_noncirc = self._n_noncircular(y_dim)
            out_dim = self._net_out_dim(params)
            if out_dim is not None:
                n_bins = (out_dim - n_noncirc) // (y_dim * 3)
                if out_dim != y_dim * 3 * n_bins + n_noncirc:
                    raise ValueError(
                        f"params_net output ({out_dim}) does not match "
                        f"y_dim*3*n_bins + n_noncircular = {y_dim}*3*{n_bins} + {n_noncirc}"
                    )
                hact = None
                if hasattr(self.params_net, "apply_trunk"):
                    try:
                        # trunk in XLA (overlaps with neighboring work),
                        # final matmul + whole spline fused in one Pallas
                        # kernel so the (3*K*D, B) raw-parameter tensor
                        # never touches HBM (ops/rqs_fused.py).  Fusing the
                        # trunk matmuls into the kernel too was measured
                        # SLOWER (the (B, F) conditioner input is
                        # lane-padded to (B, 128) in HBM regardless, so
                        # nothing is saved and the in-kernel matmuls
                        # serialize against the spline VPU work).
                        hact = self.params_net.apply_trunk(params, x)
                    except NotImplementedError:
                        hact = None
                if hact is not None:
                    from ..ops.rqs_fused import fused_row_order, rqs_fused_coupling

                    mm_dtype = self._net_compute_dtype()
                    if mm_dtype is not None:
                        # the kernel casts h to the matmul dtype anyway;
                        # storing it pre-cast halves its HBM round trip
                        # with bit-identical results
                        hact = hact.astype(mm_dtype)
                    order = fused_row_order(
                        y_dim, n_bins, self._noncircular_indices(y_dim)
                    )
                    return rqs_fused_coupling(
                        y,
                        hact,
                        params[-1]["w"][:, order],
                        params[-1]["b"][order],
                        num_bins=n_bins,
                        inverse=spline_inverse,
                        left=self.left,
                        right=self.right,
                        bottom=self.bottom,
                        top=self.top,
                        matmul_dtype=mm_dtype,
                    )
                order = slab_row_order(
                    y_dim, n_bins, self._noncircular_indices(y_dim)
                )
                raw_t = self.params_net.apply_transposed(params, x, row_order=order)
                return rq_spline_pallas_slab2(
                    y,
                    raw_t,
                    num_bins=n_bins,
                    inverse=spline_inverse,
                    left=self.left,
                    right=self.right,
                    bottom=self.bottom,
                    top=self.top,
                )
            # params shape not introspectable: gather-based slab path
            raw_t = self.params_net.apply_transposed(params, x)
            n_bins = (raw_t.shape[0] - n_noncirc) // (y_dim * 3)
            if raw_t.shape[0] != y_dim * 3 * n_bins + n_noncirc:
                raise ValueError(
                    f"params_net output ({raw_t.shape[0]}) does not match "
                    f"y_dim*3*n_bins + n_noncircular = {y_dim}*3*{n_bins} + {n_noncirc}"
                )
            return rq_spline_pallas_slab(
                y,
                raw_t,
                num_bins=n_bins,
                noncircular_indices=self._noncircular_indices(y_dim),
                inverse=spline_inverse,
                left=self.left,
                right=self.right,
                bottom=self.bottom,
                top=self.top,
            )
        w, h, slopes = self._compute_params(params, x, y.shape[-1])
        if self.use_pallas:
            from ..ops.rqs_pallas import rq_spline_pallas_ad as _rqs
        else:
            _rqs = rq_spline
        z, ldj = _rqs(
            y,
            w,
            h,
            slopes,
            inverse=spline_inverse,
            left=self.left,
            right=self.right,
            bottom=self.bottom,
            top=self.top,
        )
        return z, jnp.sum(ldj, axis=-1)

    def _forward(self, params, x, y, **kwargs):
        return self._apply(params, x, y, spline_inverse=True)

    def _inverse(self, params, x, y, **kwargs):
        return self._apply(params, x, y, spline_inverse=False)
