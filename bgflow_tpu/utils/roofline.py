"""FLOP/byte accounting and roofline/MFU reporting for jitted functions.

The reference publishes no performance model at all; BASELINE.md's
north-star ("samples/s/chip") needs a *capability denominator* to mean
anything.  This module provides it three ways:

- :func:`xla_cost_analysis` — the compiled executable's own FLOP and
  HBM-byte counts (exact for what XLA emitted, backend-specific);
- :func:`dot_flops` — an analytic, backend-independent count of matmul
  FLOPs from the jaxpr (``dot_general`` 2·B·M·N·K, scan-length aware) —
  the cross-check that the XLA number is dominated by the MXU work we
  think it is;
- :func:`roofline` — achieved TFLOP/s + MFU%, achieved HBM GB/s +
  utilization%, arithmetic intensity vs the chip's ridge point, and the
  verdict (compute- vs bandwidth-bound).

Chip peaks are public datasheet numbers (bf16 MXU TFLOP/s, HBM GB/s).
"""
from __future__ import annotations

import math
import os
from typing import Any, Callable, Dict, Optional

import numpy as np
import jax

__all__ = ["TPU_PEAKS", "detect_chip", "xla_cost_analysis", "dot_flops", "roofline"]

# public peak specs: (dense bf16 TFLOP/s, HBM GB/s)
TPU_PEAKS: Dict[str, Dict[str, float]] = {
    "v4": {"bf16_tflops": 275.0, "hbm_gbs": 1228.0},
    "v5e": {"bf16_tflops": 197.0, "hbm_gbs": 819.0},
    "v5p": {"bf16_tflops": 459.0, "hbm_gbs": 2765.0},
    "v6e": {"bf16_tflops": 918.0, "hbm_gbs": 1640.0},
}


def detect_chip() -> Optional[str]:
    """Best-effort chip generation: env pin first, then device_kind."""
    env = os.environ.get("PALLAS_AXON_TPU_GEN", "").lower()
    if env in TPU_PEAKS:
        return env
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return None
    for name in TPU_PEAKS:
        if name in kind.replace(" ", "").replace("tpu", ""):
            return name
    if "v5 lite" in kind or "v5lite" in kind.replace(" ", ""):
        return "v5e"
    return None


def xla_cost_analysis(fn: Callable, *args, **kwargs) -> Optional[Dict[str, float]]:
    """FLOPs and HBM bytes of the compiled executable, or None if the
    backend does not expose a cost analysis (some remote-compile tunnels)."""
    try:
        compiled = jax.jit(fn).lower(*args, **kwargs).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else None
        if not ca:
            return None
        out = {}
        if "flops" in ca:
            out["flops"] = float(ca["flops"])
        if "bytes accessed" in ca:
            out["bytes_accessed"] = float(ca["bytes accessed"])
        return out or None
    except Exception:
        return None


def _dot_general_flops(eqn) -> float:
    (lhs_c, rhs_c), (lhs_b, rhs_b) = eqn.params["dimension_numbers"]
    lhs, rhs = eqn.invars[0].aval.shape, eqn.invars[1].aval.shape
    b = math.prod(lhs[d] for d in lhs_b)
    k = math.prod(lhs[d] for d in lhs_c)
    m = math.prod(lhs[d] for d in range(len(lhs)) if d not in set(lhs_c) | set(lhs_b))
    n = math.prod(rhs[d] for d in range(len(rhs)) if d not in set(rhs_c) | set(rhs_b))
    return 2.0 * b * m * n * k


def _jaxpr_dot_flops(jaxpr) -> float:
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_general_flops(eqn)
        elif name == "scan":
            total += eqn.params["length"] * _jaxpr_dot_flops(eqn.params["jaxpr"].jaxpr)
        elif name == "while":
            # trip count unknown statically; count one iteration of body+cond
            total += _jaxpr_dot_flops(eqn.params["body_jaxpr"].jaxpr)
            total += _jaxpr_dot_flops(eqn.params["cond_jaxpr"].jaxpr)
        elif name == "cond":
            branches = eqn.params.get("branches", ())
            if branches:
                total += max(_jaxpr_dot_flops(b.jaxpr) for b in branches)
        else:
            # generic containers: pjit, custom_jvp/vjp, remat, shard_map, ...
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                sub = eqn.params.get(key)
                if sub is not None:
                    total += _jaxpr_dot_flops(getattr(sub, "jaxpr", sub))
                    break
    return total


def dot_flops(fn: Callable, *args, **kwargs) -> float:
    """Analytic matmul FLOPs of one call (2·B·M·N·K per ``dot_general``),
    from the jaxpr — backend-independent, scan-length aware."""
    jaxpr = jax.make_jaxpr(fn)(*args, **kwargs)
    return _jaxpr_dot_flops(jaxpr.jaxpr)


def roofline(
    flops_per_item: float,
    bytes_per_item: Optional[float],
    items_per_sec: float,
    chip: Optional[str] = None,
) -> Dict[str, Any]:
    """Roofline verdict for a measured throughput.

    ``flops_per_item``/``bytes_per_item`` per unit of work (e.g. one
    sample), ``items_per_sec`` the measured rate.  MFU is reported against
    the chip's dense bf16 MXU peak (the conditioner matmuls — where the
    FLOPs are — run bf16; elementwise f32 work makes the true ceiling
    slightly lower, so MFU% is conservative).
    """
    chip = chip or detect_chip()
    peak = TPU_PEAKS.get(chip or "", None)
    out: Dict[str, Any] = {
        "chip": chip,
        "flops_per_item": flops_per_item,
        "bytes_per_item": bytes_per_item,
        "achieved_tflops": flops_per_item * items_per_sec / 1e12,
    }
    if bytes_per_item:
        out["achieved_hbm_gbs"] = bytes_per_item * items_per_sec / 1e9
        out["arithmetic_intensity"] = flops_per_item / bytes_per_item
    if peak:
        out["peak_bf16_tflops"] = peak["bf16_tflops"]
        out["peak_hbm_gbs"] = peak["hbm_gbs"]
        out["mfu_pct"] = round(100.0 * out["achieved_tflops"] / peak["bf16_tflops"], 2)
        if bytes_per_item:
            out["hbm_utilization_pct"] = round(
                100.0 * out["achieved_hbm_gbs"] / peak["hbm_gbs"], 2
            )
            ridge = peak["bf16_tflops"] * 1e12 / (peak["hbm_gbs"] * 1e9)
            out["ridge_point_flops_per_byte"] = round(ridge, 1)
            out["bound"] = (
                "compute" if out["arithmetic_intensity"] >= ridge else "memory"
            )
    return out
