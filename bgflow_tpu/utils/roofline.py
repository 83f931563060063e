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

__all__ = [
    "TPU_PEAKS",
    "detect_chip",
    "xla_cost_analysis",
    "dot_flops",
    "hbm_traffic_from_hlo",
    "roofline",
]

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


_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16, "f8e4m3fn": 1, "f8e5m2": 1, "token": 0,
}

# entry-computation opcodes that do not launch a kernel / move HBM data
_HLO_NO_TRAFFIC = {
    "parameter", "constant", "tuple", "get-tuple-element", "bitcast",
    "bitcast-convert", "after-all", "partition-id", "replica-id",
}

_SHAPE_RE = None  # compiled lazily (module import stays cheap)


def _shape_bytes(type_str: str) -> float:
    """Total bytes of an HLO type string, e.g. ``f32[1024,66]{1,0}`` or a
    tuple ``(f32[8]{0}, u32[2]{0})``."""
    import re

    global _SHAPE_RE
    if _SHAPE_RE is None:
        _SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
    total = 0.0
    for dtype, dims in _SHAPE_RE.findall(type_str):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1.0
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def hbm_traffic_from_hlo(fn: Callable, *args, **kwargs) -> Optional[Dict[str, float]]:
    """Analytic unique-HBM-traffic estimate from the optimized HLO.

    XLA's ``cost_analysis()['bytes accessed']`` sums *per-op operand bytes*,
    counting VMEM-resident traffic inside fusions — on fusion-heavy code it
    can exceed physical HBM bandwidth (the round-3 bench printed 147% of
    peak).  This estimator instead walks the ENTRY computation of the
    *post-fusion* HLO: each top-level instruction is one launched kernel,
    whose operands are read from HBM and whose result is written back, so

        traffic = sum over kernels of (operand bytes + result bytes)

    which is what the memory system actually moves.  Three aliasing/placement
    corrections keep it honest (each was measured to inflate the naive walk
    on the flagship):

    * ``S(1)``-annotated buffers live in VMEM (XLA memory-space assignment)
      — they move no HBM bytes and count as 0;
    * the ``-done`` halves of async copy pairs repeat the buffers their
      ``-start`` already counted — skipped;
    * ``dynamic-update-slice`` fusions update their largest operand IN
      PLACE (XLA input/output buffer aliasing): only the inserted slice and
      the small operands move, not two copies of the full buffer.

    Residual bias is still upward (a buffer read by k kernels counts k
    reads even when CMEM catches some; further in-place aliasing is
    invisible in the text), and top-level while/conditional bodies are not
    walked.  Returns ``{"hbm_bytes": float, "n_kernels": int}`` or None if
    the backend does not expose compiled HLO text.
    """
    import re

    try:
        compiled = jax.jit(fn).lower(*args, **kwargs).compile()
        txt = compiled.as_text()
    except Exception:
        return None
    # isolate the ENTRY computation block
    m = re.search(r"^ENTRY [^{]+\{(.*?)^\}", txt, re.S | re.M)
    if m is None:
        return None
    body = m.group(1)
    # name -> result bytes, for operand lookup
    inst_re = re.compile(
        r"^\s*(?:ROOT\s+)?(%?[\w.\-]+)\s*=\s*((?:\([^)]*\)|[\w\[\]{},:()#\s*]+?))\s+([\w\-]+)\((.*)$",
    )
    result_bytes: Dict[str, float] = {}
    lines = []
    for line in body.splitlines():
        mm = inst_re.match(line)
        if not mm:
            continue
        name, type_str, opcode, rest = mm.groups()
        name = name.lstrip("%")
        # VMEM-resident (memory space 1) results move no HBM bytes
        nbytes = 0.0 if "S(1)" in type_str else _shape_bytes(type_str)
        result_bytes[name] = nbytes
        lines.append((name, opcode, rest))
    total = 0.0
    n_kernels = 0
    operand_re = re.compile(r"%?([\w.\-]+)")
    for name, opcode, rest in lines:
        if opcode in _HLO_NO_TRAFFIC:
            continue
        if opcode.endswith("-done"):
            # the matching -start already counted this transfer
            continue
        n_kernels += 1
        # operands: the first top-level parenthesized list (already split
        # open by the regex); cut at the matching close paren
        depth, end = 1, len(rest)
        for i, ch in enumerate(rest):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    end = i
                    break
        op_bytes = [
            result_bytes[op]
            for op in operand_re.findall(rest[:end])
            if op in result_bytes
        ]
        res = result_bytes.get(name, 0.0)
        if "dynamic-update-slice" in name or opcode == "dynamic-update-slice":
            # in-place update of the largest operand: traffic is the
            # inserted slice(s) written + small operands read
            big = max(op_bytes, default=0.0)
            # read the inserted slice sources once, write the updated
            # region once (the big buffer itself is aliased, not copied)
            total += 2.0 * (sum(op_bytes) - big)
        else:
            total += res + sum(op_bytes)
    return {"hbm_bytes": total, "n_kernels": n_kernels}


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
