"""One-kernel fused sampling path for spline-coupling Boltzmann generators.

The builder's standard sampling pipeline (uniform prior -> N conditional
spline couplings -> inverse-CDF maps onto IC domains -> whitened-fixed +
z-matrix NeRF reconstruction) compiles under XLA into ~1200 kernels whose
wall-clock is dominated by launch/VPU work and HBM round trips of
intermediates (round-4 roofline: 21% of the bandwidth budget used).  This
module collapses prior + couplings + IC-domain maps + whitening into ONE
Pallas kernel:

* the prior is drawn in-kernel from the TPU hardware PRNG (no threefry
  kernels, no (B, D) latent round trip);
* every coupling runs feature-major — conditioner trunk, final matmul and
  the full RQ spline back to back with all weights VMEM-resident; the
  (3K+1)*D parameter slab never exists in HBM;
* the truncated-normal / normal inverse-CDF domain maps run in registers
  (branchless Giles-polynomial ``ndtri``);
* angle/torsion unnormalization, the NeRF placement log-det and the
  fixed-atom de-whitening matmul happen in the same pass.

The kernel emits bonds/angles(rad)/torsions(rad)/fixed feature-major plus
the total flow log-det; the existing fused wide reconstruction kernel
(``ops/ic_pallas.py``) consumes them with a zero-cost reshape (no
transpose) and produces Cartesian coordinates.

Sample identity: column b of the feature-major buffers is sample b; the
wide reconstruction splits b = sub*S + s exactly like
``ic_reconstruct_pallas_wide``'s batch-major reshape, so the final
gather/transpose reproduces the standard (B, n_atoms*3) layout.

Validation: ``debug_u`` mode reads the latent uniforms from HBM instead of
the hardware PRNG; feeding the same uniforms through the generator's own
``flow.forward`` must reproduce x and dlogp to f32 tolerance
(``tests/test_sample_fused.py``).

Reference parity: this is the TPU-native replacement for the reference's
``BoltzmannGenerator.sample`` hot path (``bgflow/bg.py:105-139``,
``nn/flow/sequential.py:26-59``); the reference has no fused counterpart.
"""
from __future__ import annotations

import functools
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rqs_pallas import _rqs_math
from .rqs import (
    DEFAULT_MIN_BIN_HEIGHT,
    DEFAULT_MIN_BIN_WIDTH,
    DEFAULT_MIN_DERIVATIVE,
)

__all__ = ["extract_spec", "make_fused_sampler", "FusedSampleUnsupported"]

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


class FusedSampleUnsupported(Exception):
    """The generator's structure is outside what the fused kernel covers."""


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


# ---------------------------------------------------------------------------
# in-kernel ndtri (inverse normal CDF) — Wichura's AS 241 PPND7 rational
# approximation (~1e-7 relative), written with scalar coefficients because
# jax.scipy.special.ndtri traces captured constant arrays, which
# pallas_call rejects.  Branchless: all three regions are evaluated and
# selected elementwise.
# ---------------------------------------------------------------------------

def _ndtri(u):
    """Inverse standard normal CDF (u must be in (0, 1))."""
    q = u - 0.5
    # central region |q| <= 0.425
    r = 0.180625 - q * q
    num_c = ((59.109374720 * r + 159.29113202) * r + 50.434271938) * r + 3.3871327179
    den_c = ((67.187563600 * r + 78.757757664) * r + 17.895169469) * r + 1.0
    x_c = q * num_c / den_c
    # tail regions, via r = sqrt(-log(min(u, 1-u)))
    p_min = jnp.maximum(jnp.minimum(u, 1.0 - u), 1e-38)
    rt = jnp.sqrt(-jnp.log(p_min))
    r1 = rt - 1.6
    num_m = ((0.17023821103 * r1 + 1.3067284816) * r1 + 2.7568153900) * r1 + 1.4234372777
    den_m = (0.12021132975 * r1 + 0.73700164250) * r1 + 1.0
    r2 = rt - 5.0
    num_t = ((0.017337203997 * r2 + 0.42868294337) * r2 + 3.0812263860) * r2 + 6.6579051150
    den_t = (0.012258202635 * r2 + 0.24197894225) * r2 + 1.0
    x_t = jnp.where(rt <= 5.0, num_m / den_m, num_t / den_t)
    x_t = jnp.where(q < 0.0, -x_t, x_t)
    return jnp.where(jnp.abs(q) <= 0.425, x_c, x_t)


# ---------------------------------------------------------------------------
# spec extraction: introspect a built generator
# ---------------------------------------------------------------------------

def extract_spec(gen) -> Dict[str, Any]:
    """Static description of the generator's sampling pipeline.

    Supports: ProductDistribution of UniformDistributions as the prior; a
    chain of Coupling(ConditionalSplineTransformer) blocks with DenseNet or
    WrapPeriodic(DenseNet) conditioners; per-field Wrap(Inverse(CDFTransform))
    IC-domain maps over TruncatedNormal / DiagonalNormal / Uniform marginals;
    a final Wrap(Inverse(MixedCoordinateTransformation)).  Raises
    :class:`FusedSampleUnsupported` otherwise.
    """
    from ..core.structural import Coupling, Wrap
    from ..core.flow import Inverse
    from ..flows.cdf import CDFTransform
    from ..flows.ic import MixedCoordinateTransformation
    from ..distributions.normal import (
        DiagonalNormal,
        TruncatedNormalDistribution,
    )
    from ..distributions.uniform import UniformDistribution
    from ..distributions.product import ProductDistribution
    from ..transformers.spline import ConditionalSplineTransformer
    from ..nets.dense import DenseNet, WrapPeriodic

    prior = gen.prior
    if not isinstance(prior, ProductDistribution):
        raise FusedSampleUnsupported(f"prior {type(prior).__name__}")
    field_dims = []
    for comp in prior.components:
        if not isinstance(comp, UniformDistribution):
            raise FusedSampleUnsupported(f"prior component {type(comp).__name__}")
        low = np.asarray(comp.low)
        high = np.asarray(comp.high)
        if not (np.allclose(low, 0.0) and np.allclose(high, 1.0)):
            raise FusedSampleUnsupported("prior uniform must be [0, 1]")
        if low.ndim != 1:
            raise FusedSampleUnsupported("prior fields must be vectors")
        field_dims.append(int(low.shape[0]))
    n_fields = len(field_dims)

    blocks: List[Dict[str, Any]] = []
    maps: List[Optional[Dict[str, Any]]] = [None] * n_fields
    mixed = None
    for b in gen.flow.blocks:
        if isinstance(b, Coupling):
            if mixed is not None or any(m is not None for m in maps):
                raise FusedSampleUnsupported("coupling after maps")
            tr = b.transformer
            if not isinstance(tr, ConditionalSplineTransformer):
                raise FusedSampleUnsupported(type(tr).__name__)
            if len(b.transformed) != 1 or b.temperature_feature:
                raise FusedSampleUnsupported("multi-field/tempered coupling")
            if float(tr.left) != 0.0 or float(tr.right) != 1.0 or \
                    float(tr.bottom) != 0.0 or float(tr.top) != 1.0:
                raise FusedSampleUnsupported("spline domain must be [0,1]")
            net = tr.params_net
            wrap_indices = None
            if isinstance(net, WrapPeriodic):
                if net.left != 0.0 or net.right != 1.0:
                    raise FusedSampleUnsupported("WrapPeriodic domain")
                wrap_indices = np.asarray(
                    np.arange(sum(field_dims[i] for i in b.on))[net.indices]
                )
                net = net.net
            if type(net) is not DenseNet or len(net.units) != 4:
                raise FusedSampleUnsupported(
                    f"conditioner {type(net).__name__} units={getattr(net, 'units', None)}"
                )
            t_idx = b.transformed[0]
            D = field_dims[t_idx]
            circ = tr.is_circular
            if circ.ndim == 0:
                circ = np.full(D, bool(circ))
            n_nc = int(np.sum(~circ))
            n_bins = (net.units[-1] - n_nc) // (3 * D)
            if net.units[-1] != 3 * n_bins * D + n_nc:
                raise FusedSampleUnsupported("net out dim mismatch")
            blocks.append(dict(
                t_idx=t_idx, on=tuple(b.on), wrap_indices=wrap_indices,
                units=net.units, activations=net.activations,
                compute_dtype=net.compute_dtype, num_bins=n_bins,
                noncircular=np.nonzero(~circ)[0],
            ))
        elif isinstance(b, Wrap):
            inner = b.flow
            if not isinstance(inner, Inverse):
                raise FusedSampleUnsupported(type(inner).__name__)
            dele = inner.delegate
            if isinstance(dele, CDFTransform):
                if len(b.indices) != 1 or b.out_indices != b.indices:
                    raise FusedSampleUnsupported("CDF wrap indices")
                fi = b.indices[0]
                dist = dele.distribution
                eps = dele.eps
                if isinstance(dist, TruncatedNormalDistribution):
                    cdf_lo, cdf_hi = (np.asarray(v) for v in dist._cdf_bounds(dist.sigma))
                    maps[fi] = dict(
                        kind="truncnorm", eps=eps,
                        mu=np.asarray(dist.mu), sigma=np.asarray(dist.sigma),
                        cdf_lo=cdf_lo, Z=cdf_hi - cdf_lo,
                    )
                elif isinstance(dist, DiagonalNormal):
                    maps[fi] = dict(
                        kind="normal", eps=eps,
                        mu=np.asarray(dist.mu), sigma=np.asarray(dist.sigma),
                    )
                elif isinstance(dist, UniformDistribution):
                    maps[fi] = dict(
                        kind="uniform", eps=eps,
                        low=np.asarray(dist.low), high=np.asarray(dist.high),
                    )
                else:
                    raise FusedSampleUnsupported(type(dist).__name__)
            elif isinstance(dele, MixedCoordinateTransformation):
                if mixed is not None:
                    raise FusedSampleUnsupported("two mixed transforms")
                if tuple(b.indices) != tuple(range(n_fields)):
                    raise FusedSampleUnsupported("mixed wrap indices")
                wh = dele._whiten
                rel = dele._rel_ic
                if not rel.normalize_angles:
                    raise FusedSampleUnsupported("unnormalized angles")
                from .ic_pallas import build_plan

                mixed = dict(
                    order=tuple(b.indices),
                    t_blacken=np.asarray(wh.t_blacken),  # (keepdims, dim)
                    mean=np.asarray(wh.mean),
                    jacobian_xz=float(wh.jacobian_xz),
                    eps=rel.eps,
                    plan=build_plan(rel._blocks, rel._atom2index,
                                    rel._index2order, len(rel._fixed_atoms)),
                    atom2index=np.asarray(rel._atom2index),
                    n_fixed=len(rel._fixed_atoms),
                    n_total=len(rel._fixed_atoms) + len(rel.z_matrix),
                )
            else:
                raise FusedSampleUnsupported(type(dele).__name__)
        else:
            raise FusedSampleUnsupported(type(b).__name__)
    if mixed is None or any(m is None for m in maps):
        raise FusedSampleUnsupported("missing maps or mixed transform")
    # field roles: which prior field feeds bonds/angles/torsions/fixed of
    # the mixed transform (wrap indices order = (bonds, angles, torsions,
    # fixed) by MixedCoordinateTransformation._inverse signature)
    if len(mixed["order"]) != 4:
        raise FusedSampleUnsupported("mixed transform needs 4 fields")
    return dict(field_dims=field_dims, blocks=blocks, maps=maps, mixed=mixed)


# ---------------------------------------------------------------------------
# weight preparation (trace time)
# ---------------------------------------------------------------------------

def _fused_final_order(D: int, K: int, noncirc: np.ndarray) -> np.ndarray:
    """Packed-layout row index for each fused slab row (k-major, dim-minor,
    Dp-padded; same convention as ``rqs_fused.fused_row_order``)."""
    Dp = _round_up(D, 8)
    woff, hoff, soff, ncoff = 0, K * D, 2 * K * D, 3 * K * D
    nc_rank = {int(d): r for r, d in enumerate(noncirc)}
    order = []
    for base in (woff, hoff):
        for k in range(K):
            order.extend([base + d * K + k if d < D else 0 for d in range(Dp)])
    for k in range(K):
        order.extend([soff + d * K + k if d < D else 0 for d in range(Dp)])
    order.extend([
        (ncoff + nc_rank[d]) if d in nc_rank else (soff + d * K)
        if d < D else 0
        for d in range(Dp)
    ])
    return np.asarray(order, dtype=np.int64)


def _prep_weights(spec, params):
    """Per-block feature-major weight tensors (cast to the conditioner's
    compute dtype at trace time so the kernel reads half-size buffers)."""
    out = []
    for bi, blk in enumerate(spec["blocks"]):
        p = params[bi]
        W1, b1 = p[0]["w"], p[0]["b"]          # (F, H), (H,)
        W2, b2 = p[1]["w"], p[1]["b"]          # (H, H), (H,)
        Wf, bf = p[2]["w"], p[2]["b"]          # (H, R0), (R0,)
        D = spec["field_dims"][blk["t_idx"]]
        order = _fused_final_order(D, blk["num_bins"], blk["noncircular"])
        mmd = blk["compute_dtype"] or jnp.float32
        out.append(dict(
            w1t=W1.T.astype(mmd), b1=b1[:, None].astype(jnp.float32),
            w2t=W2.T.astype(mmd), b2=b2[:, None].astype(jnp.float32),
            wf=Wf.T[order].astype(mmd), bf=bf[order][:, None].astype(jnp.float32),
        ))
    return out


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _sample_kernel(
    *refs,
    spec,
    Cw: int,
    debug: bool,
    n_streams: int = 1,
):
    """refs layout:
      [seed (SMEM, 3 ints)] if not debug else [u (rows_u, Cw)]
      then per block: w1t, b1, w2t, b2, wf, bf
      then map constants (per field, variable count)
      then t_blacken (Kp, Mp), mean (Mp, 1)
      outs: bonds, angles, torsions (D, Cw) each, fixed (M, Cw), ldj (1, Cw)

    ``n_streams > 1`` splits the tile into independent lane slices whose
    computations interleave at the instruction level — the MXU matmuls of
    one stream overlap the VPU spline math of the other (the per-stream
    chains share no data).
    """
    field_dims = spec["field_dims"]
    mixed = spec["mixed"]
    fo = mixed["order"]  # (bonds_f, angles_f, torsions_f, fixed_f)

    it = iter(refs)
    seed_or_u = next(it)
    wrefs = [[next(it) for _ in range(6)] for _ in spec["blocks"]]
    mrefs = []
    for m in spec["maps"]:
        if m["kind"] in ("truncnorm",):
            mrefs.append([next(it) for _ in range(4)])  # mu, sigma, cdf_lo, Z
        elif m["kind"] == "normal":
            mrefs.append([next(it) for _ in range(2)])  # mu, sigma
        else:
            mrefs.append([next(it) for _ in range(2)])  # low, span
    tb_ref = next(it)
    mean_ref = next(it)
    out_refs = [next(it) for _ in range(4)]
    ldj_ref = next(it)

    Dps = [_round_up(d, 8) for d in field_dims]
    assert Cw % n_streams == 0
    Ws = Cw // n_streams
    for si in range(n_streams):
        _sample_stream(
            spec, seed_or_u, wrefs, mrefs, tb_ref, mean_ref, out_refs,
            ldj_ref, Dps, debug=debug, lo=si * Ws, Wl=Ws,
            stream_tag=si, n_streams=n_streams,
        )


def _sample_stream(
    spec, seed_or_u, wrefs, mrefs, tb_ref, mean_ref, out_refs, ldj_ref, Dps,
    *, debug: bool, lo: int, Wl: int, stream_tag: int, n_streams: int,
):
    field_dims = spec["field_dims"]
    mixed = spec["mixed"]
    fo = mixed["order"]

    # ---- prior: uniforms in [0,1) per field ----
    if debug:
        off = 0
        state = []
        for fi, d in enumerate(field_dims):
            state.append(seed_or_u[off:off + d, lo:lo + Wl])
            off += d
        # pad rows to Dp with 0.5
        state = [
            jnp.concatenate([s, jnp.full((Dps[fi] - field_dims[fi], Wl), 0.5,
                                         jnp.float32)], axis=0)
            if Dps[fi] != field_dims[fi] else s
            for fi, s in enumerate(state)
        ]
    else:
        step = pl.program_id(0)
        # hardware seed takes at most 2 words: mix (tile, stream) into the
        # second with an odd multiplicative hash (distinct per slice)
        pltpu.prng_seed(
            seed_or_u[0],
            seed_or_u[1]
            + (step * jnp.int32(n_streams) + jnp.int32(stream_tag))
            * jnp.int32(-1640531527),
        )
        state = []
        for fi, d in enumerate(field_dims):
            bits = pltpu.bitcast(pltpu.prng_random_bits((Dps[fi], Wl)), jnp.uint32)
            # top 24 bits -> uniform [0, 1): logical shift on uint32, then
            # reinterpret as (always-positive) int32 — Mosaic has no
            # uint32->f32 cast
            u = pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) * (
                1.0 / (1 << 24))
            state.append(u)

    ldj = jnp.zeros((1, Wl), jnp.float32)

    def row_mask(Dp, D):
        return jax.lax.broadcasted_iota(jnp.int32, (Dp, Wl), 0) < D

    def masked_rowsum(x, D):
        Dp = x.shape[0]
        if Dp != D:
            x = jnp.where(row_mask(Dp, D), x, 0.0)
        return jnp.sum(x, axis=0, keepdims=True)

    # ---- couplings ----
    for blk, wr in zip(spec["blocks"], wrefs):
        w1t, b1, w2t, b2, wf, bf = (r[...] for r in wr)
        mmd = w1t.dtype

        def mm(Wt, a):
            return jax.lax.dot_general(
                Wt, a.astype(mmd), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        # conditioner input: [cos(circ), sin(circ), noncirc] over the
        # concatenated "on" fields — realized as split first-layer matmuls
        # (no assembled (F, Cw) buffer, no copies)
        on = blk["on"]
        concat_dims = [field_dims[i] for i in on]
        offsets = np.concatenate([[0], np.cumsum(concat_dims)])
        wrap = blk["wrap_indices"]
        if wrap is None:
            circ_set = set()
        else:
            circ_set = set(int(i) for i in wrap)
        # global concat order -> (field, local range, is_circ)
        segs = []  # (transform, field_idx, lo, hi, col_lo) in W1 column space
        n_circ = len(circ_set)
        # wrap order: cos(circ) cols [0, n_circ), sin cols [n_circ, 2n_circ),
        # noncirc cols [2n_circ, ...) in original concat order
        circ_rank = {}
        nc_rank = {}
        for g in range(int(offsets[-1])):
            if g in circ_set:
                circ_rank[g] = len(circ_rank)
            else:
                nc_rank[g] = len(nc_rank)

        def field_of(g):
            fi = int(np.searchsorted(offsets, g, side="right") - 1)
            return on[fi], g - int(offsets[fi])

        # build contiguous runs with uniform transform
        def runs(rank_map, col_base, transform):
            items = sorted(rank_map.items(), key=lambda kv: kv[1])
            i = 0
            while i < len(items):
                g0, r0 = items[i]
                f0, l0 = field_of(g0)
                j = i
                while (j + 1 < len(items)
                       and items[j + 1][0] == items[j][0] + 1
                       and items[j + 1][1] == items[j][1] + 1
                       and field_of(items[j + 1][0])[0] == f0):
                    j += 1
                segs.append((transform, f0, l0, l0 + (j - i) + 1, col_base + r0))
                i = j + 1

        runs(circ_rank, 0, "cos")
        runs(circ_rank, n_circ, "sin")
        runs(nc_rank, 2 * n_circ, "id")

        # precompute cos/sin tiles for circular source fields (full width)
        trig_cache = {}
        h = jnp.broadcast_to(b1, (b1.shape[0], Wl))
        for transform, fi, r0, r1, col in segs:
            tile = state[fi]
            if transform in ("cos", "sin"):
                if fi not in trig_cache:
                    arg = (2.0 * math.pi) * tile
                    trig_cache[fi] = (jnp.cos(arg), jnp.sin(arg))
                tile = trig_cache[fi][0 if transform == "cos" else 1]
            h = h + mm(w1t[:, col:col + (r1 - r0)], tile[r0:r1])
        act0 = blk["activations"][0]
        if act0 is not None:
            h = act0(h)
        h = mm(w2t, h) + b2
        act1 = blk["activations"][1]
        if act1 is not None:
            h = act1(h)
        raw = mm(wf, h) + bf

        t_idx = blk["t_idx"]
        D = field_dims[t_idx]
        Dp = Dps[t_idx]
        K = blk["num_bins"]
        x = state[t_idx]
        w = [raw[k * Dp:(k + 1) * Dp] for k in range(K)]
        hh = [raw[(K + k) * Dp:(K + k + 1) * Dp] for k in range(K)]
        s = [raw[(2 * K + k) * Dp:(2 * K + k + 1) * Dp] for k in range(K + 1)]
        y, el = _rqs_math(
            x, w, hh, s, inverse=True, left=0.0, right=1.0, bottom=0.0,
            top=1.0, min_bin_width=DEFAULT_MIN_BIN_WIDTH,
            min_bin_height=DEFAULT_MIN_BIN_HEIGHT,
            min_derivative=DEFAULT_MIN_DERIVATIVE,
            shift=float(np.log(np.expm1(1.0 - DEFAULT_MIN_DERIVATIVE))),
            num_bins=K,
        )
        state[t_idx] = y
        ldj = ldj + masked_rowsum(el, D)

    # ---- IC-domain maps (CDFTransform inverse: u -> marginal) ----
    for fi, (m, mr) in enumerate(zip(spec["maps"], mrefs)):
        D = field_dims[fi]
        Dp = Dps[fi]
        u = state[fi]
        eps = m["eps"]
        if eps is not None:
            u = jnp.clip(u, eps, 1.0 - eps)
        if m["kind"] == "truncnorm":
            mu, sigma, cdf_lo, Z = (r[...] for r in mr)
            r = jnp.clip(Z * u + cdf_lo, 1e-12, 1.0 - 1e-12)
            t = _ndtri(r)
            x = t * sigma + mu
            el = 0.5 * t * t + _LOG_SQRT_2PI + jnp.log(Z * sigma)
        elif m["kind"] == "normal":
            mu, sigma = (r[...] for r in mr)
            r = jnp.clip(u, 1e-12, 1.0 - 1e-12)
            t = _ndtri(r)
            x = t * sigma + mu
            el = 0.5 * t * t + _LOG_SQRT_2PI + jnp.log(sigma)
        else:  # uniform
            low, span = (r[...] for r in mr)
            x = low + u * span
            el = jnp.log(span)
        if eps is not None:
            # CDFTransform._inverse clamps logdet at -1/eps from below
            el = jnp.maximum(el, -1.0 / eps)
        state[fi] = x
        ldj = ldj + masked_rowsum(el, D)

    # ---- unnormalize angles/torsions + placement logdet ----
    eps_ic = mixed["eps"]
    fb, fa, ft, ff = fo
    Db = field_dims[fb]
    bonds = state[fb]
    angles = state[fa] * math.pi
    torsions = state[ft] * (2.0 * math.pi) - math.pi
    ldj = ldj + (field_dims[fa] * math.log(math.pi)
                 + field_dims[ft] * math.log(2.0 * math.pi)
                 - mixed["jacobian_xz"])
    pl_el = (2.0 * jnp.log(jnp.maximum(bonds, eps_ic))
             + jnp.log(jnp.clip(jnp.sin(angles), eps_ic, None)))
    ldj = ldj + masked_rowsum(pl_el, Db)

    # ---- de-whiten fixed: x = Tb^T @ z + mean (feature-major) ----
    z_fixed = state[ff]
    x_fixed = jax.lax.dot_general(
        tb_ref[...], z_fixed, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + mean_ref[...]

    out_refs[0][:, lo:lo + Wl] = bonds[:field_dims[fb]]
    out_refs[1][:, lo:lo + Wl] = angles[:field_dims[fa]]
    out_refs[2][:, lo:lo + Wl] = torsions[:field_dims[ft]]
    out_refs[3][:, lo:lo + Wl] = x_fixed[:out_refs[3].shape[0]]
    ldj_ref[:, lo:lo + Wl] = ldj


# ---------------------------------------------------------------------------
# host-side builder
# ---------------------------------------------------------------------------

def _column_const(v, rows):
    """(rows, 1) f32 column from a (D,) vector, padded with 1.0."""
    v = np.asarray(v, np.float32).reshape(-1)
    out = np.ones((rows, 1), np.float32)
    out[: len(v), 0] = v
    return jnp.asarray(out)


def make_fused_sampler(gen, lanes: int = 1024, interpret: Optional[bool] = None,
                       n_streams: int = 1):
    """Compile-ready fused sampler for a supported generator.

    Returns ``fn(params, key, n, debug_u=None) -> (x (n, n_atoms*3), dlogp
    (n,))`` — a drop-in for the sampling direction of
    ``gen.flow.forward(gen.prior.sample(...))`` with the prior drawn from
    the TPU hardware PRNG (``debug_u`` (n, sum_dims) feeds explicit
    uniforms instead, for validation).  ``n_streams``: independent lane
    slices per tile whose instruction streams interleave (MXU of one
    overlaps VPU of the other).
    """
    spec = extract_spec(gen)
    field_dims = spec["field_dims"]
    mixed = spec["mixed"]
    fo = mixed["order"]
    Cw = int(lanes)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # map constants
    map_consts = []
    for fi, m in enumerate(spec["maps"]):
        Dp = _round_up(field_dims[fi], 8)
        if m["kind"] == "truncnorm":
            map_consts.append([
                _column_const(m["mu"], Dp), _column_const(m["sigma"], Dp),
                _column_const(m["cdf_lo"], Dp), _column_const(m["Z"], Dp),
            ])
        elif m["kind"] == "normal":
            map_consts.append([
                _column_const(m["mu"], Dp), _column_const(m["sigma"], Dp),
            ])
        else:
            map_consts.append([
                _column_const(m["low"], Dp),
                _column_const(m["high"] - m["low"], Dp),
            ])

    # whitening constants: t_blacken (keepdims, M); kernel computes
    # x = Tb^T contracted on dim 0 with z (Kp, Cw) -> (M, Cw)
    keep, Mdim = mixed["t_blacken"].shape
    Kp = _round_up(field_dims[fo[3]], 8)
    tb = np.zeros((Kp, Mdim), np.float32)
    tb[:keep] = np.asarray(mixed["t_blacken"], np.float32)
    tb = jnp.asarray(tb)
    mean_c = jnp.asarray(np.asarray(mixed["mean"], np.float32).reshape(-1, 1))

    n_u_rows = sum(field_dims)

    Dm = [field_dims[i] for i in fo]

    def run(params, key, n, debug_u=None):
        debug = debug_u is not None
        B = int(n)
        if B % Cw:
            raise ValueError(f"n must be a multiple of {Cw}")
        weights = _prep_weights(spec, params)

        kernel = functools.partial(
            _sample_kernel, spec=spec, Cw=Cw, debug=debug,
            n_streams=n_streams,
        )
        grid = (B // Cw,)
        const = lambda a: pl.BlockSpec(
            a.shape, lambda j, _s=a.shape: tuple(0 for _ in _s),
            memory_space=pltpu.VMEM)
        col = lambda rows: pl.BlockSpec((rows, Cw), lambda j: (0, j),
                                        memory_space=pltpu.VMEM)
        in_specs = []
        operands = []
        if debug:
            uT = jnp.asarray(debug_u, jnp.float32).T  # (rows, B)
            in_specs.append(col(n_u_rows))
            operands.append(uT)
        else:
            kd = jax.random.key_data(key).astype(jnp.uint32)
            seed = jnp.concatenate([
                kd.reshape(-1)[:2].astype(jnp.int32),
                jnp.zeros((1,), jnp.int32),
            ])
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            operands.append(seed)
        for wset in weights:
            for name in ("w1t", "b1", "w2t", "b2", "wf", "bf"):
                a = wset[name]
                in_specs.append(const(a))
                operands.append(a)
        for consts in map_consts:
            for a in consts:
                in_specs.append(const(a))
                operands.append(a)
        in_specs.append(const(tb))
        operands.append(tb)
        in_specs.append(const(mean_c))
        operands.append(mean_c)

        out_specs = (
            col(Dm[0]), col(Dm[1]), col(Dm[2]), col(Mdim), col(1),
        )
        out_shape = (
            jax.ShapeDtypeStruct((Dm[0], B), jnp.float32),
            jax.ShapeDtypeStruct((Dm[1], B), jnp.float32),
            jax.ShapeDtypeStruct((Dm[2], B), jnp.float32),
            jax.ShapeDtypeStruct((Mdim, B), jnp.float32),
            jax.ShapeDtypeStruct((1, B), jnp.float32),
        )
        bonds, angles, torsions, fixed, ldj = pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape, interpret=interpret,
        )(*operands)

        # ---- reconstruction (existing fused wide kernel, zero-copy feed) --
        x = _reconstruct_fm(mixed, bonds, angles, torsions, fixed,
                            interpret=interpret)
        return x, ldj[0]

    return run


def _reconstruct_fm(mixed, bonds, angles, torsions, fixed, interpret=False):
    """Wide NeRF reconstruction from feature-major (D, B) inputs.

    (D, B) -> (D, 8, B/8) is a contiguous reshape (sample b = sub*S + s),
    matching ``ic_reconstruct_pallas_wide``'s batch-major split.  The atom
    reorder is baked into the placement plan (the kernel writes rows in
    ATOM order), so the only remaining XLA work is one transpose."""
    from .ic_pallas import _reconstruct_kernel

    D, B = bonds.shape
    assert B % 8 == 0
    S = B // 8
    block_lanes = 512 if S % 512 == 0 else (128 if S % 128 == 0 else S)
    wide = lambda a: a.reshape(a.shape[0], 8, S)
    bonds_w, angles_w, torsions_w, fixed_w = map(
        wide, (bonds, angles, torsions, fixed))
    n_total = mixed["n_total"]
    # recon-order -> atom-order index map, baked into the plan
    i2a = np.argsort(np.asarray(mixed["atom2index"]))
    plan = tuple(
        tuple((int(i2a[o]), r, int(i2a[c1]), int(i2a[c2]), int(i2a[c3]))
              for (o, r, c1, c2, c3) in stage)
        for stage in mixed["plan"]
    )
    kernel = functools.partial(
        _reconstruct_kernel, plan=plan, n_fixed=mixed["n_fixed"],
        eps=mixed["eps"],
        fixed_rows=tuple(int(i2a[j]) for j in range(mixed["n_fixed"])),
    )
    spec = lambda rows: pl.BlockSpec(
        (rows, 8, block_lanes), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(S // block_lanes,),
        in_specs=[spec(D), spec(D), spec(D), spec(fixed.shape[0])],
        out_specs=spec(3 * n_total),
        out_shape=jax.ShapeDtypeStruct((3 * n_total, 8, S), jnp.float32),
        interpret=interpret,
    )(bonds_w, angles_w, torsions_w, fixed_w)
    pts = out.reshape(n_total, 3, 8, S)
    pts = jnp.transpose(pts, (2, 3, 0, 1))
    return pts.reshape(B, -1)
