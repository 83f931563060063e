"""Benchmark: TPU samples/s on the flagship alanine-dipeptide generator.

Workload (BASELINE.md anchor 2): the FULL flagship molecular sampling path —
uniform prior -> 6 conditional-spline coupling blocks (128x128 bf16
conditioners, 8 bins, circular torsion handling) -> inverse-CDF maps onto IC
domains -> whitened-fixed-atom + z-matrix NeRF reconstruction to Cartesian
xyz.  This is the same architecture the model-quality work trains
(``bgflow_tpu/models/ala2.py``), running the fused Pallas RQS kernel through
the relayout-free slab path and the fused Pallas reconstruction kernel.

The baseline constants are the reference (bgflow @ /root/reference, torch
CPU 8 threads, batch 8192) measured on its *affine*-coupling ala2 generator
— the faster of its two architectures, so ``vs_baseline`` understates the
speedup (the reference's nflows spline path is slower than its affine one).
They are REPRODUCIBLE: ``python scripts/baseline_reference.py`` re-measures
them on this container (artifacts/baseline_reference.json records the last
run + environment).  The train baseline is reference-KLTrainer NLL-only
(mixed NLL/KL needs OpenMM, absent here) while the TPU number is the
heavier mixed step — the multiple understates again.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}; auxiliary
metrics (affine-path samples/s, training steps/s) go to BENCH_EXTRA.json
and stderr.
"""
import json
import os
import sys
import time

from bgflow_tpu.utils.backend import ensure_reachable_backend

# Accelerator unreachable -> measure honestly on CPU at reduced batch
# rather than hang (the axon plugin's backend init has no deadline).
ON_TPU = ensure_reachable_backend()

import numpy as np
import jax
import jax.numpy as jnp

import bgflow_tpu as bg

# regenerate with scripts/baseline_reference.py (full run, 2026-08-19)
BASELINE_CPU_ALA2_SAMPLES_PER_SEC = 68_211.0
BASELINE_CPU_TRAIN_STEPS_PER_SEC = 12.66


def _synthetic_data(n=512):
    rng = np.random.RandomState(0)
    base = np.arange(22)[:, None] * np.array([[0.15, 0.1, 0.12]])
    return (base[None] + 0.05 * rng.randn(n, 22, 3)).reshape(n, 66).astype(np.float32)


def make_flagship(key, transformer="spline", compute_dtype=jnp.bfloat16,
                  use_pallas=True):
    from bgflow_tpu.energies.ala2 import ALA2_FIXED_ATOMS, ALA2_Z_MATRIX

    data = _synthetic_data()
    crd = bg.MixedCoordinateTransformation(
        data, ALA2_Z_MATRIX, ALA2_FIXED_ATOMS, keepdims=15,
        use_pallas=use_pallas,  # fused reconstruction kernel (2.9x vs XLA path)
    )
    shape_info = bg.ShapeDictionary.from_coordinate_transform(crd)
    builder = bg.BoltzmannGeneratorBuilder(shape_info)
    architecture = [
        (bg.TORSIONS, bg.FIXED),
        (bg.FIXED, bg.TORSIONS),
        (bg.BONDS, (bg.ANGLES, bg.TORSIONS)),
        (bg.ANGLES, (bg.BONDS, bg.TORSIONS)),
        (bg.TORSIONS, (bg.BONDS, bg.ANGLES)),
        (bg.FIXED, (bg.BONDS, bg.ANGLES, bg.TORSIONS)),
    ]
    if transformer == "affine":
        builder.default_transformer_type = bg.AffineTransformer
        architecture = architecture[:4]
        for what, on in architecture:
            builder.add_condition(what, on=on, hidden=(128, 128), compute_dtype=compute_dtype)
    else:
        for what, on in architecture:
            # bf16 conditioner matmuls (f32 accumulate) on the MXU; the
            # spline itself runs in the fused Pallas kernel via the
            # slab-direct layout (no HBM relayout of the 3*K*D params)
            builder.add_condition(
                what, on=on, hidden=(128, 128), num_bins=8,
                compute_dtype=compute_dtype,
                transformer_kwargs=dict(use_pallas=use_pallas),
            )
    builder.add_map_to_ic_domains()
    builder.add_map_to_cartesian(crd)
    gen = builder.build_generator(check_target=False)
    return gen, gen.init(key)


def measure_sampling(gen, params, key, n, iters=10):
    """Samples/s of ``gen.sample`` (see :func:`measure_sampling_fn`)."""
    return measure_sampling_fn(
        lambda p, k: gen.sample(p, k, n).xs[0], params, key, n, iters=iters
    )


def measure_sampling_fn(sample_fn, params, key, n, iters=10):
    """Samples/s via an on-device fori_loop with latency cancellation.

    The axon TPU tunnel's ``block_until_ready`` does NOT block (measured: a
    1 GiB op "completes" in 0.04 ms, implying 61 TB/s), so host-side loops
    over async dispatches time nothing.  Instead the iteration loop runs on
    device inside one executable (iteration count is a traced scalar so two
    lengths share the compile), each iteration folds the loop index into
    the key and contributes to a scalar accumulator (no DCE), and the
    ~30 ms tunnel round-trip cancels in the two-length difference.
    """

    @jax.jit
    def run(params, key, m):
        def body(i, acc):
            x = sample_fn(params, jax.random.fold_in(key, i))
            # consume the WHOLE output (mean forces every element to be
            # computed — consuming one row would let XLA skip part of the
            # final epilogue) and poison the accumulator on non-finite
            s = jnp.mean(x).astype(jnp.float32)
            return acc + jnp.where(jnp.isfinite(s), s * 1e-6, jnp.nan)
        return jax.lax.fori_loop(0, m, body, jnp.float32(0.0))

    base = 2
    warm = float(run(params, key, jnp.int32(base)))  # compile + warm
    assert np.isfinite(warm), "bench produced non-finite samples"
    t0 = time.perf_counter()
    float(run(params, key, jnp.int32(base)))
    t_base = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(params, key, jnp.int32(base + iters)))
    t_full = time.perf_counter() - t0
    return n * iters / (t_full - t_base)


def measure_training(key, batch=1024, scan_steps=100):
    """Mixed NLL/KL training steps/s on the spline flagship (real FF target).

    Uses the on-device scanned loop (``KLTrainer.make_train_scan``): the
    whole window of steps runs inside one executable, so the measurement —
    like production training — pays one dispatch per window instead of one
    per step.  Rate = steps / (t(2 windows) - t(1 window)); the tunnel
    round-trip cancels in the difference.
    """
    from bgflow_tpu.models.ala2 import make_ala2_generator

    data = _synthetic_data(2048)
    gen = make_ala2_generator(data, use_pallas_spline=True, keepdims=15)
    params = gen.init(key)
    trainer = bg.KLTrainer(gen)
    run = trainer.make_train_scan(
        scan_steps, batchsize_likelihood=batch, batchsize_energy=batch
    )
    opt_state = trainer.init(params)
    d = (jnp.asarray(data),)

    def window(params, opt_state, key, n_windows):
        for i in range(n_windows):
            params, opt_state, m = run(
                params, opt_state, jax.random.fold_in(key, i), d
            )
        loss = float(m["loss"][-1])
        assert np.isfinite(loss), "training produced non-finite loss"
        return params, opt_state

    params, opt_state = window(params, opt_state, jax.random.fold_in(key, 0), 1)
    t0 = time.perf_counter()
    window(params, opt_state, jax.random.fold_in(key, 1), 1)
    t_base = time.perf_counter() - t0
    t0 = time.perf_counter()
    window(params, opt_state, jax.random.fold_in(key, 2), 2)
    t_full = time.perf_counter() - t0
    return scan_steps / (t_full - t_base)


def measure_stream_bandwidth(n_mib=512, iters=16):
    """Empirically achievable HBM bandwidth (GB/s): a saxpy sweep over an
    array far larger than VMEM, on-device fori_loop, two-length differencing
    (same latency-cancellation scheme as measure_sampling).  Each iteration
    reads and writes the whole array: 8 B/element.  This is the *real*
    denominator for the bandwidth roofline — datasheet peak is never
    achievable by actual kernels (STREAM-style sweeps typically reach
    70-90% of it)."""
    n = n_mib * 1024 * 1024 // 4

    @jax.jit
    def run(x, m):
        def body(i, x):
            return x * jnp.float32(1.0000001) + jnp.float32(1e-9)

        return jax.lax.fori_loop(0, m, body, x)

    x = jnp.zeros((n,), jnp.float32)
    float(run(x, jnp.int32(2))[0])  # compile + warm
    t0 = time.perf_counter()
    float(run(x, jnp.int32(2))[0])
    t_base = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(x, jnp.int32(2 + iters))[0])
    t_full = time.perf_counter() - t0
    return iters * 8.0 * n / (t_full - t_base) / 1e9


def main():
    key = jax.random.PRNGKey(0)
    extra = {"backend": jax.default_backend()}

    # headline: the real (spline) flagship at throughput-optimal batch,
    # through the one-kernel fused sampling path (ops/sample_fused.py:
    # hardware-PRNG prior + all couplings + IC-domain maps + whitening in a
    # single Pallas kernel, feeding the fused wide NeRF reconstruction).
    # On the CPU fallback use the XLA spline path (interpret-mode Pallas is
    # an emulator, not a measurement) and a dispatch-amortizing batch.
    gen, params = make_flagship(key, transformer="spline", use_pallas=ON_TPU)
    n = 1024 * 1024 if ON_TPU else 16 * 1024
    if ON_TPU:
        from bgflow_tpu.ops.sample_fused import make_fused_sampler

        fused = make_fused_sampler(gen, lanes=2048)
        spline_sps = measure_sampling_fn(
            lambda p, k: fused(p, k, n)[0], params, key, n, iters=10
        )
        extra["unfused_samples_per_sec"] = round(
            measure_sampling(gen, params, key, n, iters=10), 1
        )
    else:
        spline_sps = measure_sampling(gen, params, key, n, iters=4)
    extra["spline_samples_per_sec"] = round(spline_sps, 1)

    # roofline/MFU accounting: what fraction of the chip the headline rate
    # uses, and whether the path is compute- or bandwidth-bound.  FLOPs and
    # HBM bytes come from the compiled executable's own cost analysis (with
    # the backend-independent jaxpr matmul count as cross-check / fallback).
    from bgflow_tpu.utils import roofline as rl

    # FLOPs: from the UNFUSED program's jaxpr/cost-analysis — the fused
    # kernel computes the same math but hides its matmuls inside one
    # custom call, which neither the jaxpr walk nor cost_analysis can see.
    sample_fn_unfused = lambda p, k: gen.sample(p, k, n).xs[0]  # noqa: E731
    sample_fn = (  # the HEADLINE path (bytes / kernel census)
        (lambda p, k: fused(p, k, n)[0]) if ON_TPU else sample_fn_unfused
    )
    ca = rl.xla_cost_analysis(sample_fn_unfused, params, key)
    df = rl.dot_flops(sample_fn_unfused, params, key)
    flops = ca["flops"] if ca and "flops" in ca else df
    # HBM traffic: per-kernel materialization walk of the post-fusion HLO.
    # cost_analysis 'bytes accessed' counts VMEM-resident fused operands and
    # can exceed physical bandwidth (round 3 printed 147% of peak) — it is
    # reported only as a labeled upper-bound diagnostic, never used for the
    # utilization verdict.
    hbm = rl.hbm_traffic_from_hlo(sample_fn, params, key)
    bytes_total = hbm["hbm_bytes"] if hbm else None
    roof = rl.roofline(
        flops / n, (bytes_total / n) if bytes_total else None, spline_sps
    )
    roof["dot_flops_per_sample"] = round(df / n, 1)
    roof["flops_source"] = (
        ("xla_cost_analysis" if ca else "jaxpr_dot_general (matmul-only lower bound)")
        + (" of the equivalent unfused program" if ON_TPU else "")
    )
    if hbm:
        roof["bytes_source"] = (
            f"hlo_kernel_materialization ({int(hbm['n_kernels'])} kernels; "
            "slight over-estimate: assumes every kernel result round-trips HBM)"
        )
    if ca and "bytes_accessed" in ca:
        roof["xla_bytes_accessed_per_item"] = round(ca["bytes_accessed"] / n, 1)
        roof["xla_bytes_accessed_caveat"] = (
            "per-op operand bytes incl. VMEM-resident fused traffic; "
            "overcounts real HBM traffic, diagnostic only"
        )
    if ON_TPU:
        stream_gbs = measure_stream_bandwidth()
        roof["measured_stream_hbm_gbs"] = round(stream_gbs, 1)
        if roof.get("achieved_hbm_gbs"):
            roof["pct_of_stream_roof"] = round(
                100.0 * roof["achieved_hbm_gbs"] / stream_gbs, 1
            )
        # wall-clock bracket: the chip cannot move more than the measured
        # stream roof, so  true bytes/item <= stream_bw / items_per_sec.
        # If the HLO estimate exceeds this bound, the path is saturating
        # achievable bandwidth and the estimator's residual upward bias
        # (multi-reader counting, invisible aliasing) explains the excess.
        implied = stream_gbs * 1e9 / spline_sps
        roof["bytes_per_item_wallclock_upper_bound"] = round(implied, 1)
        if bytes_total:
            est = bytes_total / n
            roof["hbm_verdict"] = (
                "at the achievable-bandwidth roof: the per-kernel traffic "
                "estimate (upward-biased) meets or exceeds the wall-clock "
                "bound, so there is no bandwidth headroom left at this "
                "batch size"
                if est >= 0.9 * implied
                else f"below the roof: estimated traffic uses "
                f"{100.0 * est / implied:.0f}% of the wall-clock bandwidth "
                "budget — the gap is launch/VPU-bound work, not HBM"
            )
    extra["roofline"] = roof

    if ON_TPU:
        # auxiliary: affine path (round-1 headline config) and training rate
        gen_a, params_a = make_flagship(key, transformer="affine")
        extra["affine_samples_per_sec"] = round(
            measure_sampling(gen_a, params_a, key, 4 * n), 1
        )
        tps = measure_training(jax.random.PRNGKey(1))
        extra["train_steps_per_sec"] = round(tps, 2)
        extra["train_steps_vs_cpu_baseline"] = round(tps / BASELINE_CPU_TRAIN_STEPS_PER_SEC, 2)

    if not ON_TPU and os.path.exists("BENCH_EXTRA.json"):
        # preserve the last real-TPU measurements alongside the fallback
        # numbers instead of clobbering them — including across REPEATED
        # fallback runs (carry a prior fallback file's preserved block)
        try:
            with open("BENCH_EXTRA.json") as fh:
                prev = json.load(fh)
            if prev.get("backend") != "cpu":
                extra["last_tpu_measurement"] = prev
            elif "last_tpu_measurement" in prev:
                extra["last_tpu_measurement"] = prev["last_tpu_measurement"]
        except (OSError, ValueError):
            pass
    with open("BENCH_EXTRA.json", "w") as fh:
        json.dump(extra, fh, indent=1)
    print(json.dumps(extra), file=sys.stderr)

    line = {
        "metric": "ala2_spline_bg_samples_per_sec",
        "value": round(spline_sps, 1),
        "unit": "samples/s",
        "vs_baseline": round(spline_sps / BASELINE_CPU_ALA2_SAMPLES_PER_SEC, 2),
        "backend": jax.default_backend(),
    }
    if "mfu_pct" in roof:
        line["mfu_pct"] = roof["mfu_pct"]
    if "bound" in roof:
        line["bound"] = roof["bound"]
    if not ON_TPU:
        # honest fallback measurement, flagged as such; the last real-TPU
        # numbers live in BENCH_EXTRA.json["last_tpu_measurement"]
        line["note"] = "TPU pool unreachable; CPU fallback at reduced batch"
        prev = extra.get("last_tpu_measurement", {})
        if "spline_samples_per_sec" in prev:
            line["last_tpu_value"] = prev["spline_samples_per_sec"]
            line["last_tpu_vs_baseline"] = round(
                prev["spline_samples_per_sec"] / BASELINE_CPU_ALA2_SAMPLES_PER_SEC, 2
            )
    print(json.dumps(line))


if __name__ == "__main__":
    main()
