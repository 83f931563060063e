"""FLOP/byte accounting (utils/roofline.py): analytic matmul counts from
the jaxpr, XLA cost analysis plumbing, and the roofline verdict math."""
import jax
import jax.numpy as jnp
import pytest

from bgflow_tpu.utils import roofline as rl
from tests.conftest import assert_close


def test_dot_flops_plain_matmul():
    a = jnp.zeros((8, 32))
    b = jnp.zeros((32, 16))
    # 2*M*N*K = 2*8*16*32
    assert rl.dot_flops(lambda x, y: x @ y, a, b) == 2 * 8 * 16 * 32


def test_dot_flops_batched_and_scanned():
    a = jnp.zeros((4, 8, 32))
    b = jnp.zeros((4, 32, 16))
    per = 2 * 4 * 8 * 16 * 32
    assert rl.dot_flops(lambda x, y: jnp.einsum("bmk,bkn->bmn", x, y), a, b) == per

    def scanned(x, y):
        def body(c, _):
            return c, jnp.einsum("bmk,bkn->bmn", x, y)

        _, out = jax.lax.scan(body, 0.0, jnp.arange(5))
        return out

    assert rl.dot_flops(scanned, a, b) == 5 * per


def test_dot_flops_through_jit_and_grad():
    w = jnp.zeros((32, 16))
    x = jnp.zeros((8, 32))
    fwd = 2 * 8 * 16 * 32

    # pjit container is traversed
    assert rl.dot_flops(jax.jit(lambda w, x: jnp.sum(x @ w)), w, x) == fwd
    # backward adds the two transposed matmuls
    g = rl.dot_flops(jax.grad(lambda w, x: jnp.sum((x @ w) ** 2)), w, x)
    assert g >= 2 * fwd


def test_xla_cost_analysis_close_to_analytic():
    a = jnp.zeros((64, 128))
    b = jnp.zeros((128, 64))
    fn = lambda x, y: x @ y  # noqa: E731
    ca = rl.xla_cost_analysis(fn, a, b)
    if ca is None:
        pytest.skip("backend exposes no cost analysis")
    assert ca["flops"] >= rl.dot_flops(fn, a, b)
    assert ca["flops"] <= 2.0 * rl.dot_flops(fn, a, b)


def test_roofline_verdict():
    # 1 MFLOP, 1 KB per item at 1e6 items/s on v5e: 1 TFLOP/s, 1 GB/s
    rep = rl.roofline(1e6, 1e3, 1e6, chip="v5e")
    assert_close(rep["achieved_tflops"], 1.0, 1e-9)
    assert_close(rep["achieved_hbm_gbs"], 1.0, 1e-9)
    assert_close(rep["mfu_pct"], 100.0 / 197.0, 5e-3)  # rounded to 2 decimals
    assert rep["arithmetic_intensity"] == 1000.0
    # intensity 1000 > ridge 240.5 -> compute bound
    assert rep["bound"] == "compute"
    rep2 = rl.roofline(1e3, 1e3, 1e6, chip="v5e")
    assert rep2["bound"] == "memory"
    # unknown chip: rates still reported, no MFU (chip=None would
    # auto-detect from the ambient environment)
    rep3 = rl.roofline(1e6, None, 1e6, chip="tpu-v99")
    assert "mfu_pct" not in rep3 and "achieved_tflops" in rep3


def test_hbm_traffic_from_hlo_bounds():
    """The kernel-materialization traffic estimate is >= the unavoidable
    unique I/O (inputs read + output written once) and, unlike
    cost_analysis 'bytes accessed', never counts operands of ops fused
    INTO a kernel more than once per launch."""
    w = jnp.zeros((128, 256), jnp.float32)
    x = jnp.zeros((1024, 128), jnp.float32)

    def f(x):
        return jnp.tanh(x @ w) * 2.0 + 1.0

    est = rl.hbm_traffic_from_hlo(f, x)
    if est is None:
        pytest.skip("backend exposes no compiled HLO text")
    unique_io = x.size * 4 + w.size * 4 + 1024 * 256 * 4
    assert est["hbm_bytes"] >= unique_io
    # a handful of kernels, each touching at most all operands + result:
    # the estimate stays within a small multiple of the unique I/O
    assert est["hbm_bytes"] <= 6 * unique_io
    assert est["n_kernels"] >= 1


def test_hbm_traffic_elementwise_chain_fuses():
    """A long elementwise chain must not scale traffic with chain length
    (the round-3 failure mode of 'bytes accessed'): XLA fuses it into a
    couple of kernels whose HBM traffic is ~in+out."""
    x = jnp.zeros((1 << 16,), jnp.float32)

    def f(x):
        for _ in range(20):
            x = jnp.tanh(x) * 1.01
        return x

    est = rl.hbm_traffic_from_hlo(f, x)
    if est is None:
        pytest.skip("backend exposes no compiled HLO text")
    # in + out = 2 * 256 KiB; allow generous slack for copies/layout ops,
    # but a per-op count would be ~20x in size
    assert est["hbm_bytes"] <= 6 * x.size * 4


def test_measure_op_stats_never_negative():
    """The r4 scaling artifact published a negative step time; the stats
    timer must escalate and never return dt <= 0."""
    from bgflow_tpu.utils.profiling import measure_op_stats

    x = jnp.ones((8, 8))
    stats = measure_op_stats(lambda i, a: a * (1.0 + 0.0 * i), x, iters=2,
                             repeats=3, max_rounds=2)
    assert stats["dt"] > 0
    assert stats["dt_hi"] >= stats["dt"] >= stats["dt_lo"] or stats["dt"] > 0
    assert set(stats) >= {"dt", "dt_lo", "dt_hi", "iters", "resolved"}
