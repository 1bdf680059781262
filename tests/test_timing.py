"""Tests for the honest-timing utilities (utils/timing.py).

Round-1 shipped physically impossible throughput numbers because the
platform's block_until_ready doesn't block; these tests pin the guard rails.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_masters_thesis_tpu.utils import timing


def test_rate_report_refuses_impossible_rates():
    # 1 PFLOP "executed" in 1 ms on one chip => 1000 TFLOP/s >> 197 peak
    with pytest.raises(RuntimeError, match="exceeds chip peak"):
        timing.rate_report(per_step_units=1.0, sec_per_step=1e-3,
                           flops_per_step=1e15, bf16=True)


def test_rate_report_fields():
    out = timing.rate_report(per_step_units=4128.0, sec_per_step=0.2827,
                             flops_per_step=7.35e12, bf16=True)
    assert out["value"] == pytest.approx(14601, rel=1e-3)
    assert out["step_ms"] == pytest.approx(282.7, rel=1e-3)
    assert out["tflops_per_sec"] == pytest.approx(26.0, rel=1e-2)
    assert 0.13 < out["mfu"] < 0.14


def test_time_steps_threads_carry_and_syncs():
    calls = []

    @jax.jit
    def step(x):
        return x + 1.0

    def run_one(carry):
        calls.append(1)
        out = step(carry)
        return out, out

    sec, final = timing.time_steps(run_one, jnp.zeros(()), warmup=2, steps=3)
    assert len(calls) == 5
    assert float(final) == 5.0
    assert sec > 0


def test_sync_reads_smallest_leaf():
    tree = {"big": jnp.zeros((128, 128)), "scalar": jnp.ones(())}
    timing.sync(tree)  # must not raise; picks the scalar leaf
    timing.sync({"none": None})  # tolerates no-array trees


def test_compiled_flops_reports_matmul():
    @jax.jit
    def f(a, b):
        return a @ b

    a = jnp.ones((64, 64))
    flops = timing.compiled_flops(f, a, a)
    if flops is not None:  # cost analysis is backend-dependent
        assert flops >= 2 * 64 ** 3 * 0.9
