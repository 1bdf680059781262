"""Honest device timing — execution barriers that actually block.

On this image's experimental ``axon`` tunnel platform,
``jax.block_until_ready`` returns before remote execution completes, so
wall-clock timing against it measures *dispatch* rate, not execution rate
(round-1 numbers were ~114x inflated this way — see VERDICT.md). The only
reliable barrier is a host read: ``jax.device_get`` cannot return until the
producing computation has finished, because it must transfer real bytes.

All benchmark timing in this repo goes through :func:`sync` /
:func:`time_steps`, and every published rate is cross-checked against XLA's
own cost analysis (:func:`compiled_flops`) so a number implying more than
the chip's peak FLOP rate is caught at measurement time rather than by a
reviewer.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import numpy as np

# One TPU v5 lite (v5e) chip: 197 TFLOP/s bf16, ~1/4 of that for fp32
# (public spec; used only to report MFU, never to scale results).
V5E_BF16_PEAK_FLOPS = 197e12
V5E_F32_PEAK_FLOPS = 49e12


def sync(tree: Any) -> None:
    """Execution barrier: force a host read of the smallest array leaf.

    Unlike ``jax.block_until_ready`` this is correct on the axon tunnel —
    the D2H transfer of even one scalar cannot complete before the
    computation that produces it has executed. Prefer passing a scalar
    (e.g. the loss) so the transfer itself is negligible.
    """
    leaves = [l for l in jax.tree_util.tree_leaves(tree) if hasattr(l, "dtype")]
    if not leaves:
        return
    leaf = min(leaves, key=lambda l: int(getattr(l, "size", 1)))
    np.asarray(jax.device_get(leaf))


def compiled_flops(jitted_fn: Callable, *args, **kwargs) -> Optional[float]:
    """FLOPs per call from XLA's cost analysis of the compiled program.

    Returns None when the backend does not expose cost analysis.
    """
    try:
        cost = jitted_fn.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:  # pragma: no cover - backend-specific
        return None


def time_steps(run_one: Callable[[Any], Tuple[Any, Any]], carry: Any,
               warmup: int, steps: int) -> Tuple[float, Any]:
    """Times ``steps`` state-threaded calls with a real execution barrier.

    ``run_one(carry) -> (carry, probe)`` must thread its carry so step N
    depends on step N-1; then a single host read of the final probe waits
    for the whole timed window (pipelined dispatch, one sync).
    Returns (seconds_per_step, final_carry).
    """
    probe = None
    for _ in range(warmup):
        carry, probe = run_one(carry)
    sync(probe)
    start = time.perf_counter()
    for _ in range(steps):
        carry, probe = run_one(carry)
    sync(probe)
    elapsed = time.perf_counter() - start
    return elapsed / steps, carry


def rate_report(*, per_step_units: float, sec_per_step: float,
                flops_per_step: Optional[float], bf16: bool,
                n_chips: int = 1,
                model_flops_per_step: Optional[float] = None) -> Dict[str, float]:
    """Throughput + MFU fields for a benchmark JSON record.

    Raises if the implied FLOP rate exceeds chip peak — an impossible
    number means the timing barrier is broken, and must never be published.

    ``flops_per_step`` is EXECUTED arithmetic (including e.g. a fused
    kernel's in-tile backward recompute, declared via pl.CostEstimate).
    ``model_flops_per_step`` is the model's intrinsic FLOP count (the same
    math with no recompute) — when given, the report carries BOTH
    ``mfu`` (executed) and the conservative ``model_mfu``; headline numbers
    should quote the conservative one.
    """
    out: Dict[str, float] = {
        "step_ms": round(sec_per_step * 1e3, 2),
        "value": round(per_step_units / sec_per_step / n_chips, 2),
    }
    if flops_per_step:
        tflops = flops_per_step / sec_per_step / 1e12
        peak = V5E_BF16_PEAK_FLOPS if bf16 else V5E_F32_PEAK_FLOPS
        out["tflops_per_step"] = round(flops_per_step / 1e12, 2)
        out["tflops_per_sec"] = round(tflops, 2)
        out["mfu"] = round(tflops * 1e12 / (peak * n_chips), 4)
        if model_flops_per_step:
            out["model_tflops_per_step"] = round(model_flops_per_step / 1e12, 2)
            out["model_mfu"] = round(
                model_flops_per_step / sec_per_step / (peak * n_chips), 4)
        if tflops * 1e12 > 1.05 * peak * n_chips:
            raise RuntimeError(
                f"Implied {tflops:.1f} TFLOP/s exceeds chip peak "
                f"({peak / 1e12:.0f} TFLOP/s x {n_chips}); timing barrier is "
                "not blocking — refuse to publish an impossible number.")
    return out
