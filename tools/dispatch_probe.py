"""Per-step dispatch/latency decomposition for the reference-scale train steps.

VERDICT r3 #4: the LM at batch 8 x 257 sits at 23-24% MFU while batch 64
reaches 31.9% — hypothesis: fixed per-step costs (host->device execute
latency over the axon tunnel, optimizer fixed cost), not kernel
inefficiency. This probe times the SAME jitted step two ways:

  (a) dispatched per step from the host, pipelined with one trailing sync
      (utils/timing.time_steps — the train loop's real pattern);
  (b) inside one ``lax.scan(K)`` program: ONE host dispatch for K steps,
      identical per-step math (the step folds its PRNG from ``state.step``,
      so iteration k still draws a distinct stream; the batch is reused,
      which changes data but not cost).

scan/K substantially below (a)  =>  the gap is per-execute dispatch
latency (on this image: the tunnel round trip), and its size is the
difference — evidence the deficit is not on-device. scan/K == (a)  =>
the gap is on-device and the xprof trace is the next stop.

Usage: python -m tools.dispatch_probe [--model lm|glow|vqtts]
       [--scan-lengths 8,32] [--steps 20]
"""

from __future__ import annotations

import argparse
import functools
import json

import jax


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="lm",
                        choices=["lm", "glow", "vqtts"])
    parser.add_argument("--scan-lengths", default="8,32")
    parser.add_argument("--steps", type=int, default=20,
                        help="timed per-dispatch steps (and scan repeats)")
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--platform", default=None,
                        help="force a jax backend (e.g. cpu) for sanity runs")
    args = parser.parse_args()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from benchmarks.run_benchmarks import (
        build_glow_step,
        build_lm_step,
        build_vqtts_step,
    )
    from speech_masters_thesis_tpu.utils import timing

    builder = {"lm": build_lm_step, "glow": build_glow_step,
               "vqtts": build_vqtts_step}[args.model]
    step, state, batch_data, key, meta = builder(args.quick)

    # (a) per-dispatch, pipelined (the train loop's pattern)
    def run_one(carry):
        new_state, sc = step(carry, batch_data, key)
        return new_state, sc["loss"]

    per_dispatch, state = timing.time_steps(run_one, state, warmup=3,
                                            steps=args.steps)

    # (b) K steps inside one program — one host dispatch
    result = {
        "metric": f"{args.model}_dispatch_probe",
        "per_dispatch_ms": round(per_dispatch * 1e3, 3),
        "batch": meta.get("batch"),
    }
    for k in [int(s) for s in args.scan_lengths.split(",") if s]:

        @functools.partial(jax.jit, donate_argnums=(0,))
        def many(st, _k=k):
            def body(s, _):
                ns, sc = step(s, batch_data, key)
                return ns, sc["loss"]
            return jax.lax.scan(body, st, None, length=_k)

        repeats = max(1, args.steps // k)

        def run_scan(carry):
            new_state, losses = many(carry)
            return new_state, losses

        sec_per_scan, state = timing.time_steps(run_scan, state, warmup=1,
                                                steps=repeats)
        result[f"scan{k}_ms_per_step"] = round(sec_per_scan / k * 1e3, 3)

    ks = [int(s) for s in args.scan_lengths.split(",") if s]
    if ks:
        best = min(result[f"scan{k}_ms_per_step"] for k in ks)
        result["dispatch_overhead_ms"] = round(result["per_dispatch_ms"] - best, 3)
        result["dispatch_share"] = round(
            max(0.0, 1.0 - best / result["per_dispatch_ms"]), 4)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
