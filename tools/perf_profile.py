"""Captures a device trace of the bench train step and prints the op-time
breakdown (top HLO ops / op categories by self time).

Usage: python -m tools.perf_profile [--steps 3] [--batch 32] [--no-remat]
       [--trace-dir /tmp/vqvae_trace]

The xplane is parsed with the tensorboard profiler plugin (installed in this
image) — no TensorBoard UI needed on this headless host.
"""

from __future__ import annotations

import argparse
import glob
import json
import os


def capture(args) -> str:
    import jax

    from speech_masters_thesis_tpu.utils import timing

    if args.model == "vqvae":
        from tools.stepfactory import build_vqvae_step

        train_step, state, batch, rng, meta = build_vqvae_step(
            batch_size=args.batch, bf16=not args.f32, remat=not args.no_remat,
            fused=args.fused)
    else:
        # reference-scale steps shared with the bench harness (env knobs
        # GLOW_FUSED/GLOW_FLOW_STEP/VQTTS_FUSED/LM_FUSED/LM_BATCH apply)
        from benchmarks import run_benchmarks as rb

        builder = {"glow": rb.build_glow_step, "vqtts": rb.build_vqtts_step,
                   "lm": rb.build_lm_step}[args.model]
        train_step, state, batch, rng, meta = builder()

    def run_one(carry):
        new_state, scalars = train_step(carry, batch, rng)
        return new_state, scalars["loss"]

    # compile + warm
    for _ in range(2):
        state, probe = run_one(state)
    timing.sync(probe)

    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.steps):
            state, probe = run_one(state)
        timing.sync(probe)
    return args.trace_dir


def summarize(trace_dir: str, top: int = 40) -> None:
    xplanes = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                               recursive=True), key=os.path.getmtime)
    if not xplanes:
        print(json.dumps({"error": f"no xplane under {trace_dir}"}))
        return
    xplane = xplanes[-1]
    print(f"# xplane: {xplane}")
    # xprof is the maintained converter in this image; the tensorboard plugin
    # shim hits a protobuf C-extension mismatch (needs the pure-python impl)
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    try:
        from xprof.convert import raw_to_tool_data
    except ImportError:  # pragma: no cover
        from tensorboard_plugin_profile.convert import raw_to_tool_data

    for tool in ("framework_op_stats", "hlo_stats"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data([xplane], tool + "^", {})
        except Exception as e:
            print(f"# {tool} failed: {type(e).__name__}: {e}")
            continue
        if isinstance(data, bytes):
            data = data.decode("utf-8", errors="replace")
        out = os.path.join(trace_dir, f"{tool}.json")
        with open(out, "w", encoding="utf-8") as f:
            f.write(data)
        print(f"# wrote {out} ({len(data)} bytes)")
        _print_top(tool, data, top)


def _print_top(tool: str, data: str, top: int) -> None:
    """The tools emit gviz JSON; print the biggest self-time rows."""
    try:
        table = json.loads(data)
        cols = [c.get("label") or c.get("id") for c in table["cols"]]
        rows = [[c.get("v") if isinstance(c, dict) else c for c in r["c"]]
                for r in table["rows"]]
    except Exception as e:
        print(f"# {tool}: could not parse gviz ({e}); inspect the JSON file")
        return
    # find a self-time-ish numeric column to sort by
    key_idx = None
    for i, c in enumerate(cols):
        if c and "self" in str(c).lower() and "time" in str(c).lower():
            key_idx = i
            break
    if key_idx is None:
        print(f"# {tool} columns: {cols}")
        return
    rows.sort(key=lambda r: (r[key_idx] or 0), reverse=True)
    print(f"\n== {tool} (top {top} by {cols[key_idx]}) ==")
    name_idx = next((i for i, c in enumerate(cols)
                     if c and ("name" in str(c).lower() or "op" in str(c).lower())), 0)
    total = sum((r[key_idx] or 0) for r in rows)
    for r in rows[:top]:
        share = 100.0 * (r[key_idx] or 0) / total if total else 0.0
        print(f"{share:5.1f}%  {r[key_idx]:>12}  {str(r[name_idx])[:110]}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default="vqvae",
                        choices=["vqvae", "glow", "vqtts", "lm"],
                        help="which reference-scale train step to trace "
                             "(non-vqvae use the bench builders; --batch/"
                             "--no-remat/--fused apply to vqvae only)")
    parser.add_argument("--steps", type=int, default=3)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--no-remat", action="store_true")
    parser.add_argument("--fused", action="store_true",
                        help="fused Pallas GatedHiFi blocks (model.fused_blocks)")
    parser.add_argument("--f32", action="store_true")
    parser.add_argument("--trace-dir", type=str, default=None,
                        help="default: /tmp/<model>_trace")
    parser.add_argument("--parse-only", action="store_true",
                        help="skip capture; summarize an existing trace dir")
    args = parser.parse_args()
    if args.trace_dir is None:
        args.trace_dir = f"/tmp/{args.model}_trace"
    if not args.parse_only:
        capture(args)
    summarize(args.trace_dir)
