"""Headline benchmark: VQ-VAE training throughput (mel-frames/sec/chip).

Runs the full reference-scale VQ-VAE (emb 128, l_bins 512, gated_hifi,
128x compression — configs/models/vqvae.yaml) through complete jitted train
steps (forward + backward + Adam + codebook EMA) on the available device and
prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "mel-frames/s/chip", "vs_baseline": R}

vs_baseline compares against the measured PyTorch-CPU equivalent
(tools/baseline_cpu.json, produced by tools/torch_baseline.py) — the
reference publishes no numbers of its own (BASELINE.md). Target: >= 10x.

Timing uses a forced host read as the barrier (utils/timing.py) —
jax.block_until_ready does NOT block on this image's axon tunnel platform,
which inflated round-1 numbers ~114x (VERDICT.md). The JSON also reports
XLA cost-analysis FLOPs and the implied MFU; rate_report refuses to emit a
number that exceeds chip peak.
"""

from __future__ import annotations

import json
import os
import sys
import threading

import numpy as np

# Shipped training configuration, chosen by the honest round-2 sweep
# (see BASELINE.md "Optimization ladder"): bf16, batch 16, NO remat —
# remat's +33% FLOPs lost ~23% throughput once timing was fixed.
BATCH = int(os.environ.get("BENCH_BATCH", "16"))
CLIP_SECONDS = 3.0
WARMUP_STEPS = 3
TIMED_STEPS = int(os.environ.get("BENCH_STEPS", "20"))
HOP = 256


def _skipped(reason: str) -> None:
    """Emit ONE parseable JSON line and exit 0 — the driver must always get
    a structured record, even on a backend outage (VERDICT r3 weak #1)."""
    print(json.dumps({
        "metric": "vqvae_train_mel_frames_per_sec_per_chip",
        "value": None,
        "unit": "mel-frames/s/chip",
        "vs_baseline": None,
        "skipped": reason,
    }))
    sys.stdout.flush()


def _probe_backend(timeout_s: float):
    """Run one tiny op with a watchdog before committing to long compiles.

    The round-3 failure mode was a HANG (wedged remote TPU lease), which no
    try/except can catch — a daemon timer prints the skipped record and
    hard-exits if the first op doesn't complete in time. A one-op probe that
    can't finish in `timeout_s` means the lease is already wedged, so the
    exit doesn't sacrifice a healthy client (CLAUDE.md environment gotchas).
    """
    done = threading.Event()

    def watchdog():
        if not done.wait(timeout_s):
            _skipped(f"tpu unavailable: one-op probe hung > {timeout_s:.0f}s")
            os._exit(0)

    threading.Thread(target=watchdog, daemon=True).start()
    try:
        import jax
        import jax.numpy as jnp

        backend = jax.default_backend()
        jax.device_get(jnp.ones((8, 8)).sum())
    except Exception as e:  # backend init / first-op failure
        done.set()
        _skipped(f"tpu unavailable: {type(e).__name__}: {e}")
        sys.exit(0)
    done.set()
    return backend


def main():
    # 600 s for ONE tiny op (init + ones(8,8).sum()): healthy cold-init +
    # tunnel latency is seconds, but the lease's post-process handover has
    # been observed to stall a new client's first op for 5-15 MINUTES before
    # completing (r5, 22:20 UTC Aug 19: a 300 s probe declared "wedged" on a
    # lease that a process 5 min earlier and one 20 min later both used
    # fine). Waiting longer on a trivial op is free; skipping the round's
    # headline record is not. The watchdog's hard exit only fires on a
    # genuinely dead lease — hard-exiting a trivial-op client is the
    # documented probe-recovery pattern (CLAUDE.md), unlike SIGTERM during
    # a long compile.
    _probe_backend(float(os.environ.get("BENCH_PROBE_TIMEOUT", "600")))
    import jax

    from speech_masters_thesis_tpu.models.ema import default_mu
    from speech_masters_thesis_tpu.parallel.mesh import (
        enable_compilation_cache,
        make_data_mesh,
        place_replicated,
        shard_batch,
    )
    from speech_masters_thesis_tpu.train.harness import get_model, init_model_variables
    from speech_masters_thesis_tpu.train.loop import make_train_step
    from speech_masters_thesis_tpu.train.optim import build_optimizer
    from speech_masters_thesis_tpu.train.state import TrainState
    from speech_masters_thesis_tpu.utils.config import Config, load_config
    from speech_masters_thesis_tpu.utils import timing

    # TPU-friendly PRNG for dropout/jitter bits (threefry bit-generation is
    # pure VPU overhead — measured ~46% of the LM step); BENCH_PRNG=threefry
    # opts back into the reference-comparable stream
    if os.environ.get("BENCH_PRNG", "rbg") == "rbg" and jax.default_backend() == "tpu":
        jax.config.update("jax_default_prng_impl", "rbg")

    repo = os.path.dirname(os.path.abspath(__file__))
    config = load_config(os.path.join(repo, "configs", "models", "vqvae.yaml"))
    if os.environ.get("BENCH_REMAT", "0") == "1":
        config.model.remat = True
    # fused Pallas GatedHiFi blocks (ops/pallas/gated_hifi.py); BENCH_FUSED=0 opts out
    config.model.fused_blocks = os.environ.get("BENCH_FUSED", "1") == "1" \
        and jax.default_backend() == "tpu"
    # space-to-depth/sub-pixel strided convs — measured slower (BASELINE.md),
    # default off; BENCH_FOLDED=1 re-runs the rejected experiment
    config.model.folded_convs = os.environ.get("BENCH_FOLDED", "0") == "1"

    config = config.merge(load_config(os.path.join(repo, "configs", "datasets", "ljspeech.yaml")))
    config = config.merge(Config({"train": {
        "log_dir": "/tmp/bench", "seed": 0, "batch_size": BATCH, "ema": True,
        "grad_clip_norm": None, "fp16": False, "bf16": False, "num_workers": 0,
        "n_devices": -1, "total_epochs": 1, "load_ckpt": None,
        "ckpt_every_n_steps": 10 ** 9, "log_every_n_steps": 10 ** 9,
        "eval_every_n_epochs": 1, "run_sanity_val_epoch": False, "max_steps": None,
    }}))

    enable_compilation_cache()
    devices = jax.devices()
    n_chips = len(devices)
    mesh = make_data_mesh(devices)

    model = get_model(config)
    variables = init_model_variables(model, config, jax.random.PRNGKey(0))
    tx, _ = build_optimizer(config, None)
    state = TrainState.create(variables, tx, use_ema=True)
    state = place_replicated(mesh, state)
    # bf16 mixed precision is the shipped training configuration (see
    # docs/DESIGN.md); BENCH_F32=1 measures the fp32 variant
    bf16 = os.environ.get("BENCH_F32", "0") != "1"
    train_step = make_train_step(model, tx, default_mu(BATCH, n_chips), use_ema=True,
                                 mesh=mesh, bf16=bf16)

    t_samples = int(CLIP_SECONDS * 22050) // 512 * 512
    rng = np.random.RandomState(0)
    batch = {
        "audio": rng.uniform(-0.5, 0.5, (BATCH, t_samples)).astype(np.float32),
        "audio_len": np.full((BATCH,), t_samples, np.int32),
        "speaker": None,
    }
    device_batch = shard_batch(mesh, batch)
    step_rng = jax.random.PRNGKey(0)

    flops = timing.compiled_flops(train_step, state, device_batch, step_rng)

    # model-intrinsic FLOPs (no fused-kernel backward recompute): cost
    # analysis of the SAME step compiled without the Pallas blocks — the
    # param tree is identical, only the compute schedule differs. Reported
    # as model_mfu next to executed-FLOP mfu (VERDICT r2 weak #2); the
    # compile is amortized by the persistent compilation cache.
    model_flops = None
    if config.model.fused_blocks:
        config.model.fused_blocks = False
        unfused_step = make_train_step(get_model(config), tx,
                                       default_mu(BATCH, n_chips), use_ema=True,
                                       mesh=mesh, bf16=bf16)
        model_flops = timing.compiled_flops(unfused_step, state, device_batch, step_rng)
        config.model.fused_blocks = True

    def run_one(carry):
        new_state, scalars = train_step(carry, device_batch, step_rng)
        return new_state, scalars["loss"]

    sec_per_step, state = timing.time_steps(run_one, state, WARMUP_STEPS, TIMED_STEPS)

    mel_frames_per_step = BATCH * t_samples / HOP
    report = timing.rate_report(per_step_units=mel_frames_per_step,
                                sec_per_step=sec_per_step,
                                flops_per_step=flops, bf16=bf16, n_chips=n_chips,
                                model_flops_per_step=model_flops)
    value = report["value"]

    baseline_path = os.path.join(repo, "tools", "baseline_cpu.json")
    vs_baseline = 0.0
    if os.path.exists(baseline_path):
        with open(baseline_path, encoding="utf-8") as f:
            baseline = json.load(f)
        if baseline.get("value"):
            vs_baseline = value / baseline["value"]

    result = {
        "metric": "vqvae_train_mel_frames_per_sec_per_chip",
        "value": value,
        "unit": "mel-frames/s/chip",
        "vs_baseline": round(vs_baseline, 2),
        **{k: v for k, v in report.items() if k != "value"},
        "batch": BATCH,
        "timed_steps": TIMED_STEPS,
    }
    if not bf16:
        result["metric"] += "_f32"
    print(json.dumps(result))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # mid-bench backend loss still yields a record
        if "jaxlib" in type(e).__module__ or "Runtime" in type(e).__name__:
            _skipped(f"tpu failed mid-bench: {type(e).__name__}: {e}")
        else:
            raise
