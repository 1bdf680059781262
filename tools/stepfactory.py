"""Shared builder for perf tools: the reference-scale VQ-VAE train step.

Used by tools/perf_profile.py, tools/perf_ablate.py and tools/perf_sweep.py so
every perf experiment runs exactly the shipped bench configuration
(bench.py) with controlled variations.
"""

from __future__ import annotations

import os

import numpy as np

HOP = 256
CLIP_SECONDS = 3.0


def build_vqvae_step(batch_size: int = 32, bf16: bool = True, remat: bool = True,
                     ema: bool = True, fused: bool = False):
    """Returns (train_step, state, device_batch, rng, meta)."""
    import jax

    from speech_masters_thesis_tpu.models.ema import default_mu
    from speech_masters_thesis_tpu.parallel.mesh import (
        enable_compilation_cache, make_data_mesh, place_replicated, shard_batch)
    from speech_masters_thesis_tpu.train.harness import get_model, init_model_variables
    from speech_masters_thesis_tpu.train.loop import make_train_step
    from speech_masters_thesis_tpu.train.optim import build_optimizer
    from speech_masters_thesis_tpu.train.state import TrainState
    from speech_masters_thesis_tpu.utils.config import Config, load_config

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    config = load_config(os.path.join(repo, "configs", "models", "vqvae.yaml"))
    config.model.remat = remat
    config.model.fused_blocks = fused
    config = config.merge(load_config(os.path.join(repo, "configs", "datasets", "ljspeech.yaml")))
    config = config.merge(Config({"train": {
        "log_dir": "/tmp/bench", "seed": 0, "batch_size": batch_size, "ema": ema,
        "grad_clip_norm": None, "fp16": False, "bf16": False, "num_workers": 0,
        "n_devices": -1, "total_epochs": 1, "load_ckpt": None,
        "ckpt_every_n_steps": 10 ** 9, "log_every_n_steps": 10 ** 9,
        "eval_every_n_epochs": 1, "run_sanity_val_epoch": False, "max_steps": None,
    }}))

    enable_compilation_cache()
    devices = jax.devices()
    mesh = make_data_mesh(devices)
    model = get_model(config)
    variables = init_model_variables(model, config, jax.random.PRNGKey(0))
    tx, _ = build_optimizer(config, None)
    state = place_replicated(mesh, TrainState.create(variables, tx, use_ema=ema))
    train_step = make_train_step(model, tx, default_mu(batch_size, len(devices)),
                                 use_ema=ema, mesh=mesh, bf16=bf16)

    t_samples = int(CLIP_SECONDS * 22050) // 512 * 512
    rng = np.random.RandomState(0)
    device_batch = shard_batch(mesh, {
        "audio": rng.uniform(-0.5, 0.5, (batch_size, t_samples)).astype(np.float32),
        "audio_len": np.full((batch_size,), t_samples, np.int32),
        "speaker": None,
    })
    meta = {
        "batch": batch_size, "t_samples": t_samples,
        "mel_frames_per_step": batch_size * t_samples / HOP,
        "bf16": bf16, "remat": remat, "fused": fused,
        "model": model, "config": config, "mesh": mesh, "tx": tx,
    }
    return train_step, state, device_batch, jax.random.PRNGKey(0), meta
