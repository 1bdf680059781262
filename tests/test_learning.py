"""Learning-dynamics tests: losses must actually decrease under training.

Guards against silent optimization bugs (bad gradients, dead straight-through,
mis-wired codebook updates) that shape/finiteness tests can't catch.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speech_masters_thesis_tpu.models.ema import default_mu
from speech_masters_thesis_tpu.parallel.mesh import make_data_mesh, shard_batch
from speech_masters_thesis_tpu.train.harness import get_model, init_model_variables
from speech_masters_thesis_tpu.train.loop import make_train_step
from speech_masters_thesis_tpu.train.optim import build_optimizer
from speech_masters_thesis_tpu.train.state import TrainState
from speech_masters_thesis_tpu.utils.config import Config

VQ_TRAIN = {
    "model": {
        "_import_": "models.vqvae.vqvae.VQVAE",
        "levels": 3, "downs_t": [3, 2, 2], "strides_t": [2, 2, 2], "emb_width": 16,
        "l_bins": 16, "mu": 0.99, "multipliers": [2, 1, 1], "width": 8, "depth": 2,
        "m_conv": 1.0, "revival_threshold": 1.0, "use_bottleneck": True,
        "dilation_growth_rate": 3, "dilation_cycle": None, "kernel_size_growth_rate": 2,
        "kernel_size_cycle": None, "reverse_decoder_dilation": True, "zero_out": True,
        "block_type": "gated_hifi", "ddi": False,
        "loss": {"commit": 0.05, "multispectral": 1.0, "l1": 0.0, "l2": 1.0,
                 "linf": 0.02, "linf_topk": 64, "n_ffts": [512], "hop_lengths": [128],
                 "win_lengths": [512], "window": "hann", "log": True},
    },
    "dataset": {"_import_": "datasets.ljspeech.LJSpeech", "sample_rate": 22050,
                "n_fft": 1024, "hop_length": 256, "win_length": 1024, "n_mels": 80,
                "intersperse_blanks": True, "segment_length": -1,
                "use_token": False, "use_spect": False, "use_audio": True},
    "optimizer": {"name": "adam", "lr": 3e-4, "betas": [0.9, 0.98],
                  "weight_decay": 0, "eps": 1e-9},
    "scheduler": None,
    "train": {"log_dir": "/tmp/test_learn", "seed": 0, "batch_size": 8, "ema": False,
              "grad_clip_norm": None, "fp16": False, "bf16": False, "num_workers": 0,
              "n_devices": -1, "total_epochs": 1, "load_ckpt": None,
              "ckpt_every_n_steps": 10 ** 9, "log_every_n_steps": 10,
              "eval_every_n_epochs": 1, "run_sanity_val_epoch": False, "max_steps": None},
}


def test_vqvae_loss_decreases_and_codebook_trains():
    config = Config(VQ_TRAIN)
    mesh = make_data_mesh()
    model = get_model(config)
    variables = init_model_variables(model, config, jax.random.PRNGKey(0))
    tx, _ = build_optimizer(config, None)
    state = TrainState.create(variables, tx, use_ema=False)
    train_step = make_train_step(model, tx, default_mu(8, 8), use_ema=False, mesh=mesh)

    # a fixed batch of structured audio (sines): the model should overfit fast
    rng = np.random.RandomState(0)
    # t=1024 (halved for suite wall time): still 8 latent frames at the
    # 128x downsampling, and the sine batch overfits just as decisively.
    t = np.arange(1024) / 22050.0
    audio = np.stack([
        0.5 * np.sin(2 * np.pi * rng.uniform(100, 400) * t) for _ in range(8)
    ]).astype(np.float32)
    batch = shard_batch(mesh, {
        "audio": audio,
        "audio_len": np.full((8,), 1024, np.int32),
        "speaker": None,
    })

    losses, usages = [], []
    key = jax.random.PRNGKey(1)
    for step in range(30):
        state, scalars = train_step(state, batch, key)
        losses.append(float(scalars["loss"]))
        usages.append(float(scalars.get("usage", 0)))

    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert last < first * 0.9, f"loss did not decrease: {first:.3f} -> {last:.3f}"
    assert all(np.isfinite(losses))
    # codebook is alive: some codes in use, k moved from its init
    assert usages[-1] >= 1
    k = np.asarray(state.model_state["codebook"]["bottleneck"]["level_0"]["k"])
    assert np.isfinite(k).all()


def test_glow_bf16_train_step_finite():
    """Glow-TTS under bf16 mixed precision: finite losses, fp32 masters."""
    config = Config({
        "model": {
            "_import_": "models.glow_tts.glow_tts.GlowTTS",
            "n_speakers": 1, "gin_channels": 0, "intersperse_blanks": None,
            "encoder": {"n_vocab": 20, "out_channels": None, "hidden_channels": 12,
                        "filter_channels": 24, "filter_channels_dp": 24,
                        "kernel_size": 3, "p_dropout": 0.1, "n_layers": 2,
                        "n_heads": 2, "window_size": 4, "prenet": True,
                        "mean_only": True},
            "decoder": {"in_channels": None, "hidden_channels": 12, "kernel_size": 5,
                        "n_blocks": 2, "n_layers": 2, "n_sqz": 2, "n_split": 4,
                        "sigmoid_scale": False, "p_dropout": 0.05, "dilation_rate": 1},
            "ddi": False,
        },
        "dataset": {"_import_": "datasets.ljspeech.LJSpeech", "sample_rate": 22050,
                    "n_fft": 1024, "hop_length": 256, "win_length": 1024, "n_mels": 8,
                    "intersperse_blanks": True, "segment_length": -1,
                    "use_token": True, "use_spect": True, "use_audio": False},
        "optimizer": {"name": "adam", "lr": 1e-4, "betas": [0.9, 0.98],
                      "weight_decay": 0, "eps": 1e-9},
        "scheduler": None,
        "train": {"log_dir": "/tmp/glow_bf16", "seed": 0, "batch_size": 8,
                  "ema": False, "grad_clip_norm": 1.0, "fp16": False, "bf16": True,
                  "num_workers": 0, "n_devices": -1, "total_epochs": 1,
                  "load_ckpt": None, "ckpt_every_n_steps": 10 ** 9,
                  "log_every_n_steps": 10, "eval_every_n_epochs": 1,
                  "run_sanity_val_epoch": False, "max_steps": None},
    })
    mesh = make_data_mesh()
    model = get_model(config)
    variables = init_model_variables(model, config, jax.random.PRNGKey(0))
    tx, _ = build_optimizer(config, 1.0)
    state = TrainState.create(variables, tx, use_ema=False)
    step = make_train_step(model, tx, 0.99, use_ema=False, mesh=mesh, bf16=True)

    rng = np.random.RandomState(0)
    batch = shard_batch(mesh, {
        "token": rng.randint(0, 20, (8, 6)).astype(np.int32),
        "token_len": np.full((8,), 6, np.int32),
        "spect": rng.randn(8, 12, 8).astype(np.float32),
        "spect_len": np.full((8,), 12, np.int32),
        "speaker": None,
    })
    for _ in range(3):
        state, scalars = step(state, batch, jax.random.PRNGKey(1))
    assert bool(scalars["finite"])
    for leaf in jax.tree.leaves(state.params):
        assert leaf.dtype == jnp.float32
