"""TRAINING-DYNAMICS parity vs PyTorch (VERDICT r2 missing #1).

Forward parity (tests/test_torch_parity.py) cannot see a backward-pass,
optimizer-semantics, or codebook-transition bug: transplanted weights match
at step 0 by construction. These tests run K REAL optimizer steps in both
frameworks from identical weights — full reference train-step semantics
(reference train.py:121-143: backward, clip_grad_norm, AdamW step,
LR-scheduler step, EMA step; plus the codebook EMA transition inside the
forward, reference bottleneck.py:60-90,186-196) — and assert that

  * the per-step loss trajectories track at fp32 tolerance,
  * the final parameters (exported back to the reference layout) match,
  * the final codebook (k, k_sum, k_elem) matches,
  * the final EMA shadows match,
  * the dead-code revival transition fires identically (same dead set,
    surviving centroids equal; revived vectors are random draws in both).

Dropout is 0 and revival is disabled (threshold 0) in the deterministic
trajectory test so both frameworks are RNG-free; the revival test uses
threshold 1.0 with a poisoned centroid that dies deterministically.
"""

import math

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tools.import_torch_checkpoint import export_vqvae, import_vqvae
from speech_masters_thesis_tpu.models.vqvae.model import VQVAE as JaxVQVAE
from speech_masters_thesis_tpu.train.loop import make_train_step
from speech_masters_thesis_tpu.train.optim import build_optimizer
from speech_masters_thesis_tpu.train.state import TrainState
from speech_masters_thesis_tpu.utils.config import Config

from torch_ref import vqvae_ref as tref

EMA_MU = 0.95
K_STEPS = 6

DYN_CONFIG = Config({
    "model": {
        "levels": 2, "downs_t": [2, 1], "strides_t": [2, 2], "emb_width": 16,
        "l_bins": 32, "mu": 0.99, "multipliers": [2, 1], "width": 8, "depth": 2,
        "m_conv": 1.0, "revival_threshold": 0.0, "use_bottleneck": True,
        "dilation_growth_rate": 3, "dilation_cycle": None, "kernel_size_growth_rate": 2,
        "kernel_size_cycle": None, "reverse_decoder_dilation": True, "zero_out": False,
        "block_type": "gated_hifi", "p_dropout": 0.0,
        "loss": {"commit": 0.05, "multispectral": 1.0, "l1": 0.1, "l2": 1.0,
                 "linf": 0.02, "linf_topk": 64, "linf_approx": False,
                 "n_ffts": [256, 128], "hop_lengths": [64, 32],
                 "win_lengths": [256, 128], "window": "hann", "log": True},
    },
    "optimizer": {"name": "adam", "lr": 1e-3, "betas": [0.9, 0.98],
                  "weight_decay": 0.01, "eps": 1e-9},
    "scheduler": {"name": "linear", "warmup_steps": 4},
    "train": {"grad_clip_norm": 1.0},
})


def _randomize(module: torch.nn.Module, seed: int) -> None:
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.1)


def _zero_dropout(module: torch.nn.Module) -> None:
    for m in module.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0


def _np_sd(module: torch.nn.Module) -> dict:
    # .copy() is load-bearing: torch .numpy() returns a VIEW sharing storage
    # with the live parameter, and the torch training loop mutates params
    # in-place — without the copy the "initial" weights handed to jax would
    # silently become torch's final weights.
    return {k: v.numpy().copy() for k, v in module.state_dict().items()}


def _batches(n=2, b=2, t=512):
    out = []
    for i in range(n):
        rng = np.random.RandomState(100 + i)
        audio = rng.uniform(-0.8, 0.8, (b, t)).astype(np.float32)
        lengths = np.array([t, t - 128], np.int32)
        out.append((audio, lengths))
    return out


def _build_torch(config, k_seed=2):
    torch.manual_seed(0)
    ref = tref.VQVAE(config.to_dict())
    _randomize(ref, seed=1)
    _zero_dropout(ref)
    bn = ref.bottleneck.level_blocks[0]
    bn.threshold = config.model.revival_threshold
    k0 = torch.randn(config.model.l_bins, config.model.emb_width,
                     generator=torch.Generator().manual_seed(k_seed))
    bn.restore_k(k0)
    return ref, bn


def _torch_train(ref, config, batches, k_steps):
    """Reference train-step loop: AdamW + clip + LinearWarmup + EMA."""
    opt = torch.optim.AdamW(ref.parameters(), lr=config.optimizer.lr,
                            betas=tuple(config.optimizer.betas),
                            weight_decay=config.optimizer.weight_decay,
                            eps=config.optimizer.eps)
    warmup = config.scheduler.warmup_steps

    def set_lr(count):  # reference LinearWarmupLR (lr_scheduler.py:14-24)
        scale = min((count + 1) / warmup, 1.0)
        for g in opt.param_groups:
            g["lr"] = config.optimizer.lr * scale

    ema = {n: p.detach().clone() for n, p in ref.named_parameters()}
    ref.train()
    losses = []
    for step in range(k_steps):
        audio, lengths = batches[step % len(batches)]
        set_lr(step)
        opt.zero_grad()
        out = ref(torch.from_numpy(audio)[:, None, :], torch.from_numpy(lengths),
                  update_k=True)
        out["loss"].backward()
        torch.nn.utils.clip_grad_norm_(ref.parameters(), config.train.grad_clip_norm)
        opt.step()
        with torch.no_grad():
            for n, p in ref.named_parameters():
                ema[n].mul_(EMA_MU).add_((1 - EMA_MU) * p)
        losses.append(float(out["loss"]))
    return losses, ema


def _build_jax(ref, config):
    variables = import_vqvae(_np_sd(ref), config)
    # the oracle's k_sum/k_elem live as attributes, not state_dict entries;
    # mirror restore_k exactly (k_sum = k, k_elem = ones — both already match
    # what import_vqvae derives from k)
    model = JaxVQVAE(config=config.to_dict())
    rng = jax.random.PRNGKey(0)
    init_vars = model.init({"params": rng, "dropout": rng, "codebook": rng},
                           jnp.zeros((1, 64)), jnp.full((1,), 64), train=False)
    merged = jax.device_get(dict(init_vars))
    merged.update(variables)
    return model, merged


def _jax_train(model, variables, config, batches, k_steps):
    tx, _ = build_optimizer(config, config.train.grad_clip_norm)
    state = TrainState.create(jax.tree.map(jnp.array, variables), tx, use_ema=True)
    step_fn = make_train_step(model, tx, EMA_MU, use_ema=True)
    rng = jax.random.PRNGKey(7)
    losses = []
    for step in range(k_steps):
        audio, lengths = batches[step % len(batches)]
        batch = {"audio": jnp.asarray(audio), "audio_len": jnp.asarray(lengths),
                 "speaker": None}
        state, scalars = step_fn(state, batch, rng)
        losses.append(float(scalars["loss"]))
    return losses, jax.device_get(state)


@pytest.fixture(scope="module")
def trained():
    batches = _batches()
    ref, bn = _build_torch(DYN_CONFIG)
    model, variables = _build_jax(ref, DYN_CONFIG)
    t_losses, t_ema = _torch_train(ref, DYN_CONFIG, batches, K_STEPS)
    j_losses, state = _jax_train(model, variables, DYN_CONFIG, batches, K_STEPS)
    return ref, bn, t_losses, t_ema, j_losses, state


def test_loss_trajectories_track(trained):
    _, _, t_losses, _, j_losses, _ = trained
    np.testing.assert_allclose(j_losses, t_losses, rtol=5e-4,
                               err_msg=f"torch={t_losses} jax={j_losses}")
    # the trajectory moved (the optimizer actually did something)
    assert abs(t_losses[-1] - t_losses[0]) > 1e-4


def _assert_params_close(pairs) -> None:
    """Whole-model param-trajectory closeness with bounded chaotic outliers.

    Cross-framework fp reduction-order noise (~1e-7 at step 1, measured) is
    amplified by Adam's m/sqrt(v) normalizer on elements whose gradient sign
    is near-tied across steps: measured drift grows 1e-8 -> 7e-6 -> 1e-5 ->
    5e-4 (max abs) over 1/2/4/6 steps while the LOSS gap stays ~1e-6, and
    the affected elements cluster in a few conv kernels. Gates, over ALL
    params jointly: (a) every element stays within half the 6-step
    cumulative-LR path of the reference (abs < 2.5e-3; Adam's normalizer
    makes near-zero-gradient elements step ~±lr on a pure SIGN flip of m,
    so one flipped step = ~1e-3 — observed worst 1.16e-3); (b) at most
    0.5% of ALL elements exceed
    the tight tolerance (rtol 5e-3 / atol 2e-4). A semantic bug (wrong decay
    grouping, missed clip, wrong LR/warmup schedule) moves essentially every
    element systematically and fails both gates."""
    worst_key, worst_abs, n_loose, n_total = None, 0.0, 0, 0
    for key, actual, desired in pairs:
        a, d = np.asarray(actual, np.float64), np.asarray(desired, np.float64)
        abs_err = np.abs(a - d)
        if abs_err.max() > worst_abs:
            worst_key, worst_abs = key, float(abs_err.max())
        n_loose += int((abs_err > (2e-4 + 5e-3 * np.abs(d))).sum())
        n_total += d.size
    assert worst_abs < 2.5e-3, (
        f"{worst_key}: max abs err {worst_abs:.2e} exceeds half the "
        f"cumulative-LR path (2.5e-3)")
    assert n_loose <= 0.005 * n_total, (
        f"{n_loose}/{n_total} elements outside tight tolerance "
        f"(worst {worst_key}: {worst_abs:.2e}) — systematic divergence, not drift")


def test_final_params_match(trained):
    ref, _, _, _, _, state = trained
    final_vars = {"params": state.params, **state.model_state}
    exported = export_vqvae(jax.tree.map(np.asarray, final_vars), DYN_CONFIG)
    t_sd = _np_sd(ref)
    _assert_params_close((key, val, t_sd[key]) for key, val in exported.items()
                         if not key.startswith("bottleneck."))


def test_final_codebook_matches(trained):
    _, bn, _, _, _, state = trained
    cb = jax.tree.map(np.asarray, state.model_state["codebook"]["bottleneck"]["level_0"])
    # k/k_sum inherit the encoder's fp drift through the EMA of batch sums;
    # observed worst case after 6 steps: ~5e-4 rel on 2/512 elements
    np.testing.assert_allclose(cb["k"], bn.k.numpy(), rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(cb["k_sum"], bn.k_sum.numpy(), rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(cb["k_elem"], bn.k_elem.numpy(), rtol=1e-5, atol=1e-6)


def test_final_ema_matches(trained):
    ref, _, _, t_ema, _, state = trained
    ema_vars = {"params": state.ema_params,
                "codebook": state.model_state["codebook"]}
    exported = export_vqvae(jax.tree.map(np.asarray, ema_vars), DYN_CONFIG)
    # same drift rationale as _assert_params_close (EMA is a convex
    # combination of the drifting trajectories)
    _assert_params_close((key, val, t_ema[key].numpy())
                         for key, val in exported.items()
                         if not key.startswith("bottleneck."))


def test_revival_transition_matches():
    """threshold=1.0 with a poisoned far-away centroid: it must die in BOTH
    frameworks on the first update (k_elem EMA: 0.99 * 1 + 0 < 1.0), get a
    random-draw replacement in both, and every surviving centroid must still
    match exactly."""
    config = DYN_CONFIG.copy()
    config.model.revival_threshold = 1.0
    batches = _batches(n=1)
    ref, bn = _build_torch(config)
    with torch.no_grad():
        bn.k[0] += 100.0  # never wins an argmin -> k_elem decays below 1.0
        bn.k_sum.copy_(bn.k)
    model, variables = _build_jax(ref, config)

    t_losses, _ = _torch_train(ref, config, batches, 1)
    j_losses, state = _jax_train(model, variables, config, batches, 1)
    np.testing.assert_allclose(j_losses, t_losses, rtol=5e-4)

    cb = jax.tree.map(np.asarray, state.model_state["codebook"]["bottleneck"]["level_0"])
    t_elem = bn.k_elem.numpy()
    np.testing.assert_allclose(cb["k_elem"], t_elem, rtol=1e-5, atol=1e-6)
    dead = t_elem < 1.0
    assert dead[0] and dead.sum() >= 1
    # survivors: EMA-updated centroids identical across frameworks
    np.testing.assert_allclose(cb["k"][~dead], bn.k.numpy()[~dead],
                               rtol=1e-4, atol=1e-5)
    # revived rows: fresh random draws near the data in both (not the old
    # poisoned vector, finite, bounded)
    for k_new in (cb["k"][dead], bn.k.numpy()[dead]):
        assert np.isfinite(k_new).all()
        assert np.abs(k_new).max() < 50.0  # far from the +100 poison
