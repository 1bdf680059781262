"""Validation artifacts: mel grids (PNG + TB image) and audio (WAV + TB audio).

Rebuild of reference utils/train_utils.py:174-304. Waveform-output models
save audio and a *computed* mel grid; spectrogram-output models save the mel
grid and audio *inverted* from mel via Griffin-Lim (the reference used
librosa.feature.inverse.mel_to_audio; here mel inversion is non-negative
least squares via a transposed-basis projection + Griffin-Lim on our own
iSTFT).
"""

from __future__ import annotations

import logging
import os

import numpy as np
import jax.numpy as jnp

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from PIL import Image  # noqa: E402

from speech_masters_thesis_tpu.ops.stft import STFT, cached_mel, mel_band_edges, mel_filterbank
from speech_masters_thesis_tpu.utils.audio_io import save_wav

logger = logging.getLogger(__name__)


def spects_to_grid(ys: np.ndarray, yhs: np.ndarray, n: int = 4) -> np.ndarray:
    """Pairs of (gt, pred) mel images -> one RGB grid array."""
    n = min(n, len(ys))
    fig, axes = plt.subplots(n, 2, figsize=(16, 4 * n), squeeze=False)
    for i in range(n):
        for j, spect in enumerate((ys[i], yhs[i])):
            ax = axes[i][j]
            im = ax.imshow(spect, aspect="auto", origin="lower", interpolation="none")
            plt.colorbar(im, ax=ax)
            ax.set_xlabel("ground truth" if j == 0 else "predicted")
            ax.set_ylabel(str(i))
    fig.tight_layout()
    fig.canvas.draw()
    grid = np.asarray(fig.canvas.buffer_rgba())[:, :, :3].copy()
    plt.close(fig)
    return grid


def griffin_lim(magnitude: np.ndarray, stft: STFT, n_iter: int = 32) -> np.ndarray:
    """Phase reconstruction by iterative STFT projection. magnitude: [F, bins]."""
    rng = np.random.RandomState(0)
    mag = jnp.asarray(magnitude[None])  # [1, frames, bins]
    phase = jnp.asarray(rng.uniform(-np.pi, np.pi, magnitude.shape)[None].astype(np.float32))
    for _ in range(n_iter):
        audio = stft.inverse(mag, phase)
        real, imag = stft.real_imag(audio)
        phase = jnp.arctan2(imag, real)[:, :mag.shape[1]]
    return np.asarray(stft.inverse(mag, phase))[0]


def mel_to_audio(log_mel: np.ndarray, config) -> np.ndarray:
    """[frames, n_mels] log-mel -> waveform via pinv-mel + Griffin-Lim."""
    ds = config.dataset
    fb = mel_filterbank(ds.sample_rate, ds.n_fft, ds.n_mels, *mel_band_edges(ds))  # (n_mels, bins)
    mel = np.exp(log_mel)  # undo safe_log
    mag = np.maximum(mel @ np.linalg.pinv(fb).T, 0.0).astype(np.float32)  # [frames, bins]
    stft = STFT(ds.n_fft, ds.hop_length, ds.win_length)
    return griffin_lim(mag, stft)


def save_audio_and_computed_spect(config, global_step, writer, audio, audio_pred, n: int = 4):
    """Waveform models: dump WAVs and mel grids computed from the audio."""
    ds = config.dataset
    mel_op = cached_mel(ds.sample_rate, ds.n_fft, ds.hop_length, ds.win_length,
                        ds.n_mels, *mel_band_edges(ds))
    spect, spect_pred = [], []
    for i, (gt, pred) in enumerate(zip(audio, audio_pred)):
        if i == n:
            break
        gt = np.clip(gt, -1, 1)
        pred = np.clip(pred, -1, 1)
        if i == 0:
            _dump_audio_pair(config, global_step, writer, gt, pred)
        spect.append(np.asarray(mel_op(jnp.asarray(gt[None]))[0]).T)       # [n_mels, frames]
        spect_pred.append(np.asarray(mel_op(jnp.asarray(pred[None]))[0]).T)
    _dump_grid(config, global_step, writer, np.asarray(spect), np.asarray(spect_pred), n)


def save_spect_and_inverted_audio(config, global_step, writer, spect, spect_pred, n: int = 4):
    """Spectrogram models: dump mel grids and Griffin-Lim-inverted audio.

    spect, spect_pred: [B, frames, n_mels] log-mel (NTC).
    """
    _dump_grid(config, global_step, writer,
               np.transpose(spect[:n], (0, 2, 1)), np.transpose(spect_pred[:n], (0, 2, 1)), n)
    gt = mel_to_audio(spect[0], config)
    pred = mel_to_audio(spect_pred[0], config)
    _dump_audio_pair(config, global_step, writer, gt, pred)


def _dump_audio_pair(config, global_step, writer, gt, pred):
    sr = config.dataset.sample_rate
    audio_dir = os.path.join(config.train.log_dir, "audio")
    os.makedirs(audio_dir, exist_ok=True)
    save_wav(os.path.join(audio_dir, f"val_audio_{global_step}_gt.wav"), gt, sr)
    save_wav(os.path.join(audio_dir, f"val_audio_{global_step}_pred.wav"), pred, sr)
    if writer is not None:
        try:  # tensorboardX.add_audio imports soundfile internally
            writer.add_audio("audio/val_gt", np.clip(gt, -1, 1), global_step, sample_rate=sr)
            writer.add_audio("audio/val_pred", np.clip(pred, -1, 1), global_step, sample_rate=sr)
        except Exception as e:  # pragma: no cover - depends on optional lib
            logger.debug("Skipping TB audio summaries: %s", e)


def _dump_grid(config, global_step, writer, spect, spect_pred, n):
    grid = spects_to_grid(spect, spect_pred, n=n)
    spect_dir = os.path.join(config.train.log_dir, "spect")
    os.makedirs(spect_dir, exist_ok=True)
    Image.fromarray(grid).save(os.path.join(spect_dir, f"val_spect_{global_step}.png"))
    if writer is not None:
        writer.add_image("mel/val", grid, global_step, dataformats="HWC")
