"""Loss functions (pure jnp).

TPU-native counterparts of:
  * MultiResolutionSpectralLoss / MultiNormReconstructionLoss
      (reference models/vqvae/losses.py:11-80)
  * MaximumMutualInformationLoss / FocalLoss
      (reference models/transformer_lm/losses.py:8-105)

Layouts are NTC: waveforms [B, T], masks [B, T], spectra [B, frames, bins].
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from speech_masters_thesis_tpu.ops.basic import safe_log, safe_sqrt
from speech_masters_thesis_tpu.ops.stft import STFT


def downsample_mask(mask: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """Downsamples a [B, T] sample mask to STFT frame rate.

    Matches reference models/vqvae/losses.py:33-37: pad left by pad_amount
    with ones, right by pad_amount with zeros, then stride through at hop
    starting from n_fft//2 — frames whose window center falls in padding are
    dropped.
    """
    pad = (n_fft - hop_length) // 2
    m = jnp.pad(mask, ((0, 0), (pad, 0)), constant_values=1.0)
    m = jnp.pad(m, ((0, 0), (0, pad)), constant_values=0.0)
    total = m.shape[1]
    start = n_fft // 2
    stop = total - n_fft // 2 + 1
    return m[:, start:stop:hop_length]


@dataclass(frozen=True)
class MultiResolutionSpectralLoss:
    """Masked multi-resolution STFT magnitude loss.

    Per resolution: sqrt over the per-sample sum of squared magnitude errors,
    averaged over batch (reference losses.py:39-55); optionally an extra
    log-magnitude term. N parallel STFT banks — all matmuls, all MXU.
    """

    n_ffts: Sequence[int]
    hop_lengths: Sequence[int]
    win_lengths: Sequence[int] | None = None
    window: str = "hann"  # reference losses.py:30 forwards config loss.window
    log: bool = False
    stfts: tuple = field(repr=False, default=())

    def __post_init__(self):
        wins = self.win_lengths if self.win_lengths is not None else self.n_ffts
        assert len(self.n_ffts) == len(self.hop_lengths) == len(wins)
        stfts = tuple(STFT(n, h, w, window_type=self.window)
                      for n, h, w in zip(self.n_ffts, self.hop_lengths, wins))
        object.__setattr__(self, "stfts", stfts)
        object.__setattr__(self, "win_lengths", tuple(wins))

    def __call__(self, y: jnp.ndarray, yh: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        """y, yh: [B, T] waveforms; mask: [B, T]."""
        loss = 0.0
        for stft in self.stfts:
            y_mag = stft(y)
            yh_mag = stft(yh)
            frame_mask = downsample_mask(mask, stft.n_fft, stft.hop_length)[:, :, None]
            diff = (y_mag - yh_mag) * frame_mask
            loss += jnp.mean(safe_sqrt(jnp.sum(diff * diff, axis=(1, 2))))
            if self.log:
                log_diff = (safe_log(y_mag) - safe_log(yh_mag)) * frame_mask
                loss += jnp.mean(safe_sqrt(jnp.sum(log_diff * log_diff, axis=(1, 2))))
        return loss / len(self.stfts)


@dataclass(frozen=True)
class MultiNormReconstructionLoss:
    """Weighted L1 + L2 + top-k Linf reconstruction loss over masked waveforms.

    Reference models/vqvae/losses.py:58-80. The Linf term keeps the k largest
    squared errors per sample (top_k sorts on-device; k is static).
    """

    l1: float = 0.0
    l2: float = 1.0
    linf: float = 0.02
    linf_topk: int = 2048
    # approx_max_k is the TPU-native top-k (O(n) vs a full sort; recall ~0.95
    # of the true top set). Honest round-2 profiling showed exact top_k is
    # <0.5% of the step, so the reference's exact semantics are the DEFAULT;
    # linf_approx: true remains available as a perf opt-in.
    linf_approx: bool = False

    def __call__(self, y: jnp.ndarray, yh: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        # loss accumulates in fp32 even under bf16 activations
        y = (y * mask).reshape(y.shape[0], -1).astype(jnp.float32)
        yh = (yh * mask).reshape(yh.shape[0], -1).astype(jnp.float32)
        diff = y - yh
        sq = diff * diff
        loss = self.l1 * jnp.mean(jnp.abs(diff)) + self.l2 * jnp.mean(sq)
        if self.linf > 0:
            k = min(self.linf_topk, sq.shape[-1])
            if self.linf_approx and k < sq.shape[-1]:
                topk_vals = jax.lax.approx_max_k(sq, k)[0]  # [B, k]
            else:
                topk_vals = jax.lax.top_k(sq, k)[0]
            loss += self.linf * jnp.sum(jnp.mean(topk_vals, axis=0))
        return loss


def cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over rows; logits [N, C], targets [N] int."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0])


def masked_cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """CE averaged over mask-selected rows (static shapes; no boolean gather)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(nll * mask) / denom


def mmi_loss(logits: jnp.ndarray, targets: jnp.ndarray, num_classes: int,
             mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Maximum-mutual-information loss: H(z|x) upper bound minus H(z).

    Behaviorally identical to reference models/transformer_lm/losses.py:8-21,
    including the log_softmax applied to the one-hot target (a reference
    quirk that scales the CE-like term by a constant; reproduced on purpose,
    see SURVEY §2.3).
    """
    p_zy = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    if mask is not None:
        denom = jnp.maximum(jnp.sum(mask), 1.0)
        p_z = jnp.sum(p_zy * mask[:, None], axis=0) / denom
    else:
        p_z = jnp.mean(p_zy, axis=0)
    h_z = -jnp.sum(p_z * jnp.log(p_z))

    one_hot = jax.nn.one_hot(targets, num_classes, dtype=logits.dtype)
    x = p_zy * jax.nn.log_softmax(one_hot, axis=-1)
    row = -jnp.sum(x, axis=-1)
    if mask is not None:
        h_z_x_ub = jnp.sum(row * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    else:
        h_z_x_ub = jnp.mean(row)
    return h_z_x_ub - h_z


def focal_loss(logits: jnp.ndarray, targets: jnp.ndarray, gamma: float = 0.0,
               mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Focal loss (1-pt)^gamma * CE, mean reduction.

    Reference models/transformer_lm/losses.py:24-105 (gamma=10 when selected
    by the LM config, reference transformer_lm.py:81).
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    log_pt = jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    ce = -log_pt
    focal = (1.0 - jnp.exp(log_pt)) ** gamma
    per_row = focal * ce
    if mask is not None:
        return jnp.sum(per_row * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.mean(per_row)


def masked_mse(y: jnp.ndarray, yh: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    diff = (y - yh) * mask
    return jnp.sum(diff * diff) / jnp.maximum(jnp.sum(mask), 1.0)
