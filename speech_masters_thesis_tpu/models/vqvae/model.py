"""VQ-VAE: raw-waveform codec with EMA k-means quantization (flax, NTC).

Rebuild of reference models/vqvae/vqvae.py:11-132. The reference builds
``levels`` encoder/decoder pairs and then hard-discards all but the last
(the ``# HACK`` at vqvae.py:65-71), leaving a single-level model whose
encoder runs the *full* down stack. This framework builds only that
effective model: one encoder/decoder over ``downs_t``/``strides_t`` with
``width * multipliers[-1]`` channels — identical compute graph, no dead
parameters.

Waveforms are [B, T] in [-1, 1]; encodings are [B, T/prod(stride**down), C].
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from speech_masters_thesis_tpu.models.base import WaveformReconstructionModel
from speech_masters_thesis_tpu.utils.config import Config
from speech_masters_thesis_tpu.models.vqvae.bottleneck import Bottleneck, NoBottleneck
from speech_masters_thesis_tpu.models.vqvae.encdec import Decoder, Encoder
from speech_masters_thesis_tpu.ops.basic import sequence_mask
from speech_masters_thesis_tpu.ops.losses import (
    MultiNormReconstructionLoss,
    MultiResolutionSpectralLoss,
)


def compression_factor(config) -> int:
    """prod(stride**down) over all levels (reference generate_vq_dataset.py:217)."""
    total = 1
    for down, stride in zip(config.model.downs_t, config.model.strides_t):
        total *= stride ** down
    return total


class VQVAE(WaveformReconstructionModel):

    config: dict

    def setup(self):
        # flax freezes dict attributes; rewrap for attribute access
        full_cfg = Config(self.config)
        cfg = full_cfg.model
        multiplier = (cfg.multipliers or [1] * cfg.levels)[-1]
        common = dict(
            input_emb_width=1,
            output_emb_width=cfg.emb_width,
            levels=cfg.levels,
            downs_t=tuple(cfg.downs_t),
            strides_t=tuple(cfg.strides_t),
            width=cfg.width * multiplier,
            depth=cfg.depth * multiplier,
            m_conv=cfg.m_conv,
            block_type=cfg.block_type,
            dilation_growth_rate=cfg.dilation_growth_rate,
            dilation_cycle=cfg.dilation_cycle,
            kernel_size_growth_rate=cfg.kernel_size_growth_rate,
            kernel_size_cycle=cfg.kernel_size_cycle,
            zero_out=cfg.zero_out,
            remat=cfg.get("remat", False),
            fused=cfg.get("fused_blocks", False),
            folded=cfg.get("folded_convs", False),
            # reference hardwires ResLayer dropout 0.1 (resnet.py:18); one
            # config knob controls both the flax and fused-Pallas paths
            p_dropout=cfg.get("p_dropout", 0.1),
        )
        self.encoder = Encoder(**common)
        self.decoder = Decoder(reverse_decoder_dilation=cfg.reverse_decoder_dilation, **common)

        if cfg.use_bottleneck:
            self.bottleneck = Bottleneck(cfg.l_bins, cfg.emb_width, cfg.mu, 1, cfg.revival_threshold)
        else:
            self.bottleneck = NoBottleneck(1)

        loss_cfg = cfg.loss
        self.multi_stft_loss = MultiResolutionSpectralLoss(
            n_ffts=tuple(loss_cfg.n_ffts),
            hop_lengths=tuple(loss_cfg.hop_lengths),
            win_lengths=tuple(loss_cfg.win_lengths) if loss_cfg.win_lengths else None,
            window=loss_cfg.get("window", "hann"),
            log=loss_cfg.log,
        )
        self.multi_recon_loss = MultiNormReconstructionLoss(
            l1=loss_cfg.l1, l2=loss_cfg.l2, linf=loss_cfg.linf, linf_topk=loss_cfg.linf_topk,
            linf_approx=loss_cfg.get("linf_approx", False),
        )
        self.commit = loss_cfg.commit
        self.multispectral = loss_cfg.multispectral

    @staticmethod
    def dummy_batch(config) -> dict:
        """Smallest shape-valid batch for variable initialization."""
        factor = compression_factor(config)
        t = factor * 8
        return {
            "audio": jnp.zeros((1, t), jnp.float32),
            "audio_len": jnp.full((1,), t, jnp.int32),
            "speaker": None,
        }

    def encode(self, x: jnp.ndarray, mask: jnp.ndarray):
        """[B, T] waveform + [B, T] mask -> (codes [B, T'], code_mask [B, T'])."""
        h, h_mask = self.encoder(x[..., None], mask[..., None], train=False)
        codes = self.bottleneck.encode([h], [h_mask[..., 0]])[0]
        return codes, h_mask[..., 0]

    def decode(self, codes: jnp.ndarray, code_mask: Optional[jnp.ndarray] = None):
        """[B, T'] codes -> [B, T' * compression] waveform."""
        if code_mask is None:
            code_mask = jnp.ones(codes.shape, jnp.float32)
        x_d = self.bottleneck.decode([codes])[0]
        y, _ = self.decoder([x_d], [code_mask[..., None]], all_levels=False, train=False)
        return y[..., 0]

    def __call__(self, x: jnp.ndarray, x_lengths: jnp.ndarray,
                 speaker: Optional[jnp.ndarray] = None, train: bool = True):
        """x: [B, T] waveform; x_lengths: [B]. Returns (loss_dict, metrics)."""
        x_mask = sequence_mask(x_lengths, x.shape[-1]).astype(x.dtype)  # [B, T]

        h, h_mask = self.encoder(x[..., None], x_mask[..., None], train=train)
        zs, xqs, commit_losses, quantizer_metrics = self.bottleneck(
            [h], [h_mask[..., 0]], update_k=train)

        x_out, _ = self.decoder([xqs[0]], [h_mask], all_levels=False, train=train)
        x_out = x_out[..., 0]  # [B, T]
        assert x_out.shape == x.shape, f"Expected {x.shape}, got {x_out.shape}"

        loss_recon = self.multi_recon_loss(x, x_out, x_mask)
        loss_stft = self.multi_stft_loss(x, x_out, x_mask)
        loss_commit = sum(commit_losses)
        loss = loss_recon + self.multispectral * loss_stft + self.commit * loss_commit

        loss_dict = {
            "loss": loss,
            "loss_recon": loss_recon,
            "loss_stft": loss_stft,
            "loss_commit": loss_commit,
            "yh": x_out,
        }
        metrics = quantizer_metrics[-1] if (train and quantizer_metrics) else {}
        return loss_dict, metrics
