"""Glow-TTS: text -> mel normalizing flow with monotonic alignment search.

Rebuild of reference models/glow_tts/glow_tts.py:12-168. TPU-first changes:
  * MAS runs on-device (ops/mas.py) — the reference ships the logp table to
    CPU NumPy every step (glow_tts.py:97, submodules.py:39-66);
  * mels are NTC [B, frames, n_mels];
  * DDI is a dedicated pass that *returns* ActNorm init statistics through a
    mutable collection, grafted into params host-side (see ddi_init), instead
    of in-place buffer writes + checkpoint broadcast (train.py:409-420).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from speech_masters_thesis_tpu.models.base import TokenToSpectrogramModel
from speech_masters_thesis_tpu.models.glow_tts.encoder import FlowSpecDecoder, TextEncoder
from speech_masters_thesis_tpu.ops.basic import generate_path, sequence_mask
from speech_masters_thesis_tpu.ops.mas import mas_log_prior, maximum_path_auto
from speech_masters_thesis_tpu.utils.config import Config


class GlowTTS(TokenToSpectrogramModel):

    config: dict

    def setup(self):
        full_cfg = Config(self.config)
        cfg = full_cfg.model
        ds = full_cfg.dataset
        self.n_sqz = cfg.decoder.n_sqz
        self.n_mels = ds.n_mels

        if cfg.n_speakers > 1:
            self.emb_g = nn.Embed(cfg.n_speakers, cfg.gin_channels,
                                  embedding_init=nn.initializers.uniform(0.1))
        else:
            self.emb_g = None

        self.encoder = TextEncoder(
            n_vocab=cfg.encoder.n_vocab + int(ds.intersperse_blanks),
            out_channels=ds.n_mels,
            hidden_channels=cfg.encoder.hidden_channels,
            filter_channels=cfg.encoder.filter_channels,
            filter_channels_dp=cfg.encoder.filter_channels,
            n_heads=cfg.encoder.n_heads,
            n_layers=cfg.encoder.n_layers,
            kernel_size=cfg.encoder.kernel_size,
            p_dropout=cfg.encoder.p_dropout,
            window_size=cfg.encoder.window_size,
            mean_only=cfg.encoder.mean_only,
            prenet=cfg.encoder.prenet,
            gin_channels=cfg.gin_channels,
            fused=cfg.get("fused_encoder", cfg.get("fused_blocks", False)),
        )
        self.decoder = FlowSpecDecoder(
            in_channels=ds.n_mels,
            hidden_channels=cfg.decoder.hidden_channels,
            kernel_size=cfg.decoder.kernel_size,
            dilation_rate=cfg.decoder.dilation_rate,
            n_blocks=cfg.decoder.n_blocks,
            n_layers=cfg.decoder.n_layers,
            p_dropout=cfg.decoder.p_dropout,
            n_split=cfg.decoder.n_split,
            n_sqz=cfg.decoder.n_sqz,
            sigmoid_scale=cfg.decoder.sigmoid_scale,
            gin_channels=cfg.gin_channels,
            fused=cfg.get("fused_blocks", False),
            fused_flow_step=cfg.get("fused_flow_step", True),
        )

    @staticmethod
    def dummy_batch(config) -> dict:
        t_text, t_mel = 12, 24
        return {
            "token": jnp.zeros((1, t_text), jnp.int32),
            "token_len": jnp.full((1,), t_text, jnp.int32),
            "spect": jnp.zeros((1, t_mel, config.dataset.n_mels), jnp.float32),
            "spect_len": jnp.full((1,), t_mel, jnp.int32),
            "speaker": None,
        }

    def ddi_forward(self, x, x_lengths, y, y_lengths, speaker=None):
        """Forward pass computing ActNorm DDI statistics (mutable 'ddi_stats')."""
        return self(x, x_lengths, y, y_lengths, speaker=speaker, train=True, ddi=True)

    def ddi_init(self, variables: dict, batch: dict) -> dict:
        """Data-dependent init: one forward on a real batch, graft ActNorm stats.

        Replaces the reference's in-place buffer mutation + ckpt.0 broadcast
        (utils/train_utils.py:31-59). Each ActNorm computes masked mean/var
        of its own input *during* the pass (sequentially consistent with
        upstream DDI-initialized flows) and exposes them via the 'ddi_stats'
        collection; here they overwrite the zero-initialized params.
        """
        import numpy as np
        rng = jax.random.PRNGKey(0)
        spect, spect_len = batch["spect"], batch["spect_len"]
        if spect is None and batch.get("audio") is not None:
            # dataset.on_device_spect: compute the mel here, outside the
            # model apply, with the same operator the train step uses
            from speech_masters_thesis_tpu.models.base import spect_from_audio
            spect, spect_len = spect_from_audio(self, batch)
        _, mutated = self.apply(
            variables, batch["token"], batch["token_len"], spect, spect_len,
            speaker=batch.get("speaker"), method=self.ddi_forward,
            rngs={"dropout": rng}, mutable=["ddi_stats"],
        )
        import flax
        params = flax.core.unfreeze(variables["params"])
        stats = flax.traverse_util.flatten_dict(mutated["ddi_stats"])
        flat_params = flax.traverse_util.flatten_dict(params)
        for path, value in stats.items():
            # path: (..., 'actnorm_i', '<logs|bias>'); sow wraps values in a tuple
            target = path[:-1] + (path[-1],)
            value = value[0] if isinstance(value, tuple) else value
            assert target in flat_params, f"DDI stat path {target} not in params"
            flat_params[target] = np.asarray(value)
        new_params = flax.traverse_util.unflatten_dict(flat_params)
        out = dict(variables)
        out["params"] = new_params
        return out

    def __call__(self, x: jnp.ndarray, x_lengths: jnp.ndarray,
                 y: jnp.ndarray, y_lengths: jnp.ndarray,
                 speaker: Optional[jnp.ndarray] = None, train: bool = True,
                 ddi: bool = False):
        """x: [B, T_x] token ids; y: [B, T_y, n_mels] log-mels."""
        speaker_embeddings = self.emb_g(speaker[..., 0]) if (self.emb_g is not None
                                                             and speaker is not None) else None

        # Encode text -> prior
        x_m, x_logs, logw_enc, x_mask = self.encoder(
            x, x_lengths, speaker_embeddings=speaker_embeddings, train=train)

        # Inverse flow: mel -> latent (+ logdet)
        y_max_length = (y.shape[1] // self.n_sqz) * self.n_sqz
        y = y[:, :y_max_length]
        y_lengths = (y_lengths // self.n_sqz) * self.n_sqz
        y_mask = sequence_mask(y_lengths, y_max_length)[..., None].astype(y.dtype)  # [B, T_y, 1]
        z_dec, logdet = self.decoder(y, y_mask, speaker_embeddings=speaker_embeddings,
                                     reverse=False, ddi=ddi, train=train)

        # Monotonic alignment search on the Gaussian log-prior table
        attn_mask = x_mask[:, :, 0][:, :, None] * y_mask[:, :, 0][:, None, :]  # [B, T_x, T_y]
        logp = mas_log_prior(jax.lax.stop_gradient(x_m), jax.lax.stop_gradient(x_logs),
                             jax.lax.stop_gradient(z_dec))
        attn = jax.lax.stop_gradient(maximum_path_auto(logp, attn_mask))  # [B, T_x, T_y]

        # Align prior stats to frames
        logw_dec = jnp.log(1e-8 + jnp.sum(attn, axis=-1)) * x_mask[:, :, 0]
        z_m_enc = jnp.einsum("bty,btd->byd", attn, x_m)       # [B, T_y, D]
        z_logs_enc = jnp.einsum("bty,btd->byd", attn, x_logs)

        # Eval-only: sample latent from the aligned prior, reverse flow -> mel
        yh = None
        if not train:
            rng = self.make_rng("sample") if self.has_rng("sample") else jax.random.PRNGKey(0)
            z_enc = (z_m_enc + jnp.exp(z_logs_enc)
                     * jax.random.normal(rng, z_m_enc.shape)) * y_mask
            yh, _ = self.decoder(z_enc, y_mask, speaker_embeddings=speaker_embeddings,
                                 reverse=True, train=False)

        # MLE + duration losses (reference glow_tts.py:117-124)
        logdet_sum = jnp.sum(logdet)
        l_mle = 0.5 * math.log(2 * math.pi) + (
            jnp.sum(z_logs_enc)
            + 0.5 * jnp.sum(jnp.exp(-2 * z_logs_enc) * (z_dec - z_m_enc) ** 2)
            - logdet_sum
        ) / (jnp.sum(y_lengths) * z_dec.shape[-1])
        l_length = jnp.sum((logw_enc - logw_dec) ** 2) / jnp.sum(x_lengths)

        return {
            "loss_mle": l_mle,
            "loss_length": l_length,
            "loss": l_mle + l_length,
            "yh": yh,
        }, {}

    def infer(self, x: jnp.ndarray, x_lengths: jnp.ndarray, rng: jax.Array,
              speaker: Optional[jnp.ndarray] = None, max_frames: int = 1024,
              noise_scale: float = 1.0):
        """Token ids -> mel via duration-predictor path (reference infer_step).

        max_frames bounds the static output length (jit-stable); frames beyond
        the predicted total duration are masked out.
        """
        speaker_embeddings = self.emb_g(speaker[..., 0]) if (self.emb_g is not None
                                                             and speaker is not None) else None
        x_m, x_logs, logw_enc, x_mask = self.encoder(
            x, x_lengths, speaker_embeddings=speaker_embeddings, train=False)

        w = jnp.ceil(jnp.exp(logw_enc)) * x_mask[:, :, 0]
        z_lengths = jnp.maximum(jnp.sum(w, axis=1), 1.0).astype(jnp.int32)
        z_lengths = (z_lengths // self.n_sqz) * self.n_sqz
        t_y = (max_frames // self.n_sqz) * self.n_sqz
        z_mask = sequence_mask(z_lengths, t_y)[..., None]

        attn_mask = x_mask[:, :, 0][:, :, None] * z_mask[:, :, 0][:, None, :]
        attn = generate_path(w, attn_mask)
        z_m_enc = jnp.einsum("bty,btd->byd", attn, x_m)
        z_logs_enc = jnp.einsum("bty,btd->byd", attn, x_logs)

        z_enc = (z_m_enc + jnp.exp(z_logs_enc) * noise_scale
                 * jax.random.normal(rng, z_m_enc.shape)) * z_mask
        yh, _ = self.decoder(z_enc, z_mask, speaker_embeddings=speaker_embeddings,
                             reverse=True, train=False)
        return yh, z_lengths
