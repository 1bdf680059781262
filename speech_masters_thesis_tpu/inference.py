"""Library-level inference APIs.

``GlowTTSSynthesizer`` is the counterpart of the reference's
``GlowTTS.infer_step`` (reference models/glow_tts/glow_tts.py:133-168): a
string goes through the CMUdict frontend, the duration-predictor alignment
path and the reverse flow; audio comes back via Griffin-Lim mel inversion.

``LMSampler`` wraps TransformerLM.sample + the frozen VQ-VAE decoder
(the reference's scripts/sample_from_lm.py path) behind one object.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def load_model_from_logdir(log_dir: str, ckpt_num) -> Tuple[object, dict, object]:
    """(model, variables, config) from a training logdir + checkpoint tag."""
    import orbax.checkpoint as ocp

    from speech_masters_thesis_tpu.train.checkpoint import ckpt_dir
    from speech_masters_thesis_tpu.train.harness import get_model
    from speech_masters_thesis_tpu.utils.config import load_config

    config = load_config(os.path.join(log_dir, "config.yaml"))
    model = get_model(config)
    payload = ocp.PyTreeCheckpointer().restore(ckpt_dir(log_dir, ckpt_num))
    variables = {"params": payload["state"]["params"], **payload["state"]["model_state"]}
    return model, variables, config


class GlowTTSSynthesizer:
    """Text -> (mel, waveform) through a trained Glow-TTS checkpoint."""

    def __init__(self, log_dir: str, ckpt_num, max_frames: int = 1024,
                 flow_cache: bool = True):
        import jax
        import jax.numpy as jnp

        from speech_masters_thesis_tpu.models.glow_tts.model import GlowTTS
        from speech_masters_thesis_tpu.text.parser import CMUDictParser

        self.model, self.variables, self.config = load_model_from_logdir(log_dir, ckpt_num)
        assert isinstance(self.model, GlowTTS)
        self.parser = CMUDictParser(self.config.dataset.cmudict_path)
        self.max_frames = max_frames

        if flow_cache:
            # precompute flow inverses + folded weight-norm kernels once
            # (reference store_inverse/remove_weight_norm) — amortized over
            # every synthesize() call; tiny build shapes keep it cheap
            from speech_masters_thesis_tpu.models.glow_tts.flows import build_flow_cache

            # jit the build: eager apply would dispatch the whole generation
            # graph op-by-op (LU inverse per flow block, MAS) — minutes of
            # per-op dispatch on a weak host (scripts/synthesize.py does the
            # same)
            self.variables = jax.jit(lambda r: build_flow_cache(
                self.model, self.variables,
                jnp.zeros((1, 4), jnp.int32), jnp.full((1,), 4, jnp.int32),
                r, max_frames=max(16, 4 * 4),
                noise_scale=0.0, method=GlowTTS.infer))(jax.random.PRNGKey(0))

        def _infer(tokens, lens, rng, noise_scale):
            return self.model.apply(self.variables, tokens, lens, rng,
                                    max_frames=max_frames, noise_scale=noise_scale,
                                    method=GlowTTS.infer)

        self._infer = jax.jit(_infer, static_argnames=())

    def encode_text(self, text: str) -> np.ndarray:
        from speech_masters_thesis_tpu.text.parser import intersperse_blanks

        text = text.strip()
        if text[-1] not in [".", "!", "?"]:
            text = text + "."
        ids = self.parser(text)
        if self.config.dataset.intersperse_blanks:
            ids = intersperse_blanks(ids, len(self.parser.symbols))
        return np.asarray(ids, np.int32)

    def synthesize(self, text: str, seed: int = 0,
                   noise_scale: float = 0.667,
                   invert_audio: bool = True) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        """Returns (log-mel [frames, n_mels], waveform or None)."""
        import jax
        import jax.numpy as jnp

        ids = self.encode_text(text)
        tokens = jnp.asarray(ids[None])
        lens = jnp.asarray([len(ids)], jnp.int32)
        mel, z_lengths = self._infer(tokens, lens, jax.random.PRNGKey(seed),
                                     noise_scale)
        n = int(z_lengths[0])
        mel_np = np.asarray(mel[0, :n])
        audio = None
        if invert_audio:
            from speech_masters_thesis_tpu.train.artifacts import mel_to_audio
            audio = mel_to_audio(mel_np, self.config)
        return mel_np, audio


class LMSampler:
    """Unconditional audio sampling from a trained TransformerLM checkpoint."""

    def __init__(self, log_dir: str, ckpt_num):
        from speech_masters_thesis_tpu.models.transformer_lm.model import TransformerLM

        self.model, self.variables, self.config = load_model_from_logdir(log_dir, ckpt_num)
        assert isinstance(self.model, TransformerLM)

    def sample(self, n_samples: int, n_steps: int, sigma: float = 1.0,
               seed: int = 0) -> Tuple[Optional[np.ndarray], np.ndarray]:
        """Returns (audio [B, T] or None, codes [B, n_steps])."""
        import jax

        from speech_masters_thesis_tpu.models.transformer_lm.model import TransformerLM

        audio, codes = self.model.apply(
            self.variables, n_samples, n_steps, jax.random.PRNGKey(seed),
            sigma=sigma, method=TransformerLM.sample)
        return (np.asarray(audio) if audio is not None else None), np.asarray(codes)
