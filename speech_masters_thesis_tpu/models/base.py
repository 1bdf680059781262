"""Task base classes: how models consume the canonical 7-field batch.

Rebuild of reference models/base.py:6-55. A batch is a dict with the keys

    token, token_len, spect, spect_len, audio, audio_len, speaker

(entries may be None when elided by the task type — reference
utils/commons.py:38-43). Each task class defines ``supervised_step`` to
route the right fields into ``__call__`` and attach the ground truth ``y``
for artifact saving. ``TASK`` drives dataset feature elision and the
trainer's artifact dispatch (reference train.py:296-299).
"""

from __future__ import annotations

import flax.linen as nn

TOKEN_TO_WAVEFORM = "token_to_waveform"
WAVEFORM_RECONSTRUCTION = "waveform_reconstruction"
TOKEN_TO_SPECTROGRAM = "token_to_spectrogram"
SPECTROGRAM_RECONSTRUCTION = "spectrogram_reconstruction"

# which batch features each task consumes (reference utils/commons.py:38-43)
TASK_FEATURES = {
    TOKEN_TO_WAVEFORM: {"use_token": True, "use_spect": False, "use_audio": True},
    WAVEFORM_RECONSTRUCTION: {"use_token": False, "use_spect": False, "use_audio": True},
    TOKEN_TO_SPECTROGRAM: {"use_token": True, "use_spect": True, "use_audio": False},
    SPECTROGRAM_RECONSTRUCTION: {"use_token": False, "use_spect": True, "use_audio": False},
}

# whether validation artifacts are audio (compute mel) or mel (invert audio)
TASK_OUTPUT = {
    TOKEN_TO_WAVEFORM: "waveform",
    WAVEFORM_RECONSTRUCTION: "waveform",
    TOKEN_TO_SPECTROGRAM: "spectrogram",
    SPECTROGRAM_RECONSTRUCTION: "spectrogram",
}


class TokenToWaveformModel(nn.Module):
    """Maps input tokens to audio waveform."""

    TASK = TOKEN_TO_WAVEFORM

    def supervised_step(self, batch, train: bool = True):
        loss_dict, metrics_dict = self(
            batch["token"], batch["token_len"], batch["audio"], batch["audio_len"],
            speaker=batch.get("speaker"), train=train,
        )
        loss_dict["y"] = batch["audio"]
        return loss_dict, metrics_dict


class WaveformReconstructionModel(nn.Module):
    """Reconstructs audio waveform through encoding/decoding."""

    TASK = WAVEFORM_RECONSTRUCTION

    def supervised_step(self, batch, train: bool = True):
        loss_dict, metrics_dict = self(
            batch["audio"], batch["audio_len"], speaker=batch.get("speaker"), train=train,
        )
        loss_dict["y"] = batch["audio"]
        return loss_dict, metrics_dict


def spect_from_audio(model, batch):
    """On-device log-mel from raw audio (``dataset.on_device_spect``).

    The reference extracts mel in the dataloader workers (CPU,
    transforms.py:16-68); this host has ONE core, so for spectrogram models
    the loader measured 40-57% of wall time blocked on host mel. With this
    knob the loader ships raw audio (cheap WAV decode) and the SAME
    MelSpectrogram operator runs inside the jitted train step on the TPU
    (fp32-HIGHEST, microseconds per batch). Deviation (documented): mel of
    batch-padded audio sees zeros instead of the per-clip reflect padding at
    each sequence's right edge, so the last ~n_fft/(2*hop) valid frames of
    short-in-batch clips differ from the host path; masked losses make this
    training-irrelevant, and unpadded (bucket-exact) clips are identical.
    """
    from speech_masters_thesis_tpu.ops.stft import MelSpectrogram, mel_band_edges
    from speech_masters_thesis_tpu.utils.config import Config

    d = Config(model.config).dataset
    # fresh operator per trace — the lru-cached one would capture its
    # mel-basis constant inside the first jit trace and leak the tracer
    mel = MelSpectrogram(d.sample_rate, d.n_fft, d.hop_length, d.win_length,
                         d.n_mels, *mel_band_edges(d))
    spect = mel(batch["audio"])
    spect_len = batch["audio_len"] // d.hop_length
    return spect, spect_len


class TokenToSpectrogramModel(nn.Module):
    """Maps input tokens to a spectrogram."""

    TASK = TOKEN_TO_SPECTROGRAM

    def supervised_step(self, batch, train: bool = True):
        spect, spect_len = batch["spect"], batch["spect_len"]
        if spect is None and batch.get("audio") is not None:
            spect, spect_len = spect_from_audio(self, batch)
        loss_dict, metrics_dict = self(
            batch["token"], batch["token_len"], spect, spect_len,
            speaker=batch.get("speaker"), train=train,
        )
        loss_dict["y"] = spect
        return loss_dict, metrics_dict


class SpectrogramReconstructionModel(nn.Module):
    """Reconstructs a spectrogram through encoding/decoding."""

    TASK = SPECTROGRAM_RECONSTRUCTION

    def supervised_step(self, batch, train: bool = True):
        loss_dict, metrics_dict = self(
            batch["spect"], batch["spect_len"], speaker=batch.get("speaker"), train=train,
        )
        loss_dict["y"] = batch["spect"]
        return loss_dict, metrics_dict
