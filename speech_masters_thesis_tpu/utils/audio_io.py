"""WAV read/write without librosa/soundfile.

The reference loads audio with ``librosa.load`` (reference datasets/ljspeech.py:72)
and writes with ``soundfile.write`` (reference utils/train_utils.py:249-304).
Neither library is part of this framework's dependency set; PCM WAV I/O plus
polyphase resampling via scipy reproduces the behavior for LJSpeech-style
corpora (16-bit PCM at 22.05 kHz).
"""

from __future__ import annotations

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly


def load_wav(path: str, target_sr: int = 22050) -> np.ndarray:
    """Loads a WAV file as float32 in [-1, 1], resampled to ``target_sr``.

    Matches ``librosa.load(path)`` semantics for PCM inputs: integer PCM is
    scaled by the type's full-scale value, stereo is averaged to mono.
    Decoding goes through the native C reader (native/wavio.c) when built —
    the host has one core, and RIFF parsing + scaling in C keeps the prefetch
    thread ahead of the device — with scipy as the fallback.
    """
    from speech_masters_thesis_tpu import native
    decoded = native.read_wav(path)
    if decoded is not None:
        audio, sr = decoded
        if sr != target_sr:
            g = np.gcd(int(sr), int(target_sr))
            audio = resample_poly(audio, target_sr // g, sr // g).astype(np.float32)
        return np.clip(audio, -1.0, 1.0)

    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        audio = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        audio = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        audio = (data.astype(np.float32) - 128.0) / 128.0
    else:  # float32/float64 WAV
        audio = data.astype(np.float32)
    if audio.ndim > 1:
        audio = audio.mean(axis=1)
    if sr != target_sr:
        g = np.gcd(int(sr), int(target_sr))
        audio = resample_poly(audio, target_sr // g, sr // g).astype(np.float32)
    return np.clip(audio, -1.0, 1.0)


def save_wav(path: str, audio: np.ndarray, sample_rate: int = 22050) -> None:
    """Writes float audio in [-1, 1] as 16-bit PCM WAV."""
    audio = np.asarray(audio, dtype=np.float32)
    audio = np.clip(audio, -1.0, 1.0)
    pcm = (audio * 32767.0).astype(np.int16)
    wavfile.write(path, sample_rate, pcm)
