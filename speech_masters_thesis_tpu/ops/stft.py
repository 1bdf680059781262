"""STFT / inverse STFT / log-mel as pure JAX functions.

TPU-native rebuild of the reference DSP chain (reference
datasets/transforms.py:16-156): the reference implements STFT as a conv1d
against a precomputed windowed DFT basis; here the same construction becomes
a strided ``lax.conv_general_dilated`` whose (n_fft x 2*cutoff) filter bank
XLA tiles straight onto the MXU. The mel filterbank replicates librosa's
Slaney-scale, Slaney-normalized filters (librosa.filters.mel defaults, used
at reference transforms.py:38-46) from the published formulas — librosa is
not a dependency.

Layout: audio is [B, T]; spectra are NTC ([B, frames, bins]) so the frequency
axis rides the TPU lanes. ``frames == T // hop_length`` for T a multiple of
hop (identical to the reference's frame count, transforms.py:67-68).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from speech_masters_thesis_tpu.ops.basic import safe_log, safe_sqrt


# --------------------------------------------------------------------------
# Host-side (numpy) basis construction
# --------------------------------------------------------------------------
def hann_window(win_length: int, periodic: bool = True) -> np.ndarray:
    """Periodic Hann window (scipy.signal.get_window('hann', N, fftbins=True))."""
    n = win_length + 1 if not periodic else win_length
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)
    return w[:win_length].astype(np.float64)


def make_window(window_type: str, win_length: int) -> np.ndarray:
    """Named analysis window (reference STFT's ``window=`` knob,
    transforms.py:97: scipy.signal.get_window(window, N, fftbins=True))."""
    if window_type in ("hann", "hanning"):
        return hann_window(win_length)
    from scipy.signal import get_window

    return np.asarray(get_window(window_type, win_length, fftbins=True), np.float64)


def pad_center(window: np.ndarray, size: int) -> np.ndarray:
    lpad = (size - len(window)) // 2
    return np.pad(window, (lpad, size - len(window) - lpad))


def dft_basis(n_fft: int) -> np.ndarray:
    """Stacked real/imag DFT basis, shape (2*cutoff, n_fft).

    Row r < cutoff is cos(-2*pi*r*n/N); row cutoff+r is sin(-2*pi*r*n/N) —
    i.e. real/imag parts of the forward DFT matrix rows, matching
    ``np.fft.fft(np.eye(n_fft))[:cutoff]`` (reference transforms.py:88-91).
    """
    cutoff = n_fft // 2 + 1
    n = np.arange(n_fft)
    k = np.arange(cutoff)[:, None]
    angle = -2.0 * np.pi * k * n / n_fft
    return np.vstack([np.cos(angle), np.sin(angle)])


def _hz_to_mel_slaney(freq):
    freq = np.asarray(freq, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    mel = freq / f_sp
    log_t = freq >= min_log_hz
    mel = np.where(log_t, min_log_mel + np.log(np.maximum(freq, min_log_hz) / min_log_hz) / logstep, mel)
    return mel


def _mel_to_hz_slaney(mel):
    mel = np.asarray(mel, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    freq = f_sp * mel
    log_t = mel >= min_log_mel
    freq = np.where(log_t, min_log_hz * np.exp(logstep * (mel - min_log_mel)), freq)
    return freq


def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    f_min: float = 0.0,
    f_max: float | None = None,
) -> np.ndarray:
    """Slaney-scale, Slaney-normalized triangular mel filters, (n_mels, cutoff)."""
    if f_max is None:
        f_max = sample_rate / 2.0
    fftfreqs = np.linspace(0.0, sample_rate / 2.0, n_fft // 2 + 1)
    mel_pts = np.linspace(_hz_to_mel_slaney(f_min), _hz_to_mel_slaney(f_max), n_mels + 2)
    mel_f = _mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2:n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def window_sumsquare(window: np.ndarray, n_frames: int, hop_length: int, n_fft: int) -> np.ndarray:
    """Sum of squared, hop-shifted windows (librosa.filters.window_sumsquare)."""
    n = n_fft + hop_length * (n_frames - 1)
    out = np.zeros(n, dtype=np.float32)
    win_sq = window.astype(np.float64) ** 2
    for i in range(n_frames):
        sample = i * hop_length
        out[sample:min(n, sample + n_fft)] += win_sq[:max(0, min(n_fft, n - sample))]
    return out


# --------------------------------------------------------------------------
# JAX-side transforms
# --------------------------------------------------------------------------
@dataclass(frozen=True)
class STFT:
    """Precomputed STFT operator. Construct once, apply as a pure function.

    Mirrors the constructor math of reference transforms.py:71-106 (windowed
    forward/inverse DFT bases; reflect pad of (n_fft - hop)//2).
    """

    n_fft: int = 1024
    hop_length: int = 256
    win_length: int | None = None
    window_type: str = "hann"
    forward_basis: jnp.ndarray = field(repr=False, default=None)
    inverse_basis: jnp.ndarray = field(repr=False, default=None)
    window: np.ndarray = field(repr=False, default=None)

    def __post_init__(self):
        win_length = self.win_length or self.n_fft
        object.__setattr__(self, "win_length", win_length)
        assert self.n_fft >= win_length
        basis = dft_basis(self.n_fft)  # (2*cutoff, n_fft)
        win = pad_center(make_window(self.window_type, win_length), self.n_fft)
        # forward DFT runs as framed rFFT (see real_imag); the windowed basis
        # is kept (host-side numpy) for export/introspection, and the pinv
        # basis drives the inverse transform (reference transforms.py:93).
        fwd = (basis * win[None, :]).astype(np.float32)
        scale = self.n_fft / self.hop_length
        inv = (np.linalg.pinv(scale * basis).T * win[None, :]).astype(np.float32)
        object.__setattr__(self, "forward_basis", fwd)
        object.__setattr__(self, "inverse_basis", inv)
        object.__setattr__(self, "window", win)

    @property
    def pad_amount(self) -> int:
        return (self.n_fft - self.hop_length) // 2

    @property
    def cutoff(self) -> int:
        return self.n_fft // 2 + 1

    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        """[B, T] -> magnitude [B, frames, cutoff] with frames = T // hop."""
        real, imag = self.real_imag(audio)
        # grad-safe: silent frames have exact-zero bins; sqrt'(0) is inf
        return safe_sqrt(real * real + imag * imag)

    def _frames(self, audio: jnp.ndarray) -> jnp.ndarray:
        """Reflect-pad and extract overlapping frames [B, frames, n_fft].

        Framing is Q = ceil(n_fft/hop) contiguous strided slices, each
        reshaped to [B, frames, hop] and concatenated — NOT a gather. The
        slice/reshape/concat construction differentiates to dense pad-adds;
        the previous gather version's scatter-add backward alone measured
        7% of the VQ-VAE train step on v5e (this loss is differentiated every
        step through yh).
        """
        if audio.ndim == 1:
            audio = audio[None, :]
        hop, n_fft = self.hop_length, self.n_fft
        x = jnp.pad(audio, ((0, 0), (self.pad_amount, self.pad_amount)),
                    mode="reflect").astype(jnp.float32)
        n_frames = (x.shape[1] - n_fft) // hop + 1
        n_chunks = -(-n_fft // hop)
        # right-pad so every chunk can slice a full frames*hop window
        need = (n_frames - 1) * hop + n_chunks * hop
        if x.shape[1] < need:
            x = jnp.pad(x, ((0, 0), (0, need - x.shape[1])))
        chunks = []
        for q in range(n_chunks):
            width = min(hop, n_fft - q * hop)
            sl = jax.lax.dynamic_slice_in_dim(x, q * hop, n_frames * hop, axis=1)
            chunks.append(sl.reshape(x.shape[0], n_frames, hop)[..., :width])
        return jnp.concatenate(chunks, axis=-1)  # [B, frames, n_fft]

    def real_imag(self, audio: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        # Framed rFFT: O(n log n) per frame vs the reference's dense DFT conv
        # (transforms.py:118, O(n^2)); identical math — the windowed DFT basis
        # rows ARE the rFFT of the windowed frame. Frame extraction is a
        # gather (bandwidth-only); fp32 throughout (feature extraction is
        # parity-critical, BASELINE: mel within 1e-3).
        frames = self._frames(audio) * jnp.asarray(self.window, jnp.float32)
        spec = jnp.fft.rfft(frames, axis=-1)  # [B, frames, cutoff]
        return jnp.real(spec).astype(jnp.float32), jnp.imag(spec).astype(jnp.float32)

    def inverse(self, magnitude: jnp.ndarray, phase: jnp.ndarray) -> jnp.ndarray:
        """[B, frames, cutoff] x2 -> [B, T]; window-sumsquare-corrected iSTFT.

        Reference transforms.py:125-156 expresses this as a conv_transpose
        against the pinv DFT basis; on TPU that lowering (1024-tap kernel,
        1026 channels -> 1) is pathological — the same class of conv XLA
        lowered at ~60x cost in the forward direction (see the rejected
        conv-against-DFT-basis STFT in BASELINE.md). Round 5: Griffin-Lim
        runs 33 of these per utterance and the conv_transpose was ~97% of
        the measured e2e synthesis RTF (0.250 vs the <0.05 target). Same
        math, TPU-shaped: one [2*cutoff, n_fft] MXU matmul per frame, then
        overlap-add as Q = ceil(n_fft/hop) contiguous reshape-adds — the
        exact mirror of ``_frames`` (no scatter, dense backward).
        """
        n_frames = magnitude.shape[1]
        rec = jnp.concatenate([magnitude * jnp.cos(phase), magnitude * jnp.sin(phase)], axis=-1)
        frames_t = jnp.einsum(
            "bfc,cn->bfn", rec, jnp.asarray(self.inverse_basis),
            precision=jax.lax.Precision.HIGHEST)  # [B, frames, n_fft]
        hop, n_fft = self.hop_length, self.n_fft
        n = (n_frames - 1) * hop + n_fft
        n_chunks = -(-n_fft // hop)
        batch = frames_t.shape[0]
        total = (n_chunks - 1) * hop + n_frames * hop
        out = jnp.zeros((batch, total), frames_t.dtype)
        for q in range(n_chunks):
            width = min(hop, n_fft - q * hop)
            piece = frames_t[..., q * hop:q * hop + width]
            if width < hop:  # last chunk: pad to hop so frames tile densely
                piece = jnp.pad(piece, ((0, 0), (0, 0), (0, hop - width)))
            flat = piece.reshape(batch, n_frames * hop)
            out = out + jnp.pad(
                flat, ((0, 0), (q * hop, total - q * hop - n_frames * hop)))
        out = out[:, :n]
        wss = window_sumsquare(self.window, n_frames, self.hop_length, self.n_fft)
        tiny = np.finfo(np.float32).tiny
        correction = np.where(wss > tiny, 1.0 / np.maximum(wss, tiny), 1.0).astype(np.float32)
        out = out * jnp.asarray(correction)[None, :]
        out = out * (self.n_fft / self.hop_length)
        return out[:, self.pad_amount:-self.pad_amount]


@dataclass(frozen=True)
class MelSpectrogram:
    """Log-mel operator: STFT magnitude -> slaney mel matmul -> safe_log.

    Reference datasets/transforms.py:16-68. Phase jitter augmentation is
    reproduced via an explicit PRNG key (pass ``rng`` with jitter_steps>0).
    """

    sample_rate: int = 22050
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int | None = None
    n_mels: int = 80
    f_min: float = 0.0
    f_max: float | None = None
    stft: STFT = field(repr=False, default=None)
    mel_basis: jnp.ndarray = field(repr=False, default=None)

    def __post_init__(self):
        object.__setattr__(self, "stft", STFT(self.n_fft, self.hop_length, self.win_length))
        basis = mel_filterbank(self.sample_rate, self.n_fft, self.n_mels, self.f_min, self.f_max)
        object.__setattr__(self, "mel_basis", jnp.asarray(basis.T))  # (cutoff, n_mels)

    def __call__(self, audio: jnp.ndarray, jitter_steps: int = 0, rng: jax.Array | None = None) -> jnp.ndarray:
        """[B, T] (or [T]) -> log-mel [B, frames, n_mels]."""
        if audio.ndim == 1:
            audio = audio[None, :]
        if jitter_steps > 0:
            assert rng is not None, "phase jitter requires an explicit PRNG key"
            length = audio.shape[-1]
            padded = jnp.pad(audio, ((0, 0), (jitter_steps, jitter_steps)))
            start = jax.random.randint(rng, (), 0, 2 * jitter_steps + 1)
            audio = jax.lax.dynamic_slice_in_dim(padded, start, length, axis=-1)
        mag = self.stft(audio)  # [B, frames, cutoff]
        mel = jnp.matmul(mag, self.mel_basis, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        return safe_log(mel)

    def mel_len(self, audio_len):
        return audio_len // self.hop_length


@functools.lru_cache(maxsize=16)
def cached_mel(sample_rate: int, n_fft: int, hop_length: int, win_length: int | None,
               n_mels: int, f_min: float, f_max: float | None) -> MelSpectrogram:
    return MelSpectrogram(sample_rate, n_fft, hop_length, win_length, n_mels, f_min, f_max)


def mel_band_edges(dataset_cfg) -> tuple:
    """(f_min, f_max) for a dataset config — the ONE place the reference's
    hardcoded band edges live (reference datasets/ljspeech.py:64-65 pins
    f_min=0/f_max=8000 in code). A dataset config may override with
    ``f_min``/``f_max`` keys; every mel construction site (loaders,
    on-device spect_from_audio, artifact inversion) reads through here."""
    return (float(dataset_cfg.get("f_min", 0.0)), float(dataset_cfg.get("f_max", 8000.0)))


def host_mel(mel_op: MelSpectrogram, audio: np.ndarray) -> np.ndarray:
    """Runs mel extraction pinned to the host CPU backend.

    Dataset workers call this per utterance; without pinning, each call would
    dispatch a tiny program to the accelerator and contend with the training
    step for the chip.
    """
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        return np.asarray(mel_op(jnp.asarray(np.asarray(audio))))
