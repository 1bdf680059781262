"""DSP + numeric op tests: STFT/mel parity, masks, MAS, path generation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speech_masters_thesis_tpu.ops.basic import generate_path, safe_log, sequence_mask
from oracles import mas_oracle
from speech_masters_thesis_tpu.ops.mas import mas_log_prior, maximum_path
from speech_masters_thesis_tpu.ops.stft import (
    STFT,
    MelSpectrogram,
    hann_window,
    mel_filterbank,
    pad_center,
)


def _numpy_stft_magnitude(audio, n_fft, hop):
    """Independent oracle: reflect pad + frame + periodic hann + rFFT."""
    pad = (n_fft - hop) // 2
    x = np.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    win = pad_center(hann_window(n_fft), n_fft)
    n_frames = (x.shape[1] - n_fft) // hop + 1
    frames = np.stack([x[:, i * hop:i * hop + n_fft] * win for i in range(n_frames)], axis=1)
    return np.abs(np.fft.rfft(frames, axis=-1)).astype(np.float32)


def test_stft_magnitude_matches_fft_oracle():
    rng = np.random.RandomState(0)
    audio = rng.uniform(-1, 1, size=(3, 4096)).astype(np.float32)
    for n_fft, hop in [(1024, 256), (512, 128)]:
        mag = np.asarray(STFT(n_fft, hop)(jnp.asarray(audio)))
        ref = _numpy_stft_magnitude(audio, n_fft, hop)
        assert mag.shape == ref.shape == (3, 4096 // hop, n_fft // 2 + 1)
        assert np.abs(mag - ref).max() < 1e-3
        # BASELINE target is framed relative to magnitude scale
        assert np.abs(mag - ref).max() / ref.max() < 1e-4


def test_stft_frame_count_is_t_over_hop():
    stft = STFT(1024, 256)
    audio = jnp.zeros((1, 2560))
    assert stft(audio).shape[1] == 10


def test_mel_filterbank_slaney_properties():
    fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (80, 513)
    # every filter has non-zero support, triangles don't exceed slaney norm
    assert (fb.sum(axis=1) > 0).all()
    # filters are band-limited below f_max
    freqs = np.linspace(0, 11025, 513)
    active = fb.sum(axis=0) > 0
    assert freqs[active].max() <= 8000.0 + 25.0


def test_log_mel_pipeline():
    rng = np.random.RandomState(1)
    audio = rng.uniform(-1, 1, size=(2, 4096)).astype(np.float32)
    mel_op = MelSpectrogram(22050, 1024, 256, None, 80, 0.0, 8000.0)
    mel = np.asarray(mel_op(jnp.asarray(audio)))
    assert mel.shape == (2, 16, 80)
    # oracle: stft oracle -> mel basis -> log clamp
    mag = _numpy_stft_magnitude(audio, 1024, 256)
    fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    ref = np.log(np.maximum(mag @ fb.T, 1e-5))
    assert np.abs(mel - ref).max() < 1e-3


def test_istft_roundtrip():
    rng = np.random.RandomState(2)
    audio = rng.uniform(-0.7, 0.7, size=(1, 8192)).astype(np.float32)
    stft = STFT(1024, 256)
    real, imag = stft.real_imag(jnp.asarray(audio))
    mag = jnp.sqrt(real**2 + imag**2)
    phase = jnp.arctan2(imag, real)
    recon = np.asarray(stft.inverse(mag, phase))
    # interior must reconstruct (edges lose the reflect-padded overlap)
    n = min(recon.shape[1], audio.shape[1])
    err = np.abs(recon[:, 1024:n - 1024] - audio[:, 1024:n - 1024]).max()
    assert err < 5e-3


def test_sequence_mask():
    m = np.asarray(sequence_mask(jnp.asarray([1, 3, 0]), 4))
    expected = np.array([[1, 0, 0, 0], [1, 1, 1, 0], [0, 0, 0, 0]], dtype=np.float32)
    np.testing.assert_array_equal(m, expected)


def test_safe_log():
    out = np.asarray(safe_log(jnp.asarray([0.0, 1e-9, 1.0])))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[2], 0.0, atol=1e-7)


def test_generate_path():
    duration = jnp.asarray([[2.0, 1.0, 3.0]])
    mask = jnp.ones((1, 3, 6))
    path = np.asarray(generate_path(duration, mask))
    expected = np.array([[
        [1, 1, 0, 0, 0, 0],
        [0, 0, 1, 0, 0, 0],
        [0, 0, 0, 1, 1, 1],
    ]], dtype=np.float32)
    np.testing.assert_array_equal(path, expected)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_maximum_path_matches_numpy_oracle(seed):
    rng = np.random.RandomState(seed)
    b, t_x, t_y = 3, 11, 29
    value = rng.randn(b, t_x, t_y).astype(np.float32)
    x_lens = rng.randint(2, t_x + 1, size=b)
    y_lens = rng.randint(t_x, t_y + 1, size=b)  # need t_y >= t_x for a valid path
    y_lens = np.maximum(y_lens, x_lens)
    mask = (np.arange(t_x)[None, :, None] < x_lens[:, None, None]) \
        & (np.arange(t_y)[None, None, :] < y_lens[:, None, None])
    mask = mask.astype(np.float32)

    ref = mas_oracle(value.copy(), mask.copy())
    out = np.asarray(maximum_path(jnp.asarray(value), jnp.asarray(mask)))
    np.testing.assert_array_equal(out, ref)


def test_maximum_path_is_valid_alignment():
    rng = np.random.RandomState(7)
    value = rng.randn(2, 5, 12).astype(np.float32)
    mask = np.ones((2, 5, 12), dtype=np.float32)
    path = np.asarray(maximum_path(jnp.asarray(value), jnp.asarray(mask)))
    # each frame assigned to exactly one token; monotone non-decreasing
    assert (path.sum(axis=1) == 1).all()
    token_of_frame = path.argmax(axis=1)
    assert (np.diff(token_of_frame, axis=-1) >= 0).all()
    assert (np.diff(token_of_frame, axis=-1) <= 1).all()
    # starts at token 0, ends at last token
    assert (token_of_frame[:, 0] == 0).all()
    assert (token_of_frame[:, -1] == 4).all()


def test_mas_log_prior_matches_direct():
    rng = np.random.RandomState(3)
    b, t_x, t_y, d = 2, 4, 6, 5
    x_m = rng.randn(b, t_x, d).astype(np.float32)
    x_logs = rng.randn(b, t_x, d).astype(np.float32) * 0.1
    z = rng.randn(b, t_y, d).astype(np.float32)
    logp = np.asarray(mas_log_prior(jnp.asarray(x_m), jnp.asarray(x_logs), jnp.asarray(z)))
    # direct per-element gaussian loglik sum over d
    direct = np.zeros((b, t_x, t_y), dtype=np.float64)
    for bi in range(b):
        for i in range(t_x):
            for j in range(t_y):
                var = np.exp(2 * x_logs[bi, i])
                ll = -0.5 * np.log(2 * np.pi) - x_logs[bi, i] \
                    - 0.5 * (z[bi, j] - x_m[bi, i]) ** 2 / var
                direct[bi, i, j] = ll.sum()
    np.testing.assert_allclose(logp, direct, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("t_y,unroll", [(16, 1), (16, 8), (29, 8), (29, 3)])
def test_maximum_path_pallas_interpret_matches_oracle(t_y, unroll):
    """Pallas MAS kernel (interpret mode on CPU) vs the numpy oracle,
    covering the unrolled main loop and the static remainder rows."""
    from speech_masters_thesis_tpu.ops.pallas.mas import maximum_path_pallas

    rng = np.random.RandomState(11)
    b, t_x = 3, 8
    value = rng.randn(b, t_x, t_y).astype(np.float32)
    x_lens = rng.randint(2, t_x + 1, size=b)
    y_lens = np.maximum(rng.randint(t_x, t_y + 1, size=b), x_lens)
    mask = ((np.arange(t_x)[None, :, None] < x_lens[:, None, None])
            & (np.arange(t_y)[None, None, :] < y_lens[:, None, None])).astype(np.float32)
    ref = mas_oracle(value.copy(), mask.copy())
    out = np.asarray(maximum_path_pallas(jnp.asarray(value), jnp.asarray(mask),
                                         interpret=True, unroll=unroll))
    np.testing.assert_array_equal(out, ref)


def test_griffin_lim_jit_matches_host_path():
    """On-device (jitted) Griffin-Lim == the host artifact loop for the
    same magnitude and phase init (ops/griffin_lim.py vs train/artifacts.py)."""
    from speech_masters_thesis_tpu.ops.griffin_lim import griffin_lim_jnp
    from speech_masters_thesis_tpu.ops.stft import STFT

    rng = np.random.RandomState(3)
    stft = STFT(256, 64, 256)
    frames, bins = 40, 129
    mag = np.abs(rng.randn(1, frames, bins)).astype(np.float32)
    phase0 = rng.uniform(-np.pi, np.pi, (1, frames, bins)).astype(np.float32)

    # host-style loop (artifacts.griffin_lim with injected phase)
    p = jnp.asarray(phase0)
    m = jnp.asarray(mag)
    for _ in range(8):
        audio = stft.inverse(m, p)
        real, imag = stft.real_imag(audio)
        p = jnp.arctan2(imag, real)[:, :frames]
    ref = np.asarray(stft.inverse(m, p))

    out = np.asarray(jax.jit(
        lambda m, p: griffin_lim_jnp(m, stft, p, n_iter=8))(m, jnp.asarray(phase0)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_mel_vocoder_shapes_and_energy():
    """make_mel_vocoder returns [B, frames*hop] audio that reconstructs a
    tone's energy envelope (sanity: silence in -> near-silence out)."""
    from speech_masters_thesis_tpu.ops.griffin_lim import make_mel_vocoder
    from speech_masters_thesis_tpu.ops.stft import MelSpectrogram, mel_band_edges
    from speech_masters_thesis_tpu.utils.config import Config

    ds = Config({"sample_rate": 22050, "n_fft": 1024, "hop_length": 256,
                 "win_length": 1024, "n_mels": 80})
    t = 256 * 40
    tone = (0.5 * np.sin(2 * np.pi * 440 * np.arange(t) / 22050)).astype(np.float32)
    silence = np.zeros(t, np.float32)
    mel_op = MelSpectrogram(ds.sample_rate, ds.n_fft, ds.hop_length, ds.win_length,
                            ds.n_mels, *mel_band_edges(ds))
    log_mel = np.asarray(mel_op(jnp.asarray(np.stack([tone, silence]))))

    vocode = jax.jit(make_mel_vocoder(ds, n_iter=4))
    audio = np.asarray(vocode(jnp.asarray(log_mel), jax.random.PRNGKey(0)))
    assert audio.shape == (2, 40 * 256)
    # tone reconstructs with real energy; silence stays silent
    assert np.abs(audio[0]).max() > 10 * np.abs(audio[1]).max()


@pytest.mark.parametrize("s,k,p", [(2, 4, 1), (4, 8, 2), (2, 5, 2)])
def test_folded_strided_conv_matches_unfolded(s, k, p):
    """model.folded_convs reformulation is exact (default-off perf knob;
    rejected on v5e — see BASELINE.md — but the code ships behind the knob)."""
    from speech_masters_thesis_tpu.models.vqvae.encdec import (
        MaskedConv1d, MaskedConvTranspose1d)

    rng = np.random.RandomState(0)
    B, T, C, F = 2, 64, 8, 16
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    lens = np.array([T, T - 14])
    mask = jnp.asarray((np.arange(T)[None] < lens[:, None]).astype(np.float32))[..., None]

    m0, m1 = MaskedConv1d(F, k, s, p), MaskedConv1d(F, k, s, p, folded=True)
    v = m0.init(jax.random.PRNGKey(0), x, mask)
    y0, _ = m0.apply(v, x, mask)
    y1, _ = m1.apply(v, x, mask)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)

    if k - 2 * p == s:  # sub-pixel fold requires out_len == s*T
        t0 = MaskedConvTranspose1d(F, k, s, p)
        t1 = MaskedConvTranspose1d(F, k, s, p, folded=True)
        v = t0.init(jax.random.PRNGKey(1), x, mask)
        z0, _ = t0.apply(v, x, mask)
        z1, _ = t1.apply(v, x, mask)
        assert z0.shape == z1.shape == (B, s * T, F)
        np.testing.assert_allclose(np.asarray(z0), np.asarray(z1), atol=1e-6)
