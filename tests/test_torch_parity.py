"""Cross-framework numerical parity against PyTorch (the BASELINE north star).

The torch side is ``tests/torch_ref/vqvae_ref.py`` — an exact
reference-semantics re-implementation whose state_dict layout is byte-
identical to a real reference checkpoint. Weights are transplanted through
tools/import_torch_checkpoint.py (the same path a user would take with a
trained reference checkpoint) and outputs compared:

  * VQ code indices: BITWISE equal (BASELINE.json north star)
  * decoder waveform + losses: allclose at fp32 tolerances
  * per-module parity for every block-zoo variant
  * log-mel features vs the reference's conv1d-DFT STFT: <= 1e-3 (north star)

Runs entirely on CPU (torch is CPU-only in this image).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tools.import_torch_checkpoint import import_vqvae
from speech_masters_thesis_tpu.models.vqvae import blocks as jblocks
from speech_masters_thesis_tpu.models.vqvae.model import VQVAE as JaxVQVAE
from speech_masters_thesis_tpu.ops import losses as jlosses
from speech_masters_thesis_tpu.ops.stft import MelSpectrogram, mel_filterbank
from speech_masters_thesis_tpu.utils.config import Config

from torch_ref import vqvae_ref as tref

# Small but non-trivial: zero_out=False so residual branches carry signal.
PARITY_CONFIG = Config({
    "model": {
        "levels": 2, "downs_t": [2, 1], "strides_t": [2, 2], "emb_width": 16,
        "l_bins": 32, "mu": 0.99, "multipliers": [2, 1], "width": 8, "depth": 2,
        "m_conv": 1.0, "revival_threshold": 1.0, "use_bottleneck": True,
        "dilation_growth_rate": 3, "dilation_cycle": None, "kernel_size_growth_rate": 2,
        "kernel_size_cycle": None, "reverse_decoder_dilation": True, "zero_out": False,
        "block_type": "gated_hifi",
        "loss": {"commit": 0.05, "multispectral": 1.0, "l1": 0.1, "l2": 1.0,
                 "linf": 0.02, "linf_topk": 64, "linf_approx": False,
                 "n_ffts": [256, 128], "hop_lengths": [64, 32],
                 "win_lengths": [256, 128], "window": "hann", "log": True},
    }
})


def _randomize(module: torch.nn.Module, seed: int) -> None:
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.1)


def _np_sd(module: torch.nn.Module) -> dict:
    return {k: v.numpy() for k, v in module.state_dict().items()}


# ---------------------------------------------------------------------------
# full-model parity through the checkpoint importer
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def transplanted():
    torch.manual_seed(0)
    ref = tref.VQVAE(PARITY_CONFIG.to_dict())
    _randomize(ref, seed=1)
    with torch.no_grad():
        ref.bottleneck.level_blocks[0].k.copy_(torch.randn(32, 16, generator=torch.Generator().manual_seed(2)))
    ref.eval()

    variables = import_vqvae(_np_sd(ref), PARITY_CONFIG)
    model = JaxVQVAE(config=PARITY_CONFIG.to_dict())
    # structure-complete variables: merge imported params/codebook over init
    rng = jax.random.PRNGKey(0)
    init_vars = model.init({"params": rng, "dropout": rng, "codebook": rng},
                           jnp.zeros((1, 64)), jnp.full((1,), 64), train=False)
    merged = jax.device_get(dict(init_vars))
    merged.update(variables)
    return ref, model, merged


def _audio_batch(b=2, t=512, seed=3):
    rng = np.random.RandomState(seed)
    audio = rng.uniform(-0.8, 0.8, (b, t)).astype(np.float32)
    lengths = np.array([t, t - 128], np.int32)
    return audio, lengths


def test_vq_codes_bitwise(transplanted):
    ref, model, variables = transplanted
    audio, lengths = _audio_batch()
    with torch.no_grad():
        mask = (torch.arange(audio.shape[1])[None, :]
                < torch.from_numpy(lengths)[:, None]).float()[:, None, :]
        h, h_mask = ref.encoders[0](torch.from_numpy(audio)[:, None, :], mask)
        ref_codes = ref.bottleneck.level_blocks[0].encode(h, h_mask).numpy()

    jax_codes, _ = model.apply(variables, jnp.asarray(audio),
                               jnp.asarray((np.arange(audio.shape[1])[None, :]
                                            < lengths[:, None]).astype(np.float32)),
                               method=JaxVQVAE.encode)
    np.testing.assert_array_equal(np.asarray(jax_codes), ref_codes)


def test_vqvae_forward_output_parity(transplanted):
    ref, model, variables = transplanted
    audio, lengths = _audio_batch()
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(audio)[:, None, :], torch.from_numpy(lengths))

    loss_dict, _ = model.apply(variables, jnp.asarray(audio), jnp.asarray(lengths),
                               train=False, rngs={})
    yh = np.asarray(loss_dict["yh"])
    ref_yh = ref_out["yh"].numpy()
    np.testing.assert_allclose(yh, ref_yh, rtol=1e-4, atol=2e-5)
    for key in ("loss", "loss_recon", "loss_stft", "loss_commit"):
        np.testing.assert_allclose(float(loss_dict[key]), float(ref_out[key]),
                                   rtol=2e-4, atol=1e-5, err_msg=key)


def test_mel_features_vs_reference_stft(transplanted):
    """North star: log-mel within 1e-3 of the reference DSP chain."""
    del transplanted
    audio, _ = _audio_batch(t=2048)
    n_fft, hop, n_mels, sr = 256, 64, 20, 22050
    # reference-style mel: conv1d-DFT STFT magnitude -> mel matmul -> safe_log
    stft = tref.STFT(n_fft, hop, n_fft, "hann")
    basis = torch.from_numpy(mel_filterbank(sr, n_fft, n_mels, 0.0, 8000.0))
    with torch.no_grad():
        ref_mel = tref.safe_log(basis @ stft(torch.from_numpy(audio))).numpy()
    ours = MelSpectrogram(sr, n_fft, hop, n_fft, n_mels, 0.0, 8000.0)
    jax_mel = np.asarray(ours(jnp.asarray(audio)))  # [B, frames, mels]
    np.testing.assert_allclose(jax_mel.transpose(0, 2, 1), ref_mel, atol=1e-3)


def test_spectral_loss_parity_nondefault_window():
    """loss.window is honored (reference transforms.py:97 get_window)."""
    audio, lengths = _audio_batch(t=1024)
    yh = audio + 0.05 * np.random.RandomState(5).randn(*audio.shape).astype(np.float32)
    mask = (np.arange(audio.shape[1])[None, :] < lengths[:, None]).astype(np.float32)
    for window in ("hann", "hamming", "blackman"):
        ref_loss = tref.MultiResolutionSpectralLoss(
            [256], [64], [200], window=window, log=True)
        with torch.no_grad():
            expect = float(ref_loss(torch.from_numpy(audio)[:, None, :],
                                    torch.from_numpy(yh)[:, None, :],
                                    torch.from_numpy(mask)[:, None, :]))
        ours = jlosses.MultiResolutionSpectralLoss(
            (256,), (64,), (200,), window=window, log=True)
        got = float(ours(jnp.asarray(audio), jnp.asarray(yh), jnp.asarray(mask)))
        np.testing.assert_allclose(got, expect, rtol=2e-4, err_msg=window)


def test_recon_loss_parity():
    audio, lengths = _audio_batch(t=1024)
    yh = audio + 0.1 * np.random.RandomState(6).randn(*audio.shape).astype(np.float32)
    mask = (np.arange(audio.shape[1])[None, :] < lengths[:, None]).astype(np.float32)
    ref_loss = tref.MultiNormReconstructionLoss(l1=0.3, l2=1.0, linf=0.02, linf_topk=128)
    with torch.no_grad():
        expect = float(ref_loss(torch.from_numpy(audio)[:, None, :],
                                torch.from_numpy(yh)[:, None, :],
                                torch.from_numpy(mask)[:, None, :]))
    ours = jlosses.MultiNormReconstructionLoss(l1=0.3, l2=1.0, linf=0.02,
                                               linf_topk=128, linf_approx=False)
    got = float(ours(jnp.asarray(audio), jnp.asarray(yh), jnp.asarray(mask)))
    np.testing.assert_allclose(got, expect, rtol=1e-5)


# ---------------------------------------------------------------------------
# per-module parity for the whole block zoo
# ---------------------------------------------------------------------------
def _map_res_layer(sd, prefix):
    return {"Conv_0": {"kernel": np.transpose(sd[f"{prefix}.model.2.weight"], (2, 1, 0)),
                       "bias": sd[f"{prefix}.model.2.bias"]},
            "Conv_1": {"kernel": np.transpose(sd[f"{prefix}.model.5.weight"], (2, 1, 0)),
                       "bias": sd[f"{prefix}.model.5.bias"]}}


def _map_conv(sd, name):
    return {"kernel": np.transpose(sd[f"{name}.weight"], (2, 1, 0)), "bias": sd[f"{name}.bias"]}


def _block_io(seed=7, b=2, t=32, c=8):
    rng = np.random.RandomState(seed)
    x = rng.randn(b, t, c).astype(np.float32)
    mask = np.ones((b, t, 1), np.float32)
    mask[1, t // 2:] = 0.0
    return x, mask


def _assert_block_parity(torch_block, jax_block, params, x, mask):
    torch_block.eval()
    with torch.no_grad():
        ref_y, _ = torch_block(torch.from_numpy(x.transpose(0, 2, 1)),
                               torch.from_numpy(mask.transpose(0, 2, 1)))
    got, _ = jax_block.apply({"params": params}, jnp.asarray(x), jnp.asarray(mask),
                             train=False)
    np.testing.assert_allclose(np.asarray(got), ref_y.numpy().transpose(0, 2, 1),
                               rtol=1e-5, atol=1e-6)


def test_gated_hifi_block_parity():
    tb = tref.GatedHiFiBlock(8, 3, dilation_growth_rate=3, kernel_size_growth_rate=2,
                             zero_out=False, res_scale=True)
    _randomize(tb, seed=11)
    sd = _np_sd(tb)
    params = {}
    for d in range(3):
        params[f"branch_in_{d}"] = _map_conv(sd, f"blocks.{d}.0")
        params[f"branch_res_{d}"] = _map_res_layer(sd, f"blocks.{d}.1")
    params["gate"] = _map_conv(sd, "gate")
    jb = jblocks.GatedHiFiBlock(8, 3, dilation_growth_rate=3, kernel_size_growth_rate=2,
                                zero_out=False, res_scale=True)
    x, mask = _block_io()
    _assert_block_parity(tb, jb, params, x, mask)


def test_wavenet_block_parity():
    tb = tref.WaveNetBlock(8, 3, m_conv=2.0, dilation_growth_rate=2, zero_out=False,
                           res_scale=True)
    _randomize(tb, seed=12)
    sd = _np_sd(tb)
    params = {"conv_in": _map_conv(sd, "conv_in"), "conv_out": _map_conv(sd, "conv_out")}
    for d in range(3):
        params[f"conv_{d}"] = _map_conv(sd, f"convs.{d}")
        params[f"gate_{d}"] = _map_conv(sd, f"gates.{d}")
    jb = jblocks.WaveNetBlock(8, 3, m_conv=2.0, dilation_growth_rate=2, zero_out=False,
                              res_scale=True)
    x, mask = _block_io(seed=8)
    _assert_block_parity(tb, jb, params, x, mask)


def test_resnet_block_parity_reversed_dilation():
    tb = tref.ResNetBlock(8, 3, m_conv=1.5, dilation_growth_rate=2, zero_out=False,
                          reverse_dilation=True)
    _randomize(tb, seed=13)
    sd = _np_sd(tb)
    params = {f"ResLayer_{i}": _map_res_layer(sd, f"model.{i}") for i in range(3)}
    jb = jblocks.ResNetBlock(8, 3, m_conv=1.5, dilation_growth_rate=2, zero_out=False,
                             reverse_dilation=True)
    x, mask = _block_io(seed=9)
    _assert_block_parity(tb, jb, params, x, mask)


def test_hifi_block_parity():
    tb = tref.HiFiBlock(8, 3, m_conv=1.0, dilation_growth_rate=2,
                        kernel_size_growth_rate=2, zero_out=False)
    _randomize(tb, seed=14)
    sd = _np_sd(tb)
    params = {f"ResLayer_{i}": _map_res_layer(sd, f"blocks.{i}") for i in range(3)}
    jb = jblocks.HiFiBlock(8, 3, m_conv=1.0, dilation_growth_rate=2,
                           kernel_size_growth_rate=2, zero_out=False)
    x, mask = _block_io(seed=10)
    _assert_block_parity(tb, jb, params, x, mask)
